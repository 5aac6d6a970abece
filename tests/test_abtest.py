"""operators/abtest.py: two-proportion z-test + Welch t-test."""

import math

import pytest

from pyspark.sql import functions as F

from weaviate_txtai_spark.operators.abtest import (
    two_proportion_ztest,
    welch_ttest,
)


def test_ztest_hand_computed(spark):
    # A: 30 users 12 successes, B: 40 users 8 successes
    rows = [("A", 1)] * 12 + [("A", 0)] * 18 + [("B", 1)] * 8 + [("B", 0)] * 32
    df = spark.createDataFrame(rows, ["variant", "converted"])
    r = two_proportion_ztest(
        df, "variant", "converted", group_a="A", group_b="B"
    ).collect()[0]
    assert (r.n_a, r.n_b, r.successes_a, r.successes_b) == (30, 40, 12, 8)
    assert r.rate_a == 0.4 and r.rate_b == 0.2
    assert r.abs_lift == round(0.2, 6)
    p = 20 / 70
    z = (0.4 - 0.2) / math.sqrt(p * (1 - p) * (1 / 30 + 1 / 40))
    assert r.z == round(z, 6)


def test_ztest_degenerate_pool_is_null(spark):
    rows = [("A", 1)] * 5 + [("B", 1)] * 5  # pooled rate 1 -> no variance
    df = spark.createDataFrame(rows, ["variant", "converted"])
    r = two_proportion_ztest(
        df, "variant", "converted", group_a="A", group_b="B"
    ).collect()[0]
    assert r.z is None and r.rate_a == 1.0


def test_ztest_ignores_other_groups(spark):
    rows = [("A", 1), ("A", 0), ("B", 0), ("B", 1), ("C", 1), ("C", 1)]
    df = spark.createDataFrame(rows, ["variant", "converted"])
    r = two_proportion_ztest(
        df, "variant", "converted", group_a="A", group_b="B"
    ).collect()[0]
    assert (r.n_a, r.n_b) == (2, 2)


def test_welch_hand_computed(spark):
    a = [1.0, 2.0, 3.0, 4.0]
    b = [2.0, 4.0, 6.0, 8.0, 10.0]
    rows = [("A", v) for v in a] + [("B", v) for v in b]
    df = spark.createDataFrame(rows, ["variant", "value"])
    r = welch_ttest(df, "variant", "value", group_a="A", group_b="B").collect()[0]
    ma, mb = sum(a) / 4, sum(b) / 5
    va = sum((x - ma) ** 2 for x in a) / 3
    vb = sum((x - mb) ** 2 for x in b) / 4
    qa, qb = va / 4, vb / 5
    t = (ma - mb) / math.sqrt(qa + qb)
    dof = (qa + qb) ** 2 / (qa**2 / 3 + qb**2 / 4)
    assert r.mean_a == round(ma, 6) and r.mean_b == round(mb, 6)
    assert r.t == round(t, 6)
    assert r.welch_df == round(dof, 6)


def test_welch_zero_variance_both_is_null(spark):
    rows = [("A", 5.0), ("A", 5.0), ("B", 7.0), ("B", 7.0)]
    df = spark.createDataFrame(rows, ["variant", "value"])
    r = welch_ttest(df, "variant", "value", group_a="A", group_b="B").collect()[0]
    assert r.t is None and r.welch_df is None


def test_welch_tiny_arm_is_null(spark):
    rows = [("A", 5.0), ("B", 7.0), ("B", 8.0)]
    df = spark.createDataFrame(rows, ["variant", "value"])
    r = welch_ttest(df, "variant", "value", group_a="A", group_b="B").collect()[0]
    assert r.t is None


def test_normal_two_sided_p_values(spark):
    from weaviate_txtai_spark.operators.abtest import normal_two_sided_p

    df = spark.createDataFrame(
        [(0.0,), (1.959964,), (2.575829,), (-1.959964,)], ["z"]
    )
    got = [
        r.p for r in df.select(
            F.round(normal_two_sided_p("z"), 4).alias("p")
        ).collect()
    ]
    assert got == [1.0, 0.05, 0.01, 0.05]  # symmetric in z


def test_cuped_reduces_variance_preserves_mean(spark):
    import random

    from weaviate_txtai_spark.operators.abtest import cuped_adjust

    rng = random.Random(31)
    rows = []
    for _ in range(400):
        x = rng.gauss(50, 10)          # pre-period covariate
        y = x * 0.8 + rng.gauss(0, 3)  # strongly covariate-driven
        rows.append((float(x), float(y)))
    df = spark.createDataFrame(rows, ["x", "y"])
    adj = cuped_adjust(df, "y", "x")
    r = adj.agg(
        F.avg("y").alias("my"), F.avg("adjusted").alias("ma"),
        F.var_samp("y").alias("vy"), F.var_samp("adjusted").alias("va"),
    ).collect()[0]
    assert r.ma == pytest.approx(r.my, rel=1e-9)  # unbiased
    assert r.va < r.vy * 0.3  # big variance cut on ρ≈0.93 data


def test_cuped_null_covariate_passthrough(spark):
    from weaviate_txtai_spark.operators.abtest import cuped_adjust

    df = spark.createDataFrame(
        [(1.0, 10.0), (2.0, 20.0), (None, 30.0)], "x double, y double"
    )
    got = {r.y: r.adjusted for r in cuped_adjust(df, "y", "x").collect()}
    assert got[30.0] == 30.0  # no covariate -> unadjusted


def test_cuped_constant_covariate_noop(spark):
    from weaviate_txtai_spark.operators.abtest import cuped_adjust

    df = spark.createDataFrame(
        [(5.0, float(v)) for v in range(10)], "x double, y double"
    )
    got = cuped_adjust(df, "y", "x").collect()
    assert all(r.adjusted == r.y for r in got)  # var(x)=0 -> theta null
