"""operators/abtest.py: two-proportion z-test + Welch t-test."""

import math

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
