"""Round-9 batch 11: EB beta-binomial shrinkage, jackknife ratio SE,
kNN leave-one-out label accuracy."""

import math

import pytest

from pyspark.sql import functions as F


# --------------------------------------------------------------------- EB


def test_eb_shrinks_small_samples_harder(spark):
    from weaviate_txtai_spark.operators.calibration import (
        eb_beta_binomial_shrink,
    )

    import random

    rng = random.Random(23)
    rows = []
    # many keys with true rate ~0.2; one small key at 1/1, one big at
    # 200/1000
    for k in range(50):
        n = rng.randint(20, 60)
        for _ in range(n):
            rows.append((f"k{k}", 1 if rng.random() < 0.2 else 0))
    rows.append(("tiny", 1))  # raw rate 1.0 from one trial
    for _ in range(1000):
        rows.append(("big", 1 if rng.random() < 0.2 else 0))
    df = spark.createDataFrame(rows, "k string, s int")
    got = {r["k"]: r for r in eb_beta_binomial_shrink(df, "k", "s")
           .collect()}
    tiny, big = got["tiny"], got["big"]
    assert tiny["rate_raw"] == 1.0
    # tiny moves far toward the ~0.2 prior; big barely moves
    assert tiny["rate_eb"] < 0.6
    assert abs(big["rate_eb"] - big["rate_raw"]) < 0.01
    assert tiny["alpha"] is not None and tiny["alpha"] > 0


def test_eb_matches_closed_form(spark):
    from weaviate_txtai_spark.operators.calibration import (
        eb_beta_binomial_shrink,
    )

    # three keys, hand MoM: rates .2 (1/5), .5 (2/4), .8 (4/5)
    rows = ([("a", 1)] + [("a", 0)] * 4
            + [("b", 1)] * 2 + [("b", 0)] * 2
            + [("c", 1)] * 4 + [("c", 0)])
    df = spark.createDataFrame(rows, "k string, s int")
    got = {r["k"]: r for r in eb_beta_binomial_shrink(df, "k", "s")
           .collect()}
    m = (0.2 + 0.5 + 0.8) / 3
    v = ((0.2 - m) ** 2 + (0.5 - m) ** 2 + (0.8 - m) ** 2) / 2
    ab = m * (1 - m) / v - 1
    alpha = round(ab * m, 9)
    beta = round(ab * (1 - m), 9)
    want_a = round((1 + alpha) / (5 + alpha + beta), 6)
    assert got["a"]["alpha"] == pytest.approx(alpha, abs=1e-12)
    assert got["a"]["rate_eb"] == pytest.approx(want_a, abs=1e-9)


def test_eb_degenerate_falls_back_to_raw(spark):
    from weaviate_txtai_spark.operators.calibration import (
        eb_beta_binomial_shrink,
    )

    # all keys share the same rate -> v = 0 -> no shrinkage, NULL prior
    rows = [("a", 1), ("a", 0), ("b", 1), ("b", 0)]
    df = spark.createDataFrame(rows, "k string, s int")
    got = eb_beta_binomial_shrink(df, "k", "s").collect()
    for r in got:
        assert r["rate_eb"] == r["rate_raw"] == 0.5
        assert r["alpha"] is None and r["beta"] is None


# --------------------------------------------------------------- jackknife


def test_jackknife_matches_python_reference(spark):
    from weaviate_txtai_spark.operators.bootstrap import jackknife_ratio

    import random

    rng = random.Random(29)
    groups = []
    for g in range(40):
        n = rng.randint(2, 10)
        c = rng.randint(0, n)
        groups.append((g, float(c), float(n)))
    df = spark.createDataFrame(groups, "g long, num double, den double")
    r = jackknife_ratio(df, "g", "num", "den").collect()[0]
    N = sum(c for _, c, _ in groups)
    D = sum(n for _, _, n in groups)
    ts = [(N - c) / (D - n) for _, c, n in groups]
    tbar = sum(ts) / len(ts)
    se = math.sqrt(
        (len(ts) - 1) / len(ts) * sum((t - tbar) ** 2 for t in ts)
    )
    assert r["theta"] == pytest.approx(round(N / D, 6), abs=1e-9)
    assert r["se_jack"] == pytest.approx(se, abs=1e-6)
    assert r["g"] == r["g_used"] == 40


def test_jackknife_excludes_denominator_emptying_groups(spark):
    from weaviate_txtai_spark.operators.bootstrap import jackknife_ratio

    # one group IS the whole denominator: its deletion is undefined
    df = spark.createDataFrame(
        [(1, 2.0, 10.0), (2, 0.0, 0.0)], "g long, num double, den double"
    )
    r = jackknife_ratio(df, "g", "num", "den").collect()[0]
    assert r["g"] == 2 and r["g_used"] == 1
    assert r["se_jack"] is None  # < 2 usable pseudo-values


# ------------------------------------------------------------- kNN LOO acc


def test_knn_loo_separable_clusters(spark):
    from weaviate_txtai_spark.operators.intdim import (
        knn_label_loo_accuracy,
    )

    import random

    rng = random.Random(31)
    rows = []
    for i in range(30):
        base = [5.0, 0.0] if i % 2 == 0 else [0.0, 5.0]
        vec = [base[0] + rng.gauss(0, 0.1), base[1] + rng.gauss(0, 0.1)]
        rows.append((i, vec, "x" if i % 2 == 0 else "y"))
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label string"
    )
    got = {r["label"]: r for r in knn_label_loo_accuracy(df).collect()}
    assert got["x"]["accuracy"] == 1.0
    assert got["y"]["accuracy"] == 1.0
    assert got["x"]["n"] == 15


def test_knn_loo_mislabeled_point_detected(spark):
    from weaviate_txtai_spark.operators.intdim import (
        knn_label_loo_accuracy,
    )

    rows = [(i, [1.0, float(i) / 100], "a") for i in range(6)]
    rows.append((99, [1.0, 0.035], "b"))  # lone 'b' inside the 'a' blob
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label string"
    )
    got = {r["label"]: r for r in knn_label_loo_accuracy(df).collect()}
    assert got["b"]["n_correct"] == 0  # neighbors all vote 'a'
    assert got["a"]["accuracy"] == 1.0
