"""Round-9 batch 6: TwoNN intrinsic dimension, personalized PageRank,
chi-square goodness-of-fit (SRM)."""

import math

import pytest

from pyspark.sql import functions as F


# ----------------------------------------------------------------- TwoNN


def test_twonn_matches_hand_mle(spark):
    from weaviate_txtai_spark.operators.intdim import twonn_intrinsic_dim

    import random

    rng = random.Random(13)
    # points on a 2-D plane embedded in 6-D: id should come out near 2
    rows = []
    for i in range(120):
        a, b = rng.gauss(0, 1), rng.gauss(0, 1)
        rows.append((i, [a, b, a + b, a - b, 0.5 * a, 0.5 * b]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    r = twonn_intrinsic_dim(df).collect()[0]
    assert r["n_used"] > 100
    assert r["id_mle"] is not None and 0.5 < r["id_mle"] < 6.0


def test_twonn_excludes_duplicates_and_ties(spark):
    from weaviate_txtai_spark.operators.intdim import twonn_intrinsic_dim

    # v0 == v1 (duplicates: d1 = 0 for both) and v2/v3/v4 equidistant
    rows = [
        (0, [1.0, 0.0]),
        (1, [1.0, 0.0]),
        (2, [0.0, 1.0]),
        (3, [0.6, 0.8]),
        (4, [0.8, 0.6]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    r = twonn_intrinsic_dim(df).collect()[0]
    # duplicates excluded; remaining points must have d2 > d1 > 0
    assert r["n_used"] <= 3


def test_twonn_all_duplicates_null(spark):
    from weaviate_txtai_spark.operators.intdim import twonn_intrinsic_dim

    rows = [(i, [1.0, 2.0]) for i in range(4)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    r = twonn_intrinsic_dim(df).collect()[0]
    assert r["n_used"] == 0 and r["id_mle"] is None


# ---------------------------------------------------- personalized PR


def test_ppr_mass_concentrates_near_seed(spark):
    from weaviate_txtai_spark.operators.graph import (
        personalized_pagerank_exact,
    )

    # chain a -> b -> c -> d, seed at a: rank must decay along hops;
    # d (3 hops out) below b (1 hop)
    e = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a")],
        "src string, dst string",
    )
    seeds = spark.createDataFrame([("a",)], "id string")
    got = {r["id"]: r["rank_fp"]
           for r in personalized_pagerank_exact(e, seeds, iters=4).collect()}
    assert got["a"] > got["b"] > got["c"] > got["d"]


def test_ppr_python_trajectory_bitmatch(spark):
    from weaviate_txtai_spark.operators.graph import (
        personalized_pagerank_exact,
    )

    edges = [("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"), ("d", "a")]
    seeds = ["a", "d"]
    e = spark.createDataFrame(edges, "src string, dst string")
    sdf = spark.createDataFrame([(s,) for s in seeds], "id string")
    scale, num, den, iters = 10**12, 85, 100, 3
    nodes = sorted({x for p in edges for x in p} | set(seeds))
    deg = {}
    for s, _ in edges:
        deg[s] = deg.get(s, 0) + 1
    k = len(seeds)
    base = ((den - num) * scale) // (den * k)
    r = {n: (scale // k if n in seeds else 0) for n in nodes}
    for _ in range(iters):
        dm = sum(v for n, v in r.items() if n not in deg)
        mass = {n: 0 for n in nodes}
        for s, d in edges:
            mass[d] += r[s] // deg[s]
        r = {
            n: (base if n in seeds else 0)
            + (num * (mass[n] + (dm // k if n in seeds else 0))) // den
            for n in nodes
        }
    got = {row["id"]: row["rank_fp"]
           for row in personalized_pagerank_exact(e, sdf, iters=iters)
           .collect()}
    assert got == r


def test_ppr_validation(spark):
    from weaviate_txtai_spark.operators.graph import (
        personalized_pagerank_exact,
    )

    e = spark.createDataFrame([("a", "b")], "src string, dst string")
    empty = spark.createDataFrame([], "id string")
    with pytest.raises(ValueError):
        personalized_pagerank_exact(e, empty)
    s = spark.createDataFrame([("a",)], "id string")
    with pytest.raises(ValueError):
        personalized_pagerank_exact(e, s, iters=0)


# ------------------------------------------------------------- chisq GOF


def test_chisq_gof_exact_fit_is_zero(spark):
    from weaviate_txtai_spark.operators.abtest import chisq_gof

    rows = [("A",)] * 50 + [("B",)] * 30 + [("C",)] * 20
    df = spark.createDataFrame(rows, "g string")
    r = chisq_gof(df, "g", {"A": 0.5, "B": 0.3, "C": 0.2}).collect()[0]
    assert r["n"] == 100 and r["k"] == 3
    assert r["chi2"] == 0.0
    assert r["p_value"] > 0.9


def test_chisq_gof_matches_hand_statistic(spark):
    from weaviate_txtai_spark.operators.abtest import chisq_gof

    rows = [("A",)] * 70 + [("B",)] * 30
    df = spark.createDataFrame(rows, "g string")
    r = chisq_gof(df, "g", {"A": 0.5, "B": 0.5}).collect()[0]
    # chi2 = (70-50)^2/50 + (30-50)^2/50 = 16
    assert r["chi2"] == pytest.approx(16.0)
    assert r["p_value"] < 0.001  # strong SRM alarm


def test_chisq_gof_unobserved_and_foreign_groups(spark):
    from weaviate_txtai_spark.operators.abtest import chisq_gof

    rows = [("A",)] * 10 + [("X",)] * 5  # X not expected: ignored
    df = spark.createDataFrame(rows, "g string")
    r = chisq_gof(df, "g", {"A": 0.5, "B": 0.5}).collect()[0]
    assert r["n"] == 10 and r["k"] == 2
    # all mass in A: chi2 = (10-5)^2/5 + (0-5)^2/5 = 10
    assert r["chi2"] == pytest.approx(10.0)


def test_chisq_gof_validation(spark):
    from weaviate_txtai_spark.operators.abtest import chisq_gof

    df = spark.createDataFrame([("A",)], "g string")
    with pytest.raises(ValueError):
        chisq_gof(df, "g", {"A": 1.0})
    with pytest.raises(ValueError):
        chisq_gof(df, "g", {"A": 0.6, "B": 0.6})
    with pytest.raises(ValueError):
        chisq_gof(df, "g", {"A": 1.2, "B": -0.2})
