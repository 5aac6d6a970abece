"""Round-9 batch 7: Newman modularity, Markov entropy rate, CMH test."""

import math

import pytest

from pyspark.sql import functions as F


# ------------------------------------------------------------- modularity


def test_modularity_two_cliques(spark):
    from weaviate_txtai_spark.operators.graph import modularity

    # two triangles joined by one bridge: modular partition scores high
    edges = [("a1", "a2"), ("a2", "a3"), ("a3", "a1"),
             ("b1", "b2"), ("b2", "b3"), ("b3", "b1"),
             ("a1", "b1")]
    e = spark.createDataFrame(edges, "src string, dst string")
    lab = spark.createDataFrame(
        [(n, n[0]) for n in ["a1", "a2", "a3", "b1", "b2", "b3"]],
        "id string, label string",
    )
    rows = modularity(e, lab).collect()
    q = sum(r["q_part"] for r in rows)
    # hand: m=7, each clique e_in=3, d_sum=7 -> q_c = 3/7 - (7/14)^2
    want = 2 * (3 / 7 - 0.25)
    assert q == pytest.approx(want, abs=2e-6)  # q_part rounded at 6 dp
    # anti-community labels (mixing the cliques) must score lower
    lab2 = spark.createDataFrame(
        [("a1", "x"), ("a2", "y"), ("a3", "x"),
         ("b1", "y"), ("b2", "x"), ("b3", "y")],
        "id string, label string",
    )
    q2 = sum(r["q_part"] for r in modularity(e, lab2).collect())
    assert q2 < q


def test_modularity_symmetrizes_and_drops_selfloops(spark):
    from weaviate_txtai_spark.operators.graph import modularity

    # duplicate directed edges + self-loop collapse to ONE undirected edge
    e = spark.createDataFrame(
        [("a", "b"), ("b", "a"), ("a", "a")], "src string, dst string"
    )
    lab = spark.createDataFrame(
        [("a", "c"), ("b", "c")], "id string, label string"
    )
    rows = modularity(e, lab).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["m_edges"] == 1 and r["e_in"] == 1 and r["d_sum"] == 2
    # single community containing everything: q = 1 - 1 = 0
    assert r["q_part"] == pytest.approx(0.0)


def test_modularity_unlabeled_nodes_excluded_from_rows(spark):
    from weaviate_txtai_spark.operators.graph import modularity

    e = spark.createDataFrame(
        [("a", "b"), ("b", "c")], "src string, dst string"
    )
    lab = spark.createDataFrame([("a", "x"), ("b", "x")],
                                "id string, label string")
    rows = modularity(e, lab).collect()
    assert {r["label"] for r in rows} == {"x"}
    # c still counts toward m and degrees: m=2, d(a)=1, d(b)=2
    assert rows[0]["m_edges"] == 2 and rows[0]["d_sum"] == 3


# ------------------------------------------------------------ entropy rate


def test_entropy_rate_deterministic_chain_is_zero(spark):
    from weaviate_txtai_spark.operators.markov import markov_entropy_rate

    tr = spark.createDataFrame(
        [("a", "b", 5), ("b", "a", 5)], "src string, dst string, n long"
    )
    r = markov_entropy_rate(tr).collect()[0]
    assert r["entropy_rate"] == pytest.approx(0.0)
    assert r["n_states"] == 2 and r["n_transitions"] == 2


def test_entropy_rate_uniform_chain_is_ln_k(spark):
    from weaviate_txtai_spark.operators.markov import markov_entropy_rate

    # every state jumps uniformly to 2 targets: H = ln 2
    tr = spark.createDataFrame(
        [("a", "b", 1), ("a", "c", 1),
         ("b", "a", 1), ("b", "c", 1),
         ("c", "a", 1), ("c", "b", 1)],
        "src string, dst string, n long",
    )
    r = markov_entropy_rate(tr, n_iter=12).collect()[0]
    assert r["entropy_rate"] == pytest.approx(math.log(2), abs=1e-4)


# --------------------------------------------------------------------- CMH


def test_cmh_matches_hand_computation(spark):
    from weaviate_txtai_spark.operators.abtest import cmh_test

    # stratum 1: a=30 of (n1=50, m1=40, N=100); stratum 2: a=10 of
    # (n1=40, m1=30, N=80)
    rows = []
    def stratum(s, a, b, c, d):  # a=T1O1 b=T1O0 c=T0O1 d=T0O0
        rows.extend([(s, 1, 1)] * a + [(s, 1, 0)] * b
                    + [(s, 0, 1)] * c + [(s, 0, 0)] * d)
    stratum(1, 30, 20, 10, 40)
    stratum(2, 10, 30, 20, 20)
    df = spark.createDataFrame(rows, "s int, t int, y int")
    r = cmh_test(df, "s", "t", "y").collect()[0]
    sa = 30 + 10
    se = 50 * 40 / 100 + 40 * 30 / 80
    sv = (50 * 50 * 40 * 60) / (100 * 100 * 99) \
        + (40 * 40 * 30 * 50) / (80 * 80 * 79)
    want = (sa - se) ** 2 / sv
    assert r["cmh"] == pytest.approx(round(want, 6), abs=1e-9)
    assert r["k_strata"] == 2 and r["n"] == 180
    assert 0 <= r["p_value"] <= 1


def test_cmh_degenerate_strata_skipped(spark):
    from weaviate_txtai_spark.operators.abtest import cmh_test

    # stratum 9 has no treated units -> contributes nothing; stratum 1
    # is a clean 2x2
    rows = ([(1, 1, 1)] * 5 + [(1, 1, 0)] * 5 + [(1, 0, 1)] * 2
            + [(1, 0, 0)] * 8 + [(9, 0, 1)] * 4 + [(9, 0, 0)] * 4)
    df = spark.createDataFrame(rows, "s int, t int, y int")
    r = cmh_test(df, "s", "t", "y").collect()[0]
    assert r["k_strata"] == 2  # both strata counted in the census
    assert r["cmh"] is not None


def test_cmh_all_degenerate_null(spark):
    from weaviate_txtai_spark.operators.abtest import cmh_test

    df = spark.createDataFrame(
        [(1, 1, 1), (1, 1, 0)], "s int, t int, y int"
    )  # no controls anywhere
    r = cmh_test(df, "s", "t", "y").collect()[0]
    assert r["cmh"] is None and r["p_value"] is None
