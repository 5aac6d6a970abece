"""BM25 semantics on hand-built docs (operators/bm25.py)."""

import math

import pytest

from weaviate_txtai_spark.operators.bm25 import bm25_scores


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_bm25_matches_hand_computation(spark):
    # 3 docs, query term 'x': df=2, N=3, all lengths 2 → tf norm identical
    docs = _docs(spark, [(0, "x x"), (1, "x y"), (2, "y z")])
    got = {
        r["doc_id"]: r["score"]
        for r in bm25_scores(docs, ["x"], k1=1.2, b=0.75).collect()
    }
    assert set(got) == {0, 1}  # doc 2 has no query term
    idf = math.log(1 + (3 - 2 + 0.5) / (2 + 0.5))
    tfn = lambda tf: tf * 2.2 / (tf + 1.2 * (1 - 0.75 + 0.75 * 2 / 2))
    assert got[0] == round(idf * tfn(2), 6)
    assert got[1] == round(idf * tfn(1), 6)
    assert got[0] > got[1]  # more occurrences, same length → higher


def test_bm25_length_normalization(spark):
    # same tf, longer doc → lower score
    docs = _docs(spark, [(0, "x a b c d e f g"), (1, "x a")])
    got = {r["doc_id"]: r["score"] for r in bm25_scores(docs, ["x"]).collect()}
    assert got[1] > got[0]


def test_bm25_rare_term_outweighs_common(spark):
    # 'rare' appears in 1 of 4 docs, 'common' in all 4; one-hit docs of
    # equal length → the rare-term doc must outscore the common-term doc
    docs = _docs(
        spark,
        [
            (0, "rare common"),
            (1, "common pad"),
            (2, "common pad"),
            (3, "common pad"),
        ],
    )
    got = {
        r["doc_id"]: r["score"]
        for r in bm25_scores(docs, ["rare", "common"]).collect()
    }
    assert got[0] > got[1] == got[2] == got[3]


def test_qlm_hand_computed(spark):
    """2-doc corpus, query {a, b}: hand-evaluated Dirichlet QLM.
    d1 = 'a a c' (tf_a=2, len 3), d2 = 'b c c' (tf_b=1, len 3).
    C = 6 tokens, cf_a = 2, cf_b = 1, μ = 2.
    P(a|C)=1/3, P(b|C)=1/6.
    score(d1) = ln((2+2/3)/5) + ln((0+1/3)/5)
    score(d2) = ln((0+2/3)/5) + ln((1+1/3)/5)"""
    import math

    from weaviate_txtai_spark.operators.bm25 import qlm_scores

    docs = spark.createDataFrame(
        [(1, "a a c"), (2, "b c c")], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r["score"]
        for r in qlm_scores(docs, ["a", "b"], mu=2.0).collect()
    }
    exp1 = math.log((2 + 2 * (2 / 6)) / 5) + math.log((2 * (1 / 6)) / 5)
    exp2 = math.log((2 * (2 / 6)) / 5) + math.log((1 + 2 * (1 / 6)) / 5)
    assert got[1] == pytest.approx(exp1, abs=1e-6)
    assert got[2] == pytest.approx(exp2, abs=1e-6)


def test_qlm_absent_term_dropped(spark):
    """A query term with zero collection frequency is dropped rather
    than zeroing every likelihood."""
    from weaviate_txtai_spark.operators.bm25 import qlm_scores

    docs = spark.createDataFrame(
        [(1, "a c"), (2, "c c")], "doc_id long, text string"
    )
    with_ghost = {
        r["doc_id"]: r["score"]
        for r in qlm_scores(docs, ["a", "zzz_absent"], mu=2.0).collect()
    }
    without = {
        r["doc_id"]: r["score"]
        for r in qlm_scores(docs, ["a"], mu=2.0).collect()
    }
    assert with_ghost == without


def test_qlm_length_penalty_orders_ties(spark):
    """Same tf, longer doc scores lower (the Dirichlet length prior)."""
    from weaviate_txtai_spark.operators.bm25 import qlm_scores

    docs = spark.createDataFrame(
        [(1, "a c"), (2, "a c c c c c")], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r["score"]
        for r in qlm_scores(docs, ["a"], mu=2.0).collect()
    }
    assert got[1] > got[2]
