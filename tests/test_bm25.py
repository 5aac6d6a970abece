"""BM25 semantics on hand-built docs (operators/bm25.py)."""

import math

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
