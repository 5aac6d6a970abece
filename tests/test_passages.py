"""Repeated-passage detection (operators/passages.py)."""

from pyspark.sql import functions as F

from weaviate_txtai_spark.operators.passages import (
    repeated_passage_stats,
    repeated_passages,
    window_doc_pairs,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


BOILER = "this site uses cookies to improve your browsing experience ok"  # 10 tokens


def test_hand_computed_stats(spark):
    # doc 1: boiler + unique tail; doc 2: unique head + boiler; doc 3: unique
    docs = _docs(
        spark,
        [
            (1, BOILER + " alpha beta gamma delta epsilon zeta eta theta"),
            (2, "iota kappa lamda mu nu xi omicron pi " + BOILER),
            (3, "rho sigma tau upsilon phi chi psi omega aa bb cc dd ee ff"),
        ],
    )
    stats = {
        r["doc_id"]: r
        for r in repeated_passage_stats(docs, k=8, min_docs=2).collect()
    }
    # each doc: 18 tokens -> 11 windows of 8
    assert stats[1]["n_windows"] == 11
    # the 10-token boiler yields 3 shared 8-windows per doc
    assert stats[1]["n_repeated"] == 3
    assert stats[2]["n_repeated"] == 3
    assert stats[3]["n_repeated"] == 0
    assert stats[3]["keep"] is True
    assert abs(stats[1]["repeated_ratio"] - round(3 / 11, 6)) < 1e-9
    inv = repeated_passages(docs, k=8, min_docs=2).collect()
    assert len(inv) == 3 and all(r["n_docs"] == 2 for r in inv)


def test_short_and_empty_docs_kept(spark):
    docs = _docs(spark, [(1, "only three tokens"), (2, ""), (3, "x " * 4)])
    rows = {r["doc_id"]: r for r in repeated_passage_stats(docs, k=8).collect()}
    assert len(rows) == 3
    for r in rows.values():
        assert r["n_windows"] == 0 and r["repeated_ratio"] == 0.0 and r["keep"]


def test_intra_doc_repeat_not_cross_doc(spark):
    # the same window twice inside ONE doc is not a repeated passage
    eight = "a b c d e f g h"
    docs = _docs(spark, [(1, eight + " z " + eight), (2, "p q r s t u v w")])
    stats = {r["doc_id"]: r for r in repeated_passage_stats(docs, k=8).collect()}
    assert stats[1]["n_repeated"] == 0
    # but it counts twice in n_windows (positions, not distinct windows)
    pairs = window_doc_pairs(docs, k=8).filter(F.col("doc_id") == 1).collect()
    assert any(r["n_occ"] == 2 for r in pairs)


def test_hash_modes_agree(spark, sf_dir):
    from weaviate_txtai_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    a = repeated_passage_stats(docs, k=8, hash_mode="md5")
    b = repeated_passage_stats(docs, k=8, hash_mode="xxhash64")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
