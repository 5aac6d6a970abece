"""Repeated-passage detection (operators/passages.py)."""

import pytest

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


def test_ngram_containment_scores(spark):
    from weaviate_txtai_spark.operators.passages import ngram_containment

    train = spark.createDataFrame(
        [(1, "a b c d e f g h i j")], "doc_id long, text string"
    )
    evals = spark.createDataFrame(
        [
            (10, "a b c d e f g h i j"),   # fully contained -> 1.0
            (11, "a b c d e f g h zz yy"), # 1 of 3 windows hit
            (12, "q r s t u v w x y z"),   # novel -> 0.0
            (13, "too short"),             # < k tokens -> surfaced NULL
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r
        for r in ngram_containment(evals, train, k=8).collect()
    }
    assert got[10]["containment"] == 1.0
    assert got[11]["n_windows"] == 3 and got[11]["n_hit"] == 1
    assert got[11]["containment"] == pytest.approx(1 / 3, abs=1e-6)
    assert got[12]["containment"] == 0.0 and got[12]["n_hit"] == 0
    assert got[13]["n_windows"] == 0 and got[13]["containment"] is None
    # md5 oracle mode == xxhash64 production mode
    md5 = sorted(
        (r["doc_id"], r["n_hit"])
        for r in ngram_containment(evals, train, k=8, hash_mode="md5").collect()
    )
    xx = sorted(
        (r["doc_id"], r["n_hit"])
        for r in ngram_containment(evals, train, k=8, hash_mode="xxhash64").collect()
    )
    assert md5 == xx
