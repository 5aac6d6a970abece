"""Round-9 batch 9: greedy set cover, autocorrelation function."""

import math

import pytest

from pyspark.sql import functions as F


# -------------------------------------------------------------- set cover


def test_set_cover_greedy_trajectory(spark):
    from weaviate_txtai_spark.operators.setcover import greedy_set_cover

    docs = spark.createDataFrame(
        [
            (1, "a b c d"),       # 4 tokens
            (2, "a b"),           # subset of 1
            (3, "e f g"),         # 3 new
            (4, "d e"),           # subsumed by 1+3
            (5, "h"),             # 1 new
        ],
        "doc_id long, text string",
    )
    got = [(r["rank"], r["doc_id"], r["gain"])
           for r in greedy_set_cover(docs, 5).orderBy("rank").collect()]
    # greedy: doc1 (4), doc3 (3), doc5 (1); then everything is covered
    assert got == [(1, 1, 4), (2, 3, 3), (3, 5, 1)]


def test_set_cover_tie_breaks_on_doc_id(spark):
    from weaviate_txtai_spark.operators.setcover import greedy_set_cover

    docs = spark.createDataFrame(
        [(7, "x y"), (3, "p q")], "doc_id long, text string"
    )
    got = greedy_set_cover(docs, 1).collect()
    assert got[0]["doc_id"] == 3  # equal gain 2, smaller id wins


def test_set_cover_bigram_mode_and_validation(spark):
    from weaviate_txtai_spark.operators.setcover import greedy_set_cover

    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "b c")], "doc_id long, text string"
    )
    # doc1 bigrams {a b, b a}; doc2 {b c}
    got = [(r["doc_id"], r["gain"])
           for r in greedy_set_cover(docs, 3, ngram=2)
           .orderBy("rank").collect()]
    assert got == [(1, 2), (2, 1)]
    with pytest.raises(ValueError):
        greedy_set_cover(docs, 0)
    with pytest.raises(ValueError):
        greedy_set_cover(docs, 2, ngram=3)


def test_set_cover_duplicate_tokens_count_once(spark):
    from weaviate_txtai_spark.operators.setcover import greedy_set_cover

    docs = spark.createDataFrame(
        [(1, "a a a"), (2, "b c")], "doc_id long, text string"
    )
    got = greedy_set_cover(docs, 2).orderBy("rank").collect()
    assert got[0]["doc_id"] == 2 and got[0]["gain"] == 2
    assert got[1]["doc_id"] == 1 and got[1]["gain"] == 1


# --------------------------------------------------------------------- ACF


def _series(spark, ys):
    return spark.createDataFrame(
        [(i, float(y)) for i, y in enumerate(ys)], "t long, y double"
    )


def test_acf_matches_numpy_reference(spark):
    from weaviate_txtai_spark.operators.seasonal import acf

    import random

    rng = random.Random(21)
    ys = [rng.uniform(0, 10) for _ in range(60)]
    got = {r["lag"]: r["acf"]
           for r in acf(_series(spark, ys), max_lag=5).collect()}
    mu = sum(ys) / len(ys)
    den = sum((y - mu) ** 2 for y in ys)
    for k in range(1, 6):
        num = sum((ys[t] - mu) * (ys[t + k] - mu)
                  for t in range(len(ys) - k))
        assert got[k] == pytest.approx(round(num / den, 6), abs=1e-9), k


def test_acf_periodic_series_spikes_at_period(spark):
    from weaviate_txtai_spark.operators.seasonal import acf

    ys = [1.0, 0.0, 0.0, 0.0] * 20  # period 4
    got = {r["lag"]: r["acf"]
           for r in acf(_series(spark, ys), max_lag=6).collect()}
    assert got[4] > 0.8
    assert got[1] < 0 and got[2] < 0


def test_acf_constant_series_null_and_validation(spark):
    from weaviate_txtai_spark.operators.seasonal import acf

    got = acf(_series(spark, [5.0] * 10), max_lag=2).collect()
    assert all(r["acf"] is None for r in got)
    with pytest.raises(ValueError):
        acf(_series(spark, [1.0, 2.0]), max_lag=0)


def test_acf_pair_counts(spark):
    from weaviate_txtai_spark.operators.seasonal import acf

    got = {r["lag"]: r["n_pairs"]
           for r in acf(_series(spark, list(range(10))), max_lag=3)
           .collect()}
    assert got == {1: 9, 2: 8, 3: 7}
