"""DSIR importance weights: estimator sanity on a labeled corpus,
hashed-feature mode (fixed vocab, broadcast join), hash portability."""

import pytest
from pyspark.sql import functions as F

from weaviate_txtai_spark.operators.importance import (
    dsir_weights,
    hash_feature,
)
from weaviate_txtai_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents")


def test_target_docs_score_higher_on_average(spark, docs):
    """The estimator must separate the domains it was fit on: the mean
    weight of target (en) docs exceeds the mean weight of the rest —
    weights ARE the log-likelihood ratio of exactly that split."""
    w = dsir_weights(docs, F.col("lang") == "en")
    j = w.join(docs.select("doc_id", "lang"), "doc_id")
    means = dict(
        j.groupBy(F.col("lang") == "en")
        .agg(F.avg("weight").alias("m"))
        .collect()
    )
    assert means[True] > means[False]


def test_hashed_mode_is_self_consistent_and_broadcast(spark, docs):
    """num_buckets mode: weights still separate the domains, and the
    vocab join is a broadcast (the fixed-size table is the 100 TB
    configuration)."""
    w = dsir_weights(docs, F.col("lang") == "en", num_buckets=512)
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        w.explain("formatted")
    assert "BroadcastHashJoin" in buf.getvalue()
    j = w.join(docs.select("doc_id", "lang"), "doc_id")
    means = dict(
        j.groupBy(F.col("lang") == "en")
        .agg(F.avg("weight").alias("m"))
        .collect()
    )
    assert means[True] > means[False]


def test_hash_feature_range_and_determinism(spark):
    df = spark.createDataFrame(
        [("alpha",), ("beta",), ("alpha",), ("",)], ["t"]
    )
    out = [
        r[0]
        for r in df.select(hash_feature(F.col("t"), 64)).collect()
    ]
    assert out[0] == out[2]  # same token, same bucket
    assert all(0 <= b < 64 for b in out)


def test_weight_matches_hand_computation(spark):
    """Pin the estimator on a 2-doc corpus: doc0='x x' target,
    doc1='y' raw-only. V=2, n_t=2, n_raw=3, a=0.5.
    lr(x) = ln(2.5/3) - ln(2.5/4); lr(y) = ln(0.5/3) - ln(1.5/4).
    weight(doc0)=2*lr(x), weight(doc1)=lr(y)."""
    import math

    df = spark.createDataFrame(
        [(0, "x x", True), (1, "y", False)], ["doc_id", "text", "t"]
    )
    got = {
        r["doc_id"]: r["weight"]
        for r in dsir_weights(df, F.col("t")).collect()
    }
    lr_x = math.log(2.5 / 3.0) - math.log(2.5 / 4.0)
    lr_y = math.log(0.5 / 3.0) - math.log(1.5 / 4.0)
    assert abs(got[0] - 2 * lr_x) < 1e-12
    assert abs(got[1] - lr_y) < 1e-12
