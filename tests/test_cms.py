"""Count-Min sketch: never-undercount guarantee, εN over-count bound,
exact merge additivity, distributed-vs-driver estimate parity."""

import math

import pytest

from pyspark.sql import functions as F

from weaviate_txtai_spark.operators.cms import (
    CountMinSketch,
    build_cms,
    estimate_df,
)


def _tokens(spark, sf_dir):
    from weaviate_txtai_spark.functions.text import tokens

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select(F.explode(tokens("text")).alias("term"))


def test_cms_never_undercounts_and_bounded_overcount(spark, sf_dir):
    tok = _tokens(spark, sf_dir)
    true = {r["term"]: r["n"] for r in
            tok.groupBy("term").agg(F.count(F.lit(1)).alias("n")).collect()}
    n_total = sum(true.values())
    cms = build_cms(tok, "term", width=1024, depth=5)
    assert cms.total == n_total
    ests = {
        r["term"]: r["est"]
        for r in estimate_df(
            cms, tok.select("term").distinct(), "term"
        ).collect()
    }
    eps = math.e / 1024
    for t, c in true.items():
        assert ests[t] >= c  # CMS never undercounts
        # e/width bound holds per row with prob 1-1/e; min over 5 rows
        # fails with prob e^-5 — allow 3x slack for the whole vocab
        assert ests[t] <= c + 3 * eps * n_total


def test_cms_merge_equals_union_build(spark, sf_dir):
    tok = _tokens(spark, sf_dir)
    a = tok.limit(2000)
    # build over two halves via distinct hashing split
    left = tok.filter(F.xxhash64("term") % 2 == 0)
    right = tok.filter(F.xxhash64("term") % 2 != 0)
    c_all = build_cms(tok, "term", width=256, depth=3)
    c_l = build_cms(left, "term", width=256, depth=3)
    c_r = build_cms(right, "term", width=256, depth=3)
    merged = c_l.merge(c_r)
    assert merged.table == c_all.table and merged.total == c_all.total
    with pytest.raises(ValueError, match="dimension"):
        c_l.merge(build_cms(a, "term", width=128, depth=3))


def test_cms_estimate_matches_estimate_df(spark, sf_dir):
    tok = _tokens(spark, sf_dir)
    cms = build_cms(tok, "term", width=512, depth=4)
    some = [r["term"] for r in tok.distinct().limit(5).collect()]
    df_est = {
        r["term"]: r["est"]
        for r in estimate_df(
            cms, spark.createDataFrame([(t,) for t in some], "term string"), "term"
        ).collect()
    }
    for t in some:
        assert cms.estimate(t) == df_est[t]


def test_cms_validation(spark, sf_dir):
    tok = _tokens(spark, sf_dir)
    with pytest.raises(ValueError, match="positive"):
        build_cms(tok, "term", width=0)
    empty = build_cms(tok.filter(F.lit(False)), "term", width=64, depth=2)
    assert empty.total == 0 and empty.estimate("anything") == 0


def test_cms_estimate_df_null_items(spark, sf_dir):
    tok = _tokens(spark, sf_dir)
    cms = build_cms(tok, "term", width=256, depth=3)
    items = spark.createDataFrame([("the",), (None,)], "term string")
    got = {r["term"]: r["est"] for r in estimate_df(cms, items, "term").collect()}
    assert got[None] is None
    assert got["the"] is not None and got["the"] >= 0
