"""Cache lifecycle (VERDICT r2 item 3): every operator-internal persist
is released when the enclosing cache_scope exits, so a long-lived driver
looping heavy operators no longer accumulates cached tables."""

import pytest

from pyspark.sql import functions as F

from weaviate_txtai_spark.cache import cache_scope, scoped_persist


def _cache_empty(spark) -> bool:
    return bool(spark._jsparkSession.sharedState().cacheManager().isEmpty())


def _docs(spark):
    rows = [
        (i, "src", f"tok{i} " + " ".join(f"w{j}" for j in range(12)))
        for i in range(30)
    ]
    # plant one near-dup pair so the operators have real work
    rows.append((100, "src", rows[0][2]))
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def _emb(spark):
    return spark.createDataFrame(
        [(i, [float(i % 7), 1.0, float(i % 3)]) for i in range(40)],
        "vec_id long, embedding array<float>",
    )


@pytest.fixture(autouse=True)
def _clean_slate(spark):
    spark.catalog.clearCache()
    yield
    spark.catalog.clearCache()


def test_scope_releases_jaccard_caches(spark):
    from weaviate_txtai_spark.operators.dedup import jaccard_pairs

    with cache_scope() as handles:
        jaccard_pairs(_docs(spark), threshold=0.8).collect()
        assert handles  # the shingle table was registered
        assert not _cache_empty(spark)
    assert _cache_empty(spark)
    # the df-cap branch adds a second cache; both release
    with cache_scope() as handles:
        jaccard_pairs(_docs(spark), threshold=0.8, max_doc_freq=10).collect()
        assert len(handles) == 2
    assert _cache_empty(spark)


def test_scope_releases_minhash_caches(spark):
    from weaviate_txtai_spark.operators.dedup import (
        minhash_lsh_pairs,
        minhash_lsh_pairs_incremental,
    )

    with cache_scope():
        minhash_lsh_pairs(_docs(spark), threshold=0.8).collect()
    assert _cache_empty(spark)
    with cache_scope():
        minhash_lsh_pairs_incremental(
            _docs(spark).filter(F.col("doc_id") >= 15),
            corpus=_docs(spark).filter(F.col("doc_id") < 15),
        ).collect()
    assert _cache_empty(spark)


def test_scope_releases_bm25_and_ivf_caches(spark):
    from weaviate_txtai_spark.operators.ann import IVFIndex
    from weaviate_txtai_spark.operators.bm25 import bm25_scores

    with cache_scope():
        bm25_scores(_docs(spark), "tok3 w5").collect()
    assert _cache_empty(spark)

    emb = _emb(spark)
    idx = IVFIndex.build(emb, nlist=4)
    qdf = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vector"),
    )
    with cache_scope():
        idx.search(qdf, 3, nprobe=2).collect()
    assert _cache_empty(spark)


def test_nested_scopes_release_only_their_own(spark):
    df_outer = scoped_persist(spark.range(10).toDF("a"))
    # no active scope yet -> df_outer is NOT registered anywhere
    with cache_scope():
        inner = scoped_persist(spark.range(5).toDF("b"))
        inner.collect()
        with cache_scope():
            innermost = scoped_persist(spark.range(3).toDF("c"))
            innermost.collect()
        # innermost released, inner still cached
        assert innermost.storageLevel.useMemory is False
        assert inner.storageLevel.useMemory is True
    assert inner.storageLevel.useMemory is False
    # the unscoped persist survives every scope exit
    df_outer.collect()
    assert df_outer.storageLevel.useMemory is True
    df_outer.unpersist()


def test_no_scope_is_unchanged_behavior(spark):
    from weaviate_txtai_spark.operators.dedup import jaccard_pairs

    jaccard_pairs(_docs(spark), threshold=0.8).collect()
    assert not _cache_empty(spark)  # legacy: cache lives on
    spark.catalog.clearCache()
