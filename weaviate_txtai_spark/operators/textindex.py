"""Persisted inverted text index: build once, answer BM25 queries from
the index with NO corpus scan.

`bm25_scores` (operators/bm25.py) recomputes tokenization, document
frequencies, and corpus stats on every call — right for one-off
analytics, wrong for a serving corpus queried thousands of times. This
is the text-side twin of the vector tier's index lifecycle
(`IVFIndex.save/load`, reference save/load contract
`/root/reference/weaviate_txtai/ann/weaviate.py:208-224`): the
expensive pass happens once at build; every query reads only its own
terms' postings.

Layout under ``path``:

- ``postings/``  (term, doc_id, tf, doc_len) parquet, PARTITIONED BY
  ``bucket = crc32(term) % n_buckets`` — dir-per-term would explode the
  namespace at web vocabularies, so terms hash into a fixed bucket
  count and a query prunes to its own terms' buckets (real partition
  pruning, visible as PartitionFilters in the scan) plus a row-group
  ``term IN (...)`` pushed filter inside each bucket.
- ``dictionary/`` (term, df) parquet — document frequencies are
  precomputed at build; a query broadcast-joins its ≤|query| rows.
- ``stats/`` (n_docs, avgdl) 1-row parquet.

Query cost is O(postings of the query's terms) — independent of corpus
size for selective terms. Scores are bit-identical to ``bm25_scores``
on the same corpus (same Lucene-idf formula, same rounding), pinned by
test and by the gate oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from weaviate_txtai_spark.functions.text import token_count, tokens

_N_BUCKETS = 64


def _bucket(term_col):
    return F.crc32(term_col.cast("binary")) % _N_BUCKETS


def build_text_index(
    docs: DataFrame,
    path: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """One pass over the corpus: write postings (bucket-partitioned),
    per-term document frequencies, and corpus stats."""
    tf = (
        # NULL ids excluded: one pseudo-doc would otherwise absorb every
        # unkeyed document's terms into the persisted postings
        docs.filter(F.col(id_col).isNotNull())
        .select(
            F.col(id_col).alias("doc_id"),
            token_count(text_col).alias("doc_len"),
            F.explode(tokens(text_col)).alias("term"),
        )
        .groupBy("doc_id", "doc_len", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    (
        tf.withColumn("bucket", _bucket(F.col("term")))
        .repartition("bucket")
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(os.path.join(path, "postings"))
    )
    # df from the just-written postings: one distinct-free aggregate
    # (tf rows are already (doc, term)-unique)
    post = docs.sparkSession.read.parquet(os.path.join(path, "postings"))
    post.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("df")
    ).write.mode("overwrite").parquet(os.path.join(path, "dictionary"))
    docs.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.avg(token_count(text_col)).alias("avgdl"),
    ).write.mode("overwrite").parquet(os.path.join(path, "stats"))


def bm25_from_index(
    spark: SparkSession,
    path: str,
    query_terms: list[str],
    *,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 scores for ``query_terms`` answered FROM the index: the
    postings scan prunes to the query terms' hash buckets
    (PartitionFilters) and pushes ``term IN (...)`` into the row
    groups; dictionary and stats are broadcast. Returns
    (doc_id, score), score rounded to 6dp — bit-identical to
    ``bm25_scores`` on the same corpus."""
    if not query_terms:
        raise ValueError("empty query")
    buckets = sorted(
        {__import__("zlib").crc32(t.encode()) % _N_BUCKETS for t in query_terms}
    )
    post = (
        spark.read.parquet(os.path.join(path, "postings"))
        .filter(F.col("bucket").isin(buckets))
        .filter(F.col("term").isin(query_terms))
    )
    dic = (
        spark.read.parquet(os.path.join(path, "dictionary"))
        .filter(F.col("term").isin(query_terms))
    )
    stats = spark.read.parquet(os.path.join(path, "stats"))
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    tf_norm = (F.col("tf") * (k1 + 1)) / (
        F.col("tf") + k1 * (1 - b + b * F.col("doc_len") / F.col("avgdl"))
    )
    return (
        post.join(F.broadcast(dic), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn("__s", idf * tf_norm)
        .groupBy("doc_id")
        .agg(F.round(F.sum("__s"), 6).alias("score"))
    )
