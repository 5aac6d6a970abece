"""Streaming exact deduplication (M4 extension; reference has none).

``dropDuplicates`` on a stream keeps per-key state in the state store and
emits each key's FIRST arrival — with ``availableNow`` over a static
source the emitted set equals the batch ``SELECT DISTINCT``, which is the
oracle gate (streaming correctness = batch equivalence).

Scale notes: exact streaming dedup state grows with the number of
distinct keys — that is the honest cost of exactness (the batch analogue
is a distinct shuffle). For unbounded streams, production uses
``dropDuplicatesWithinWatermark`` so state ages out after the watermark;
that trades exactness for bounded state and is NOT gate-equal to batch
distinct when duplicates arrive further apart than the watermark, so the
gate pins the exact variant and tests pin the watermarked one's
semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from weaviate_txtai_spark.streaming.events import stream_events


def stream_distinct_pairs(
    spark: SparkSession, sf_dir: str, *, table_name: str = "dedup_stream"
) -> DataFrame:
    """Stream events and emit the distinct (user_id, event_type) pairs."""
    pairs = stream_events(spark, sf_dir).select("user_id", "event_type")
    q = (
        pairs.dropDuplicates(["user_id", "event_type"])
        .writeStream.format("memory")
        .queryName(table_name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(table_name)


def stream_distinct_pairs_watermarked(
    spark: SparkSession,
    sf_dir: str,
    *,
    delay: str = "1 hour",
    table_name: str = "dedup_stream_wm",
) -> DataFrame:
    """Bounded-state variant: ``dropDuplicatesWithinWatermark`` evicts a
    key's state once the watermark passes ``delay`` beyond its event
    time, so duplicates arriving further apart than the delay are
    re-emitted — the deliberate exactness-for-bounded-state trade.
    Guarantees (pinned in tests): every batch-distinct pair appears at
    least once; no pair that doesn't exist in the batch is invented."""
    ev = stream_events(spark, sf_dir).select("ts", "user_id", "event_type")
    q = (
        ev.withWatermark("ts", delay)
        .dropDuplicatesWithinWatermark(["user_id", "event_type"])
        .select("user_id", "event_type")
        .writeStream.format("memory")
        .queryName(table_name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(table_name)


def stream_near_dedup(
    doc_stream: DataFrame,
    *,
    store_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.8,
    n: int = 3,
    num_perms: int = 64,
    bands: int = 16,
):
    """Streaming NEAR-duplicate dedup: each micro-batch is deduped
    against everything that has already survived, using the stored
    MinHash signatures — the continuous-ingest version of
    ``minhash_lsh_pairs_incremental`` (the reference has no analogue;
    this is the production crawl-ingest shape).

    Per micro-batch (foreachBatch, sequential by contract):
    1. batch-INTERNAL near-dup pairs (``minhash_lsh_pairs``) → drop
       every doc with a lower-id near-dup in its own batch (the same
       one-shot rule as ``semantic_dedup_survivors``);
    2. remaining docs × SIGNATURE STORE (``…_incremental`` with
       ``corpus_signatures``) → drop any doc near-dupping a PRIOR
       SURVIVOR. The corpus text is never re-read — recurring cost is
       O(batch) signatures + a bipartite bucket join;
    3. survivors append to ``out_dir``; their signatures append to
       ``store_dir`` — both written into a ``batch=<id>/`` subdirectory
       with overwrite, so a replayed micro-batch rewrites the same
       content into the same directory (idempotent, no commit-marker
       protocol needed). A replay may see ITS OWN batch=<id> store
       directory from before the crash: that is harmless because the
       incremental join excludes same-id pairs, and stage 1 already
       guaranteed the batch's survivors are mutually below-threshold —
       so self-comparison drops nothing and the rewrite is identical.

    State grows with the number of distinct survivors — the honest cost
    of exact-history dedup (same argument as exact streaming distinct
    above); production bounds it by date-partitioning the store and
    aging out old partitions.

    Input contract (ADVICE r3): ``id_col`` must be GLOBALLY unique
    across the whole stream, not just within a batch. The replay-safety
    argument above leans on the incremental join's same-id exclusion —
    which equally means two genuinely different documents sharing an id
    across batches are never compared, so a reused id silently skips
    dedup for that pair. Crawl pipelines should use a content- or
    URL-derived id (e.g. uuid5), never a per-batch counter. NULL-id
    docs are excluded from the survivor output (they never receive
    signatures, so the final left_semi drops them) — the same contract
    as batch ``dedup_survivors`` (r13 join census).

    Returns the StreamingQuery (caller awaits termination).
    """
    import os

    from weaviate_txtai_spark.operators.dedup import (
        minhash_lsh_pairs,
        minhash_lsh_pairs_incremental,
        minhash_signatures_with_sets,
    )
    from weaviate_txtai_spark.cache import cache_scope, scoped_persist

    def _prior_batches(spark) -> list[str]:
        # Hadoop FS listing, not os.listdir: the store may live on
        # hdfs://-or-s3a://-shaped paths where a driver-local listdir
        # silently returns nothing and every batch would skip
        # cross-batch dedup without any error
        jvm = spark._jvm
        path = jvm.org.apache.hadoop.fs.Path(store_dir)
        fs = path.getFileSystem(
            spark._jsc.hadoopConfiguration()  # type: ignore[union-attr]
        )
        if not fs.exists(path):
            return []
        return [
            st.getPath().toString()
            for st in fs.listStatus(path)
            if st.isDirectory() and st.getPath().getName().startswith("batch=")
        ]

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        # cache_scope releases every operator-internal persist when the
        # micro-batch completes — a continuous stream would otherwise
        # accumulate per-batch signature caches forever (the handler
        # runs in one thread, so the thread-local scope covers the
        # operator calls below)
        with cache_scope():
            # signatures computed ONCE per batch: they feed the
            # in-batch pairs, the store join, AND the store write —
            # tokenize+shingle+hash is the dominant map-side cost and
            # ran three times before this was hoisted
            sigs_all = scoped_persist(
                minhash_signatures_with_sets(
                    batch_df, text_col=text_col, id_col=id_col, n=n,
                    num_perms=num_perms,
                )
            )
            internal = minhash_lsh_pairs(
                batch_df, text_col=text_col, id_col=id_col, n=n,
                threshold=threshold, num_perms=num_perms, bands=bands,
                signatures=sigs_all,
            )
            drops = internal.select(F.col("d2").alias("__id")).distinct()
            stage1_sigs = scoped_persist(
                sigs_all.join(drops, "__id", "left_anti")
            )
            prior = _prior_batches(spark)
            if prior:
                store = spark.read.parquet(*prior)
                vs_store = minhash_lsh_pairs_incremental(
                    None, None, text_col=text_col, id_col=id_col, n=n,
                    threshold=threshold, num_perms=num_perms, bands=bands,
                    corpus_signatures=store, new_signatures=stage1_sigs,
                )
                drops2 = vs_store.select(F.col("new_id").alias("__id")).distinct()
                surv_sigs = scoped_persist(
                    stage1_sigs.join(drops2, "__id", "left_anti")
                )
            else:
                surv_sigs = stage1_sigs
            surv_ids = surv_sigs.select(F.col("__id").alias(id_col))
            batch_df.join(surv_ids, id_col, "left_semi").write.mode(
                "overwrite"
            ).parquet(os.path.join(out_dir, f"batch={batch_id}"))
            surv_sigs.write.mode("overwrite").parquet(
                os.path.join(store_dir, f"batch={batch_id}")
            )

    return (
        doc_stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
