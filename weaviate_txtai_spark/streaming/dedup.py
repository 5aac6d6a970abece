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
