"""Stream-stream interval (range) join — Structured Streaming extension.

The reference has no streaming and no joins (SURVEY §2.4); this is the
streaming twin of ``operators.asof.range_join``: for every error event,
the same user's events in the following ``window_seconds``, computed as a
watermarked stream-stream self-join.

Scale design: Spark's stream-stream join keys state by the equality
column (user_id) and evicts rows once they age past the watermark plus
the join's time range — so state is bounded by (input rate × window),
not by history. The range predicate on both event-time columns is what
lets the state store GC both sides; without it the join would buffer
forever. This is the standard interval-join recipe (same semantics as
Flink's interval join), expressed with public Structured Streaming APIs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def interval_join_stream(
    errors: DataFrame,
    follow: DataFrame,
    *,
    window_seconds: int = 600,
    watermark: str = "1 hour",
) -> DataFrame:
    """Joined (error, follower) pairs: same user, follower strictly after
    the error and within ``window_seconds``. Both inputs are streaming
    DataFrames with event-time columns ``ts`` (errors) / ``r_ts``
    (follow)."""
    e = errors.withWatermark("ts", watermark)
    f = follow.withWatermark("r_ts", watermark)
    cond = (
        (e["user_id"] == f["r_user_id"])
        & (f["r_ts"] > e["ts"])
        & (f["r_ts"] <= e["ts"] + F.expr(f"INTERVAL {window_seconds} SECONDS"))
    )
    return e.join(f, cond, "inner")


def run_error_follow_join(
    spark: SparkSession,
    sf_dir: str,
    *,
    window_seconds: int = 600,
    table_name: str = "interval_join_stream",
) -> DataFrame:
    """Drain the self-joined events stream with availableNow and return
    the joined pairs as a batch DataFrame (streaming correctness = batch
    equivalence; the aggregation over pairs happens batch-side)."""
    from weaviate_txtai_spark.streaming.events import stream_events

    ev1 = stream_events(spark, sf_dir)
    ev2 = stream_events(spark, sf_dir)
    errors = ev1.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    follow = ev2.select(
        F.col("user_id").alias("r_user_id"),
        F.col("ts").alias("r_ts"),
        F.col("event_id").alias("r_event_id"),
        F.col("value").alias("r_value"),
    )
    joined = interval_join_stream(
        errors, follow, window_seconds=window_seconds
    )
    q = (
        joined.writeStream.format("memory")
        .queryName(table_name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(table_name)


def run_segment_rollup(
    spark: SparkSession,
    sf_dir: str,
    *,
    table_name: str = "segment_rollup_stream",
) -> DataFrame:
    """Stream-STATIC enrichment: the events stream joined to the static
    customer dimension (user_id = c_custkey), rolled up to (market
    segment, event type). The static side broadcasts — a stream-static
    join adds NO state store (the dim is re-resolvable per micro-batch)
    and no watermark requirement, the standard shape for enriching an
    event stream with slowly-changing reference data. availableNow over
    the fixed file equals the batch join (gate: `streaming_enrich`)."""
    import os

    from weaviate_txtai_spark.streaming.events import stream_events

    ev = stream_events(spark, sf_dir)
    cust = spark.read.parquet(os.path.join(sf_dir, "customer.parquet")).select(
        F.col("c_custkey"), F.col("c_mktsegment")
    )
    rolled = (
        # the equijoin already drops NULL user ids; exclude NULL rollup
        # keys too — a NULL segment/type would aggregate as a pseudo-group
        ev.filter(F.col("event_type").isNotNull())
        .join(
            F.broadcast(cust.filter(F.col("c_mktsegment").isNotNull())),
            ev["user_id"] == cust["c_custkey"],
        )
        .groupBy("c_mktsegment", "event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
    )
    q = (
        rolled.writeStream.format("memory")
        .queryName(table_name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(table_name)
