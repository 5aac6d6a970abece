"""Structured Streaming extension (SURVEY §7 M4 — the reference has no
streaming at all; the `events` table is the designated surface).

Two pieces:
- ``stream_events``: file-source stream over the events parquet with the
  same nanos→micros normalization as the batch loader.
- ``hourly_aggregate``: watermarked tumbling-window aggregation whose
  availableNow result must equal the batch ``events_hourly`` query —
  asserted in tests (streaming correctness = batch equivalence).

Scale notes: watermark bounds state; the window agg is a streaming
hash-agg partial → state-store merge, exactly the batch shuffle shape.
A production ingest would be readStream(kafka) → this plan →
writeStream.partitionBy(date).parquet with checkpointing.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

def stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over events.parquet, ts normalized to TIMESTAMP.

    File streams require an explicit schema, but the driver testdata has
    shipped ``ts`` as TIMESTAMP(NANOS) (only readable as long via
    nanosAsLong), naive micros (TIMESTAMP_NTZ), and tz-aware micros across
    rounds — so probe the physical schema with a (footer-only) batch read
    and adapt, exactly like the batch loader in sources/tables.py.
    """
    from weaviate_txtai_spark.sources.tables import normalize_ts

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    physical = spark.read.parquet(os.path.join(sf_dir, "events.parquet")).schema
    # file streams require a directory basePath; the glob keeps the match
    # to events.parquet while making basePath = sf_dir
    raw = spark.readStream.schema(physical).parquet(
        os.path.join(sf_dir, "events.parque*")
    )
    return normalize_ts(raw)


def hourly_aggregate(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Tumbling 1-hour window per event_type: count + sum(value).

    Late data beyond the watermark is dropped; with availableNow over a
    static file the result is exact and equals the batch groupBy."""
    return (
        # NULL keys excluded (the r11 streaming NULL-slot rule): a NULL
        # event_type would roll up as a pseudo-type, and a NULL ts has
        # no window (watermarking drops it anyway on real streams —
        # filter explicitly so batch equivalence shares the contract)
        events.filter(
            F.col("ts").isNotNull() & F.col("event_type").isNotNull()
        )
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.year("win.start").alias("y"),
            F.month("win.start").alias("m"),
            F.dayofmonth("win.start").alias("d"),
            F.hour("win.start").alias("h"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def run_hourly_available_now(
    spark: SparkSession, sf_dir: str, *, table_name: str = "hourly_stream"
) -> DataFrame:
    """Run the streaming hourly agg to completion (availableNow) into an
    in-memory sink and return the result as a DataFrame."""
    agg = hourly_aggregate(stream_events(spark, sf_dir))
    q = (
        agg.writeStream.format("memory")
        .queryName(table_name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(table_name)


def stream_events_to_parquet(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    checkpoint: str,
) -> DataFrame:
    """Production-shaped streaming file sink: events stream → parquet
    partitioned by event date, exactly-once via the file-sink commit log
    + checkpoint. A loader prunes directories by date predicate, same
    mechanism as sources.tables.write_partitioned. Returns the result
    of reading back the committed output."""
    ev = stream_events(spark, sf_dir).withColumn(
        "event_date", F.to_date("ts")
    )
    q = (
        ev.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint)
        .partitionBy("event_date")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(out_dir)
