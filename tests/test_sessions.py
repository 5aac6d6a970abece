"""Stateful streaming sessionization: streaming result == batch spec for
all sessions the watermark has closed."""

import datetime as dt

from pyspark.sql import functions as F

from weaviate_txtai_spark.sources.tables import load_table
from weaviate_txtai_spark.streaming.events import stream_events
from weaviate_txtai_spark.streaming.sessions import (
    sessionize_batch,
    sessionize_stream,
)


def test_streaming_sessions_match_batch_spec(spark, sf_dir):
    gap = 1800
    out = sessionize_stream(stream_events(spark, sf_dir), gap_seconds=gap,
                            watermark="1 hour")
    q = (
        out.writeStream.format("memory")
        .queryName("sessions_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    streamed = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in spark.table("sessions_stream").collect()
    }

    events = load_table(spark, sf_dir, "events")
    batch_df = sessionize_batch(events, gap_seconds=gap)
    max_ts = events.agg(F.max("ts")).collect()[0][0]
    batch_all = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in batch_df.collect()
    }

    # every streamed (closed) session must be a real session per the spec
    assert streamed, "stream emitted no sessions"
    assert streamed <= batch_all
    # and every session the final watermark could close must be emitted:
    # watermark_final = max_ts - 1 hour; a session closes when
    # last_event + gap < watermark
    import datetime as dt

    wm = max_ts - dt.timedelta(hours=1)
    closable = {
        s for s in batch_all
        if s[2] + dt.timedelta(seconds=gap) < wm
    }
    assert closable <= streamed


def test_streaming_sessions_merge_late_events(spark, tmp_path):
    """Out-of-order events ACROSS micro-batches (review finding r2):
    a late event within the gap extends session_start backward; one
    older than start - gap forms its own session — matching the batch
    spec instead of being folded into the newer session."""
    import os

    src = str(tmp_path / "src")
    os.makedirs(src)
    schema = "event_id long, ts timestamp, user_id long"
    # batch 1: event at 10:00. batch 2 (late): 09:45 (merges, start moves
    # back) and 07:00 (own session, > gap before start)
    spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1, 10, 0, 0), 1)], schema
    ).coalesce(1).write.parquet(src + "/b1")
    spark.createDataFrame(
        [
            (2, dt.datetime(2024, 1, 1, 9, 45, 0), 1),
            (3, dt.datetime(2024, 1, 1, 7, 0, 0), 1),
            # a far-future event closes everything via the watermark
            (4, dt.datetime(2024, 1, 2, 12, 0, 0), 1),
        ],
        schema,
    ).coalesce(1).write.parquet(src + "/b2")

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )
    out = sessionize_stream(stream, gap_seconds=1800, watermark="1 hour")
    q = (
        out.writeStream.format("memory")
        .queryName("late_sessions")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["session_start"].strftime("%H:%M"), r["session_end"].strftime("%H:%M"), r["n_events"])
        for r in spark.table("late_sessions").collect()
    }
    assert ("09:45", "10:00", 2) in got  # late event extended start back
    assert ("07:00", "07:00", 1) in got  # old event = its own session


def test_open_runs_accumulate_across_batches(spark, tmp_path):
    """Above-watermark disorder across micro-batches: two distant runs
    stay OPEN in state simultaneously (multi-run state, review r4) and
    each emits exactly once when the watermark seals it — never as
    split/overlapping fragments."""
    import os

    src = str(tmp_path / "src")
    os.makedirs(src)
    schema = "event_id long, ts timestamp, user_id long"
    # batch 1: two events 2h apart -> two separate runs, both open
    spark.createDataFrame(
        [
            (1, dt.datetime(2024, 1, 1, 10, 0, 0), 1),
            (2, dt.datetime(2024, 1, 1, 12, 0, 0), 1),
        ],
        schema,
    ).coalesce(1).write.parquet(src + "/b1")
    # batch 2: an event merging into the EARLIER run (above watermark:
    # wm after b1 = 11:00; 11:59... no — merge into the 12:00 run AND
    # extend the 10:00 run via 10:15, which is below wm=11:00 and may be
    # engine-filtered; so only assert the always-defined behavior)
    spark.createDataFrame(
        [(3, dt.datetime(2024, 1, 1, 12, 10, 0), 1)], schema
    ).coalesce(1).write.parquet(src + "/b2")
    # batch 3: far-future event seals everything
    spark.createDataFrame(
        [(4, dt.datetime(2024, 1, 2, 12, 0, 0), 1)], schema
    ).coalesce(1).write.parquet(src + "/b3")

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )
    out = sessionize_stream(stream, gap_seconds=1800, watermark="1 hour")
    q = (
        out.writeStream.format("memory")
        .queryName("multi_runs")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(
        (r["session_start"].strftime("%H:%M"),
         r["session_end"].strftime("%H:%M"), r["n_events"])
        for r in spark.table("multi_runs").collect()
        if r["session_start"].day == 1
    )
    # both day-1 runs emitted exactly once, the later one merged with
    # its batch-2 extension
    assert got == [("10:00", "10:00", 1), ("12:00", "12:10", 2)]
