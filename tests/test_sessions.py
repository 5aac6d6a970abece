"""Stateful streaming sessionization: streaming result == batch spec for
all sessions the watermark has closed."""

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
