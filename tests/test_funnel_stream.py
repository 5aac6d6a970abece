"""Streaming windowed funnel == batch chain enumeration on the
watermark-sealed anchors (streaming/funnel.py)."""

import datetime as dt

import pytest

from pyspark.sql import functions as F

from weaviate_txtai_spark.sources.tables import load_table
from weaviate_txtai_spark.streaming.events import stream_events
from weaviate_txtai_spark.streaming.funnel import funnel_stream

STEPS = ["signup", "view", "click"]
W_US = 86400 * 1_000_000


def _run(out, name):
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def _batch_levels(events, wm):
    """Greedy per-anchor levels on the sealed anchors — plain python
    reference (per user: sorted step timestamps; greedy chain)."""
    by_user: dict = {}
    for r in events:
        if r["event_type"] in STEPS:
            by_user.setdefault(r["user_id"], set()).add(
                (STEPS.index(r["event_type"]), int(r["us"]))
            )
    out = set()
    wm_us = int(wm.timestamp() * 1_000_000)
    import bisect

    for u, evs in by_user.items():
        by_step = [sorted(t for s, t in evs if s == k) for k in range(3)]
        for a in by_step[0]:
            if a + W_US < wm_us:
                level, lo = 1, a
                for s in (1, 2):
                    i = bisect.bisect_right(by_step[s], lo)
                    if i < len(by_step[s]) and by_step[s][i] <= a + W_US:
                        lo = by_step[s][i]
                        level += 1
                    else:
                        break
                out.add((u, a, level))
    return out


def test_stream_funnel_matches_batch_enumeration(spark, sf_dir):
    out = funnel_stream(
        stream_events(spark, sf_dir), STEPS,
        window_seconds=86400, watermark="1 hour",
    )
    _run(out, "funnel_stream_t")
    streamed = {
        (r.user_id, r.anchor_us, r.level)
        for r in spark.table("funnel_stream_t").collect()
    }
    assert streamed, "stream emitted nothing"

    events = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_micros("ts").alias("us"), "ts"
    )
    max_ts = events.agg(F.max("ts")).collect()[0][0]
    # ms-floored watermark, matching getCurrentWatermarkMs
    wm = max_ts.replace(microsecond=max_ts.microsecond // 1000 * 1000) \
        - dt.timedelta(hours=1)
    batch = _batch_levels(events.collect(), wm)
    assert streamed == batch


def test_funnel_stream_validation(spark):
    import os

    df = spark.readStream.format("rate").load()
    with pytest.raises(ValueError, match="steps"):
        funnel_stream(df, ["only_one"])
