"""Streaming EWMA+CUSUM monitor == batch ewma()+cusum() composition on
the watermark-sealed prefix (streaming/monitor.py)."""

import datetime as dt

from pyspark.sql import functions as F

from weaviate_txtai_spark.operators.changepoint import cusum, ewma
from weaviate_txtai_spark.sources.tables import load_table
from weaviate_txtai_spark.streaming.events import stream_events
from weaviate_txtai_spark.streaming.monitor import monitor_stream


def _run(out, name):
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_stream_monitor_matches_batch_composition(spark, sf_dir):
    alpha, target, drift, h = 0.3, 100.0, 2.0, 50.0
    stream = stream_events(spark, sf_dir).select(
        F.col("event_type").alias("key"), "ts", F.col("value").alias("x")
    )
    out = monitor_stream(
        stream, alpha=alpha, target=target, drift=drift, threshold=h,
        watermark="1 hour",
    )
    _run(out, "monitor_stream_t")
    streamed = {
        (r.key, r.ts, r.x, r.ewma, r.s_pos, r.s_neg, r.alarm)
        for r in spark.table("monitor_stream_t").collect()
    }
    assert streamed, "stream emitted nothing"

    # batch twin on the sealed prefix (final watermark = max_ts - 1h;
    # the stream only emits rows with ts < watermark)
    events = load_table(spark, sf_dir, "events").select(
        F.col("event_type").alias("key"), "ts", F.col("value").alias("x")
    )
    max_ts = events.agg(F.max("ts")).collect()[0][0]
    wm = max_ts - dt.timedelta(hours=1)
    sealed = events.filter(F.col("ts") < wm)
    ew = ewma(sealed, "key", "ts", "x", alpha=alpha)
    cs = cusum(sealed, "key", "ts", "x", target=target, drift=drift,
               threshold=h)
    batch = {
        (r.key, r.ts, r.x, r.ewma, c.s_pos, c.s_neg, c.alarm)
        for r, c in zip(
            sorted(ew.collect(), key=lambda r: (r.key, r.ts)),
            sorted(cs.collect(), key=lambda r: (r.key, r.ts)),
        )
    }
    assert streamed == batch


def test_stream_monitor_orders_within_watermark(spark):
    # rows arrive out of order inside one batch; sealing must sort by ts
    rows = [
        ("k", dt.datetime(2024, 1, 1, 0, 0, 2), 30.0),
        ("k", dt.datetime(2024, 1, 1, 0, 0, 0), 10.0),
        ("k", dt.datetime(2024, 1, 1, 0, 0, 1), 20.0),
        # a far-future row pushes the watermark past the first three
        ("k", dt.datetime(2024, 1, 2), 0.0),
    ]
    df = spark.createDataFrame(rows, "key string, ts timestamp, x double")
    import tempfile

    src = tempfile.mkdtemp(prefix="monitor_src_")
    df.coalesce(1).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(df.schema).parquet(src)
    out = monitor_stream(stream, alpha=0.5, target=0.0, watermark="1 hour")
    _run(out, "monitor_order_t")
    got = sorted(
        (r.ts, r.x, r.ewma)
        for r in spark.table("monitor_order_t").collect()
    )
    # sealed = the three in-order rows; ewma folds 10 -> 15 -> 22.5
    assert [g[1] for g in got] == [10.0, 20.0, 30.0]
    assert [g[2] for g in got] == [10.0, 15.0, 22.5]
