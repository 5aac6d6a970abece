"""Hostile-input hardening for streaming/ (VERDICT r10 task 3).

RECORDED CLEAN PASS: the probes below feed the streaming surfaces rows
the fixtures never carry — NULL event-time, NULL user ids, a batch
whose docs are all near-dups of each other — and assert the behaviors
are already correct (exactly-once, no silent state corruption, batch
equivalence). No code change was needed; the file pins the contracts
so a regression becomes loud.
"""

import pytest

from pyspark.sql import functions as F


def _write_events(spark, tmp_path, rows):
    d = tmp_path / "sf"
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts string, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    df.coalesce(1).write.mode("overwrite").parquet(
        str(d / "events.parquet")
    )
    return str(d)


def test_hourly_agg_null_ts_rows_dropped_like_batch(spark, tmp_path):
    """NULL event time cannot form a window: the streaming agg drops the
    row, which must match the batch groupBy-window result (batch
    equivalence is the streaming contract)."""
    from weaviate_txtai_spark.streaming.events import (
        run_hourly_available_now,
    )

    sf = _write_events(
        spark,
        tmp_path,
        [
            (1, 10, "click", "2024-01-01 00:05:00", 1.0),
            (2, 11, "click", None, 99.0),
            (3, 12, "click", "2024-01-01 00:45:00", 2.0),
        ],
    )
    out = run_hourly_available_now(
        spark, sf, table_name="hardening_hourly"
    ).collect()
    assert len(out) == 1
    assert out[0].n_events == 2 and out[0].sum_value == 3.0


def test_stream_dedup_null_keys_collapse_like_batch_distinct(spark, tmp_path):
    """dropDuplicates treats NULL keys as equal — so must the batch
    SELECT DISTINCT oracle; both sides agree and no NULL row is
    silently multiplied."""
    from weaviate_txtai_spark.streaming.dedup import stream_distinct_pairs

    sf = _write_events(
        spark,
        tmp_path,
        [
            (1, None, "click", "2024-01-01 00:00:00", 1.0),
            (2, None, "click", "2024-01-01 01:00:00", 1.0),
            (3, 5, "click", "2024-01-01 02:00:00", 1.0),
        ],
    )
    out = stream_distinct_pairs(
        spark, sf, table_name="hardening_dedup"
    ).collect()
    got = sorted(((r.user_id, r.event_type) for r in out),
                 key=lambda t: (t[0] is None, t[0] or 0))
    assert got == [(5, "click"), (None, "click")]


def test_interval_join_empty_error_side_is_empty_not_crash(spark, tmp_path):
    from weaviate_txtai_spark.streaming.joins import run_error_follow_join

    sf = _write_events(
        spark,
        tmp_path,
        [
            (1, 10, "click", "2024-01-01 00:00:00", 1.0),
            (2, 10, "view", "2024-01-01 00:01:00", 1.0),
        ],
    )
    out = run_error_follow_join(
        spark, sf, table_name="hardening_ij"
    )
    assert out.count() == 0


def test_near_dedup_batch_of_identical_docs_keeps_one(spark, tmp_path):
    """A batch whose docs are ALL near-dups of each other must keep
    exactly the lowest id — the one-shot in-batch rule — and a second
    identical batch must keep NOTHING (everything near-dups the stored
    survivor)."""
    from weaviate_txtai_spark.streaming.dedup import stream_near_dedup

    text = "the quick brown fox jumps over the lazy dog " * 6
    src = tmp_path / "in"
    store = str(tmp_path / "store")
    out_dir = str(tmp_path / "out")
    ck = str(tmp_path / "ck")

    b1 = spark.createDataFrame(
        [(i, text) for i in range(1, 4)], "doc_id long, text string"
    )
    b1.write.mode("overwrite").parquet(str(src / "b1"))
    stream = spark.readStream.schema("doc_id long, text string").parquet(
        str(src / "*")
    )
    q = stream_near_dedup(
        stream, store_dir=store, out_dir=out_dir, checkpoint_dir=ck
    )
    q.awaitTermination()
    survivors = spark.read.parquet(out_dir)
    assert [r.doc_id for r in survivors.collect()] == [1]

    b2 = spark.createDataFrame(
        [(10 + i, text) for i in range(3)], "doc_id long, text string"
    )
    b2.write.mode("overwrite").parquet(str(src / "b2"))
    q2 = stream_near_dedup(
        stream, store_dir=store, out_dir=out_dir, checkpoint_dir=ck
    )
    q2.awaitTermination()
    survivors2 = spark.read.parquet(out_dir)
    assert [r.doc_id for r in survivors2.collect()] == [1]
