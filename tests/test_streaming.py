"""Streaming correctness = batch equivalence (availableNow over the static
events table must reproduce the batch groupBy exactly)."""

from weaviate_txtai_spark.plans.queries import events_hourly_q
from weaviate_txtai_spark.streaming.events import run_hourly_available_now


def test_streaming_hourly_equals_batch(spark, sf_dir):
    stream_rows = {
        (r["y"], r["m"], r["d"], r["h"], r["event_type"]): (
            r["n_events"],
            r["sum_value"],
        )
        for r in run_hourly_available_now(spark, sf_dir).collect()
    }
    batch_rows = {
        (r["y"], r["m"], r["d"], r["h"], r["event_type"]): (
            r["n_events"],
            r["sum_value"],
        )
        for r in events_hourly_q(spark, sf_dir).collect()
    }
    assert stream_rows == batch_rows


def test_streaming_interval_join_equals_batch_range_join(spark, sf_dir):
    """The watermarked stream-stream self-join must produce exactly the
    pairs of the batch epoch-bucketed range_join (inner form)."""
    from pyspark.sql import functions as F

    from weaviate_txtai_spark.operators.asof import range_join
    from weaviate_txtai_spark.sources.tables import load_table
    from weaviate_txtai_spark.streaming.joins import run_error_follow_join

    stream_pairs = {
        (r["event_id"], r["r_event_id"])
        for r in run_error_follow_join(
            spark, sf_dir, table_name="interval_join_test"
        ).collect()
    }

    ev = load_table(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    follow = ev.select(
        "user_id",
        F.col("ts").alias("r_ts"),
        F.col("event_id").alias("r_event_id"),
        F.col("value").alias("r_value"),
    )
    batch_pairs = {
        (r["event_id"], r["r_event_id"])
        for r in range_join(
            errors,
            follow,
            window_seconds=600,
            on=["user_id"],
            left_ts="ts",
            right_ts="r_ts",
        ).collect()
    }
    assert stream_pairs == batch_pairs
    assert stream_pairs  # non-degenerate: the window does catch followers


def test_streaming_dedup_equals_batch_distinct(spark, sf_dir):
    """dropDuplicates over the stream (availableNow) emits exactly the
    batch DISTINCT (user_id, event_type) set."""
    from weaviate_txtai_spark.sources.tables import load_table
    from weaviate_txtai_spark.streaming.dedup import stream_distinct_pairs

    stream_pairs = {
        (r["user_id"], r["event_type"])
        for r in stream_distinct_pairs(
            spark, sf_dir, table_name="dedup_stream_test"
        ).collect()
    }
    batch_pairs = {
        (r["user_id"], r["event_type"])
        for r in load_table(spark, sf_dir, "events")
        .select("user_id", "event_type")
        .distinct()
        .collect()
    }
    assert stream_pairs == batch_pairs
    assert len(stream_pairs) > len({p[1] for p in stream_pairs})


def test_watermarked_dedup_covers_batch_distinct(spark, sf_dir):
    """dropDuplicatesWithinWatermark trades exactness for bounded state:
    it may re-emit a key whose duplicates arrive further apart than the
    delay, but must (a) cover every true distinct pair and (b) never
    invent pairs."""
    from weaviate_txtai_spark.sources.tables import load_table
    from weaviate_txtai_spark.streaming.dedup import (
        stream_distinct_pairs_watermarked,
    )

    emitted = [
        (r["user_id"], r["event_type"])
        for r in stream_distinct_pairs_watermarked(
            spark, sf_dir, table_name="dedup_wm_test"
        ).collect()
    ]
    batch_pairs = {
        (r["user_id"], r["event_type"])
        for r in load_table(spark, sf_dir, "events")
        .select("user_id", "event_type")
        .distinct()
        .collect()
    }
    assert set(emitted) == batch_pairs  # coverage + no invented pairs


def test_streaming_parquet_sink_partitioned_and_exactly_once(
    spark, sf_dir, tmp_path
):
    from weaviate_txtai_spark.sources.tables import load_table
    from weaviate_txtai_spark.streaming.events import stream_events_to_parquet

    out = str(tmp_path / "events_out")
    cp = str(tmp_path / "events_cp")
    back = stream_events_to_parquet(spark, sf_dir, out, cp)
    n_batch = load_table(spark, sf_dir, "events").count()
    assert back.count() == n_batch
    # partitioned layout on disk: event_date=... directories exist
    import os

    parts = [d for d in os.listdir(out) if d.startswith("event_date=")]
    assert len(parts) >= 1
    # re-running over the same checkpoint adds nothing (exactly-once)
    again = stream_events_to_parquet(spark, sf_dir, out, cp)
    assert again.count() == n_batch
    # date predicate prunes directories (PartitionFilters on the scan)
    from weaviate_txtai_spark.plans.explain import physical_plan
    from pyspark.sql import functions as F

    some_date = back.select("event_date").head()[0]
    scan = spark.read.parquet(out).filter(F.col("event_date") == F.lit(some_date))
    assert "PartitionFilters" in physical_plan(scan)


def test_stream_near_dedup_two_batches(spark, tmp_path):
    """Two deterministic micro-batches (maxFilesPerTrigger=1, distinct
    mtimes): in-batch near-dups drop by the lower-id rule, cross-batch
    near-dups drop against the signature store, unrelated docs survive,
    and the store never re-reads prior batch text."""
    import os
    import time

    from weaviate_txtai_spark.streaming.dedup import stream_near_dedup

    base = "spark shuffle partition codegen catalyst tungsten arrow " * 4
    other = "completely different words about cooking pasta tonight " * 4
    third = "yet another unrelated passage regarding alpine hiking trails " * 4
    b1 = [
        (1, base),            # survives (lowest id of its group)
        (2, base + "extra"),  # near-dup of 1 in SAME batch -> drops
        (3, other),           # survives
    ]
    b2 = [
        (10, base + "tail"),  # near-dup of stored 1 -> drops
        (11, third),          # survives
        (12, third + "x"),    # near-dup of 11 in same batch -> drops
    ]
    src = tmp_path / "src"
    src.mkdir()
    spark.createDataFrame(b1, "doc_id long, text string").coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(src / "f1"))
    spark.createDataFrame(b2, "doc_id long, text string").coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(src / "f2"))
    # file source orders by modification time: force f1 strictly older
    now = time.time()
    for root, age in ((src / "f1", 200), (src / "f2", 100)):
        for dirpath, _, files in os.walk(root):
            for fn in files:
                os.utime(os.path.join(dirpath, fn), (now - age, now - age))
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )
    # session is shared across the suite: measure cache GROWTH, not
    # absolute emptiness (other tests' operator caches may linger)
    cached_before = len(spark.sparkContext._jsc.sc().getRDDStorageInfo())
    q = stream_near_dedup(
        stream,
        store_dir=str(tmp_path / "store"),
        out_dir=str(tmp_path / "out"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        threshold=0.5,
    )
    q.awaitTermination()
    kept = sorted(
        r["doc_id"]
        for r in spark.read.parquet(str(tmp_path / "out")).collect()
    )
    assert kept == [1, 3, 11]
    # store holds signatures for exactly the survivors
    store = spark.read.parquet(str(tmp_path / "store"))
    assert sorted(r["__id"] for r in store.select("__id").collect()) == [1, 3, 11]
    # the per-batch cache_scope released every operator-internal persist:
    # a continuous stream must not accumulate signature caches
    cached_after = len(spark.sparkContext._jsc.sc().getRDDStorageInfo())
    assert cached_after <= cached_before
