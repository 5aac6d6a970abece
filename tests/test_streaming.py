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
