"""Sequential pattern mining: order sensitivity, window bound,
user-level support, self-pairs, the fan-out cap."""

import datetime as dt

from weaviate_txtai_spark.operators.seqmine import sequence_pairs


def _ev(spark, rows):
    base = dt.datetime(2024, 1, 1)
    data = [
        (u, t, base + dt.timedelta(seconds=s)) for u, t, s in rows
    ]
    return spark.createDataFrame(data, "user_id long, event_type string, ts timestamp")


def test_order_and_window(spark):
    ev = _ev(spark, [
        (1, "a", 0), (1, "b", 10),          # a->b inside window
        (2, "b", 0), (2, "a", 10),          # b->a only
        (3, "a", 0), (3, "b", 5000),        # outside 3600s? no: 5000 > 3600
    ])
    got = {
        (r["a"], r["b"]): r["support"]
        for r in sequence_pairs(ev, window_seconds=3600, min_support=1).collect()
    }
    assert got == {("a", "b"): 1, ("b", "a"): 1}


def test_user_level_support_not_event_level(spark):
    # user 1 produces a->b THREE times; support must still be 1
    ev = _ev(spark, [
        (1, "a", 0), (1, "b", 1), (1, "a", 2), (1, "b", 3), (1, "b", 4),
        (2, "a", 0), (2, "b", 1),
    ])
    out = {
        (r["a"], r["b"]): r
        for r in sequence_pairs(ev, window_seconds=60, min_support=1).collect()
    }
    assert out[("a", "b")]["support"] == 2
    # confidence: both users with 'a' produced the pattern
    assert out[("a", "b")]["confidence"] == 1.0


def test_self_pairs_and_lift(spark):
    ev = _ev(spark, [(1, "r", 0), (1, "r", 5), (2, "x", 0)])
    out = {
        (r["a"], r["b"]): r
        for r in sequence_pairs(ev, window_seconds=60, min_support=1).collect()
    }
    r = out[("r", "r")]
    # support_r = 1 of 2 users; lift = (1/1) / (1/2) = 2
    assert r["support"] == 1 and r["lift"] == 2.0


def test_max_user_events_cap_drops_bots(spark):
    rows = [(1, "a", i) for i in range(50)] + [
        (1, "b", 51), (2, "a", 0), (2, "b", 1)
    ]
    ev = _ev(spark, rows)
    out = sequence_pairs(
        ev, window_seconds=3600, min_support=1, max_user_events=10
    ).collect()
    # user 1 (51 events) dropped entirely; only user 2's pattern remains
    got = {(r["a"], r["b"]): r["support"] for r in out}
    assert got == {("a", "b"): 1}


def test_min_support_filters(spark):
    ev = _ev(spark, [(1, "a", 0), (1, "b", 1), (2, "c", 0), (2, "d", 1)])
    out = sequence_pairs(ev, window_seconds=60, min_support=2).collect()
    assert out == []
