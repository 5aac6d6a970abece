"""operators/changepoint.ewma, sharding.rendezvous_assign."""

import hashlib
import random

import pytest

from weaviate_txtai_spark.operators.changepoint import ewma
from weaviate_txtai_spark.operators.sharding import (
    movement_on_reshard,
    rendezvous_assign,
)


# ------------------------------------------------------------------- ewma


def _py_ewma(xs, alpha):
    out = []
    for x in xs:
        out.append(x if not out else alpha * x + (1 - alpha) * out[-1])
    return out


def test_ewma_matches_recursion(spark):
    rng = random.Random(9)
    xs = [rng.uniform(0, 100) for _ in range(60)]
    rows = [("g", i, x) for i, x in enumerate(xs)]
    df = spark.createDataFrame(rows, ["g", "t", "x"]).repartition(5)
    got = {r.t: r.ewma for r in ewma(df, "g", "t", "x", alpha=0.3).collect()}
    for t, want in enumerate(_py_ewma(xs, 0.3)):
        assert got[t] == pytest.approx(round(want, 6), abs=2e-6), t


def test_ewma_alpha_one_is_identity(spark):
    rows = [("g", i, float(i * i)) for i in range(10)]
    df = spark.createDataFrame(rows, ["g", "t", "x"])
    got = ewma(df, "g", "t", "x", alpha=1.0).collect()
    assert all(r.ewma == r.x for r in got)


def test_ewma_groups_independent(spark):
    rows = [("a", 0, 10.0), ("a", 1, 20.0), ("b", 0, 100.0), ("b", 1, 0.0)]
    df = spark.createDataFrame(rows, ["g", "t", "x"])
    got = {(r.g, r.t): r.ewma for r in ewma(df, "g", "t", "x", alpha=0.5).collect()}
    assert got == {("a", 0): 10.0, ("a", 1): 15.0,
                   ("b", 0): 100.0, ("b", 1): 50.0}


def test_ewma_rejects_bad_alpha(spark):
    df = spark.createDataFrame([("g", 0, 1.0)], ["g", "t", "x"])
    with pytest.raises(ValueError):
        ewma(df, "g", "t", "x", alpha=0.0)


# ------------------------------------------------------------- rendezvous


def _py_rendezvous(key, shards):
    return max(
        shards,
        key=lambda s: (hashlib.md5(f"{key}:{s}".encode()).hexdigest(), s),
    )


def test_rendezvous_matches_reference(spark):
    shards = ["s0", "s1", "s2", "s3"]
    keys = list(range(200))
    df = spark.createDataFrame([(k,) for k in keys], ["k"])
    got = {
        r.k: r.shard
        for r in rendezvous_assign(df, "k", shards).collect()
    }
    assert got == {k: _py_rendezvous(k, shards) for k in keys}


def test_rendezvous_add_shard_moves_only_to_new(spark):
    before = ["s0", "s1", "s2", "s3"]
    after = before + ["s4"]
    df = spark.createDataFrame([(k,) for k in range(500)], ["k"])
    a = {r.k: r.shard for r in rendezvous_assign(df, "k", before).collect()}
    b = {r.k: r.shard for r in rendezvous_assign(df, "k", after).collect()}
    moved = [k for k in a if a[k] != b[k]]
    # minimal-movement guarantee: every moved key moves TO the new shard
    assert all(b[k] == "s4" for k in moved)
    # expected 1/5 of keys, generous tolerance
    assert 0.10 <= len(moved) / 500 <= 0.32


def test_movement_report(spark):
    df = spark.createDataFrame([(k,) for k in range(300)], ["k"])
    r = movement_on_reshard(
        df, "k", ["s0", "s1", "s2"], ["s0", "s1", "s2", "s3"]
    ).collect()[0]
    assert r.n_keys == 300
    assert r.moved_frac == round(r.moved / 300, 6)
    assert r.moved < 300 * 0.45  # nothing like mod-n's 2/3 reshuffle


def test_rendezvous_rejects_bad_shards(spark):
    df = spark.createDataFrame([(1,)], ["k"])
    with pytest.raises(ValueError):
        rendezvous_assign(df, "k", [])
    with pytest.raises(ValueError):
        rendezvous_assign(df, "k", ["a", "a"])


# ------------------------------------------------------- rolling distinct


def test_rolling_distinct_hand_computed(spark):
    import datetime as dt

    from weaviate_txtai_spark.operators.resample import rolling_distinct

    def ts(day):
        return dt.datetime(2024, 1, day, 12, 0)

    rows = [
        (1, ts(1)), (1, ts(1)),  # dup same day counts once
        (2, ts(2)),
        (1, ts(4)),
        (3, ts(5)),
    ]
    df = spark.createDataFrame(rows, "u long, ts timestamp")
    got = {
        str(r.day): r.n_distinct
        for r in rolling_distinct(
            df, ts_col="ts", key_col="u", window_days=3
        ).collect()
    }
    # trailing-3-day windows ending each day:
    # d1:{1} d2:{1,2} d3:{1,2} d4:{1,2} d5:{1,3}
    assert got == {
        "2024-01-01": 1, "2024-01-02": 2, "2024-01-03": 2,
        "2024-01-04": 2, "2024-01-05": 2,
    }


def test_rolling_distinct_window_one_is_daily(spark):
    import datetime as dt

    from weaviate_txtai_spark.operators.resample import rolling_distinct

    rows = [(1, dt.datetime(2024, 1, 1)), (2, dt.datetime(2024, 1, 1)),
            (1, dt.datetime(2024, 1, 3))]
    df = spark.createDataFrame(rows, "u long, ts timestamp")
    got = {
        str(r.day): r.n_distinct
        for r in rolling_distinct(
            df, ts_col="ts", key_col="u", window_days=1
        ).collect()
    }
    assert got == {"2024-01-01": 2, "2024-01-03": 1}


# --------------------------------------------------- time-weighted average


def test_twa_hand_computed(spark):
    import datetime as dt

    from weaviate_txtai_spark.operators.resample import time_weighted_avg

    def ts(sec):
        return dt.datetime(2024, 1, 1, 0, 0, sec)

    # value 10 held 5 s, value 20 held 15 s, last sample weightless
    rows = [("g", ts(0), 10.0), ("g", ts(5), 20.0), ("g", ts(20), 99.0)]
    df = spark.createDataFrame(rows, "g string, ts timestamp, v double")
    r = time_weighted_avg(
        df, group_col="g", ts_col="ts", value_col="v"
    ).collect()[0]
    assert r.n_samples == 3
    assert r.twa == round((10 * 5 + 20 * 15) / 20, 6)


def test_twa_single_sample_null(spark):
    import datetime as dt

    from weaviate_txtai_spark.operators.resample import time_weighted_avg

    df = spark.createDataFrame(
        [("g", dt.datetime(2024, 1, 1), 5.0)],
        "g string, ts timestamp, v double",
    )
    assert time_weighted_avg(
        df, group_col="g", ts_col="ts", value_col="v"
    ).collect()[0].twa is None
