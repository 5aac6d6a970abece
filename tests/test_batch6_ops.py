"""operators/attribution, scd.pit_join, funnel.funnel_latency."""

import datetime as dt

import pytest

from pyspark.sql import functions as F

from weaviate_txtai_spark.operators.attribution import attribution
from weaviate_txtai_spark.operators.funnel import funnel_latency
from weaviate_txtai_spark.operators.scd import pit_join


def _ts(day, sec=0):
    return dt.datetime(2024, 1, day, 0, 0, sec)


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, event_type string, ts timestamp, value double"
    )


# ------------------------------------------------------------ attribution


@pytest.fixture(scope="module")
def attr_events(spark):
    return _events(
        spark,
        [
            # u1: ad -> email -> purchase(10); email is last touch
            (1, "ad", _ts(1), 0.0),
            (1, "email", _ts(2), 0.0),
            (1, "purchase", _ts(3), 10.0),
            # u2: email -> ad -> purchase(20) -> ad -> purchase(5)
            (2, "email", _ts(1), 0.0),
            (2, "ad", _ts(2), 0.0),
            (2, "purchase", _ts(3), 20.0),
            (2, "ad", _ts(4), 0.0),
            (2, "purchase", _ts(5), 5.0),
            # u3: purchase with NO touch
            (3, "purchase", _ts(2), 7.0),
            # noise event type never credited
            (1, "view", _ts(1, 30), 0.0),
        ],
    )


def test_last_touch(attr_events):
    got = {
        r.touch_type: (r.conversions, r.credited_value)
        for r in attribution(
            attr_events,
            touch_types=["ad", "email"],
            conversion_type="purchase",
        ).collect()
    }
    assert got == {
        "email": (1.0, 10.0),
        "ad": (2.0, 25.0),
        "(none)": (1.0, 7.0),
    }


def test_first_touch(attr_events):
    got = {
        r.touch_type: (r.conversions, r.credited_value)
        for r in attribution(
            attr_events,
            touch_types=["ad", "email"],
            conversion_type="purchase",
            model="first",
        ).collect()
    }
    # u1 first touch ad; u2 both purchases first-touch email
    assert got == {
        "ad": (1.0, 10.0),
        "email": (2.0, 25.0),
        "(none)": (1.0, 7.0),
    }


def test_linear_split(attr_events):
    got = {
        r.touch_type: (r.conversions, r.credited_value)
        for r in attribution(
            attr_events,
            touch_types=["ad", "email"],
            conversion_type="purchase",
            model="linear",
        ).collect()
    }
    # u1: 2 touches split 10 -> 5/5. u2 conv1: email+ad split 20;
    # u2 conv2: email+ad+ad -> email 5/3, ad 10/3
    assert got["(none)"] == (1.0, 7.0)
    assert got["email"] == (
        round(0.5 + 0.5 + 1 / 3, 6),
        round(5 + 10 + 5 / 3, 6),
    )
    assert got["ad"] == (
        round(0.5 + 0.5 + 2 / 3, 6),
        round(5 + 10 + 10 / 3, 6),
    )


def test_lookback_window(attr_events):
    # 1-day lookback: u1's purchase at day3 sees only email (day2);
    # u2's first purchase sees only ad (day2); second sees ad (day4)
    got = {
        r.touch_type: r.credited_value
        for r in attribution(
            attr_events,
            touch_types=["ad", "email"],
            conversion_type="purchase",
            lookback=86400,
        ).collect()
    }
    assert got == {"email": 10.0, "ad": 25.0, "(none)": 7.0}


def test_conversion_cannot_be_touch(attr_events):
    with pytest.raises(ValueError):
        attribution(
            attr_events,
            touch_types=["purchase"],
            conversion_type="purchase",
        )


# ---------------------------------------------------------------- pit_join


def test_pit_join_picks_correct_version(spark):
    dim = spark.createDataFrame(
        [
            (1, "EARLY", _ts(1), _ts(10)),
            (1, "LATE", _ts(10), None),
            (2, "ONLY", _ts(1), None),
        ],
        "k long, seg string, valid_from timestamp, valid_to timestamp",
    )
    facts = spark.createDataFrame(
        [(1, _ts(5)), (1, _ts(10)), (1, _ts(20)), (2, _ts(3))],
        "k long, ts timestamp",
    )
    got = {
        (r.k, r.ts): r.seg
        for r in pit_join(facts, dim, key_cols=["k"], ts_col="ts").collect()
    }
    # boundary: valid_from inclusive, valid_to exclusive
    assert got == {
        (1, _ts(5)): "EARLY",
        (1, _ts(10)): "LATE",
        (1, _ts(20)): "LATE",
        (2, _ts(3)): "ONLY",
    }


def test_pit_join_left_null_when_before_history(spark):
    dim = spark.createDataFrame(
        [(1, "A", _ts(10), None)],
        "k long, seg string, valid_from timestamp, valid_to timestamp",
    )
    facts = spark.createDataFrame([(1, _ts(5))], "k long, ts timestamp")
    rows = pit_join(facts, dim, key_cols=["k"], ts_col="ts").collect()
    assert len(rows) == 1 and rows[0].seg is None


# ----------------------------------------------------------- funnel latency


def test_funnel_latency_values(spark):
    ev = _events(
        spark,
        [
            # u1: signup day1, view day2 (+86400 s), click day4 (+2 d)
            (1, "signup", _ts(1), 0.0),
            (1, "view", _ts(2), 0.0),
            (1, "click", _ts(4), 0.0),
            # u2: signup day1, view day3 (+2 d), no click
            (2, "signup", _ts(1), 0.0),
            (2, "view", _ts(3), 0.0),
        ],
    )
    rows = {
        r.step: r
        for r in funnel_latency(ev, ["signup", "view", "click"]).collect()
    }
    assert rows["view"].n_users == 2
    assert rows["view"].p50 == round((86400 + 172800) / 2, 6)
    assert rows["click"].n_users == 1
    assert rows["click"].p50 == 172800.0
    assert rows["click"].p90 == 172800.0


def test_funnel_latency_empty_step_is_null(spark):
    ev = _events(spark, [(1, "signup", _ts(1), 0.0)])
    rows = {
        r.step: r for r in funnel_latency(ev, ["signup", "view"]).collect()
    }
    assert rows["view"].n_users == 0 and rows["view"].p50 is None
