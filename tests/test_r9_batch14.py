"""Round-9 batch 14: cohort LTV triangle, Simpson's-paradox check."""

import datetime as dt

import pytest

from pyspark.sql import functions as F


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long,"
              " event_type string, value double"
    )


# ------------------------------------------------------------------- LTV


def test_cohort_ltv_hand_triangle(spark):
    from weaviate_txtai_spark.operators.funnel import cohort_ltv

    w0 = dt.datetime(2026, 1, 5)  # a Monday
    rows = [
        # cohort w0: users 1,2 — week 0 purchases 10+20, week 1: 30
        (0, w0, 1, "purchase", 10.0),
        (1, w0 + dt.timedelta(days=1), 2, "purchase", 20.0),
        (2, w0 + dt.timedelta(days=8), 1, "purchase", 30.0),
        (3, w0 + dt.timedelta(days=9), 2, "view", 99.0),  # filtered out
        # cohort w0+2w: user 3, no purchases (anchors cohort, value 0)
        (4, w0 + dt.timedelta(days=14), 3, "view", 5.0),
    ]
    out = cohort_ltv(
        _ev(spark, rows),
        value_filter=(F.col("event_type") == "purchase"),
    ).collect()
    tri = {(str(r["cohort_week"]), r["week_offset"]): r for r in out}
    a0 = tri[("2026-01-05", 0)]
    assert a0["cohort_users"] == 2
    assert a0["week_value"] == 30.0 and a0["cum_value"] == 30.0
    assert a0["ltv_per_user"] == pytest.approx(15.0)
    a1 = tri[("2026-01-05", 1)]
    assert a1["week_value"] == 30.0 and a1["cum_value"] == 60.0
    assert a1["ltv_per_user"] == pytest.approx(30.0)
    b0 = tri[("2026-01-19", 0)]
    assert b0["cohort_users"] == 1 and b0["cum_value"] == 0.0


def test_cohort_ltv_no_filter_counts_everything(spark):
    from weaviate_txtai_spark.operators.funnel import cohort_ltv

    w0 = dt.datetime(2026, 1, 5)
    rows = [(0, w0, 1, "view", 7.0), (1, w0, 1, "error", 3.0)]
    out = cohort_ltv(_ev(spark, rows)).collect()
    assert out[0]["cum_value"] == 10.0


# --------------------------------------------------------------- Simpson


def _cells(spark, spec):
    """spec: list of (stratum, treated_successes, treated_n,
    control_successes, control_n)."""
    rows = []
    for s, c1, n1, c0, n0 in spec:
        rows += [(s, 1, 1)] * c1 + [(s, 1, 0)] * (n1 - c1)
        rows += [(s, 0, 1)] * c0 + [(s, 0, 0)] * (n0 - c0)
    return spark.createDataFrame(rows, "s int, t int, y int")


def test_simpson_classic_reversal(spark):
    from weaviate_txtai_spark.operators.abtest import simpson_check

    # the classic kidney-stone shape: treatment better IN EACH stratum,
    # pooled worse because treatment concentrates in the hard stratum
    df = _cells(spark, [
        (1, 81, 87, 234, 270),   # easy: 93% vs 87%
        (2, 192, 263, 55, 80),   # hard: 73% vs 69%
    ])
    r = simpson_check(df, "s", "t", "y").collect()[0]
    assert r["pooled_diff"] < 0       # pooled says treatment worse
    assert r["n_reverse"] == 2        # both strata say better
    assert r["reversed"] is True


def test_simpson_consistent_no_flag(spark):
    from weaviate_txtai_spark.operators.abtest import simpson_check

    df = _cells(spark, [(1, 8, 10, 2, 10), (2, 7, 10, 3, 10)])
    r = simpson_check(df, "s", "t", "y").collect()[0]
    assert r["pooled_diff"] > 0
    assert r["n_agree"] == 2 and r["n_reverse"] == 0
    assert r["reversed"] is False


def test_simpson_degenerate_strata_and_counts(spark):
    from weaviate_txtai_spark.operators.abtest import simpson_check

    # stratum 9 has no controls: not usable, but still counted
    df = _cells(spark, [(1, 5, 10, 2, 10)])
    extra = spark.createDataFrame([(9, 1, 1)] * 4, "s int, t int, y int")
    r = simpson_check(df.unionByName(extra), "s", "t", "y").collect()[0]
    assert r["k_strata"] == 2 and r["k_usable"] == 1
    assert r["reversed"] is False


# ------------------------------------------------------------ odds ratio


def test_odds_ratio_hand_2x2(spark):
    from weaviate_txtai_spark.operators.abtest import odds_ratio

    import math

    rows = [(1, 1)] * 30 + [(1, 0)] * 20 + [(0, 1)] * 10 + [(0, 0)] * 40
    df = spark.createDataFrame(rows, "t int, y int")
    r = odds_ratio(df, "t", "y").collect()[0]
    want = (30 * 40) / (20 * 10)
    assert r["or_"] == pytest.approx(want)
    se = math.sqrt(1 / 30 + 1 / 20 + 1 / 10 + 1 / 40)
    assert r["or_lo"] == pytest.approx(
        round(math.exp(math.log(want) - 1.959963985 * se), 6), abs=1e-9
    )
    assert r["corrected"] is False


def test_odds_ratio_haldane_correction_on_zero_cell(spark):
    from weaviate_txtai_spark.operators.abtest import odds_ratio

    rows = [(1, 1)] * 5 + [(1, 0)] * 5 + [(0, 0)] * 10  # c = 0
    df = spark.createDataFrame(rows, "t int, y int")
    r = odds_ratio(df, "t", "y").collect()[0]
    assert r["corrected"] is True
    want = (5.5 * 10.5) / (5.5 * 0.5)
    assert r["or_"] == pytest.approx(round(want, 6))
    assert r["or_lo"] is not None  # correction keeps the CI finite
