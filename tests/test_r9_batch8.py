"""Round-9 batch 8: RFM segmentation, burstiness, Theil decomposition."""

import math

import pytest

from pyspark.sql import functions as F


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double"
    )


# -------------------------------------------------------------------- RFM


def test_rfm_scores_and_segment(spark):
    from weaviate_txtai_spark.operators.rfm import rfm_segments

    import datetime as dt

    t0 = dt.datetime(2026, 1, 1)
    rows = []
    eid = 0
    # user u: u purchases, each of value 10*u, last one u days ago
    for u in range(1, 6):
        for j in range(u):
            rows.append((eid, t0 - dt.timedelta(days=u, hours=j),
                         u, 10.0 * u))
            eid += 1
    df = _ev(spark, rows)
    got = {r["user_id"]: r for r in rfm_segments(df, warn_rows=None)
           .collect()}
    # user 1: most recent (r best=5), least frequent (f=1), lowest spend
    assert got[1]["r_score"] == 5 and got[1]["f_score"] == 1
    assert got[5]["r_score"] == 1 and got[5]["f_score"] == 5
    assert got[5]["m_score"] == 5  # 5 purchases x 50 = max monetary
    for u, r in got.items():
        assert r["segment"] == f"{r['r_score']}{r['f_score']}{r['m_score']}"
    # user 1's last purchase IS the corpus max -> recency 0; user 5's
    # last is 4 days earlier
    assert got[1]["recency_us"] == 0
    assert got[5]["recency_us"] == 4 * 86400 * 10**6


def test_rfm_validation_and_null_exclusion(spark):
    from weaviate_txtai_spark.operators.rfm import rfm_segments

    import datetime as dt

    df = _ev(spark, [(0, dt.datetime(2026, 1, 1), 1, 5.0),
                     (1, None, 2, 5.0)])
    rows = rfm_segments(df, warn_rows=None).collect()
    assert {r["user_id"] for r in rows} == {1}
    with pytest.raises(ValueError):
        rfm_segments(df, n_buckets=1)


# ------------------------------------------------------------- burstiness


def test_burstiness_periodic_vs_bursty(spark):
    from weaviate_txtai_spark.operators.profile import burstiness

    import datetime as dt

    t0 = dt.datetime(2026, 1, 1)
    rows = []
    # user 1: perfectly periodic (equal gaps) -> sigma=0 -> B=-1
    for j in range(6):
        rows.append((j, t0 + dt.timedelta(hours=j), 1, 0.0))
    # user 2: bursty (five 1s gaps then a week)
    for j in range(6):
        rows.append((10 + j, t0 + dt.timedelta(seconds=j), 2, 0.0))
    rows.append((16, t0 + dt.timedelta(days=7), 2, 0.0))
    df = _ev(spark, rows)
    got = {r["user_id"]: r for r in burstiness(df).collect()}
    assert got[1]["b"] == pytest.approx(-1.0)
    # five 1s gaps + one week-long gap, n=6: B ~ 0.42 (sample sd caps
    # B below 1 at small n)
    assert got[2]["b"] > 0.3
    assert got[1]["mean_gap_us"] == 3600 * 10**6


def test_burstiness_matches_closed_form(spark):
    from weaviate_txtai_spark.operators.profile import burstiness

    import datetime as dt
    import statistics

    t0 = dt.datetime(2026, 1, 1)
    gaps = [10, 20, 40, 5, 90]  # seconds
    rows, t, eid = [], t0, 0
    rows.append((eid, t, 1, 0.0))
    for g in gaps:
        eid += 1
        t = t + dt.timedelta(seconds=g)
        rows.append((eid, t, 1, 0.0))
    df = _ev(spark, rows)
    r = burstiness(df).collect()[0]
    mu = statistics.mean(g * 10**6 for g in gaps)
    sd = statistics.stdev(g * 10**6 for g in gaps)
    assert r["n_gaps"] == 5
    assert r["b"] == pytest.approx(round((sd - mu) / (sd + mu), 6),
                                   abs=1e-9)


def test_burstiness_min_gaps_filter(spark):
    from weaviate_txtai_spark.operators.profile import burstiness

    import datetime as dt

    t0 = dt.datetime(2026, 1, 1)
    df = _ev(spark, [(0, t0, 1, 0.0),
                     (1, t0 + dt.timedelta(seconds=5), 1, 0.0)])
    assert burstiness(df).count() == 0  # one gap < min_gaps=2


# ------------------------------------------------------------------ Theil


def test_theil_decomposition_identity_and_zero_inequality(spark):
    from weaviate_txtai_spark.operators.inequality import (
        theil_decomposition,
    )

    import random

    rng = random.Random(3)
    rows = [(f"g{i % 3}", rng.uniform(1, 100)) for i in range(90)]
    df = spark.createDataFrame(rows, "g string, x double")
    r = theil_decomposition(df, "x", "g").collect()[0]
    assert r["theil_total"] == pytest.approx(
        r["theil_between"] + r["theil_within"], abs=2e-6
    )
    assert r["theil_total"] > 0 and r["n_groups"] == 3
    # perfectly equal values -> all indices 0
    eq = spark.createDataFrame(
        [("a", 5.0)] * 10 + [("b", 5.0)] * 10, "g string, x double"
    )
    r0 = theil_decomposition(eq, "x", "g").collect()[0]
    assert r0["theil_total"] == pytest.approx(0.0, abs=1e-9)
    assert r0["theil_between"] == pytest.approx(0.0, abs=1e-9)


def test_theil_between_dominates_when_groups_separate(spark):
    from weaviate_txtai_spark.operators.inequality import (
        theil_decomposition,
    )

    rows = [("poor", 1.0)] * 20 + [("rich", 100.0)] * 20
    df = spark.createDataFrame(rows, "g string, x double")
    r = theil_decomposition(df, "x", "g").collect()[0]
    assert r["theil_within"] == pytest.approx(0.0, abs=1e-9)
    assert r["theil_between"] > 0.5
    # hand value: w_rich = .5*(100/50.5), etc.
    mu = 50.5
    want = 0.5 * (1 / mu) * math.log(1 / mu) \
        + 0.5 * (100 / mu) * math.log(100 / mu)
    assert r["theil_between"] == pytest.approx(round(want, 6), abs=1e-9)


def test_theil_excludes_nonpositive(spark):
    from weaviate_txtai_spark.operators.inequality import (
        theil_decomposition,
    )

    rows = [("a", 2.0), ("a", 0.0), ("a", -1.0), ("b", 2.0)]
    df = spark.createDataFrame(rows, "g string, x double")
    r = theil_decomposition(df, "x", "g").collect()[0]
    assert r["n"] == 2 and r["theil_total"] == pytest.approx(0.0)
