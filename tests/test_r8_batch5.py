"""Round-8 batch 5: split conformal intervals, diff-in-diff,
composed volume anomalies."""

import datetime as dt
import math

import pytest

from pyspark.sql import functions as F


def test_conformal_qhat_order_statistic(spark):
    from weaviate_txtai_spark.operators.conformal import conformal_qhat

    # residuals 1..10; alpha=0.1 -> k = ceil(11*0.9) = 10 -> qhat = 10
    rows = [(float(i + 100), 100.0) for i in range(1, 11)]
    df = spark.createDataFrame(rows, "pred double, actual double")
    r = conformal_qhat(df, "pred", "actual", alpha=0.1).collect()[0]
    assert r["n_cal"] == 10 and r["k"] == 10 and r["qhat"] == 10.0
    # alpha=0.5 -> k = ceil(11*0.5) = 6 -> qhat = 6
    r2 = conformal_qhat(df, "pred", "actual", alpha=0.5).collect()[0]
    assert r2["k"] == 6 and r2["qhat"] == 6.0
    with pytest.raises(ValueError, match="alpha"):
        conformal_qhat(df, "pred", "actual", alpha=0.0)


def test_conformal_qhat_null_when_uncertifiable(spark):
    from weaviate_txtai_spark.operators.conformal import conformal_qhat

    df = spark.createDataFrame(
        [(1.0, 0.0), (2.0, 0.0)], "pred double, actual double"
    )
    # n=2, alpha=0.1 -> k = ceil(3*0.9) = 3 > n -> NULL
    r = conformal_qhat(df, "pred", "actual", alpha=0.1).collect()[0]
    assert r["qhat"] is None


def test_conformal_report_coverage_guarantee(spark):
    from weaviate_txtai_spark.operators.conformal import conformal_report

    import random

    rng = random.Random(17)
    rows = [
        (50.0, 50.0 + rng.gauss(0, 5.0), i % 2 == 0) for i in range(4000)
    ]
    df = spark.createDataFrame(rows, "pred double, actual double, cal boolean")
    r = conformal_report(df, "pred", "actual", cal_col="cal", alpha=0.1
                         ).collect()[0]
    assert r["n_cal"] == 2000 and r["n_eval"] == 2000
    # finite-sample guarantee: coverage >= 0.9 in expectation; allow
    # sampling slack downward
    assert r["coverage"] >= 0.87, r["coverage"]


def test_conformal_apply_bounds(spark):
    from weaviate_txtai_spark.operators.conformal import (
        conformal_apply,
        conformal_qhat,
    )

    cal = spark.createDataFrame(
        [(float(i), 0.0) for i in range(1, 6)], "pred double, actual double"
    )
    q = conformal_qhat(cal, "pred", "actual", alpha=0.4)  # k=ceil(6*.6)=4
    out = conformal_apply(
        spark.createDataFrame([(10.0,)], "pred double"), "pred", q
    ).collect()[0]
    assert out["lo"] == 6.0 and out["hi"] == 14.0


def test_diff_in_diff_closed_form(spark):
    from weaviate_txtai_spark.operators.abtest import diff_in_diff

    rows = (
        [("t", "pre", 10.0), ("t", "pre", 12.0)]
        + [("t", "post", 20.0), ("t", "post", 26.0)]
        + [("c", "pre", 5.0), ("c", "pre", 7.0)]
        + [("c", "post", 8.0), ("c", "post", 10.0)]
    )
    df = spark.createDataFrame(rows, "g string, p string, y double")
    r = diff_in_diff(
        df, "g", "p", "y", treat_value="t", post_value="post"
    ).collect()[0]
    # (23 - 11) - (9 - 6) = 9
    assert r["did"] == 9.0
    se = math.sqrt(2 / 2 + 18 / 2 + 2 / 2 + 2 / 2)
    assert abs(r["se"] - se) < 1e-6
    assert (r["n_tpre"], r["n_cpost"]) == (2, 2)


def test_diff_in_diff_singleton_cell_null_se(spark):
    from weaviate_txtai_spark.operators.abtest import diff_in_diff

    rows = [("t", "pre", 1.0), ("t", "post", 2.0),
            ("c", "pre", 3.0), ("c", "post", 4.0)]
    df = spark.createDataFrame(rows, "g string, p string, y double")
    r = diff_in_diff(
        df, "g", "p", "y", treat_value="t", post_value="post"
    ).collect()[0]
    assert r["did"] == 0.0 and r["se"] is None


def test_volume_anomalies_flags_planted_spike(spark):
    from weaviate_txtai_spark.operators.seasonal import volume_anomalies

    # 4 flat weeks at 10/day, then one day spiked to 30
    d0 = dt.date(2024, 1, 1)
    rows = []
    for k in range(28):
        n = 30 if k == 14 else 10
        day = d0 + dt.timedelta(days=k)
        rows += [("a", dt.datetime.combine(day, dt.time(2))
                  + dt.timedelta(minutes=i)) for i in range(n)]
    ev = spark.createDataFrame(rows, "event_type string, ts timestamp")
    out = {str(r["day"]): r for r in
           volume_anomalies(ev, threshold=0.5).collect()}
    assert out["2024-01-15"]["anomaly"] is True
    assert out["2024-01-15"]["log_ratio"] > 0.5
    # flat days away from the spike's MA window stay quiet
    assert out["2024-01-03"]["anomaly"] is False
    with pytest.raises(ValueError, match="odd"):
        volume_anomalies(ev, window_days=6)
