"""Calibration eval: Brier/ECE closed forms, bin edges, clamping."""

import pytest

from weaviate_txtai_spark.operators.calibration import (
    calibration_summary,
    reliability_bins,
)


def test_perfectly_calibrated_bins(spark):
    # bin 2 (p=0.25): half positive; bin 7 (p=0.75): 3/4 positive
    rows = [(0.25, 1.0), (0.25, 0.0), (0.75, 1.0), (0.75, 1.0),
            (0.75, 1.0), (0.75, 0.0)]
    df = spark.createDataFrame(rows, "p double, y double")
    bins = {r["bin"]: r for r in reliability_bins(df, "p", "y").collect()}
    assert set(bins) == {2, 7}
    assert bins[2]["avg_prob"] == 0.25 and bins[2]["frac_pos"] == 0.5
    assert bins[2]["gap"] == -0.25
    assert bins[7]["n"] == 4 and bins[7]["frac_pos"] == 0.75
    assert bins[7]["gap"] == 0.0


def test_brier_and_ece_closed_form(spark):
    rows = [(0.8, 1.0), (0.8, 0.0), (0.2, 0.0), (0.2, 0.0)]
    df = spark.createDataFrame(rows, "p double, y double")
    s = calibration_summary(df, "p", "y").collect()[0]
    # brier = (0.04 + 0.64 + 0.04 + 0.04) / 4
    assert s["n"] == 4 and abs(s["brier"] - 0.19) < 1e-9
    # bin 8: |1.6 - 1| = 0.6 ; bin 2: |0.4 - 0| = 0.4 ; /4 = 0.25
    assert abs(s["ece"] - 0.25) < 1e-9


def test_top_edge_and_clamping(spark):
    rows = [(1.0, 1.0), (1.7, 1.0), (-0.3, 0.0)]
    df = spark.createDataFrame(rows, "p double, y double")
    bins = {r["bin"]: r["n"] for r in reliability_bins(df, "p", "y").collect()}
    # p=1.0 and clamped 1.7 both land in the TOP bin, -0.3 clamps to bin 0
    assert bins == {9: 2, 0: 1}


def test_null_rows_dropped_and_validation(spark):
    rows = [(0.5, 1.0), (None, 1.0), (0.5, None)]
    df = spark.createDataFrame(rows, "p double, y double")
    assert calibration_summary(df, "p", "y").collect()[0]["n"] == 1
    with pytest.raises(ValueError, match="n_bins"):
        reliability_bins(df, "p", "y", n_bins=0)
