"""ks_drift — hand-computed two-sample KS statistics."""

import pytest
from pyspark.sql import functions as F

from weaviate_txtai_spark.operators.drift import ks_drift


def _df(spark, rows):
    return spark.createDataFrame(rows, "g string, v double")


def test_identical_distribution_is_zero(spark):
    """A group that IS the pool (single group) has KS = 0 at every
    step point."""
    rows = [("a", float(v)) for v in (1, 2, 2, 3)]
    out = ks_drift(_df(spark, rows), group_col="g", value_col="v").collect()
    assert out == [("a", 4, 0.0)] or (
        out[0]["g"] == "a" and out[0]["n"] == 4 and out[0]["ks"] == 0.0
    )


def test_hand_computed_two_groups(spark):
    """a = {1, 2}, b = {3, 4}; pool = {1, 2, 3, 4}.
    At x=2: F_a=1, F_pool=0.5 → |diff|=0.5; F_b=0, diff 0.5.
    KS = 0.5 for both groups."""
    rows = [("a", 1.0), ("a", 2.0), ("b", 3.0), ("b", 4.0)]
    got = {
        r["g"]: (r["n"], r["ks"])
        for r in ks_drift(_df(spark, rows), group_col="g", value_col="v").collect()
    }
    assert got == {"a": (2, 0.5), "b": (2, 0.5)}


def test_sup_attained_between_group_points(spark):
    """a = {1, 10}, b = {2,...,9} (8 points). The sup for `a` is at
    x=9: F_a = 0.5 (only the 1 ≤ 9), F_pool = 9/10 → 0.4. Evaluating
    only at a's OWN points (1: |0.5−0.1|=0.4; 10: 0) would give the
    same here, so sharpen: a = {1, 3}, b = {2}: pool {1,2,3};
    at x=2: F_a=0.5, F_pool=2/3 → 1/6; at x=1: |0.5−1/3|=1/6;
    b at x=1: |0−1/3|=1/3 → b's sup needs the point x=1 where b has
    NO mass — the grid evaluation, not a per-group-points shortcut."""
    rows = [("a", 1.0), ("a", 3.0), ("b", 2.0)]
    got = {
        r["g"]: r["ks"]
        for r in ks_drift(_df(spark, rows), group_col="g", value_col="v").collect()
    }
    assert got["b"] == pytest.approx(1 / 3, abs=1e-6)  # at x=1: |0 − 1/3|
    assert got["a"] == pytest.approx(1 / 6, abs=1e-6)


def test_nulls_dropped(spark):
    rows = [("a", 1.0), ("a", None), ("b", 1.0)]
    got = {r["g"]: r["n"] for r in ks_drift(
        _df(spark, rows), group_col="g", value_col="v").collect()}
    assert got == {"a": 1, "b": 1}
