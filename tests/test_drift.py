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


# ----------------------------------------------------------------- PSI


def test_psi_identical_group_is_zero(spark):
    from weaviate_txtai_spark.operators.drift import psi_drift

    rows = [("b", float(v)) for v in range(100)] + [
        ("a", float(v)) for v in range(100)
    ]
    df = spark.createDataFrame(rows, ["g", "v"])
    got = {r.g: r.psi for r in psi_drift(
        df, group_col="g", value_col="v", baseline="b", n_bins=5
    ).collect()}
    assert got["b"] == 0.0
    assert got["a"] == 0.0  # same distribution, same bins


def test_psi_shifted_group_is_large(spark):
    from weaviate_txtai_spark.operators.drift import psi_drift

    rows = [("b", float(v)) for v in range(100)] + [
        ("shift", float(v + 200)) for v in range(100)
    ]
    df = spark.createDataFrame(rows, ["g", "v"])
    got = {r.g: r.psi for r in psi_drift(
        df, group_col="g", value_col="v", baseline="b", n_bins=5
    ).collect()}
    # the shifted group lands entirely in the top bin: strongly drifted
    assert got["shift"] > 0.25
    assert got["b"] == 0.0


def test_psi_hand_computed_with_floor(spark):
    import math

    from weaviate_txtai_spark.operators.drift import psi_drift

    # baseline: 1..4 uniform, 2 bins (edge = median 2.5)
    # group x: all values 4 -> bin0 empty (floored at 0.5)
    rows = [("b", 1.0), ("b", 2.0), ("b", 3.0), ("b", 4.0),
            ("x", 4.0), ("x", 4.0)]
    df = spark.createDataFrame(rows, ["g", "v"])
    got = {r.g: r.psi for r in psi_drift(
        df, group_col="g", value_col="v", baseline="b", n_bins=2
    ).collect()}
    pb = [0.5, 0.5]
    pg = [0.5 / 2, 2 / 2]  # floored empty bin
    want = sum((g - b) * math.log(g / b) for g, b in zip(pg, pb))
    assert got["x"] == round(want, 6)


def test_psi_missing_baseline_raises(spark):
    from weaviate_txtai_spark.operators.drift import psi_drift

    df = spark.createDataFrame([("a", 1.0)], ["g", "v"])
    import pytest as _pytest

    with _pytest.raises(ValueError):
        psi_drift(df, group_col="g", value_col="v", baseline="zzz")
