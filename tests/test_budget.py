"""waterfill_allocation — closed-form fairness properties."""

import pytest
from pyspark.sql import functions as F

from weaviate_txtai_spark.operators.budget import waterfill_allocation


def _df(spark, rows):
    return spark.createDataFrame(rows, "source string, tokens double")


def test_hand_computed_split(spark):
    """Inventories 10/40/100, budget 90: 10 whole, θ = 40 for the
    rest (10 + 2·40 = 90)."""
    out = {
        r["source"]: r["alloc"]
        for r in waterfill_allocation(
            _df(spark, [("a", 10.0), ("b", 40.0), ("c", 100.0)]), 90
        ).collect()
    }
    assert out == {"a": 10.0, "b": 40.0, "c": 40.0}


def test_budget_exceeds_total_takes_everything(spark):
    out = waterfill_allocation(
        _df(spark, [("a", 5.0), ("b", 7.0)]), 1000
    ).collect()
    assert all(r["alloc"] == r["tokens"] for r in out)


def test_budget_below_smallest_caps_uniformly(spark):
    """No source fits whole → θ = B/n for everyone."""
    out = {
        r["source"]: r["alloc"]
        for r in waterfill_allocation(
            _df(spark, [("a", 50.0), ("b", 80.0)]), 60
        ).collect()
    }
    assert out == {"a": 30.0, "b": 30.0}


def test_allocation_sums_to_budget_and_respects_caps(spark):
    rows = [(f"s{i}", float((i * 37) % 90 + 1)) for i in range(25)]
    budget = 600.0
    out = waterfill_allocation(_df(spark, rows), budget).collect()
    total = sum(r["alloc"] for r in out)
    assert total == pytest.approx(budget, abs=1e-4)
    caps = dict(rows)
    for r in out:
        assert r["alloc"] <= caps[r["source"]] + 1e-9
    # max-min fairness: every capped source gets the same θ
    thetas = {
        r["alloc"] for r in out if r["alloc"] < caps[r["source"]] - 1e-9
    }
    assert len(thetas) <= 1


def test_negative_budget_raises(spark):
    with pytest.raises(ValueError, match="negative budget"):
        waterfill_allocation(_df(spark, [("a", 1.0)]), -5)


def test_deterministic_with_ties(spark):
    """Tied inventories order by key — two runs agree exactly."""
    rows = [("b", 10.0), ("a", 10.0), ("c", 10.0), ("d", 50.0)]
    a = sorted(map(tuple, waterfill_allocation(_df(spark, rows), 45).collect()))
    b = sorted(map(tuple, waterfill_allocation(_df(spark, rows), 45).collect()))
    assert a == b
    # 3×10 whole, d capped at 15
    alloc = dict((r[0], r[2]) for r in a)
    assert alloc["d"] == 15.0
