"""operators/skyline.py: distributed Pareto frontier."""

import random

import pytest

from weaviate_txtai_spark.operators.skyline import skyline


def _brute(rows, minimize, maximize):
    out = []
    for a in rows:
        dominated = False
        for b in rows:
            no_worse = all(b[c] <= a[c] for c in minimize) and all(
                b[c] >= a[c] for c in maximize
            )
            better = any(b[c] < a[c] for c in minimize) or any(
                b[c] > a[c] for c in maximize
            )
            if no_worse and better:
                dominated = True
                break
        if not dominated:
            out.append(a)
    return out


def test_simple_frontier(spark):
    # (price, quality): want cheap and good
    rows = [
        ("cheap_bad", 1.0, 1.0),
        ("mid", 2.0, 5.0),
        ("dear_good", 4.0, 9.0),
        ("dominated", 3.0, 4.0),   # mid is cheaper AND better
        ("dear_worse", 5.0, 8.0),  # dear_good dominates
    ]
    df = spark.createDataFrame(rows, ["name", "price", "quality"])
    got = {
        r.name for r in skyline(df, minimize=["price"], maximize=["quality"]).collect()
    }
    assert got == {"cheap_bad", "mid", "dear_good"}


def test_duplicates_survive(spark):
    df = spark.createDataFrame(
        [("a", 1.0, 1.0), ("b", 1.0, 1.0), ("c", 2.0, 1.5)],
        ["name", "x", "y"],
    )
    got = sorted(
        r.name for r in skyline(df, minimize=["x", "y"]).collect()
    )
    assert got == ["a", "b"]


def test_matches_bruteforce_random(spark):
    rng = random.Random(7)
    rows = [
        {"id": i, "x": rng.randint(0, 20) * 1.0, "y": rng.randint(0, 20) * 1.0,
         "z": rng.randint(0, 20) * 1.0}
        for i in range(300)
    ]
    df = spark.createDataFrame(rows).repartition(7)
    got = sorted(
        r.id
        for r in skyline(df, minimize=["x"], maximize=["y", "z"]).collect()
    )
    want = sorted(r["id"] for r in _brute(rows, ["x"], ["y", "z"]))
    assert got == want


def test_single_criterion_is_min(spark):
    df = spark.createDataFrame(
        [(i, float(i % 5)) for i in range(20)], ["id", "x"]
    )
    got = sorted(r.id for r in skyline(df, minimize=["x"]).collect())
    assert got == [i for i in range(20) if i % 5 == 0]


def test_rejects_empty_and_dup_criteria(spark):
    df = spark.createDataFrame([(1.0,)], ["x"])
    with pytest.raises(ValueError):
        skyline(df)
    with pytest.raises(ValueError):
        skyline(df, minimize=["x"], maximize=["x"])


def test_local_prune_is_superset_never_wrong(spark):
    # adversarial: anti-correlated data (everything on the frontier)
    rows = [(i, float(i), float(100 - i)) for i in range(100)]
    df = spark.createDataFrame(rows, ["id", "x", "y"]).repartition(5)
    assert skyline(df, minimize=["x", "y"]).count() == 100
