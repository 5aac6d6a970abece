"""Round-9 batch 13: pass@k estimator, Wilson score intervals."""

import math

import pytest

from pyspark.sql import functions as F


# ----------------------------------------------------------------- pass@k


def _ref_pass_at_k(tasks, k):
    """Reference 1 - C(n-c,k)/C(n,k) with the n<k clamp."""
    vals = []
    for n, c in tasks:
        kk = min(k, n)
        num = den = 1.0
        for i in range(kk):
            num *= max(n - c - i, 0)
            den *= n - i
        vals.append(1.0 - num / den)
    return sum(vals) / len(vals)


def test_pass_at_k_matches_reference(spark):
    from weaviate_txtai_spark.operators.evalmetrics import pass_at_k

    import random

    rng = random.Random(47)
    rows, tasks = [], []
    for t in range(80):
        n = rng.randint(1, 30)
        c = rng.randint(0, n)
        tasks.append((n, c))
        rows += [(t, 1)] * c + [(t, 0)] * (n - c)
    df = spark.createDataFrame(rows, "task long, s int")
    got = {r["k"]: r["pass_at_k"]
           for r in pass_at_k(df, "task", "s", ks=(1, 5, 10)).collect()}
    for k in (1, 5, 10):
        assert got[k] == pytest.approx(
            round(_ref_pass_at_k(tasks, k), 6), abs=1e-9
        ), k


def test_pass_at_k_known_values(spark):
    from weaviate_txtai_spark.operators.evalmetrics import pass_at_k

    # one task: n=4, c=1 -> pass@1 = 1/4; pass@2 = 1 - C(3,2)/C(4,2)
    # = 1 - 3/6 = 1/2; pass@4 = 1 (a full sweep must hit the success)
    rows = [(0, 1), (0, 0), (0, 0), (0, 0)]
    df = spark.createDataFrame(rows, "task long, s int")
    got = {r["k"]: r["pass_at_k"]
           for r in pass_at_k(df, "task", "s", ks=(1, 2, 4)).collect()}
    assert got[1] == pytest.approx(0.25)
    assert got[2] == pytest.approx(0.5)
    assert got[4] == pytest.approx(1.0)


def test_pass_at_k_clamps_small_n_and_validates(spark):
    from weaviate_txtai_spark.operators.evalmetrics import pass_at_k

    # n=2 < k=10: clamp -> pass@10 == pass@2 (here c=0 -> 0.0)
    rows = [(0, 0), (0, 0), (1, 1)]
    df = spark.createDataFrame(rows, "task long, s int")
    got = {r["k"]: r["pass_at_k"]
           for r in pass_at_k(df, "task", "s", ks=(10,)).collect()}
    assert got[10] == pytest.approx(0.5)  # task0 -> 0, task1 -> 1
    with pytest.raises(ValueError):
        pass_at_k(df, "task", "s", ks=(0,))


def test_pass_at_k_heavy_task_no_overflow(spark):
    from weaviate_txtai_spark.operators.evalmetrics import pass_at_k

    rows = [(0, 0)] * 5000 + [(0, 1)]  # n=5001: 5001^10 >> int64
    df = spark.createDataFrame(rows, "task long, s int")
    r = pass_at_k(df, "task", "s", ks=(10,)).collect()[0]
    want = 1.0
    for i in range(10):
        want *= (5000 - i) / (5001 - i)
    assert r["pass_at_k"] == pytest.approx(round(1 - want, 6), abs=1e-9)


# ------------------------------------------------------------------ Wilson


def test_wilson_matches_closed_form(spark):
    from weaviate_txtai_spark.operators.evalmetrics import (
        wilson_interval,
    )

    rows = [("a", 1)] * 95 + [("a", 0)] * 5 + [("b", 1)]
    df = spark.createDataFrame(rows, "k string, s int")
    got = {r["k"]: r for r in wilson_interval(df, "k", "s").collect()}
    z = 1.959963985
    n, p = 100.0, 0.95
    denom = 1 + z * z / n
    center = (p + z * z / (2 * n)) / denom
    half = z * math.sqrt(p * (1 - p) / n + z * z / (4 * n * n)) / denom
    assert got["a"]["wilson_lb"] == pytest.approx(
        round(center - half, 6), abs=1e-9
    )
    assert got["a"]["wilson_ub"] == pytest.approx(
        round(center + half, 6), abs=1e-9
    )
    # the 1-of-1 key must NOT outrank the 95-of-100 on the lower bound
    assert got["b"]["rate"] == 1.0
    assert got["b"]["wilson_lb"] < got["a"]["wilson_lb"]


def test_wilson_bounds_clamped(spark):
    from weaviate_txtai_spark.operators.evalmetrics import (
        wilson_interval,
    )

    df = spark.createDataFrame(
        [("z", 0), ("o", 1)], "k string, s int"
    )
    got = {r["k"]: r for r in wilson_interval(df, "k", "s").collect()}
    assert 0.0 <= got["z"]["wilson_lb"] <= got["z"]["wilson_ub"] <= 1.0
    assert 0.0 <= got["o"]["wilson_lb"] <= got["o"]["wilson_ub"] <= 1.0
