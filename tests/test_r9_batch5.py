"""Round-9 batch 5: Markov stationary distribution, two-feature OLS."""

import pytest

from pyspark.sql import functions as F


# ---------------------------------------------------------------- Markov


def test_markov_two_state_closed_form(spark):
    from weaviate_txtai_spark.operators.markov import (
        markov_stationary_exact,
    )

    # P = [[0.5, 0.5], [0.25, 0.75]] -> stationary (1/3, 2/3)
    tr = spark.createDataFrame(
        [("a", "a", 2), ("a", "b", 2), ("b", "a", 1), ("b", "b", 3)],
        "src string, dst string, n long",
    )
    got = {r["state"]: r["pi"]
           for r in markov_stationary_exact(tr, n_iter=30).collect()}
    assert got["a"] == pytest.approx(1 / 3, abs=1e-4)
    assert got["b"] == pytest.approx(2 / 3, abs=1e-4)


def test_markov_pi_sums_to_one_and_absorbing(spark):
    from weaviate_txtai_spark.operators.markov import (
        markov_stationary_exact,
    )

    # 'c' is absorbing via dangling redistribution: c has no outgoing
    # row, so its mass re-spreads uniformly each step (mass conserved)
    tr = spark.createDataFrame(
        [("a", "b", 1), ("b", "c", 1)], "src string, dst string, n long"
    )
    rows = markov_stationary_exact(tr, n_iter=6).collect()
    assert sum(r["pi"] for r in rows) == pytest.approx(1.0, abs=1e-5)
    assert {r["state"] for r in rows} == {"a", "b", "c"}


def test_markov_local_vs_python_trajectory(spark):
    """Bit-match the scaled-long trajectory against a python replica."""
    from weaviate_txtai_spark.operators.markov import (
        markov_stationary_exact,
    )

    edges = [("a", "b", 3), ("b", "a", 1), ("b", "c", 2), ("c", "a", 5)]
    tr = spark.createDataFrame(edges, "src string, dst string, n long")
    scale, n_iter = 10**9, 8
    states = sorted({s for s, _, _ in edges} | {d for _, d, _ in edges})
    tot = {}
    for s, _, n in edges:
        tot[s] = tot.get(s, 0) + n
    m = {s: scale // len(states) for s in states}
    for _ in range(n_iter):
        dm = sum(v for s, v in m.items() if s not in tot)
        nxt = {s: 0 for s in states}
        for s, d, n in edges:
            nxt[d] += (m[s] * n) // tot[s]
        m = {s: nxt[s] + dm // len(states) for s in states}
    t = float(sum(m.values()))
    want = {s: round(m[s] / t, 6) for s in states}
    got = {r["state"]: r["pi"]
           for r in markov_stationary_exact(tr, n_iter=n_iter).collect()}
    assert got == want


def test_markov_validation(spark):
    from weaviate_txtai_spark.operators.markov import (
        markov_stationary_exact,
    )

    tr = spark.createDataFrame(
        [("a", "b", 1)], "src string, dst string, n long"
    )
    with pytest.raises(ValueError):
        markov_stationary_exact(tr, n_iter=0)
    with pytest.raises(ValueError):
        markov_stationary_exact(tr, scale=10)
    empty = tr.filter(F.col("n") < 0)
    with pytest.raises(ValueError):
        markov_stationary_exact(empty)


# ------------------------------------------------------------------ OLS2


def test_ols2_recovers_exact_plane(spark):
    from weaviate_txtai_spark.operators.regression import ols2

    import random

    rng = random.Random(5)
    rows = []
    for _ in range(60):
        x1, x2 = rng.uniform(0, 10), rng.uniform(-3, 3)
        rows.append((2.5 + 1.25 * x1 - 0.5 * x2, x1, x2))
    df = spark.createDataFrame(rows, "y double, x1 double, x2 double")
    r = ols2(df, "y", "x1", "x2").collect()[0]
    assert r["b0"] == pytest.approx(2.5, abs=1e-4)
    assert r["b1"] == pytest.approx(1.25, abs=1e-4)
    assert r["b2"] == pytest.approx(-0.5, abs=1e-4)
    assert r["r2"] == pytest.approx(1.0, abs=1e-6)


def test_ols2_matches_numpy_lstsq(spark):
    from weaviate_txtai_spark.operators.regression import ols2

    import numpy as np

    rng = np.random.default_rng(9)
    x1 = rng.uniform(0, 5, 200)
    x2 = rng.integers(0, 2, 200).astype(float)
    y = 1.0 + 0.7 * x1 + 2.0 * x2 + rng.normal(0, 0.5, 200)
    df = spark.createDataFrame(
        [(float(a), float(b), float(c)) for a, b, c in zip(y, x1, x2)],
        "y double, x1 double, x2 double",
    )
    r = ols2(df, "y", "x1", "x2").collect()[0]
    X = np.column_stack([np.ones_like(x1), x1, x2])
    beta, *_ = np.linalg.lstsq(X, y, rcond=None)
    assert r["b0"] == pytest.approx(beta[0], abs=1e-4)
    assert r["b1"] == pytest.approx(beta[1], abs=1e-4)
    assert r["b2"] == pytest.approx(beta[2], abs=1e-4)
    yhat = X @ beta
    r2 = 1 - ((y - yhat) ** 2).sum() / ((y - y.mean()) ** 2).sum()
    assert r["r2"] == pytest.approx(r2, abs=1e-4)


def test_ols2_singular_gives_null(spark):
    from weaviate_txtai_spark.operators.regression import ols2

    # x2 = 2*x1 exactly -> collinear -> singular Gram
    rows = [(float(i), float(i), 2.0 * i) for i in range(10)]
    df = spark.createDataFrame(rows, "y double, x1 double, x2 double")
    r = ols2(df, "y", "x1", "x2").collect()[0]
    assert r["b0"] is None and r["b1"] is None and r["b2"] is None
    # and too-few rows
    tiny = spark.createDataFrame(
        [(1.0, 1.0, 0.0), (2.0, 2.0, 1.0)], "y double, x1 double, x2 double"
    )
    assert ols2(tiny, "y", "x1", "x2").collect()[0]["b1"] is None


def test_ols2_drops_nulls(spark):
    from weaviate_txtai_spark.operators.regression import ols2

    rows = [(1.0, 1.0, 0.0), (2.0, 2.0, 1.0), (3.0, 3.0, 0.0),
            (4.0, 4.0, 1.0), (None, 9.0, 9.0), (5.0, None, 1.0)]
    df = spark.createDataFrame(rows, "y double, x1 double, x2 double")
    assert ols2(df, "y", "x1", "x2").collect()[0]["n"] == 4
