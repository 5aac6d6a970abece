"""Hard-sigmoid fixed-point GD quality classifier (operators/classifier.py).

Three angles: the kernel's integer primitives (_tdiv property vs a
pure-python truncating reference), learning on a genuinely separable
dataset (the gate's corpus isn't separable by design — the machinery
must still be provably capable), and Spark-vs-pure-python trajectory
parity (the same bit-exact discipline the DuckDB oracle relies on).
"""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from weaviate_txtai_spark.operators.classifier import (
    W_SCALE,
    X_SCALE,
    _tdiv,
    fit_hard_sigmoid_gd,
    normalized_features,
    score_hard_sigmoid,
)


# ------------------------------------------------------------------ _tdiv

@given(
    st.integers(min_value=-(10**18), max_value=10**18),
    st.integers(min_value=-(10**12), max_value=10**12).filter(lambda b: b != 0),
)
@settings(max_examples=300, deadline=None)
def test_tdiv_truncates_toward_zero(a, b):
    q = _tdiv(a, b)
    # |q| is the floor of |a/b| and the sign follows a*b — exactly what
    # DuckDB // and Spark div were verified to do
    assert abs(q) == abs(a) // abs(b)
    if q != 0:
        assert (q > 0) == ((a > 0) == (b > 0))
    # division identity under truncation: a = q*b + r with |r| < |b|
    r = a - q * b
    assert abs(r) < abs(b)
    assert r == 0 or (r > 0) == (a > 0)


# ---------------------------------------------------- pure-python kernel

def _py_fit(rows, n_iter=8, lr_num=5, lr_den=10):
    """Reference trajectory: rows = [(y, x1..xd)] with x in [0, X_SCALE]."""
    d = len(rows[0]) - 1
    w = [0] * (d + 1)
    n = len(rows)
    for _ in range(n_iter):
        g = [0] * (d + 1)
        for row in rows:
            y, xs = row[0], row[1:]
            z = _tdiv(
                X_SCALE * w[0] + sum(x * wj for x, wj in zip(xs, w[1:])),
                X_SCALE,
            )
            p = min(max(_tdiv(z + 2 * W_SCALE, 4), 0), W_SCALE)
            r = p - y * W_SCALE
            g[0] += r * X_SCALE
            for j, x in enumerate(xs):
                g[j + 1] += r * x
        w = [
            w[j] - _tdiv(lr_num * g[j], lr_den * n * X_SCALE)
            for j in range(d + 1)
        ]
    return w


def _py_score(w, xs):
    z = _tdiv(
        X_SCALE * w[0] + sum(x * wj for x, wj in zip(xs, w[1:])), X_SCALE
    )
    return min(max(_tdiv(z + 2 * W_SCALE, 4), 0), W_SCALE)


# ------------------------------------------------------------ spark tests

def _toy(spark, n=400):
    """Separable: y=1 docs have large x1 and small x2; deterministic."""
    rows = []
    for i in range(n):
        y = i % 2
        x1 = 7000 + (i * 37) % 2000 if y else 1000 + (i * 37) % 2000
        x2 = 1500 + (i * 53) % 1000 if y else 6500 + (i * 53) % 1000
        rows.append((i, y, x1, x2))
    return spark.createDataFrame(rows, "id long, y int, x1 long, x2 long")


def test_learns_separable(spark):
    feats = _toy(spark).cache()
    w = fit_hard_sigmoid_gd(feats, ["x1", "x2"], "y", n_iter=8)
    scored = feats.select(
        "y", (score_hard_sigmoid(["x1", "x2"], w) >= W_SCALE // 2).alias("pred")
    ).collect()
    acc = sum(int(r.pred) == r.y for r in scored) / len(scored)
    feats.unpersist()
    assert acc >= 0.95, (acc, w)
    # direction learned: positive class loads on x1, negative on x2
    assert w[1] > 0 > w[2], w


def test_spark_matches_python_trajectory(spark):
    feats = _toy(spark, n=120).cache()
    w_spark = fit_hard_sigmoid_gd(feats, ["x1", "x2"], "y", n_iter=6)
    rows = [
        (r.y, r.x1, r.x2)
        for r in feats.orderBy("id").collect()
    ]
    w_py = _py_fit(rows, n_iter=6)
    assert w_spark == w_py
    # scoring parity on every row
    scored = {
        r.id: r.p
        for r in feats.select(
            "id", score_hard_sigmoid(["x1", "x2"], w_spark).alias("p")
        ).collect()
    }
    for i, row in enumerate(rows):
        assert scored[i] == _py_score(w_py, row[1:])
    feats.unpersist()


def test_normalized_features_bounds_and_passthrough(spark):
    raw = spark.createDataFrame(
        [(1, 10, 0), (2, 40, 0), (3, 0, 0), (4, None, 0)],
        "doc_id long, a long, b long",
    )
    out = normalized_features(raw, ["a", "b"], out_cols=["xa", "xb"])
    got = {r.doc_id: (r.xa, r.xb) for r in out.collect()}
    # max(a)=40 -> 10*X/40; null -> 0; zero-max column b -> all zero
    assert got[1] == (10 * X_SCALE // 40, 0)
    assert got[2] == (X_SCALE, 0)
    assert got[3] == (0, 0)
    assert got[4] == (0, 0)
    assert set(out.columns) == {"doc_id", "xa", "xb"}


def test_empty_features_raises(spark):
    feats = spark.createDataFrame([], "y int, x1 long")
    with pytest.raises(ValueError, match="empty"):
        fit_hard_sigmoid_gd(feats, ["x1"], "y", n_iter=1)


# -------------------------------------------------- overflow-bound property

@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=1),
            st.integers(min_value=0, max_value=X_SCALE),
            st.integers(min_value=0, max_value=X_SCALE),
        ),
        min_size=1,
        max_size=60,
    ),
    st.integers(min_value=1, max_value=12),
)
@settings(max_examples=60, deadline=None)
def test_py_kernel_bounds(rows, n_iter):
    """The docstring's overflow-safety bounds, pinned: each update step
    moves a weight by at most lr*W_SCALE (= W_SCALE/2 at the default
    lr), so |w_j| <= n_iter*W_SCALE/2 and every per-row gradient term
    stays within 1e10 — the headroom the long arithmetic relies on."""
    w = _py_fit(rows, n_iter=n_iter)
    for wj in w:
        assert abs(wj) <= n_iter * W_SCALE // 2 + n_iter  # +slack for tdiv
    for row in rows:
        p = _py_score(w, row[1:])
        assert 0 <= p <= W_SCALE
        for x in row[1:]:
            assert abs((p - row[0] * W_SCALE) * x) <= 10**10
