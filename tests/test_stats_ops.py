"""operators/inequality.gini, operators/regression.ols_trend,
operators/abtest.mann_whitney_u."""

import math

import pytest

from weaviate_txtai_spark.operators.abtest import mann_whitney_u
from weaviate_txtai_spark.operators.inequality import gini
from weaviate_txtai_spark.operators.regression import ols_trend


# ---------------------------------------------------------------- gini


def _py_gini(xs):
    s = sorted(xs)
    n = len(s)
    # tie-averaged rank form
    first = {}
    for i, v in enumerate(s):
        first.setdefault(v, i)
    r = [first[v] + (s.count(v) + 1) / 2.0 for v in s]
    sx = sum(s)
    srx = sum(ri * vi for ri, vi in zip(r, s))
    return (2 * srx - (n + 1) * sx) / (n * sx)


def test_gini_uniform_is_zero(spark):
    df = spark.createDataFrame([(float(5),)] * 8, ["v"])
    r = gini(df, "v").collect()[0]
    assert r.gini == 0.0 and r.n == 8 and r.total == 40.0


def test_gini_total_concentration(spark):
    # one unit owns everything: G = (n-1)/n
    df = spark.createDataFrame([(0.0,)] * 9 + [(100.0,)], ["v"])
    assert gini(df, "v").collect()[0].gini == round(9 / 10, 6)


def test_gini_matches_reference_with_ties(spark):
    xs = [1.0, 1.0, 2.0, 3.0, 5.0, 8.0, 8.0, 13.0]
    df = spark.createDataFrame([(x,) for x in xs], ["v"]).repartition(3)
    assert gini(df, "v").collect()[0].gini == pytest.approx(
        round(_py_gini(xs), 6), abs=2e-6
    )


def test_gini_per_group_and_zero_total(spark):
    rows = [("a", 5.0), ("a", 5.0), ("b", 0.0), ("b", 0.0), ("c", 1.0), ("c", 3.0)]
    df = spark.createDataFrame(rows, ["g", "v"])
    got = {r.g: r.gini for r in gini(df, "v", group_col="g").collect()}
    assert got["a"] == 0.0
    assert got["b"] is None
    assert got["c"] == pytest.approx(round(_py_gini([1.0, 3.0]), 6), abs=2e-6)


# ------------------------------------------------------------ ols_trend


def test_ols_exact_line(spark):
    df = spark.createDataFrame(
        [(float(x), 3.0 * x + 2.0) for x in range(10)], ["x", "y"]
    )
    r = ols_trend(df, "x", "y").collect()[0]
    assert (r.slope, r.intercept, r.r2) == (3.0, 2.0, 1.0)


def test_ols_reference_fit(spark):
    xs = [0.0, 1.0, 2.0, 3.0, 4.0]
    ys = [1.0, 2.0, 1.5, 3.5, 3.0]
    df = spark.createDataFrame(list(zip(xs, ys)), ["x", "y"])
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(a * b for a, b in zip(xs, ys))
    sxx = sum(a * a for a in xs)
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    intercept = (sy - slope * sx) / n
    r = ols_trend(df, "x", "y").collect()[0]
    assert r.slope == round(slope, 6)
    assert r.intercept == round(intercept, 6)


def test_ols_degenerate_groups(spark):
    rows = [("const_x", 1.0, 5.0), ("const_x", 1.0, 7.0),
            ("single", 2.0, 3.0),
            ("const_y", 1.0, 4.0), ("const_y", 2.0, 4.0)]
    df = spark.createDataFrame(rows, ["g", "x", "y"])
    got = {r.g: r for r in ols_trend(df, "x", "y", group_col="g").collect()}
    assert got["const_x"].slope is None
    assert got["single"].slope is None
    assert got["const_y"].slope == 0.0 and got["const_y"].r2 is None


# --------------------------------------------------------- mann-whitney


def _py_mwu(a, b):
    pooled = sorted(a + b)
    first = {}
    for i, v in enumerate(pooled):
        first.setdefault(v, i)
    rank = {v: first[v] + (pooled.count(v) + 1) / 2.0 for v in set(pooled)}
    ra = sum(rank[v] for v in a)
    na, nb = len(a), len(b)
    n = na + nb
    ua = ra - na * (na + 1) / 2
    tie = sum(
        pooled.count(v) ** 3 - pooled.count(v) for v in set(pooled)
    )
    var = na * nb / 12 * ((n + 1) - tie / (n * (n - 1)))
    z = (ua - na * nb / 2) / math.sqrt(var)
    return ua, z


def test_mwu_hand_computed_with_ties(spark):
    a = [1.0, 2.0, 2.0, 5.0]
    b = [2.0, 3.0, 6.0, 7.0, 8.0]
    rows = [("A", v) for v in a] + [("B", v) for v in b]
    df = spark.createDataFrame(rows, ["g", "v"]).repartition(3)
    r = mann_whitney_u(df, "g", "v", group_a="A", group_b="B").collect()[0]
    ua, z = _py_mwu(a, b)
    assert (r.n_a, r.n_b) == (4, 5)
    assert r.u_a == round(ua, 6)
    assert r.u_b == round(4 * 5 - ua, 6)
    assert r.z == pytest.approx(round(z, 6), abs=2e-6)


def test_mwu_all_tied_is_null(spark):
    rows = [("A", 3.0)] * 3 + [("B", 3.0)] * 3
    df = spark.createDataFrame(rows, ["g", "v"])
    r = mann_whitney_u(df, "g", "v", group_a="A", group_b="B").collect()[0]
    assert r.z is None
    assert r.u_a == r.u_b  # symmetric under total ties


def test_mwu_clear_separation_sign(spark):
    rows = [("A", float(v)) for v in range(10, 20)] + [
        ("B", float(v)) for v in range(0, 10)
    ]
    df = spark.createDataFrame(rows, ["g", "v"])
    r = mann_whitney_u(df, "g", "v", group_a="A", group_b="B").collect()[0]
    assert r.u_a == 100.0 and r.u_b == 0.0 and r.z > 3


# ----------------------------------------------------------------- WOE/IV


def test_woe_iv_hand_computed(spark):
    import math

    from weaviate_txtai_spark.operators.regression import woe_iv

    # level A: 3 good 1 bad; level B: 1 good 3 bad; totals 4/4
    rows = [("A", 1)] * 3 + [("A", 0)] + [("B", 1)] + [("B", 0)] * 3
    df = spark.createDataFrame(rows, ["f", "y"])
    got = {r.f: r for r in woe_iv(df, "f", "y").collect()}
    woe_a = math.log((3 / 4) / (1 / 4))
    assert got["A"].woe == round(woe_a, 6)
    assert got["A"].iv_term == round((3 / 4 - 1 / 4) * woe_a, 6)
    assert got["B"].woe == round(-woe_a, 6)  # symmetric
    assert (got["A"].n_good, got["A"].n_bad) == (3, 1)


def test_woe_iv_zero_cell_floor(spark):
    import math

    from weaviate_txtai_spark.operators.regression import woe_iv

    rows = [("pure", 1)] * 4 + [("other", 0)] * 4 + [("other", 1)] * 4
    df = spark.createDataFrame(rows, ["f", "y"])
    got = {r.f: r for r in woe_iv(df, "f", "y").collect()}
    # 'pure' has 0 bads: floored at 0.5 of 4 total bads
    woe = math.log((4 / 8) / (0.5 / 4))
    assert got["pure"].woe == round(woe, 6)


def test_woe_uninformative_feature_is_zero(spark):
    from weaviate_txtai_spark.operators.regression import woe_iv

    rows = [(f, y) for f in "ab" for y in (0, 1) for _ in range(5)]
    df = spark.createDataFrame(rows, ["f", "y"])
    got = woe_iv(df, "f", "y").collect()
    assert all(r.woe == 0.0 and r.iv_term == 0.0 for r in got)
