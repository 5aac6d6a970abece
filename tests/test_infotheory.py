"""operators/infotheory.categorical_dependence."""

import math

import pytest

from weaviate_txtai_spark.operators.infotheory import categorical_dependence


def _ref(pairs):
    from collections import Counter

    n = len(pairs)
    j = Counter(pairs)
    cx = Counter(x for x, _ in pairs)
    cy = Counter(y for _, y in pairs)

    def h(counter):
        return -sum(c / n * math.log2(c / n) for c in counter.values())

    hx, hy, hxy = h(cx), h(cy), h(j)
    chi2 = 0.0
    for x in cx:
        for y in cy:
            e = cx[x] * cy[y] / n
            o = j.get((x, y), 0)
            chi2 += (o - e) ** 2 / e
    dof = (len(cx) - 1) * (len(cy) - 1)
    v = (
        math.sqrt(chi2 / (n * min(len(cx) - 1, len(cy) - 1)))
        if min(len(cx), len(cy)) > 1
        else None
    )
    return hx, hy, hxy, hx + hy - hxy, chi2, dof, v


def test_perfect_dependence(spark):
    pairs = [("a", 1), ("b", 2)] * 10
    df = spark.createDataFrame(pairs, ["x", "y"])
    r = categorical_dependence(df, "x", "y").collect()[0]
    assert r.h_x == 1.0 and r.h_y == 1.0 and r.h_xy == 1.0
    assert r.mi == 1.0 and r.nmi == 1.0
    assert r.cramers_v == 1.0
    assert r.dof == 1


def test_independence(spark):
    pairs = [(x, y) for x in "ab" for y in [1, 2]] * 5
    df = spark.createDataFrame(pairs, ["x", "y"])
    r = categorical_dependence(df, "x", "y").collect()[0]
    assert r.mi == 0.0 and r.chi2 == 0.0 and r.cramers_v == 0.0


def test_matches_reference_with_empty_cells(spark):
    # an absent (a,3) cell exercises the missing-cell χ² correction
    pairs = (
        [("a", 1)] * 5 + [("a", 2)] * 3 + [("b", 1)] * 2
        + [("b", 2)] * 4 + [("b", 3)] * 6
    )
    df = spark.createDataFrame(pairs, ["x", "y"]).repartition(3)
    r = categorical_dependence(df, "x", "y").collect()[0]
    hx, hy, hxy, mi, chi2, dof, v = _ref(pairs)
    assert r.h_x == pytest.approx(round(hx, 6), abs=2e-6)
    assert r.h_xy == pytest.approx(round(hxy, 6), abs=2e-6)
    assert r.mi == pytest.approx(round(mi, 6), abs=2e-6)
    assert r.chi2 == pytest.approx(round(chi2, 6), abs=2e-6)
    assert r.dof == dof
    assert r.cramers_v == pytest.approx(round(v, 6), abs=2e-6)


def test_constant_column_nulls(spark):
    pairs = [("a", y) for y in [1, 2, 1, 2, 1]]
    df = spark.createDataFrame(pairs, ["x", "y"])
    r = categorical_dependence(df, "x", "y").collect()[0]
    assert r.h_x == 0.0 and r.mi == 0.0
    assert r.nmi is None and r.cramers_v is None and r.dof == 0
