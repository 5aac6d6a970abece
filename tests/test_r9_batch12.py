"""Round-9 batch 12: cross-correlation, Mann-Kendall trend, Haar DWT."""

import math

import pytest

from pyspark.sql import functions as F


def _series(spark, ys):
    return spark.createDataFrame(
        [(i, float(y)) for i, y in enumerate(ys)], "t long, y double"
    )


# --------------------------------------------------------------------- XCF


def test_xcf_detects_known_lead(spark):
    from weaviate_txtai_spark.operators.seasonal import xcf

    import random

    rng = random.Random(41)
    a = [rng.uniform(0, 10) for _ in range(60)]
    b = [0.0, 0.0, 0.0] + a[:-3]  # B is A delayed by 3: A leads by 3
    got = {r["lag"]: r["xcf"]
           for r in xcf(_series(spark, a), _series(spark, b),
                        max_lag=5).collect()}
    best = max(got, key=lambda k: got[k] if got[k] is not None else -2)
    assert best == 3
    assert got[3] > 0.8  # truncated-overlap means depress r below 1


def test_xcf_matches_closed_form(spark):
    from weaviate_txtai_spark.operators.seasonal import xcf

    a = [1.0, 3.0, 2.0, 5.0, 4.0]
    b = [2.0, 1.0, 4.0, 3.0, 6.0]
    got = {r["lag"]: (r["xcf"], r["n_pairs"])
           for r in xcf(_series(spark, a), _series(spark, b),
                        max_lag=2).collect()}
    ma, mb = sum(a) / 5, sum(b) / 5
    da = sum((x - ma) ** 2 for x in a)
    db = sum((x - mb) ** 2 for x in b)
    for k in range(-2, 3):
        pairs = [
            (a[t] - ma) * (b[t + k] - mb)
            for t in range(5)
            if 0 <= t + k < 5
        ]
        want = round(sum(pairs) / math.sqrt(da * db), 6)
        assert got[k][0] == pytest.approx(want, abs=1e-9), k
        assert got[k][1] == len(pairs)
    with pytest.raises(ValueError):
        xcf(_series(spark, a), _series(spark, b), max_lag=0)


# ------------------------------------------------------------ Mann-Kendall


def test_mann_kendall_strong_trend(spark):
    from weaviate_txtai_spark.operators.seasonal import mann_kendall

    r = mann_kendall(_series(spark, list(range(30)))).collect()[0]
    # strictly increasing: S = C(30,2) = 435
    assert r["s"] == 435
    assert r["p_value"] < 1e-6
    assert r["z"] > 5


def test_mann_kendall_matches_hand_stat_with_ties(spark):
    from weaviate_txtai_spark.operators.seasonal import mann_kendall

    ys = [1.0, 2.0, 2.0, 3.0, 1.0]
    r = mann_kendall(_series(spark, ys)).collect()[0]
    s = 0
    for i in range(5):
        for j in range(i + 1, 5):
            s += (ys[j] > ys[i]) - (ys[j] < ys[i])
    n = 5
    tie = sum(
        t * (t - 1) * (2 * t + 5)
        for t in (2, 2, 1)  # two pairs of ties (1.0 x2, 2.0 x2)
    )
    var = (n * (n - 1) * (2 * n + 5) - tie) / 18.0
    assert r["s"] == s
    assert r["var_s"] == pytest.approx(round(var, 6), abs=1e-9)


def test_mann_kendall_constant_series_null_z(spark):
    from weaviate_txtai_spark.operators.seasonal import mann_kendall

    r = mann_kendall(_series(spark, [4.0] * 8)).collect()[0]
    assert r["s"] == 0 and r["z"] is None and r["p_value"] is None


# -------------------------------------------------------------------- Haar


def test_haar_hand_decomposition(spark):
    from weaviate_txtai_spark.operators.seasonal import haar_dwt

    ys = [2.0, 4.0, 6.0, 2.0]
    rows = {(r["level"], r["k"]): (r["approx"], r["detail"])
            for r in haar_dwt(_series(spark, ys), levels=2).collect()}
    # level 1: (2,4) -> approx 3, detail (2-4)/2 = -1 ; (6,2) -> 4, 2
    assert rows[(1, 0)] == (3.0, -1.0)
    assert rows[(1, 1)] == (4.0, 2.0)
    # level 2: (3,4) -> approx 3.5, detail -0.5
    assert rows[(2, 0)] == (3.5, -0.5)


def test_haar_odd_tail_carried(spark):
    from weaviate_txtai_spark.operators.seasonal import haar_dwt

    ys = [1.0, 3.0, 5.0]
    rows = {(r["level"], r["k"]): (r["approx"], r["detail"])
            for r in haar_dwt(_series(spark, ys), levels=1).collect()}
    assert rows[(1, 0)] == (2.0, -1.0)
    assert rows[(1, 1)] == (5.0, None)  # lone tail carried, no detail
    with pytest.raises(ValueError):
        haar_dwt(_series(spark, ys), levels=0)


def test_haar_energy_reconstruction_level1(spark):
    from weaviate_txtai_spark.operators.seasonal import haar_dwt

    import random

    rng = random.Random(43)
    ys = [float(rng.randint(0, 100)) for _ in range(16)]
    rows = {(r["level"], r["k"]): r
            for r in haar_dwt(_series(spark, ys), levels=1).collect()}
    for k in range(8):
        a, d = rows[(1, k)]["approx"], rows[(1, k)]["detail"]
        assert a + d == pytest.approx(ys[2 * k])  # even = approx+detail
        assert a - d == pytest.approx(ys[2 * k + 1])
