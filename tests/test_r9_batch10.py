"""Round-9 batch 10: Shapley attribution, ABC classes, SAX symbols."""

import itertools
import math

import pytest

from pyspark.sql import functions as F


# ---------------------------------------------------------------- Shapley


def _py_shapley(exposures, channels):
    """Reference Shapley over the exact-exposure-set game."""
    k = len(channels)
    rates = {}
    counts = {}
    for chans, conv in exposures:
        key = frozenset(chans)
        n, c = counts.get(key, (0, 0))
        counts[key] = (n + 1, c + conv)
    for key, (n, c) in counts.items():
        rates[key] = c / n

    def v(s):
        return rates.get(frozenset(s), 0.0)

    phi = {}
    for ch in channels:
        rest = [c for c in channels if c != ch]
        total = 0.0
        for r in range(len(rest) + 1):
            for s in itertools.combinations(rest, r):
                w = (
                    math.factorial(len(s))
                    * math.factorial(k - len(s) - 1)
                    / math.factorial(k)
                )
                total += w * (v(set(s) | {ch}) - v(s))
        phi[ch] = round(total, 6)
    return phi


def test_shapley_matches_python_reference(spark):
    from weaviate_txtai_spark.operators.attribution import (
        shapley_attribution,
    )

    import random

    rng = random.Random(17)
    channels = ["a", "b", "c"]
    rows, exposures = [], []
    for u in range(300):
        chans = [c for c in channels if rng.random() < 0.5]
        # conversion more likely with 'b'
        p = 0.1 + (0.5 if "b" in chans else 0.0)
        conv = 1 if rng.random() < p else 0
        exposures.append((chans, conv))
        for c in chans:
            rows.append((u, c))
        if conv:
            rows.append((u, "buy"))
        if not chans and not conv:
            rows.append((u, "noop"))  # keeps the user visible
    df = spark.createDataFrame(rows, "user_id long, event_type string")
    got = {r["channel"]: r["shapley"]
           for r in shapley_attribution(
               df, channels=channels, conversion_type="buy").collect()}
    want = _py_shapley(exposures, channels)
    for ch in channels:
        assert got[ch] == pytest.approx(want[ch], abs=1e-9), ch
    assert got["b"] > got["a"] and got["b"] > got["c"]


def test_shapley_validation(spark):
    from weaviate_txtai_spark.operators.attribution import (
        shapley_attribution,
    )

    df = spark.createDataFrame([(1, "a")], "user_id long, event_type string")
    with pytest.raises(ValueError):
        shapley_attribution(df, channels=[], conversion_type="x")
    with pytest.raises(ValueError):
        shapley_attribution(df, channels=["x"], conversion_type="x")


# -------------------------------------------------------------------- ABC


def test_abc_hand_classes(spark):
    from weaviate_txtai_spark.operators.inequality import abc_classes

    # values 70, 20, 6, 3, 1 -> cumulative shares .70 A, .90 B, .96 C...
    rows = [("p1", 70.0), ("p2", 20.0), ("p3", 6.0), ("p4", 3.0),
            ("p5", 1.0)]
    df = spark.createDataFrame(rows, "k string, v double")
    got = {r["k"]: (r["cum_share"], r["abc_class"])
           for r in abc_classes(df, "k", "v").collect()}
    assert got["p1"] == (0.7, "A")
    assert got["p2"] == (0.9, "B")
    assert got["p3"] == (0.96, "C")
    assert got["p5"][1] == "C"


def test_abc_ties_share_a_class_and_aggregates(spark):
    from weaviate_txtai_spark.operators.inequality import abc_classes

    rows = [("a", 30.0), ("a", 20.0), ("b", 50.0), ("c", 50.0)]
    df = spark.createDataFrame(rows, "k string, v double")
    got = {r["k"]: r for r in abc_classes(df, "k", "v").collect()}
    assert got["a"]["value"] == 50.0  # aggregated duplicate keys
    # all three keys tie at 50: one tie group, cum share 1.0, class C
    assert {got[k]["abc_class"] for k in "abc"} == {"C"}
    assert all(got[k]["cum_share"] == 1.0 for k in "abc")
    with pytest.raises(ValueError):
        abc_classes(df, "k", "v", a_cut=0.9, b_cut=0.8)


# -------------------------------------------------------------------- SAX


def test_sax_step_series_symbols(spark):
    from weaviate_txtai_spark.operators.seasonal import sax_symbols

    # 32 points: first half low (0), second half high (10) -> with 4
    # segments: a/a then d/d
    ys = [0.0] * 16 + [10.0] * 16
    df = spark.createDataFrame(
        [(i, y) for i, y in enumerate(ys)], "t long, y double"
    )
    got = [(r["seg"], r["symbol"])
           for r in sax_symbols(df, n_segments=4).collect()]
    assert got == [(0, "a"), (1, "a"), (2, "d"), (3, "d")]


def test_sax_matches_closed_form_z(spark):
    from weaviate_txtai_spark.operators.seasonal import sax_symbols

    ys = [1.0, 2.0, 3.0, 4.0, 5.0, 6.0]
    df = spark.createDataFrame(
        [(i, y) for i, y in enumerate(ys)], "t long, y double"
    )
    rows = {r["seg"]: r for r in sax_symbols(df, n_segments=3).collect()}
    mu = sum(ys) / 6
    sd = math.sqrt(sum((y - mu) ** 2 for y in ys) / 6)
    for seg, pair in enumerate([(1.0, 2.0), (3.0, 4.0), (5.0, 6.0)]):
        want = round((sum(pair) / 2 - mu) / sd, 6)
        assert rows[seg]["paa_z"] == pytest.approx(want, abs=1e-9)
        assert rows[seg]["n_points"] == 2


def test_sax_constant_series_and_validation(spark):
    from weaviate_txtai_spark.operators.seasonal import sax_symbols

    df = spark.createDataFrame(
        [(i, 7.0) for i in range(8)], "t long, y double"
    )
    rows = sax_symbols(df, n_segments=2).collect()
    assert all(r["paa_z"] is None and r["symbol"] == "b" for r in rows)
    with pytest.raises(ValueError):
        sax_symbols(df, n_segments=0)
