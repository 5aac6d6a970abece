"""operators/stringjoin.edit_distance_join, changepoint.cusum,
profile.benford."""

import math
import random

import pytest

from weaviate_txtai_spark.operators.changepoint import cusum
from weaviate_txtai_spark.operators.profile import benford
from weaviate_txtai_spark.operators.stringjoin import edit_distance_join


# ------------------------------------------------------ edit-distance join


def _lev(a, b):
    dp = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        prev, dp[0] = dp[0], i
        for j, cb in enumerate(b, 1):
            prev, dp[j] = dp[j], min(
                dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb)
            )
    return dp[len(b)]


def _brute_pairs(strs, k):
    out = set()
    ids = sorted(strs)
    for i in ids:
        for j in ids:
            if i < j and _lev(strs[i], strs[j]) <= k:
                out.add((i, j))
    return out


def test_join_matches_bruteforce(spark):
    rng = random.Random(3)
    vocab = "abcde"
    strs = {}
    base = ["".join(rng.choice(vocab) for _ in range(10)) for _ in range(30)]
    n = 0
    for s in base:
        strs[n] = s; n += 1
        # a 1-edit neighbor: substitution at a random position
        p = rng.randrange(10)
        strs[n] = s[:p] + rng.choice(vocab) + s[p + 1:]; n += 1
    df = spark.createDataFrame(list(strs.items()), ["id", "s"]).repartition(5)
    got = {
        (r.id1, r.id2)
        for r in edit_distance_join(df, "id", "s", k=1).collect()
    }
    assert got == _brute_pairs(strs, 1)


def test_join_k2(spark):
    strs = {0: "kitten", 1: "sitten", 2: "sittin", 3: "bitten", 4: "mitten",
            5: "flying", 6: "frying", 7: "crying"}
    df = spark.createDataFrame(list(strs.items()), ["id", "s"])
    got = {
        (r.id1, r.id2): r.dist
        for r in edit_distance_join(df, "id", "s", k=2).collect()
    }
    want = {
        (i, j): _lev(strs[i], strs[j])
        for (i, j) in _brute_pairs(strs, 2)
    }
    assert got == want


def test_join_short_strings(spark):
    # all below the q-gram bound: must come from the short pool
    strs = {0: "a", 1: "b", 2: "ab", 3: "ba", 4: "abc"}
    df = spark.createDataFrame(list(strs.items()), ["id", "s"])
    got = {
        (r.id1, r.id2)
        for r in edit_distance_join(df, "id", "s", k=1).collect()
    }
    assert got == _brute_pairs(strs, 1)


def test_join_boundary_lengths(spark):
    # lengths straddling lmin = q(k+1) = 4: "abc" (3, short pool) vs
    # "abcd" (4, long pool) at distance 1 must cross the boundary path
    strs = {0: "abc", 1: "abcd", 2: "abcde", 3: "zzzz"}
    df = spark.createDataFrame(list(strs.items()), ["id", "s"])
    got = {
        (r.id1, r.id2)
        for r in edit_distance_join(df, "id", "s", k=1).collect()
    }
    assert got == _brute_pairs(strs, 1)
    assert (0, 1) in got and (1, 2) in got


def test_join_no_false_pairs(spark):
    strs = {0: "aaaaaaaa", 1: "bbbbbbbb", 2: "cccccccc"}
    df = spark.createDataFrame(list(strs.items()), ["id", "s"])
    assert edit_distance_join(df, "id", "s", k=2).count() == 0


# ------------------------------------------------------------------ cusum


def _py_cusum(xs, target, drift):
    sp = sn = 0.0
    out = []
    for x in xs:
        sp = max(0.0, sp + (x - target - drift))
        sn = max(0.0, sn - (x - target + drift))
        out.append((sp, sn))
    return out


def test_cusum_matches_recursion(spark):
    rng = random.Random(5)
    xs = [10 + rng.gauss(0, 1) for _ in range(30)] + [
        13 + rng.gauss(0, 1) for _ in range(20)
    ]
    rows = [("g", i, float(x)) for i, x in enumerate(xs)]
    df = spark.createDataFrame(rows, ["g", "t", "x"]).repartition(4)
    got = {
        r.t: (r.s_pos, r.s_neg)
        for r in cusum(df, "g", "t", "x", target=10.0, drift=0.5).collect()
    }
    for t, (sp, sn) in enumerate(_py_cusum(xs, 10.0, 0.5)):
        assert got[t][0] == pytest.approx(round(sp, 6), abs=2e-6), t
        assert got[t][1] == pytest.approx(round(sn, 6), abs=2e-6), t


def test_cusum_detects_shift_direction(spark):
    xs = [10.0] * 20 + [14.0] * 10
    rows = [("g", i, x) for i, x in enumerate(xs)]
    df = spark.createDataFrame(rows, ["g", "t", "x"])
    res = cusum(
        df, "g", "t", "x", target=10.0, drift=0.5, threshold=5.0
    ).collect()
    alarms = sorted(r.t for r in res if r.alarm)
    assert alarms and min(alarms) >= 20  # fires only after the shift
    assert all(r.s_neg == 0.0 for r in res)  # upward shift only


def test_cusum_per_group_independent(spark):
    rows = [("a", i, 10.0) for i in range(5)] + [
        ("b", i, 20.0) for i in range(5)
    ]
    df = spark.createDataFrame(rows, ["g", "t", "x"])
    got = {
        (r.g, r.t): r.s_pos
        for r in cusum(df, "g", "t", "x", target=10.0).collect()
    }
    assert all(got[("a", t)] == 0.0 for t in range(5))
    assert got[("b", 4)] == 50.0  # 5 × (20−10), no cross-group bleed


# ---------------------------------------------------------------- benford


def test_benford_exact_fractions(spark):
    # 1 appears 4x, 2 2x, 9 2x -> fractions over 8
    vals = [1.0, 10.0, 199.0, 0.015, 2.0, 25.0, 9.0, 0.95]
    df = spark.createDataFrame([(v,) for v in vals], ["v"])
    got = {r.digit: r for r in benford(df, "v").collect()}
    assert {d: got[d].n for d in got} == {1: 4, 2: 2, 9: 2}
    assert got[1].observed == 0.5
    assert got[1].expected == round(math.log10(2), 6)
    tot = 8
    exp = math.log10(2)
    assert got[1].chi2_term == pytest.approx(
        round(tot * (0.5 - exp) ** 2 / exp, 6), abs=2e-6
    )


def test_benford_drops_nonpositive(spark):
    df = spark.createDataFrame(
        [(0.0,), (-5.0,), (None,), (3.0,)], "v double"
    )
    rows = benford(df, "v").collect()
    assert len(rows) == 1 and rows[0].digit == 3 and rows[0].n == 1
