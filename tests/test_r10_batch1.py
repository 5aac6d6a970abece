"""Round-10 operator batch: Kendall τ-b, exact single changepoint,
Heaps'-law fit, Bernoulli SPRT, and the 2-D skyline — each pinned
against hand-computed or brute-force references."""

import itertools
import math

import pytest

from pyspark.sql import functions as F


# ------------------------------------------------------------ kendall


def _brute_tau_b(xy):
    n = len(xy)
    C = D = tx = ty = 0
    for (x1, y1), (x2, y2) in itertools.combinations(xy, 2):
        if x1 == x2 and y1 == y2:
            tx += 1
            ty += 1
        elif x1 == x2:
            tx += 1
        elif y1 == y2:
            ty += 1
        elif (x1 < x2) == (y1 < y2):
            C += 1
        else:
            D += 1
    n0 = n * (n - 1) // 2
    denom = math.sqrt((n0 - tx) * (n0 - ty))
    return C, D, tx, ty, (C - D) / denom if denom else None


def test_kendall_tau_matches_brute_force(spark):
    from weaviate_txtai_spark.operators.rankstats import kendall_tau_b

    import random

    rng = random.Random(5)
    xy = [(rng.randint(0, 6), rng.randint(0, 4)) for _ in range(80)]
    df = spark.createDataFrame(xy, "x int, y int")
    r = kendall_tau_b(df, "x", "y").collect()[0]
    C, D, tx, ty, tau = _brute_tau_b(xy)
    assert (r.n, r.n_concordant, r.n_discordant) == (80, C, D)
    assert (r.tie_x, r.tie_y) == (tx, ty)
    assert r.tau_b == round(tau, 6)


def test_kendall_tau_cell_cap_guards_quadratic(spark):
    from weaviate_txtai_spark.operators.rankstats import kendall_tau_b

    df = spark.createDataFrame(
        [(i, i * 3 % 17) for i in range(50)], "x int, y int"
    )
    with pytest.raises(ValueError, match="bucket"):
        kendall_tau_b(df, "x", "y", max_cells=10)
    # within the cap it runs
    assert kendall_tau_b(df, "x", "y", max_cells=1000).count() == 1


def test_kendall_tau_perfect_and_constant(spark):
    from weaviate_txtai_spark.operators.rankstats import kendall_tau_b

    mono = spark.createDataFrame(
        [(i, i * 2) for i in range(10)], "x int, y int"
    )
    assert kendall_tau_b(mono, "x", "y").collect()[0].tau_b == 1.0
    anti = spark.createDataFrame(
        [(i, -i) for i in range(10)], "x int, y int"
    )
    assert kendall_tau_b(anti, "x", "y").collect()[0].tau_b == -1.0
    const = spark.createDataFrame(
        [(i, 7) for i in range(10)], "x int, y int"
    )
    assert kendall_tau_b(const, "x", "y").collect()[0].tau_b is None
    # constant X empties the cell-pair join entirely: the C/D counts
    # must come back 0 (a bare sum over zero rows is NULL), tau NULL
    constx = spark.createDataFrame(
        [(7, i) for i in range(10)], "x int, y int"
    )
    row = kendall_tau_b(constx, "x", "y").collect()[0]
    assert row.tau_b is None
    assert row.n_concordant == 0 and row.n_discordant == 0


# -------------------------------------------------------- changepoint


def test_changepoint_finds_planted_shift(spark):
    from weaviate_txtai_spark.operators.seasonal import single_changepoint

    ys = [10] * 20 + [30] * 15
    df = spark.createDataFrame(
        list(enumerate(ys)), "t long, y long"
    )
    r = single_changepoint(df).collect()[0]
    assert r.k == 20 and r.n == 35
    assert r.mean_before == 10.0 and r.mean_after == 30.0


def test_changepoint_matches_brute_sse(spark):
    from weaviate_txtai_spark.operators.seasonal import single_changepoint

    import random

    rng = random.Random(11)
    ys = [rng.randint(0, 50) for _ in range(40)]
    df = spark.createDataFrame(list(enumerate(ys)), "t long, y long")
    r = single_changepoint(df).collect()[0]

    def sse(vals):
        m = sum(vals) / len(vals)
        return sum((v - m) ** 2 for v in vals)

    best = min(
        range(1, 40), key=lambda k: (sse(ys[:k]) + sse(ys[k:]), k)
    )
    assert r.k == best


def test_changepoint_tie_breaks_small_k(spark):
    from weaviate_txtai_spark.operators.seasonal import single_changepoint

    # symmetric series: k=1 and k=3 tie on BSS; smaller k wins
    df = spark.createDataFrame(
        [(0, 5), (1, 0), (2, 0), (3, 5)], "t long, y long"
    )
    r = single_changepoint(df).collect()[0]
    assert r.k == 1


def test_changepoint_validation(spark):
    from weaviate_txtai_spark.operators.seasonal import single_changepoint

    one = spark.createDataFrame([(0, 1)], "t long, y long")
    with pytest.raises(ValueError):
        single_changepoint(one)


# -------------------------------------------------------------- heaps


def test_heaps_fit_pure_power_law(spark):
    """A stream where every doc holds 8 tokens of which exactly 2 are
    new types gives V = N/4 exactly — β = 1, K = 0.25."""
    from weaviate_txtai_spark.operators.profile import heaps_fit

    # every doc: 2 brand-new types + 6 repeats of one stopword
    rows = []
    for d in range(40):
        rows.append((d, f"new{2 * d}"))
        rows.append((d, f"new{2 * d + 1}"))
        rows += [(d, "stopword")] * 6
    df = spark.createDataFrame(rows, "doc long, tok string")
    r = heaps_fit(df, "doc", "tok", step=5).collect()[0]
    assert r.n_checkpoints == 8
    assert r.total_tokens == 40 * 8
    assert r.vocab == 2 * 40 + 1
    # V = N/4 + 1 ⇒ slope → 1 asymptotically; the +1 bends the finite
    # fit slightly below (measured 0.962)
    assert abs(r.heaps_beta - 1.0) < 0.05
    assert 0.2 < r.heaps_k < 0.4
    assert r.r2 > 0.999


def test_heaps_fit_saturated_vocab(spark):
    """All docs reuse one tiny vocabulary: V flat ⇒ β ≈ 0."""
    from weaviate_txtai_spark.operators.profile import heaps_fit

    rows = [
        (d, f"w{j % 5}") for d in range(30) for j in range(10)
    ]
    df = spark.createDataFrame(rows, "doc long, tok string")
    r = heaps_fit(df, "doc", "tok", step=5).collect()[0]
    assert r.vocab == 5
    assert abs(r.heaps_beta) < 0.01


def test_heaps_fit_validation(spark):
    from weaviate_txtai_spark.operators.profile import heaps_fit

    df = spark.createDataFrame([(0, "a")], "doc long, tok string")
    with pytest.raises(ValueError):
        heaps_fit(df, "doc", "tok", step=0)


# --------------------------------------------------------------- sprt


def test_sprt_accepts_h1_on_high_rate(spark):
    from weaviate_txtai_spark.operators.abtest import sprt_bernoulli

    # 30% success rate vs H0 p=0.1 / H1 p=0.2: accept H1 quickly
    periods = [(t, 100, 30) for t in range(20)]
    df = spark.createDataFrame(periods, "t long, n long, s long")
    r = sprt_bernoulli(df, "t", "n", "s", p0=0.1, p1=0.2).collect()[0]
    assert r.decision == "accept_h1"
    assert r.stop_period == 0  # one 100-trial batch at 30% is enough
    assert r.llr_scaled >= r.a_scaled


def test_sprt_accepts_h0_on_low_rate(spark):
    from weaviate_txtai_spark.operators.abtest import sprt_bernoulli

    periods = [(t, 100, 5) for t in range(20)]
    df = spark.createDataFrame(periods, "t long, n long, s long")
    r = sprt_bernoulli(df, "t", "n", "s", p0=0.1, p1=0.2).collect()[0]
    assert r.decision == "accept_h0"
    assert r.llr_scaled <= r.b_scaled


def test_sprt_continues_between_boundaries(spark):
    from weaviate_txtai_spark.operators.abtest import sprt_bernoulli

    # 2 successes in 14 trials: LLR strictly between B and A
    df = spark.createDataFrame([(0, 14, 2)], "t long, n long, s long")
    r = sprt_bernoulli(df, "t", "n", "s", p0=0.1, p1=0.2).collect()[0]
    assert r.decision == "continue"
    assert r.b_scaled < r.llr_scaled < r.a_scaled
    assert (r.k_success, r.n_trials) == (2, 14)


def test_sprt_walk_matches_hand_llr(spark):
    from weaviate_txtai_spark.operators.abtest import (
        sprt_bernoulli,
        sprt_constants,
    )

    c = sprt_constants(0.1, 0.2)
    periods = [(0, 10, 3), (1, 10, 1), (2, 10, 4)]
    df = spark.createDataFrame(periods, "t long, n long, s long")
    r = sprt_bernoulli(df, "t", "n", "s", p0=0.1, p1=0.2).collect()[0]
    # walk by hand: stops wherever the exact integer walk stops
    k = n = 0
    for t, nn, s in periods:
        k += s
        n += nn
        llr = k * c["c1"] + (n - k) * c["c0"]
        if llr >= c["a"] or llr <= c["b"]:
            break
    assert r.llr_scaled == llr
    assert r.stop_period == t or r.decision == "continue"


def test_sprt_validation(spark):
    from weaviate_txtai_spark.operators.abtest import sprt_bernoulli

    df = spark.createDataFrame([(0, 10, 1)], "t long, n long, s long")
    with pytest.raises(ValueError):
        sprt_bernoulli(df, "t", "n", "s", p0=0.3, p1=0.2)
    empty = df.filter(F.lit(False))
    with pytest.raises(ValueError):
        sprt_bernoulli(empty, "t", "n", "s", p0=0.1, p1=0.2)


# ------------------------------------------------------------ skyline


def _brute_skyline(points):
    out = []
    for i, (pid, x, y) in enumerate(points):
        dominated = any(
            (x2 >= x and y2 >= y and (x2 > x or y2 > y))
            for _, x2, y2 in points
        )
        if not dominated:
            out.append((pid, x, y))
    return sorted(out)


def test_skyline_matches_brute_force(spark):
    from weaviate_txtai_spark.operators.skyline import skyline_2d

    import random

    rng = random.Random(3)
    pts = [(i, rng.randint(0, 1000), rng.randint(0, 1000))
           for i in range(300)]
    df = spark.createDataFrame(pts, "id long, x long, y long")
    got = sorted(
        (r.id, r.x, r.y) for r in skyline_2d(df, "id", "x", "y").collect()
    )
    assert got == _brute_skyline(pts)


def test_skyline_duplicates_and_ties(spark):
    from weaviate_txtai_spark.operators.skyline import skyline_2d

    # two identical best points: both kept (dominance needs one strict)
    pts = [(1, 10, 10), (2, 10, 10), (3, 5, 20), (4, 5, 19), (5, 1, 1)]
    df = spark.createDataFrame(pts, "id long, x long, y long")
    got = sorted(r.id for r in skyline_2d(df, "id", "x", "y").collect())
    assert got == [1, 2, 3]


def test_skyline_single_bucket_path(spark):
    from weaviate_txtai_spark.operators.skyline import skyline_2d

    pts = [(i, i, 100 - i) for i in range(20)]  # anti-chain: all kept
    df = spark.createDataFrame(pts, "id long, x long, y long")
    assert skyline_2d(df, "id", "x", "y", n_buckets=1).count() == 20
    assert skyline_2d(df, "id", "x", "y", n_buckets=50).count() == 20


# ------------------------------------- review-fix regressions (r10 cont.)

def test_heaps_fit_negative_and_huge_doc_ids(spark):
    """Bucketing is integer div (truncating), not a double-precision
    division: negative ids bucket like DuckDB's // and ids above 2^53
    do not collapse into each other."""
    from weaviate_txtai_spark.operators.profile import heaps_fit

    big = 2**60
    rows = [(d, t) for d in (-3, -1, 0, 1, big, big + 1)
            for t in (f"tok{d}", "shared")]
    dt = spark.createDataFrame(rows, "doc_id long, term string")
    out = heaps_fit(dt, "doc_id", "term", step=2).collect()[0]
    # buckets: -3 div 2 = -1, -1 div 2 = 0 (trunc!), 0,1 -> 0,
    # big and big+1 -> same distinct huge bucket => 3 checkpoints
    assert out.n_checkpoints == 3
    assert out.total_tokens == 12
    assert out.vocab == 7  # 6 unique tok{d} + "shared"


def test_permutation_labels_valid_for_negative_unit_ids(spark):
    """pmod keeps the permutation hash label in {0,1} for negative unit
    ids (plain % gave __pt = -1, corrupting arm counts)."""
    from weaviate_txtai_spark.operators.abtest import (
        permutation_test_rates,
    )

    rows = [(u, 1 if u % 2 == 0 else 0, 1 if u % 3 == 0 else 0)
            for u in range(-20, 20)]
    df = spark.createDataFrame(rows, "u long, t int, y int")
    out = permutation_test_rates(df, "u", "t", "y", n_perms=16).collect()[0]
    # every permutation must partition all 40 units into the two arms
    assert out.n1 + out.n0 == 40
    assert 0.0 < out.p_value <= 1.0
    # label validity: with plain %, negative ids gave __pt = -1 and
    # n_extreme could exceed n_perms; pmod keeps it bounded
    assert 0 <= out.n_extreme <= out.n_perms


def test_logrank_chi2_exact_rational_rounding(spark):
    """chi2 is rounded half-away in exact integer arithmetic (no float
    round path): parity against the hand-computed rational."""
    from weaviate_txtai_spark.operators.survival import logrank_test

    rows = ([("A", t, 1) for t in (1, 2, 3, 5)]
            + [("B", t, 1) for t in (2, 4, 6, 8)]
            + [("A", 9, 0), ("B", 9, 0)])
    df = spark.createDataFrame(rows, "variant string, t int, e int")
    out = logrank_test(df, "t", "e", "variant").collect()[0]
    assert out.chi2 is not None
    # recompute from the emitted exact aggregates: the emitted chi2 must
    # be the half-away 6dp rounding of (o1 - e1)^2 / v
    import math
    expect = (out.o1 - out.e1) ** 2 / out.v
    assert math.isclose(out.chi2, expect, rel_tol=0, abs_tol=5e-6)
