"""Property tests (hypothesis) for the r10 fixed-point kernels — all
pure driver-side Python, no Spark session needed: EM fit invariants,
apportionment sum exactness, and SPRT constant ordering."""

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=100, deadline=None)
@given(
    counts=st.lists(
        st.integers(min_value=0, max_value=10**9), min_size=8, max_size=8
    ).filter(lambda c: sum(c) > 0),
    n_iter=st.integers(min_value=1, max_value=20),
)
def test_em_fit_params_stay_clamped_and_deterministic(counts, n_iter):
    from weaviate_txtai_spark.operators.recordlinkage import fs_em_fit

    pc = dict(enumerate(counts))
    fit = fs_em_fit(pc, 3, n_iter=n_iter)
    sc = fit["scale"]
    for t in fit["trajectory"]:
        for v in [t["p"], *t["m"], *t["u"]]:
            assert 1 <= v <= sc - 1
    assert fs_em_fit(pc, 3, n_iter=n_iter) == fit
    assert len(fit["trajectory"]) == n_iter


@settings(max_examples=60, deadline=None)
@given(
    p0=st.floats(min_value=0.01, max_value=0.5),
    delta=st.floats(min_value=0.01, max_value=0.4),
    alpha=st.floats(min_value=0.001, max_value=0.2),
    beta=st.floats(min_value=0.001, max_value=0.2),
)
def test_sprt_constants_ordering(p0, delta, alpha, beta):
    from weaviate_txtai_spark.operators.abtest import sprt_constants

    p1 = min(p0 + delta, 0.99)
    c = sprt_constants(p0, p1, alpha=alpha, beta=beta)
    # success increments evidence toward H1, failure toward H0;
    # boundaries bracket zero
    assert c["c1"] > 0 > c["c0"]
    assert c["a"] > 0 > c["b"]


@settings(max_examples=60, deadline=None)
@given(
    ys=st.lists(
        st.integers(min_value=0, max_value=10**6), min_size=2, max_size=60
    )
)
def test_changepoint_pure_fold_matches_brute(ys):
    """The integer-score argmax must equal the SSE-minimizing split
    with smaller-k ties — checked on the pure fold logic via a local
    replica (no Spark needed for the arithmetic property)."""
    n = len(ys)
    total = sum(ys)

    def int_best():
        best_k, best_score = None, -1
        s1 = 0
        for k in range(1, n):
            s1 += ys[k - 1]
            d = s1 * n - total * k
            score = d * d * 10**6 // (k * (n - k))
            if score > best_score:
                best_k, best_score = k, score
        return best_k

    from fractions import Fraction

    def sse_best():
        def sse(vals):
            if not vals:
                return Fraction(0)
            m = Fraction(sum(vals), len(vals))
            return sum((v - m) ** 2 for v in vals)

        return min(range(1, n), key=lambda k: (sse(ys[:k]) + sse(ys[k:]), k))

    # the 1e6-scaled truncation can only reorder EXACT ties in BSS;
    # verify the chosen k's exact BSS is >= the SSE-optimal k's BSS
    # minus nothing (they must agree except on exact-tie groups where
    # any member is valid — the fold picks the smallest in its group)
    ki, ks = int_best(), sse_best()
    if ki != ks:
        def bss(k):
            d = sum(ys[:k]) * n - total * k
            return Fraction(d * d, k * (n - k))

        assert bss(ki) == bss(ks)


@settings(max_examples=80, deadline=None)
@given(
    durations=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=50),
            st.integers(min_value=0, max_value=1),
        ),
        min_size=1,
        max_size=200,
    )
)
def test_km_fold_monotone_and_bounded(durations):
    """The KM product-limit fold (replicated locally): survival is
    non-increasing, within [0, 1], and equals the exact product under
    Fraction arithmetic to within the 1e-12 fixed-point truncation."""
    from collections import Counter
    from fractions import Fraction

    grp = Counter()
    ev = Counter()
    for t, e in durations:
        grp[t] += 1
        ev[t] += e
    remaining = len(durations)
    s_int, sc = 10**12, 10**12
    s_frac = Fraction(1)
    last = 1.0
    for t in sorted(grp):
        d = ev[t]
        if d > 0:
            n = remaining
            s_int = s_int * (n - d) // n
            s_frac *= Fraction(n - d, n)
            surv = s_int / sc
            assert 0.0 <= surv <= last + 1e-12
            assert abs(surv - float(s_frac)) < 1e-9
            last = surv
        remaining -= grp[t]
