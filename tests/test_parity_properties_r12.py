"""r12 randomized parity oracles (VERDICT r11 task 5): extend the r11
program to families that lacked one — graph (SCC vs brute-force
transitive closure; exact-integer PPR vs a Python replay of the same
fixed-point arithmetic), survival (Kaplan-Meier vs a hand-rolled
product-limit), and conformal (qhat vs a direct rank computation) —
plus the two r12 end-product kernels: capped weighted water-filling vs
the textbook iterative cap-and-redistribute algorithm, and the
decontamination signals (containment + winnowed-fingerprint overlap)
vs a pure-Python window/winnow brute force on random tiny corpora.

Each oracle is an INDEPENDENT re-derivation (no Spark, no shared
helpers), so agreement on randomized inputs is evidence the plan
computes the intended statistic, not merely that it is deterministic.
"""

import math

from hypothesis import HealthCheck, given, settings, strategies as st

_SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


# ---------------------------------------------------------------- SCC

@st.composite
def _digraph(draw):
    n = draw(st.integers(2, 7))
    m = draw(st.integers(1, 14))
    e = st.integers(0, n - 1)
    edges = sorted({(draw(e), draw(e)) for _ in range(m)})
    return edges


def _scc_bruteforce(edges):
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    reach = {u: {u} for u in nodes}
    adj = {u: set() for u in nodes}
    for u, v in edges:
        adj[u].add(v)
    changed = True
    while changed:  # transitive closure to fixpoint
        changed = False
        for u in nodes:
            new = set(reach[u])
            for v in list(new):
                new |= adj[v]
            if new != reach[u]:
                reach[u] = new
                changed = True
    return {
        u: min(v for v in nodes if u in reach[v] and v in reach[u])
        for u in nodes
    }


@settings(**_SETTINGS)
@given(edges=_digraph())
def test_scc_matches_bruteforce_closure(spark, edges):
    from weaviate_txtai_spark.operators.graph import (
        strongly_connected_components,
    )

    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["node"]: r["scc"]
        for r in strongly_connected_components(df).collect()
    }
    assert got == _scc_bruteforce(edges)


# ---------------------------------------------------------------- PPR

@settings(**_SETTINGS)
@given(edges=_digraph(), n_seed=st.integers(1, 3))
def test_ppr_matches_python_integer_replay(spark, edges, n_seed):
    from weaviate_txtai_spark.operators.graph import (
        personalized_pagerank_exact,
    )

    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    seeds = nodes[:n_seed]
    num, den, scale, iters = 85, 100, 10**9, 3

    df = spark.createDataFrame(edges, "src long, dst long")
    sdf = spark.createDataFrame([(s,) for s in seeds], "id long")
    got = {
        r["id"]: r["rank_fp"]
        for r in personalized_pagerank_exact(
            df, sdf, iters=iters, damping_num=num, damping_den=den,
            scale=scale,
        ).collect()
    }

    # independent replay of the documented exact-integer fixpoint
    deg = {}
    for u, _ in edges:
        deg[u] = deg.get(u, 0) + 1
    ns = len(seeds)
    base = ((den - num) * scale) // (den * ns)
    r = {u: (scale // ns if u in seeds else 0) for u in nodes}
    for _ in range(iters):
        dm = sum(r[u] for u in nodes if u not in deg)
        mass = {u: 0 for u in nodes}
        for u, v in edges:
            mass[v] += r[u] // deg[u]
        r = {
            u: (base if u in seeds else 0)
            + (num * (mass[u] + (dm // ns if u in seeds else 0))) // den
            for u in nodes
        }
    assert got == r


# ------------------------------------------------------- Kaplan-Meier

@st.composite
def _survival_case(draw):
    n = draw(st.integers(1, 16))
    return [
        (
            draw(st.integers(0, 1)),          # group
            draw(st.integers(1, 8)),          # duration
            draw(st.integers(0, 1)),          # event (0 = censored)
        )
        for _ in range(n)
    ]


def _km_bruteforce(rows):
    out = {}
    for g in sorted({g for g, _, _ in rows}):
        subj = [(t, e) for gg, t, e in rows if gg == g]
        times = sorted({t for t, _ in subj})
        s = 1.0
        for t in times:
            n_risk = sum(1 for tt, _ in subj if tt >= t)
            n_ev = sum(1 for tt, e in subj if tt == t and e == 1)
            n_cs = sum(1 for tt, e in subj if tt == t and e == 0)
            if n_ev == n_risk:
                s = 0.0
            elif s > 0.0:
                # mirror the plan's exp(sum(log)) fold, not a direct
                # product: the two differ in the last ulp and the
                # comparison below is exact after rounding
                s = math.exp(
                    math.fsum(0.0 for _ in ())
                    + sum(
                        math.log(1 - ne / nr)
                        for nr, ne in _factors(subj, t)
                    )
                )
            out[(g, t)] = (n_risk, n_ev, n_cs, round(s, 6))
    return out


def _factors(subj, upto):
    for t in sorted({tt for tt, _ in subj}):
        if t > upto:
            return
        n_risk = sum(1 for tt, _ in subj if tt >= t)
        n_ev = sum(1 for tt, e in subj if tt == t and e == 1)
        if 0 < n_ev < n_risk:
            yield n_risk, n_ev


@settings(**_SETTINGS)
@given(rows=_survival_case())
def test_kaplan_meier_matches_product_limit(spark, rows):
    from weaviate_txtai_spark.operators.survival import kaplan_meier

    df = spark.createDataFrame(rows, "grp long, dur long, ev long")
    got = {
        (r["grp"], r["dur"]): (
            r["n_risk"], r["n_events"], r["n_censored"], r["survival"]
        )
        for r in kaplan_meier(df, "dur", "ev", group_col="grp").collect()
    }
    want = _km_bruteforce(rows)
    assert set(got) == set(want)
    for key in want:
        gr, wr = got[key], want[key]
        assert gr[:3] == wr[:3], (key, gr, wr)
        assert abs(gr[3] - wr[3]) <= 1e-6, (key, gr, wr)


# ----------------------------------------------------------- conformal

@st.composite
def _conformal_case(draw):
    n = draw(st.integers(1, 24))
    vals = st.integers(-50, 50)
    return [(draw(vals) / 10.0, draw(vals) / 10.0) for _ in range(n)]


@settings(**_SETTINGS)
@given(rows=_conformal_case(), alpha=st.sampled_from([0.1, 0.25, 0.5]))
def test_conformal_qhat_matches_rank_oracle(spark, rows, alpha):
    from weaviate_txtai_spark.operators.conformal import conformal_qhat

    df = spark.createDataFrame(rows, "pred double, actual double")
    got = conformal_qhat(df, "pred", "actual", alpha=alpha).collect()[0]

    res = sorted(round(abs(p - a), 6) for p, a in rows)
    n = len(res)
    k = math.ceil((n + 1) * (1 - alpha))
    want = res[k - 1] if k <= n else None
    assert got["n_cal"] == n
    assert got["k"] == k
    if want is None:
        assert got["qhat"] is None
    else:
        assert abs(got["qhat"] - want) <= 1e-9


# ------------------------------------------- capped weighted waterfill

@st.composite
def _waterfill_case(draw):
    n = draw(st.integers(1, 8))
    rows = [
        (
            f"s{i}",
            draw(st.integers(0, 20)),       # weight
            draw(st.integers(0, 1000)),     # cap
        )
        for i in range(n)
    ]
    budget = draw(st.integers(0, 3000))
    return rows, budget


def _waterfill_iterative(rows, budget):
    """Independent oracle: iterative cap-and-redistribute (the textbook
    weighted max-min fairness algorithm) instead of the closed-form
    theta construction."""
    alloc = {k: 0.0 for k, _, _ in rows}
    active = {k: (w, c) for k, w, c in rows if w > 0}
    b = float(budget)
    while active and b > 1e-12:
        tw = sum(w for w, _ in active.values())
        theta = b / tw
        capped = {k for k, (w, c) in active.items() if c <= theta * w + 1e-12}
        if not capped:
            for k, (w, c) in active.items():
                alloc[k] = theta * w
            return alloc
        for k in capped:
            w, c = active.pop(k)
            alloc[k] = float(c)
            b -= c
    return alloc


@settings(**_SETTINGS)
@given(case=_waterfill_case())
def test_capped_waterfill_matches_iterative_oracle(spark, case):
    from weaviate_txtai_spark.operators.budget import (
        capped_weighted_waterfill,
    )

    rows, budget = case
    df = spark.createDataFrame(rows, "source string, weight long, cap long")
    got = {
        r["source"]: r["alloc"]
        for r in capped_weighted_waterfill(df, budget).collect()
    }
    want = _waterfill_iterative(rows, budget)
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) <= 1e-5, (k, got[k], want[k], case)
    # the invariant the solver promises: sum alloc = min(budget, sum cap
    # over positive-weight sources)
    cap_pos = sum(c for _, w, c in rows if w > 0)
    assert abs(sum(got.values()) - min(budget, cap_pos)) <= 1e-4


# --------------------------------------- decontamination report signals

def _tokens(text):
    return [t for t in text.split(" ") if t != ""]


def _containment_brute(ev_text, train_texts, k):
    toks = _tokens(ev_text)
    if len(toks) < k:
        return 0, None
    wins = {
        " ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)
    }
    train = set()
    for t in train_texts:
        tt = _tokens(t)
        train |= {
            " ".join(tt[i : i + k]) for i in range(len(tt) - k + 1)
        }
    hit = len(wins & train)
    return len(wins), round(hit / len(wins), 6)


def _winnow_brute(text, k, w):
    """Independent re-derivation of the repo's winnowing fingerprints
    (rightmost-min over k-gram rolling hashes, short-doc single window)."""
    toks = _tokens(text)
    th = [(ord(t[0]) * 31 + len(t)) for t in toks]
    if len(th) < k:
        return set()
    kg = []
    for i in range(len(th) - k + 1):
        a = 0
        for x in th[i : i + k]:
            a = (a * 131 + x) % 1_000_000_007
        kg.append(a)
    wl = min(len(kg), w)
    fps = set()
    for j in range(len(kg) - wl + 1):
        best, pos = 1_000_000_008, -1
        for p in range(j, j + wl):
            if kg[p] <= best:
                best, pos = kg[p], p
        fps.add(best)
    return fps


@st.composite
def _decontam_case(draw):
    vocab = ["aa", "bb", "cc", "dd", "ee", "ff"]
    word = st.sampled_from(vocab)

    def text(lo, hi):
        n = draw(st.integers(lo, hi))
        return " ".join(draw(word) for _ in range(n))

    train = [(i, text(0, 14)) for i in range(draw(st.integers(1, 3)))]
    ev = [(100 + i, text(0, 14)) for i in range(draw(st.integers(1, 3)))]
    return train, ev


@settings(**_SETTINGS)
@given(case=_decontam_case())
def test_decontamination_signals_match_bruteforce(spark, case):
    from weaviate_txtai_spark.operators.passages import (
        decontamination_report,
    )

    train, ev = case
    k, wk, ww = 4, 3, 2
    tdf = spark.createDataFrame(train, "doc_id long, text string")
    edf = spark.createDataFrame(ev, "doc_id long, text string")
    got = {
        r["doc_id"]: r.asDict()
        for r in decontamination_report(
            edf, tdf, k=k, winnow_k=wk, winnow_w=ww
        ).collect()
    }
    train_fps = set()
    for _, t in train:
        train_fps |= _winnow_brute(t, wk, ww)
    assert set(got) == {d for d, _ in ev}
    for d, text in ev:
        r = got[d]
        n_win, cont = _containment_brute(
            text, [t for _, t in train], k
        )
        assert r["n_windows"] == n_win, (d, text)
        assert (r["containment"] is None) == (cont is None)
        if cont is not None:
            assert abs(r["containment"] - cont) <= 1e-6
        fps = _winnow_brute(text, wk, ww)
        assert r["n_fps"] == len(fps), (d, text)
        if fps:
            want = round(len(fps & train_fps) / len(fps), 6)
            assert abs(r["fp_overlap"] - want) <= 1e-6
        else:
            assert r["fp_overlap"] is None
