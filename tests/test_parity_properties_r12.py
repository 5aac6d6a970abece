"""r12 randomized parity oracles (VERDICT r11 task 5): extend the r11
program to families that lacked one — graph (SCC vs brute-force
transitive closure; exact-integer PPR vs a Python replay of the same
fixed-point arithmetic), survival (Kaplan-Meier vs a hand-rolled
product-limit), and conformal (qhat vs a direct rank computation).

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
