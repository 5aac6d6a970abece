"""operators/graph.k_core, rankstats.group_percentile_rank."""

import pytest

from weaviate_txtai_spark.operators.graph import k_core
from weaviate_txtai_spark.operators.rankstats import group_percentile_rank


def _clique(nodes):
    return [(a, b) for a in nodes for b in nodes if a < b]


def test_kcore_of_cliques(spark):
    # K5 survives k=3; K3 does not; K4 exactly at k=3 (degree 3)
    edges = _clique([1, 2, 3, 4, 5]) + _clique([10, 11, 12]) + _clique(
        [20, 21, 22, 23]
    )
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {r.node: r.degree for r in k_core(df, 3).collect()}
    assert got == {**{n: 4 for n in [1, 2, 3, 4, 5]},
                   **{n: 3 for n in [20, 21, 22, 23]}}


def test_kcore_cascade_peels_path(spark):
    # a tail path hanging off a cycle: the 2-core is exactly the cycle;
    # peeling must cascade down the path one layer per round
    cycle = [(1, 2), (2, 3), (3, 4), (4, 1)]
    tail = [(4, 5), (5, 6), (6, 7), (7, 8)]
    df = spark.createDataFrame(cycle + tail, ["src", "dst"])
    got = {r.node: r.degree for r in k_core(df, 2).collect()}
    assert got == {1: 2, 2: 2, 3: 2, 4: 2}


def test_kcore_empty_when_k_too_high(spark):
    df = spark.createDataFrame(_clique([1, 2, 3]), ["src", "dst"])
    assert k_core(df, 5).count() == 0


def test_kcore_ignores_self_loops_and_dupes(spark):
    edges = _clique([1, 2, 3]) + [(1, 1), (2, 2), (1, 2), (2, 1)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {r.node: r.degree for r in k_core(df, 2).collect()}
    assert got == {1: 2, 2: 2, 3: 2}


def test_kcore_raises_past_max_iter(spark):
    # a long path at k=2 peels one end-layer per round: > 2 rounds needed
    path = [(i, i + 1) for i in range(12)]
    df = spark.createDataFrame(path, ["src", "dst"])
    with pytest.raises(RuntimeError):
        k_core(df, 2, max_iter=2)


def test_percentile_rank_cume_dist_semantics(spark):
    rows = [("a", 1.0), ("a", 2.0), ("a", 2.0), ("a", 5.0),
            ("b", 7.0), ("b", 9.0)]
    df = spark.createDataFrame(rows, ["g", "v"])
    got = sorted(
        (r.g, r.v, r.pct_rank)
        for r in group_percentile_rank(df, "v", group_col="g").collect()
    )
    assert got == [
        ("a", 1.0, 0.25), ("a", 2.0, 0.75), ("a", 2.0, 0.75),
        ("a", 5.0, 1.0), ("b", 7.0, 0.5), ("b", 9.0, 1.0),
    ]


def test_percentile_rank_drops_nulls(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("a", None), ("a", 3.0)], "g string, v double"
    )
    got = {r.v: r.pct_rank for r in
           group_percentile_rank(df, "v", group_col="g").collect()}
    assert got == {1.0: 0.5, 3.0: 1.0}


# --------------------------------------------------------- robust z-scores


def test_robust_zscores_hand_computed(spark):
    from weaviate_txtai_spark.operators.profile import robust_zscores

    # group a: values 1..5 + outlier 100. median 3.5? n=6 -> median
    # (3+4)/2 = 3.5; adevs |x-3.5| = 2.5,1.5,.5,.5,1.5,96.5 -> MAD 1.5
    rows = [("a", float(x)) for x in [1, 2, 3, 4, 5, 100]]
    df = spark.createDataFrame(rows, ["g", "v"])
    got = {r.v: r.rz for r in robust_zscores(df, "v", group_col="g").collect()}
    assert got[100.0] == round(0.6745 * (100 - 3.5) / 1.5, 6)
    assert got[3.0] == round(0.6745 * (-0.5) / 1.5, 6)
    flagged = robust_zscores(df, "v", group_col="g", threshold=3.5).collect()
    assert [r.v for r in flagged] == [100.0]


def test_robust_zscores_mad_zero_is_null(spark):
    from weaviate_txtai_spark.operators.profile import robust_zscores

    rows = [("a", 5.0)] * 4 + [("a", 9.0)]
    df = spark.createDataFrame(rows, ["g", "v"])
    got = robust_zscores(df, "v", group_col="g").collect()
    assert all(r.rz is None for r in got)


def test_robust_zscores_exact_int_path(spark):
    """The exact-integer path (added after the docs_robust_zscores
    sf0.1 divergence: the TRUE rz can land exactly on a 1e-6 midpoint,
    where engines rounding doubles disagree) must equal a
    Fraction-based half-away-from-zero reference on every value."""
    from fractions import Fraction

    from weaviate_txtai_spark.operators.profile import robust_zscores

    # 2,10,18 -> med 10, MAD 8: exact rz = ±0.6745 and 0
    df = spark.createDataFrame(
        [("a", 2), ("a", 10), ("a", 18)], ["g", "v"]
    )
    got = {
        r.v: r.rz
        for r in robust_zscores(
            df, "v", group_col="g", exact_int=True
        ).collect()
    }
    assert got == {2: -0.6745, 10: 0.0, 18: 0.6745}

    # 0,5,11,16 -> med 8, MAD 5.5 (both on the half grid): check every
    # value against the exact rational rounded half-away
    df2 = spark.createDataFrame(
        [("a", 0), ("a", 5), ("a", 11), ("a", 16)], ["g", "v"]
    )
    got2 = {
        r.v: r.rz
        for r in robust_zscores(
            df2, "v", group_col="g", exact_int=True
        ).collect()
    }

    def ref(x, med, mad):
        q = Fraction(
            6745 * (2 * x - int(2 * med)) * 10**6, 10**4 * int(2 * mad)
        )
        sign = -1 if q < 0 else 1
        q = abs(q)
        return sign * ((q.numerator * 2 + q.denominator)
                       // (2 * q.denominator)) / 10**6

    for x in (0, 5, 11, 16):
        assert got2[x] == ref(x, 8.0, 5.5), x

    # a true 1e-6 midpoint (the sf0.1 case shape): delta=-3, MAD=8 ->
    # rz = -0.2529375 exactly, half-away -> -0.252938
    assert ref(5, 8.0, 8.0) == -0.252938
    df3 = spark.createDataFrame(
        [("a", 0), ("a", 8), ("a", 16), ("a", 5)], ["g", "v"]
    )
    # med(0,5,8,16)=6.5, MAD of adevs(6.5,1.5,1.5,9.5)=4.0
    got3 = {
        r.v: r.rz
        for r in robust_zscores(
            df3, "v", group_col="g", exact_int=True
        ).collect()
    }
    for x in (0, 5, 8, 16):
        assert got3[x] == ref(x, 6.5, 4.0), x


# ----------------------------------------------------------- graph summary


def test_graph_summary_star(spark):
    from weaviate_txtai_spark.operators.graph import graph_summary

    # star K1,4 + a self-loop + a dup edge: center degree 4, leaves 1
    edges = [(0, i) for i in range(1, 5)] + [(0, 0), (1, 0)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    r = graph_summary(df).collect()[0]
    assert (r.n_nodes, r.n_edges, r.max_degree) == (5, 4, 4)
    assert r.avg_degree == round(8 / 5, 6)
    assert r.density == round(8 / (5 * 4), 6)
    # star is maximally disassortative for its size
    assert r.assortativity == -1.0


def test_graph_summary_regular_graph_null_assortativity(spark):
    from weaviate_txtai_spark.operators.graph import graph_summary

    # a 4-cycle: every degree 2 -> zero variance -> NULL
    df = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 1)], ["src", "dst"]
    )
    r = graph_summary(df).collect()[0]
    assert r.assortativity is None
    assert (r.n_nodes, r.n_edges, r.max_degree) == (4, 4, 2)


def test_degree_powerlaw_mle(spark):
    import math

    from weaviate_txtai_spark.operators.graph import degree_powerlaw

    # hand-built degree multiset via edges: path of 4 (degrees 1,2,2,1)
    df = spark.createDataFrame([(1, 2), (2, 3), (3, 4)], ["src", "dst"])
    r = degree_powerlaw(df, d_min=1).collect()[0]
    degs = [1, 2, 2, 1]
    alpha = 1 + len(degs) / sum(math.log(d / 0.5) for d in degs)
    assert r.n_tail == 4
    assert r.alpha == pytest.approx(round(alpha, 6), abs=2e-6)


def test_degree_powerlaw_degenerate_null(spark):
    from weaviate_txtai_spark.operators.graph import degree_powerlaw

    df = spark.createDataFrame([(1, 2)], ["src", "dst"])
    # both nodes degree 1 with d_min=1: denominator ln(1/0.5) > 0, fine;
    # empty tail at d_min=5 -> NULL
    r = degree_powerlaw(df, d_min=5).collect()[0]
    assert r.n_tail == 0 and r.alpha is None
