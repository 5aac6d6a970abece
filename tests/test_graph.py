"""PageRank + kNN graph: hand-computed values, rank-mass conservation,
dangling handling, partitioning-invariance, self-exclusion."""

import pytest

from pyspark.sql import functions as F

from weaviate_txtai_spark.operators.graph import knn_graph, pagerank


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def test_pagerank_hand_computed_cycle(spark):
    # 3-cycle: symmetric structure -> ranks stay exactly 1/3 forever
    e = _edges(spark, [(1, 2), (2, 3), (3, 1)])
    got = {r["id"]: r["rank"] for r in pagerank(e, iters=4).collect()}
    for v in got.values():
        assert v == pytest.approx(1 / 3, abs=1e-8)


def test_pagerank_hand_computed_star(spark):
    # 1->3, 2->3: after one iteration (d=0.85, N=3, r0=1/3):
    # r(3) = 0.15/3 + 0.85*(1/3 + 1/3 + dangling(3)*1/3 ... ) with 3 dangling
    e = _edges(spark, [(1, 3), (2, 3)])
    got = {r["id"]: r["rank"] for r in pagerank(e, iters=1).collect()}
    base, d = 0.15 / 3, 0.85
    dangling = (1 / 3) / 3  # node 3 has no out-edges; its mass spreads
    assert got[1] == pytest.approx(base + d * dangling, abs=1e-8)
    assert got[2] == pytest.approx(base + d * dangling, abs=1e-8)
    assert got[3] == pytest.approx(base + d * (2 / 3 + dangling), abs=1e-8)
    # total mass conserved
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-6)


def test_pagerank_mass_conserved_and_invariant(spark):
    import random

    rng = random.Random(7)
    pairs = list({(rng.randrange(30), rng.randrange(30)) for _ in range(80)})
    pairs = [(a, b) for a, b in pairs if a != b]
    e = _edges(spark, pairs)
    r1 = {r["id"]: r["rank"] for r in pagerank(e, iters=3).collect()}
    r2 = {
        r["id"]: r["rank"]
        for r in pagerank(e.repartition(7), iters=3).collect()
    }
    assert r1 == r2  # rounded trajectory identical under repartitioning
    assert sum(r1.values()) == pytest.approx(1.0, abs=1e-5)


def test_pagerank_empty_raises(spark):
    with pytest.raises(ValueError, match="empty"):
        pagerank(_edges(spark, []), iters=1)


def test_knn_graph_excludes_self_and_is_k_regular(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(60)
    g = knn_graph(emb, 3)
    rows = g.collect()
    assert all(r["src"] != r["dst"] for r in rows)
    from collections import Counter

    deg = Counter(r["src"] for r in rows)
    assert set(deg.values()) == {3}  # every node has exactly k out-edges
    # centrality over the graph: ranks exist for every node, mass ~1
    pr = pagerank(g, iters=3).collect()
    assert len(pr) == emb.count()
    assert sum(r["rank"] for r in pr) == pytest.approx(1.0, abs=1e-5)


def test_pagerank_exact_matches_float_and_is_bit_stable(spark):
    import random

    from weaviate_txtai_spark.operators.graph import pagerank_exact

    rng = random.Random(11)
    pairs = [(a, b) for a, b in {(rng.randrange(25), rng.randrange(25))
                                 for _ in range(70)} if a != b]
    e = _edges(spark, pairs)
    fp = {r["id"]: r["rank_fp"] for r in pagerank_exact(e, iters=3).collect()}
    fl = {r["id"]: r["rank"] for r in pagerank(e, iters=3).collect()}
    scale = 10**12
    # integer trajectory tracks the float one to ~floor-division leakage
    for i, v in fp.items():
        assert v / scale == pytest.approx(fl[i], abs=1e-6)
    # bit-stable under repartitioning: EXACT equality, not approx
    fp2 = {
        r["id"]: r["rank_fp"]
        for r in pagerank_exact(e.repartition(9), iters=3).collect()
    }
    assert fp == fp2


def test_pagerank_exact_validation(spark):
    from weaviate_txtai_spark.operators.graph import pagerank_exact

    with pytest.raises(ValueError, match="invalid damping"):
        pagerank_exact(_edges(spark, [(1, 2)]), damping_num=101)
    with pytest.raises(ValueError, match="empty"):
        pagerank_exact(_edges(spark, []))


def test_hits_star_graph(spark):
    """One customer pointing at every supplier: that node is the unique
    max hub; all suppliers tie at authority 1; pure-source nodes have
    authority 0 and pure-sink nodes hub 0."""
    from weaviate_txtai_spark.operators.graph import hits

    edges = spark.createDataFrame(
        [(1, 10), (1, 11), (1, 12), (2, 10)], "src long, dst long"
    )
    out = {r["node"]: (r["hub"], r["authority"]) for r in hits(edges).collect()}
    assert out[1][0] == 1.0  # the 3-out-edge hub dominates
    assert out[2][0] < 1.0
    assert out[10][1] == 1.0  # pointed at by both hubs -> max authority
    assert out[1][1] == 0.0 and out[10][0] == 0.0
    assert set(out) == {1, 2, 10, 11, 12}


def test_hits_is_deterministic_across_partitionings(spark):
    from weaviate_txtai_spark.operators.graph import hits

    import random

    rng = random.Random(11)
    edges = [(rng.randrange(20), 100 + rng.randrange(10)) for _ in range(60)]
    df1 = spark.createDataFrame(edges, "src long, dst long")
    df4 = df1.repartition(7)
    a = sorted(map(tuple, hits(df1, n_iter=4).collect()))
    b = sorted(map(tuple, hits(df4, n_iter=4).collect()))
    assert a == b


def test_hits_bipartite_symmetry(spark):
    """Two disconnected complete bipartite blocks of equal shape: all
    hubs tie and all authorities tie (per-block structure identical)."""
    from weaviate_txtai_spark.operators.graph import hits

    edges = [(u, d) for u in (1, 2) for d in (10, 11)] + [
        (u, d) for u in (3, 4) for d in (12, 13)
    ]
    out = {r["node"]: (r["hub"], r["authority"]) for r in hits(
        spark.createDataFrame(edges, "src long, dst long")
    ).collect()}
    assert {out[n][0] for n in (1, 2, 3, 4)} == {1.0}
    assert {out[n][1] for n in (10, 11, 12, 13)} == {1.0}


def test_pagerank_exact_local_finish_bit_matches_distributed(spark):
    """The threshold-gated single-task path must be BIT-identical to
    the distributed star of integer jobs (same integer arithmetic),
    including dangling handling and duplicate-edge double counting."""
    import random

    from weaviate_txtai_spark.operators.graph import pagerank_exact

    rng = random.Random(23)
    edges = [(rng.randrange(30), rng.randrange(30)) for _ in range(80)]
    edges += edges[:5]  # duplicates keep double-count semantics
    df = spark.createDataFrame(edges, "src long, dst long")
    local = sorted(map(tuple, pagerank_exact(df, iters=4).collect()))
    dist = sorted(
        map(tuple, pagerank_exact(df, iters=4, local_finish_edges=0).collect())
    )
    assert local == dist


def test_hits_exact_parity_and_local_finish(spark):
    """hits_exact: the local single-task path is BIT-identical to the
    forced-distributed half-steps, tracks the float variant within the
    quantization bound, and keeps the star-graph structure."""
    import random

    from weaviate_txtai_spark.operators.graph import hits, hits_exact

    rng = random.Random(41)
    edges = [(rng.randrange(40), 1000 + rng.randrange(15)) for _ in range(150)]
    df = spark.createDataFrame(edges, "src long, dst long")
    loc = sorted(map(tuple, hits_exact(df, n_iter=4).collect()))
    dist = sorted(
        map(tuple, hits_exact(df, n_iter=4, local_finish_edges=0).collect())
    )
    assert loc == dist
    fl = {r["node"]: (r["hub"], r["authority"])
          for r in hits(df, n_iter=4).collect()}
    ex = {t[0]: (t[1], t[2]) for t in loc}
    assert max(
        abs(fl[n][i] - ex[n][i]) for n in fl for i in (0, 1)
    ) < 1e-4
    star = spark.createDataFrame(
        [(1, 10), (1, 11), (1, 12), (2, 10)], "src long, dst long"
    )
    out = {r["node"]: (r["hub"], r["authority"])
           for r in hits_exact(star).collect()}
    assert out[1][0] == 1.0 and out[10][1] == 1.0
    assert out[1][1] == 0.0 and out[10][0] == 0.0
