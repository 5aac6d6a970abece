"""Connected components (alternating large-star/small-star): equality
with a union-find reference on random graphs, deep-path convergence
where one-hop label propagation cannot finish, fixpoint guard."""

import random

import pytest

from weaviate_txtai_spark.operators.graph import connected_components


def _union_find(n_nodes, edges):
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    comp = {}
    for x in range(n_nodes):
        comp.setdefault(find(x), []).append(x)
    return {x: min(members) for r, members in comp.items() for x in members}


def _spark_cc(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src long, dst long")
    return {
        r["node"]: r["component"]
        for r in connected_components(df, **kw).collect()
    }


@pytest.mark.parametrize("local_finish_edges", [0, 2_000_000])
def test_matches_union_find_on_random_graphs(spark, local_finish_edges):
    """Both exits — the all-distributed star rounds
    (local_finish_edges=0) and the single-task numpy local finish
    (default threshold) — must agree with a union-find reference."""
    rng = random.Random(7)
    for trial in range(3):
        n = 60
        edges = [
            (rng.randrange(n), rng.randrange(n)) for _ in range(50)
        ]
        edges = [(u, v) for u, v in edges if u != v]
        got = _spark_cc(spark, edges, local_finish_edges=local_finish_edges)
        want = _union_find(n, edges)
        touched = {u for e in edges for u in e}
        assert got == {x: want[x] for x in touched}


@pytest.mark.parametrize("local_finish_edges", [0, 2_000_000])
def test_deep_path_converges_fast(spark, local_finish_edges):
    """A 64-node path has diameter 63 — one-hop label propagation needs
    63 rounds; the alternating stars must finish within the O(log² n)
    budget (max_iter=10 here) and still label every node with the
    minimum. Run with the local finish both disabled (the distributed
    machinery is what's under test) and enabled (the default path)."""
    edges = [(i, i + 1) for i in range(63)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["node"]: r["component"]
        for r in connected_components(
            df, max_iter=10, local_finish_edges=local_finish_edges
        ).collect()
    }
    assert got == {i: 0 for i in range(64)}


def test_mid_iteration_local_finish(spark):
    """A threshold hit AFTER some distributed rounds (not at init) —
    the contracted intermediate edge set must still produce the
    original components: star rounds contract a 200-node path below
    150 edges within a couple of rounds, then the local kernel
    finishes."""
    edges = [(i, i + 1) for i in range(199)]
    got = _spark_cc(spark, edges, local_finish_edges=150)
    assert got == {i: 0 for i in range(200)}


@pytest.mark.parametrize("local_finish_edges", [0, 2_000_000])
def test_self_loops_are_singletons_and_guard(spark, local_finish_edges):
    edges = [(1, 2), (5, 5), (9, 9)]
    got = _spark_cc(spark, edges, local_finish_edges=local_finish_edges)
    assert got == {1: 1, 2: 1, 5: 5, 9: 9}
    # the max_iter guard only applies to the distributed path — the
    # local finish needs no rounds at all
    with pytest.raises(RuntimeError, match="max_iter"):
        long_path = [(i, i + 1) for i in range(63)]
        connected_components(
            spark.createDataFrame(long_path, "src long, dst long"),
            max_iter=1,
            local_finish_edges=0,
        ).collect()
