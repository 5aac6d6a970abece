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


def _spark_cc(spark, edges):
    df = spark.createDataFrame(edges, "src long, dst long")
    return {
        r["node"]: r["component"]
        for r in connected_components(df).collect()
    }


def test_matches_union_find_on_random_graphs(spark):
    rng = random.Random(7)
    for trial in range(3):
        n = 60
        edges = [
            (rng.randrange(n), rng.randrange(n)) for _ in range(50)
        ]
        edges = [(u, v) for u, v in edges if u != v]
        got = _spark_cc(spark, edges)
        want = _union_find(n, edges)
        touched = {u for e in edges for u in e}
        assert got == {x: want[x] for x in touched}


def test_deep_path_converges_fast(spark):
    """A 64-node path has diameter 63 — one-hop label propagation needs
    63 rounds; the alternating stars must finish within the O(log² n)
    budget (max_iter=10 here) and still label every node with the
    minimum."""
    edges = [(i, i + 1) for i in range(63)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["node"]: r["component"]
        for r in connected_components(df, max_iter=10).collect()
    }
    assert got == {i: 0 for i in range(64)}


def test_self_loops_are_singletons_and_guard(spark):
    edges = [(1, 2), (5, 5), (9, 9)]
    got = _spark_cc(spark, edges)
    assert got == {1: 1, 2: 1, 5: 5, 9: 9}
    with pytest.raises(RuntimeError, match="max_iter"):
        df = spark.sparkSession if False else None
        from pyspark.sql import functions as F  # noqa: F401
        long_path = [(i, i + 1) for i in range(63)]
        connected_components(
            spark.createDataFrame(long_path, "src long, dst long"),
            max_iter=1,
        ).collect()
