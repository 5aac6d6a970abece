"""Randomized networkx-vs-operator parity (r13 VERDICT task 6).

The r12 parity oracles replayed the builder's own math in Python; these
use networkx (now present in the env) as an INDEPENDENT implementation
on random graphs. Graph sizes ~40-60 nodes, fixed seeds — small enough
for one Spark job per trial, adversarial enough (random digraphs have
nontrivial SCC/core structure) to catch semantic drift.
"""

import random

import networkx as nx
import pytest
from pyspark.sql import functions as F

from weaviate_txtai_spark.operators.graph import (
    bfs_hops,
    k_core,
    modularity,
    personalized_pagerank_exact,
    strongly_connected_components,
)


def _rand_edges(seed, n=50, m=120, directed=True):
    rnd = random.Random(seed)
    edges = set()
    while len(edges) < m:
        u, v = rnd.randrange(n), rnd.randrange(n)
        if u != v:
            edges.add((u, v))
    # a few self-loops: the operators must treat them per contract
    edges |= {(1, 1), (7, 7)}
    return sorted(edges)


def _edf(spark, edges):
    return spark.createDataFrame(edges, "src long, dst long")


@pytest.mark.parametrize("seed", [11, 23, 47])
def test_scc_matches_networkx(spark, seed):
    edges = _rand_edges(seed)
    got = {
        r["node"]: r["scc"]
        for r in strongly_connected_components(_edf(spark, edges)).collect()
    }
    g = nx.DiGraph(edges)
    want = {}
    for comp in nx.strongly_connected_components(g):
        label = min(comp)
        for node in comp:
            want[node] = label
    assert got == want


@pytest.mark.parametrize("seed", [5, 31])
def test_ppr_matches_networkx(spark, seed):
    edges = [e for e in _rand_edges(seed) if e[0] != e[1]]
    seeds = [0, 3, 9]
    got = {
        r["id"]: r["rank_fp"] / 1e12
        for r in personalized_pagerank_exact(
            _edf(spark, edges),
            spark.createDataFrame([(s,) for s in seeds], "id long"),
            iters=60,
        ).collect()
    }
    g = nx.DiGraph(edges)
    g.add_nodes_from(seeds)
    p = {n: (1.0 / len(seeds) if n in seeds else 0.0) for n in g.nodes}
    # nx.pagerank needs scipy (absent in this env); google_matrix is
    # networkx's own numpy construction of the SAME chain (teleport +
    # dangling both to the personalization vector) — power-iterate it
    import numpy as np

    M = nx.google_matrix(g, alpha=0.85, personalization=p)
    x = np.full(len(g), 1.0 / len(g))
    for _ in range(500):
        x = x @ M
    want = dict(zip(g.nodes, np.asarray(x).flatten()))
    assert set(got) == set(want)
    for n, v in want.items():
        # 60 exact-integer iterations vs converged float power method:
        # residual ~0.85^60 ≈ 6e-5 plus floor-division bias
        assert abs(got[n] - v) < 5e-4, (n, got[n], v)


@pytest.mark.parametrize("seed", [13, 29])
def test_bfs_matches_networkx(spark, seed):
    edges = _rand_edges(seed)
    seeds = [2, 17]
    got = {
        r["node"]: r["dist"]
        for r in bfs_hops(
            _edf(spark, edges),
            spark.createDataFrame([(s,) for s in seeds], "node long"),
            max_hops=4,
        ).collect()
    }
    g = nx.DiGraph(edges)
    g.add_nodes_from(seeds)
    want = dict(nx.multi_source_dijkstra_path_length(
        g, seeds, cutoff=4, weight=None))
    assert got == want


@pytest.mark.parametrize("seed,k", [(3, 3), (41, 4)])
def test_k_core_matches_networkx(spark, seed, k):
    edges = _rand_edges(seed, n=40, m=140)
    got = {
        r["node"]: r["degree"] for r in k_core(_edf(spark, edges), k).collect()
    }
    g = nx.Graph(e for e in edges if e[0] != e[1])
    want = dict(nx.k_core(g, k).degree)
    assert got == want


@pytest.mark.parametrize("seed", [19, 37])
def test_modularity_matches_networkx(spark, seed):
    edges = [e for e in _rand_edges(seed, n=40, m=100) if e[0] != e[1]]
    g = nx.Graph(edges)
    rnd = random.Random(seed + 1)
    lab = {n: rnd.randrange(4) for n in g.nodes}
    labels = spark.createDataFrame(list(lab.items()), "id long, label long")
    parts = got_q = None
    parts = modularity(_edf(spark, edges), labels).collect()
    got_q = sum(r["q_part"] for r in parts)
    comms = [
        {n for n, c in lab.items() if c == ci}
        for ci in sorted(set(lab.values()))
    ]
    want_q = nx.algorithms.community.modularity(g, comms)
    # q_part rounds to 6dp per label: 4 labels -> 2e-6 worst-case drift
    assert abs(got_q - want_q) < 5e-6
    assert {r["label"] for r in parts} == set(lab.values())
