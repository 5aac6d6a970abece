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


# ---------------------------------------------------------------------------
# strongly_connected_components (coloring + Tarjan local finish)
# ---------------------------------------------------------------------------


def _py_scc(edges):
    """Reference: Tarjan via sys.setrecursionlimit-free iterative walk,
    independent implementation (Kosaraju two-pass) for cross-checking."""
    from collections import defaultdict

    fwd, rev = defaultdict(list), defaultdict(list)
    nodes = set()
    for u, v in edges:
        nodes.update((u, v))
        if u != v:
            fwd[u].append(v)
            rev[v].append(u)
    order, seen = [], set()
    for s in sorted(nodes):
        if s in seen:
            continue
        stack = [(s, iter(fwd[s]))]
        seen.add(s)
        while stack:
            v, it = stack[-1]
            nxt = next(it, None)
            if nxt is None:
                order.append(v)
                stack.pop()
            elif nxt not in seen:
                seen.add(nxt)
                stack.append((nxt, iter(fwd[nxt])))
    label = {}
    for s in reversed(order):
        if s in label:
            continue
        comp, stack = [s], [s]
        label[s] = s
        while stack:
            v = stack.pop()
            for w in rev[v]:
                if w not in label:
                    label[w] = s
                    comp.append(w)
                    stack.append(w)
        m = min(comp)
        for v in comp:
            label[v] = m
    # second pass fix: label by min id of the component
    groups = {}
    for v, l in label.items():
        groups.setdefault(l, []).append(v)
    out = {}
    for mem in groups.values():
        m = min(mem)
        for v in mem:
            out[v] = m
    return out


@pytest.mark.parametrize("local_finish_edges", [0, 2_000_000])
def test_scc_random_graphs_match_kosaraju(spark, local_finish_edges):
    """Both the all-distributed coloring path and the Tarjan local
    finish must agree with an independent Kosaraju reference on random
    directed graphs (cycles, chains, cross-links)."""
    import random

    from weaviate_txtai_spark.operators.graph import (
        strongly_connected_components,
    )

    rng = random.Random(97)
    edges = [(rng.randrange(40), rng.randrange(40)) for _ in range(90)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["node"]: r["scc"]
        for r in strongly_connected_components(
            df, local_finish_edges=local_finish_edges
        ).collect()
    }
    assert got == _py_scc(edges)


@pytest.mark.parametrize("local_finish_edges", [0, 2_000_000])
def test_scc_structured_shapes(spark, local_finish_edges):
    """Canonical shapes: a 4-cycle, a chain INTO the cycle (not part of
    it), a 2-cycle bridge, self-loop singleton, isolated pair."""
    from weaviate_txtai_spark.operators.graph import (
        strongly_connected_components,
    )

    edges = [
        (1, 2), (2, 3), (3, 4), (4, 1),      # 4-cycle -> scc 1
        (10, 11), (11, 1),                    # chain into cycle: singletons
        (20, 21), (21, 20),                   # 2-cycle -> scc 20
        (21, 10),                             # bridge out
        (30, 30),                             # self-loop singleton
        (40, 41),                             # plain edge: two singletons
    ]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["node"]: r["scc"]
        for r in strongly_connected_components(
            df, local_finish_edges=local_finish_edges
        ).collect()
    }
    want = {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 11,
            20: 20, 21: 20, 30: 30, 40: 40, 41: 41}
    assert got == want


def test_scc_each_node_exactly_once(spark):
    """No node dropped, none duplicated across trim/color/local waves."""
    import random

    from weaviate_txtai_spark.operators.graph import (
        strongly_connected_components,
    )

    rng = random.Random(3)
    edges = [(rng.randrange(60), rng.randrange(60)) for _ in range(150)]
    df = spark.createDataFrame(edges, "src long, dst long")
    rows = strongly_connected_components(df, local_finish_edges=0).collect()
    nodes = [r["node"] for r in rows]
    assert len(nodes) == len(set(nodes))
    assert set(nodes) == {x for e in edges for x in e}


def test_scc_distributed_trim_resolves_dag(spark):
    """A pure DAG resolves entirely through the trim fixpoint — every
    node is its own SCC and no coloring round should be needed (the
    loop exits via the zero-edge trim path)."""
    from weaviate_txtai_spark.operators.graph import (
        strongly_connected_components,
    )

    edges = [(i, i + 1) for i in range(20)] + [(5, 15), (3, 18)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["node"]: r["scc"]
        for r in strongly_connected_components(
            df, local_finish_edges=0, max_iter=30
        ).collect()
    }
    assert got == {i: i for i in range(21)}
