"""The single-task graph kernels (union-find CC finish, Tarjan SCC
finish, the HITS integer recursion) must appear ONCE in the physical
plan of their operator's local-finish exit.

Each kernel's output used to be referenced by two or three plan
branches (the `lonely` anti-join probe in CC/SCC, the hub/authority
max aggregates in hits_exact), and Spark plans — and executes — a
separate copy of a non-cached subtree per reference: the plan evidence
showed the Python kernel two (CC/SCC) and three (HITS) times, each a
full re-run of the numpy pass per materialization (r13 opt). The
fixes derive the secondary branches from the kernel's INPUT (whose
node set provably equals the kernel's output node set) or pin the
kernel output with a lazy localCheckpoint, so exactly one kernel
execution remains.

Value coverage (local == distributed, self-loop isolates, randomized
parity) lives in test_components.py / test_graph.py /
test_parity_networkx.py; these tests pin the PLAN SHAPE so a future
edit can't silently reintroduce the duplicate kernel.
"""

from weaviate_txtai_spark.operators.graph import (
    connected_components,
    hits_exact,
    strongly_connected_components,
)
from weaviate_txtai_spark.plans.explain import physical_plan


def test_cc_local_finish_single_kernel(spark):
    # includes a self-loop-only node so the `lonely` branch is non-empty
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (7, 7)], "src long, dst long"
    )
    out = connected_components(edges)
    # r14: the kernel output is eager-localCheckpoint-pinned (the hits
    # discipline) — the recursion ran ONCE already and the plan scans
    # its RDD; no MapInPandas copy may remain
    plan = physical_plan(out)
    assert plan.count("MapInPandas") == 0
    assert "ExistingRDD" in plan
    got = {(r.node, r.component) for r in out.collect()}
    assert got == {(1, 1), (2, 1), (3, 1), (7, 7)}


def test_scc_local_finish_single_kernel(spark):
    # 2-cycle + chain tail + self-loop-only node: `m` and `lonely`
    # both non-empty
    edges = spark.createDataFrame(
        [(1, 2), (2, 1), (2, 3), (9, 9)], "src long, dst long"
    )
    out = strongly_connected_components(edges)
    # r14: same eager-checkpoint pin as CC — kernel ran once, plan
    # scans the RDD
    plan = physical_plan(out)
    assert plan.count("MapInPandas") == 0
    assert "ExistingRDD" in plan
    got = {(r.node, r.scc) for r in out.collect()}
    assert got == {(1, 1), (2, 1), (3, 3), (9, 9)}


def test_hits_exact_local_single_kernel(spark):
    edges = spark.createDataFrame(
        [(1, 10), (2, 10), (2, 11), (3, 11)], "src long, dst long"
    )
    out = hits_exact(edges, n_iter=2)
    plan = physical_plan(out)
    # the kernel output is localCheckpoint-pinned: the recursion runs
    # once and the plan scans its RDD — no MapInPandas copies remain
    assert plan.count("MapInPandas") == 0
    assert "ExistingRDD" in plan
    rows = {r.node: (r.hub, r.authority) for r in out.collect()}
    assert set(rows) == {1, 2, 3, 10, 11}
    # max-rescaled scores: the best hub and best authority are exactly 1
    assert max(h for h, _ in rows.values()) == 1.0
    assert max(a for _, a in rows.values()) == 1.0
