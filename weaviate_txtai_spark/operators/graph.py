"""Iterative graph algebra over edge DataFrames: PageRank.

Why an LLM-data engine carries it: centrality over the kNN graph of an
embedding corpus ranks documents by how "representative" their
neighborhood is — the signal behind graph-based coreset selection and
density-aware curation (a high-centrality doc speaks for many
neighbors; isolated points are outliers or noise). The same operator
runs over any (src, dst) edge frame — citation graphs, link graphs,
co-occurrence graphs.

Scale shape (E edges, V nodes, per iteration):
- one groupBy(dst) partial-agg shuffle carrying rank/degree mass — the
  canonical power-iteration join (edges ⋈ ranks on src is
  AQE-broadcastable while ranks stay small, else a hash join keyed on
  src); out-degrees are computed ONCE and cached;
- dangling mass (nodes with no out-edges) is folded back uniformly via
  ONE scalar agg broadcast — no driver-side row data;
- the rank frame is V rows × 2 columns; iterations chain lazily and a
  fixed small iteration count keeps the lineage shallow (the
  to-fixpoint variant with localCheckpoint is ``dedup.duplicate_groups``'
  pattern — reuse it if you need convergence detection).

Determinism: every iteration rounds ranks to ``round_decimals`` so the
trajectory is identical across partitionings and engines (partial-sum
order perturbs doubles at ~1e-16; rounding at 1e-9 absorbs it) — the
same contract that makes the k-means gates oracle-able.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from weaviate_txtai_spark.cache import scoped_persist


def pagerank(
    edges: DataFrame,
    *,
    iters: int = 3,
    damping: float = 0.85,
    src_col: str = "src",
    dst_col: str = "dst",
    round_decimals: Optional[int] = 9,
) -> DataFrame:
    """Power-iteration PageRank over a directed edge frame.

    Nodes are every distinct id appearing as src OR dst; dangling nodes
    (no out-edges) contribute their mass uniformly each iteration (the
    standard stochastic-matrix completion). Output: ``id, rank`` with
    ranks summing to ~1.

    Fixed ``iters`` (not to-fixpoint): curation signals need the
    ordering, which stabilizes in a handful of iterations; a fixed
    count also keeps the result a pure deterministic function of the
    edge set — oracle-checkable by replaying the iterations in SQL.
    """
    # persist the EDGE frame too, not just nodes/deg: it feeds the node
    # union, the degree agg, AND every iteration's contrib join — for a
    # derived edge set (knn_graph's GEMM join) the unpersisted plan
    # recomputed that join once per consumer (measured: doc_centrality
    # 2x slower without this)
    e = scoped_persist(
        # NULL endpoints excluded: an edge without an endpoint is not an
        # edge, and a grouped NULL src would mint one pseudo-node
        # absorbing every unkeyed edge's rank mass
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
    )
    nodes = scoped_persist(
        e.select(F.col("src").alias("id"))
        .union(e.select(F.col("dst").alias("id")))
        .distinct()
    )
    n_nodes = nodes.count()
    if n_nodes == 0:
        raise ValueError("pagerank: empty edge frame")
    deg = scoped_persist(e.groupBy("src").agg(F.count(F.lit(1)).alias("deg")))

    def _round(c):
        return F.round(c, round_decimals) if round_decimals is not None else c

    ranks = nodes.select(
        "id", _round(F.lit(1.0 / n_nodes)).alias("rank")
    )
    base = (1.0 - damping) / n_nodes
    for it in range(iters):
        if it:
            # each iteration references the previous `ranks` plan twice
            # (dangling agg + contrib join) — without truncation the
            # lineage recomputes ~2^iters on action (ADVICE r3). Same
            # pattern as duplicate_groups.
            ranks = ranks.localCheckpoint()
        with_deg = ranks.join(deg, ranks.id == deg.src, "left")
        # dangling mass: ranks of nodes with no out-edges, one scalar
        dangling = with_deg.filter(F.col("deg").isNull()).agg(
            F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dm")
        )
        contrib = (
            e.join(ranks.withColumnRenamed("id", "src"), "src")
            .join(deg, "src")
            .groupBy("dst")
            .agg(F.sum(F.col("rank") / F.col("deg")).alias("mass"))
        )
        ranks = (
            nodes.join(contrib, nodes.id == contrib.dst, "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "id",
                _round(
                    F.lit(base)
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("mass"), F.lit(0.0))
                        + F.col("dm") / F.lit(float(n_nodes))
                    )
                ).alias("rank"),
            )
        )
    return ranks


def _local_pagerank_exact(
    e: DataFrame,
    iters: int,
    damping_num: int,
    damping_den: int,
    scale: int,
    n_nodes: int,
) -> DataFrame:
    """Single-task replica of the ``pagerank_exact`` integer recursion
    (same motivation as ``_local_components``: below the threshold,
    every distributed iteration is pure job overhead). The arithmetic
    is INTEGER throughout — truncating division on non-negative values
    == floor — so the result is bit-identical to the distributed path,
    not approximately equal. Duplicate edge rows keep their
    double-count semantics (no dedup, matching the distributed form).
    Runs executor-side via ``repartition(1).mapInPandas``. Node ids may
    be any orderable type (ints, strings — e.g. TextRank term graphs):
    the kernel factorizes them with ``np.unique`` and the output id
    column keeps the input's Spark type."""
    import pandas as pd

    id_type = dict(e.dtypes)["src"]

    def run(batches):
        import numpy as np

        srcs, dsts = [], []
        for b in batches:
            srcs.append(b["src"].to_numpy())
            dsts.append(b["dst"].to_numpy())
        if not srcs:
            yield pd.DataFrame({"id": pd.Series([], dtype="object"),
                                "rank_fp": pd.Series([], dtype="int64")})
            return
        s = np.concatenate(srcs)
        d = np.concatenate(dsts)
        nodes, inv = np.unique(np.concatenate([s, d]), return_inverse=True)
        si, di = inv[: len(s)], inv[len(s):]
        n = len(nodes)
        if n_nodes is not None:
            assert n == n_nodes
        deg = np.zeros(n, dtype="int64")
        np.add.at(deg, si, 1)
        base = ((damping_den - damping_num) * scale) // (
            damping_den * n
        )
        r = np.full(n, scale // n, dtype="int64")
        for _ in range(iters):
            dm = int(r[deg == 0].sum())
            mass = np.zeros(n, dtype="int64")
            np.add.at(mass, di, r[si] // deg[si])
            r = base + (damping_num * (mass + dm // n)) // damping_den
        yield pd.DataFrame({"id": nodes, "rank_fp": r})

    return e.repartition(1).mapInPandas(
        run, f"id {id_type}, rank_fp bigint"
    )


def pagerank_exact(
    edges: DataFrame,
    *,
    iters: int = 3,
    damping_num: int = 85,
    damping_den: int = 100,
    scale: int = 10**12,
    src_col: str = "src",
    dst_col: str = "dst",
    local_finish_edges: int = 2_000_000,
) -> DataFrame:
    """Fixed-point PageRank: every rank is a scaled LONG and every step
    is integer arithmetic (``div``), so the trajectory is identical TO
    THE BIT on any engine, any partitioning, any iteration count — the
    float variant above can differ across engines by one rounding-grid
    step when a partial sum lands within ~1e-15 of a rounding boundary
    (observed in gate testing; a contraction keeps the flip bounded but
    never heals it). Exactness makes this the ORACLE-GRADE variant;
    the float one is marginally cheaper and fine when ranks feed a
    threshold rather than a hash comparison.

    Semantics: r_{t+1} = (1-d)·S/N + d·Σ (r_u div deg_u) + d·(dangling
    div N), with every division a floor division — mass leaks a few
    units of 1/scale per iteration (deterministically, identically on
    both engines), which is noise at scale=1e12. Output: ``id,
    rank_fp`` (long, fixed-point; divide by ``scale`` for the float
    rank).
    """
    if scale <= 0 or damping_den <= 0 or not (0 <= damping_num <= damping_den):
        raise ValueError("pagerank_exact: invalid damping/scale")
    # see pagerank: the edge frame feeds every iteration — persist it
    e = scoped_persist(
        # NULL endpoints excluded: an edge without an endpoint is not an
        # edge, and a grouped NULL src would mint one pseudo-node
        # absorbing every unkeyed edge's rank mass
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
    )
    # the edge count first (one job, doubling as the persist's
    # materialization): below the local-finish bound the kernel derives
    # the node set itself, so the `nodes` frame + its distinct + count
    # — two more jobs — only exist on the distributed path (r13 opt)
    n_edges = e.count()
    if n_edges == 0:
        raise ValueError("pagerank_exact: empty edge frame")
    # small graph ⇒ the iterations are pure job overhead: finish in one
    # task, BIT-IDENTICALLY (integer arithmetic — same reasoning as
    # connected_components' local finish; 0 disables).
    if local_finish_edges and n_edges <= local_finish_edges:
        return _local_pagerank_exact(
            e, iters, damping_num, damping_den, scale, None
        )
    nodes = scoped_persist(
        e.select(F.col("src").alias("id"))
        .union(e.select(F.col("dst").alias("id")))
        .distinct()
    )
    n_nodes = nodes.count()
    deg = scoped_persist(e.groupBy("src").agg(F.count(F.lit(1)).alias("deg")))
    base = ((damping_den - damping_num) * scale) // (damping_den * n_nodes)
    ranks = nodes.select("id", F.lit(scale // n_nodes).alias("r"))
    for it in range(iters):
        if it:
            # truncate the doubling iterative lineage (see pagerank)
            ranks = ranks.localCheckpoint()
        with_deg = ranks.join(deg, ranks.id == deg.src, "left")
        dangling = with_deg.filter(F.col("deg").isNull()).agg(
            F.coalesce(F.sum("r"), F.lit(0)).cast("long").alias("dm")
        )
        contrib = (
            e.join(ranks.withColumnRenamed("id", "src"), "src")
            .join(deg, "src")
            .groupBy("dst")
            .agg(F.sum(F.expr("r div deg")).alias("mass"))
        )
        ranks = (
            nodes.join(contrib, nodes.id == contrib.dst, "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "id",
                (
                    F.lit(base)
                    + F.expr(
                        f"({damping_num} * (coalesce(mass, 0L) "
                        f"+ (dm div {n_nodes}))) div {damping_den}"
                    )
                ).cast("long").alias("r"),
            )
        )
    return ranks.select("id", F.col("r").alias("rank_fp"))


def knn_graph(
    emb: DataFrame,
    k: int,
    *,
    id_col: str = "vec_id",
    vector_col: str = "embedding",
    score_decimals: int = 6,
) -> DataFrame:
    """Directed kNN graph: each node points at its k nearest neighbors
    by cosine (self excluded; ties score DESC then id ASC — the repo's
    standard deterministic ordering). Output: ``src, dst, score``.

    Built on the similarity-join machinery (`operators.simjoin`), so
    the same GEMM/blocked/IVF strategies apply as the corpus grows.
    """
    from weaviate_txtai_spark.operators.simjoin import topk_join

    left = emb.select(
        F.col(id_col).alias("query_id"), F.col(vector_col).alias("query_vector")
    )
    # k+1 then drop self: the nearest neighbor of any point is itself
    hits = topk_join(
        left,
        emb,
        k + 1,
        left_id="query_id",
        left_vec="query_vector",
        right_id=id_col,
        right_vec=vector_col,
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc(id_col))
    return (
        hits.filter(F.col("query_id") != F.col(id_col))
        .withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= k)
        .select(
            F.col("query_id").alias("src"),
            F.col(id_col).alias("dst"),
            F.round("score", score_decimals).alias("score"),
        )
    )


def _local_components(edges: DataFrame) -> DataFrame:
    """Finish connectivity on a SMALL edge frame in one single-task pass
    (the "finish locally once the contraction fits" step every
    production CC implementation carries — GraphX's run and the
    Kiveris et al. 2014 filtering variant both end this way; without it
    the algorithm pays a full distributed round of pure job overhead
    for every halving of an already-tiny graph).

    Kernel: vectorized Shiloach–Vishkin-style hooking — scatter the
    edge-min onto both endpoints (``np.minimum.at``), then pointer-jump
    (``label = label[label]``) to a fixpoint, repeat until an entire
    pass changes nothing. O(E) numpy work per pass, O(log n) passes; no
    Python-level per-edge loop. Labels are indices into the SORTED node
    array, so index order = id order and the converged shared label is
    exactly the component's minimum id.

    Runs executor-side via ``repartition(1).mapInPandas`` (never a
    driver collect); input must be self-loop-free. Output: one
    ``(node, component)`` row per distinct node — component minima
    map to themselves (unlike the distributed fixpoint exit, roots are
    already included). Id-type-agnostic like ``_local_pagerank_exact``:
    labels are INDICES into the sorted node array, so any orderable id
    type (string doc ids included) works and the output keeps the
    input's id dtype — an int64 coercion here crashed
    ``duplicate_groups`` on string-keyed dup-pair graphs."""
    import pandas as pd

    id_type = dict(edges.dtypes)["u"]

    def finish(batches):
        import numpy as np

        us, vs = [], []
        for b in batches:
            us.append(b["u"].to_numpy())
            vs.append(b["v"].to_numpy())
        if not us:
            yield pd.DataFrame({"node": pd.Series([], dtype="object"),
                                "component": pd.Series([], dtype="object")})
            return
        u = np.concatenate(us)
        v = np.concatenate(vs)
        nodes, idx = np.unique(np.concatenate([u, v]), return_inverse=True)
        a, b = idx[: len(u)], idx[len(u):]
        label = np.arange(len(nodes), dtype="int64")
        while True:
            before = label.copy()
            m = np.minimum(label[a], label[b])
            np.minimum.at(label, a, m)
            np.minimum.at(label, b, m)
            while True:
                jumped = label[label]
                if np.array_equal(jumped, label):
                    break
                label = jumped
            if np.array_equal(label, before):
                break
        yield pd.DataFrame({"node": nodes, "component": nodes[label]})

    return edges.repartition(1).mapInPandas(
        finish, f"node {id_type}, component {id_type}"
    )


def connected_components(
    edges: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
    local_finish_edges: int = 2_000_000,
) -> DataFrame:
    """Connected components by alternating large-star / small-star
    (Kiveris et al., "Connected Components in MapReduce and Beyond",
    SoCC 2014 — public knowledge): each round hangs every node under
    the minimum id of its closed neighborhood, which provably converges
    in O(log² n) rounds on ANY graph — unlike one-hop label propagation
    (``dedup.duplicate_groups``), whose round count is the component
    DIAMETER and which therefore cannot finish on a long path within a
    fixed budget. This is the variant to reach for when components can
    be deep (citation chains, web graphs); near-dup clusters stay with
    the cheaper label propagation.

    Each round is two single-shuffle star passes over the edge list
    (each star's neighborhood minimum is a ``min OVER (PARTITION BY
    u)`` window — ONE exchange per star, where the groupBy-min +
    join-back formulation paid two) plus one distinct; the frame is
    localCheckpoint'd per round (same lineage discipline as
    ``pagerank``), lazily, so the fingerprint job below is also the
    materialization job. Convergence is detected by an edge-set
    fixpoint (large-star + small-star both idempotent ⇔ every node
    points at its component minimum); raises past ``max_iter`` rather
    than returning wrong labels.

    ``local_finish_edges``: whenever the (contracted) edge count —
    already measured for free by the per-round fingerprint — is at or
    below this bound, the remaining work is handed to
    ``_local_components`` (one single-task vectorized pass) instead of
    paying O(log²) more distributed rounds of pure job overhead. Both
    star operations preserve every non-isolated node in the frame (a
    node always survives as the ``v>u`` side of its smaller neighbor's
    star or as a neighborhood minimum), so the intermediate edge set
    connects exactly the original components over the original ids and
    the local kernel's answer is the final answer. At 100 TB the early
    rounds still run distributed and each round contracts the graph
    geometrically; the threshold (2M edges ≈ 32 MB in one task) only
    collapses the long tail of tiny rounds. Set 0 to force the
    all-distributed path.

    Output: ``node, component`` — component is the minimum node id in
    the component (every node appears exactly once; isolated nodes of
    the edge list, i.e. self-loops, keep themselves).
    """
    # canonical undirected edge list (u, v) with u != v, deduped.
    # The input selection is persisted ONCE: both the canonical list
    # and the self-loop `isolated` set below derive from it, and
    # without the persist each branch re-ran the caller's full edge
    # lineage — for the dedup/curation composites that lineage is the
    # shingle self-join pair table, recomputed wholesale just to find
    # (usually zero) self-loops (r13 opt; no-common-subplan rule)
    ed = scoped_persist(
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .filter(F.col("u").isNotNull() & F.col("v").isNotNull())
    )
    e = (
        ed.unionByName(ed.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        # lazy, like the round checkpoints below: the initial
        # fingerprint job is the first action and doubles as the
        # materialization job — eager=True paid a separate job to
        # materialize before fingerprinting (r13 opt)
        .localCheckpoint(eager=False)
    )
    isolated = ed.filter(F.col("u") == F.col("v")).select(
        F.col("u").alias("node")
    ).distinct()

    wu = Window.partitionBy("u")

    def large_star(ed: DataFrame) -> DataFrame:
        # per node u over the UNDIRECTED neighborhood (the running edge
        # frame is kept high->low oriented between rounds, so expand to
        # both directions first — a one-direction neighborhood makes the
        # star collapse to empty after round one): m = min(closed
        # neighborhood); every neighbor v > u re-hangs onto m. The
        # window attaches m in the SAME exchange that groups the
        # neighborhood — no join-back shuffle. No trailing distinct:
        # small_star's window-min is dup-insensitive and its own
        # distinct dedups the round's output.
        bidir = ed.unionByName(
            ed.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        return (
            bidir.withColumn("m", F.least(F.min("v").over(wu), F.col("u")))
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .filter(F.col("u") != F.col("v"))
        )

    def small_star(ed: DataFrame) -> DataFrame:
        # orient edges high->low, then per node u: all small neighbors
        # (and u itself) hang onto the minimum — the (u, m) self-hang is
        # emitted from EVERY row and deduped by the trailing distinct
        # the round needs anyway, keeping the star at one exchange
        hi_lo = ed.filter(F.col("v") < F.col("u"))
        return (
            hi_lo.withColumn("m", F.min("v").over(wu))
            .select(
                F.explode(
                    F.array(
                        F.struct(F.col("v").alias("u"), F.col("m").alias("v")),
                        F.struct(F.col("u").alias("u"), F.col("m").alias("v")),
                    )
                ).alias("s")
            )
            .select("s.u", "s.v")
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )

    def fingerprint(ed: DataFrame):
        # shuffle-free edge-set digest: count + sum of per-edge hashes
        # (map-side partial agg, one tiny job — vs the two exceptAll
        # set-diff shuffles the fixpoint check used to run EVERY round,
        # which dominated the per-round floor at small scale: 16.2 s →
        # see NOTES.md r7). bit_xor, not sum: order-insensitive AND
        # overflow-free under ANSI mode (edges are distinct, so the
        # xor self-cancellation failure mode can't occur).
        row = ed.agg(
            F.count(F.lit(1)).alias("n"),
            F.expr("bit_xor(xxhash64(u, v))").alias("h"),
        ).collect()[0]
        return (row["n"], row["h"])

    members = None
    # local exits: eager-checkpoint the kernel output and let `lonely`
    # probe IT — kernel runs once (the r13 single-kernel invariant, now
    # enforced by the checkpoint), the probe is one anti-join against
    # the cached node-sized RDD instead of the u∪v union+distinct
    # shuffles, and the kernel executes as its own job (r14 opt). The
    # fixpoint exit keeps the u∪v probe over msrc: its members frame is
    # a cheap projection of the checkpointed e, and {u}∪roots =
    # {u}∪({v}−{u}) makes the probe set identical (r13 opt).
    local_probe = None
    msrc = e
    fp = fingerprint(e)
    if fp[0] <= local_finish_edges:
        members = _local_components(e).localCheckpoint(eager=True)
        local_probe = members.select("node")
    else:
        for _ in range(max_iter):
            # lazy checkpoint: the fingerprint job right below is the
            # first action, so it doubles as the materialization job —
            # one job per round where eager=True paid two
            nxt = small_star(large_star(e)).localCheckpoint(eager=False)
            # fixpoint: the edge SET is unchanged (both stars
            # idempotent). Cheap digest first; only when it matches
            # (≈ the final round) confirm EXACTLY with the two
            # set-diffs, so a 2⁻⁶⁴-class hash collision can never
            # terminate early with wrong labels.
            nfp = fingerprint(nxt)
            if nfp[0] <= local_finish_edges:
                members = _local_components(nxt).localCheckpoint(
                    eager=True
                )
                local_probe = members.select("node")
                msrc = nxt
                break
            if nfp == fp:
                changed = (
                    nxt.exceptAll(e).limit(1).count()
                    + e.exceptAll(nxt).limit(1).count()
                )
                if changed == 0:
                    e = nxt
                    msrc = nxt
                    break
            fp = nfp
            e = nxt
            msrc = nxt
        else:
            raise RuntimeError(
                f"connected_components: no fixpoint within "
                f"max_iter={max_iter} rounds — raise max_iter "
                "(convergence is O(log² n) rounds)"
            )

    if members is None:
        # at the fixpoint every edge is (node, component_min); component
        # minima map to themselves (the local-finish exit emits them
        # directly, so this recovery is distributed-exit-only)
        members = e.select(
            F.col("u").alias("node"), F.col("v").alias("component")
        )
        roots = e.select(F.col("v").alias("node")).distinct().join(
            e.select(F.col("u").alias("node")).distinct(),
            "node",
            "left_anti",
        ).select("node", F.col("node").alias("component"))
        members = members.unionByName(roots)

    # self-loop isolates keep themselves; local exits probe the
    # checkpointed kernel output, the fixpoint exit probes the edge
    # frame's node set (== nodes(members), see above)
    probe = (
        local_probe
        if local_probe is not None
        else msrc.select(F.col("u").alias("node"))
        .unionByName(msrc.select(F.col("v").alias("node")))
        .distinct()
    )
    lonely = isolated.join(probe, "node", "left_anti").select(
        "node", F.col("node").alias("component")
    )
    return members.unionByName(lonely)


def _local_scc(edges: DataFrame) -> DataFrame:
    """Single-task SCC finish: iterative Tarjan (O(V+E), exact) over a
    SMALL directed edge frame — the same "finish locally once it fits"
    step as ``_local_components``. Runs executor-side via
    ``repartition(1).mapInPandas`` (never a driver collect); input must
    be self-loop-free. Output: one ``(node, scc)`` row per distinct
    node, scc = the MINIMUM node id in the strongly connected
    component (the ``connected_components`` labeling convention)."""
    import pandas as pd

    def finish(batches):
        import numpy as np

        us, vs = [], []
        for b in batches:
            us.append(b["u"].to_numpy(dtype="int64"))
            vs.append(b["v"].to_numpy(dtype="int64"))
        if not us:
            yield pd.DataFrame({"node": pd.Series([], dtype="int64"),
                                "scc": pd.Series([], dtype="int64")})
            return
        u = np.concatenate(us)
        v = np.concatenate(vs)
        nodes, inv = np.unique(np.concatenate([u, v]), return_inverse=True)
        a, b = inv[: len(u)], inv[len(u):]
        n = len(nodes)
        order = np.argsort(a, kind="stable")
        # plain lists / bytearray for the per-element loop state: numpy
        # SCALAR indexing dominates a Python-level graph walk (~2x list
        # indexing; measured 0.46 s -> 0.26 s at the order_scc gate's
        # 150k nodes). label/nodes stay arrays — they are only touched
        # with vectorized fancy indexing. Same algorithm, same output
        # (r14 opt; parity pinned in test_components/test_kernel_*).
        b_s = b[order].tolist()
        starts = np.searchsorted(a[order], np.arange(n + 1)).tolist()
        index_of = [-1] * n
        low = [0] * n
        on_stack = bytearray(n)
        label = np.full(n, -1, dtype=np.int64)
        counter = 0
        stack: list[int] = []
        for root in range(n):
            if index_of[root] != -1:
                continue
            work = [(root, starts[root])]
            index_of[root] = low[root] = counter
            counter += 1
            stack.append(root)
            on_stack[root] = 1
            while work:
                vtx, ei = work[-1]
                advanced = False
                lim = starts[vtx + 1]
                while ei < lim:
                    w = b_s[ei]
                    ei += 1
                    if index_of[w] == -1:
                        work[-1] = (vtx, ei)
                        index_of[w] = low[w] = counter
                        counter += 1
                        stack.append(w)
                        on_stack[w] = 1
                        work.append((w, starts[w]))
                        advanced = True
                        break
                    elif on_stack[w]:
                        if index_of[w] < low[vtx]:
                            low[vtx] = index_of[w]
                if advanced:
                    continue
                # vtx exhausted
                if low[vtx] == index_of[vtx]:
                    comp = []
                    while True:
                        w = stack.pop()
                        on_stack[w] = 0
                        comp.append(w)
                        if w == vtx:
                            break
                    label[comp] = nodes[comp].min()
                work.pop()
                if work:
                    parent = work[-1][0]
                    if low[vtx] < low[parent]:
                        low[parent] = low[vtx]
        yield pd.DataFrame({"node": nodes, "scc": label})

    return edges.repartition(1).mapInPandas(finish, "node bigint, scc bigint")


def strongly_connected_components(
    edges: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 50,
    local_finish_edges: int = 2_000_000,
) -> DataFrame:
    """Strongly connected components by the COLORING algorithm (Orzan
    2004; the MapReduce formulation in Kim et al. / the Slota et al.
    trim-and-color family — public knowledge), composed from the
    ``connected_components`` machinery: digest-checked fixpoints,
    lazy localCheckpoint rounds, and a single-task exact finish
    (iterative Tarjan) once the remaining edge set fits.

    Outer rounds, each over the REMAINING graph:
      1. TRIM — nodes with no in-edges or no out-edges are singleton
         SCCs by definition; peel one frontier per pass (repeated
         passes peel DAG-like regions geometrically).
      2. COLOR — propagate ``c(v) = min(v, min over in-neighbors'
         colors)`` to a fixpoint: c(v) is the minimum id that can
         reach v. ROOTS (c(v)=v) are each the minimum id of their own
         SCC (any smaller in-SCC id would be an ancestor).
      3. MARK — within each color class, backward-close from the root:
         the marked set {u : c(u)=r, u reaches r} is EXACTLY SCC(r)
         (the same-color restriction is lossless: every node on a
         u→…→r path with c(u)=c(r)=r has color r — a smaller-id
         ancestor of an intermediate node would also reach r and
         contradict c(r)=r).
      4. Emit marked SCCs (scc = color = min id in the SCC), remove
         them, repeat — at least one SCC per color class per round.

    Scale shape: every inner step is one edges⋈colors hash join + one
    groupBy partial-agg shuffle (the pagerank shape); nothing is
    collected beyond 1-row digests. The known cost profile of coloring
    — fixpoints take O(diameter) rounds — is why the Tarjan local
    finish exists: at 100 TB the early trim/color rounds shrink the
    graph distributed, and the deep-tail remainder finishes in one
    task once ≤ ``local_finish_edges`` (the ``connected_components``
    threshold argument). Set 0 to force all-distributed.

    Output: ``node, scc`` — scc is the minimum node id in the SCC;
    every node of the edge frame (self-loops included) appears exactly
    once."""
    # the input selection is persisted once: all_nodes and e both
    # derive from it, and unpersisted each materialization re-ran the
    # caller's full edge lineage (the gate's window chain) — same
    # no-common-subplan fix as connected_components (r13 opt)
    e0 = scoped_persist(
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .filter(F.col("u").isNotNull() & F.col("v").isNotNull())
    )
    all_nodes = scoped_persist(
        e0.select(F.col("u").alias("node"))
        .unionByName(e0.select(F.col("v").alias("node")))
        .distinct()
    )
    e = scoped_persist(
        e0.filter(F.col("u") != F.col("v")).distinct()
    )

    def digest(df: DataFrame, a: str, b: str):
        row = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.expr(f"bit_xor(xxhash64({a}, {b}))").alias("h"),
        ).collect()[0]
        return (row["n"], row["h"])

    done: list[DataFrame] = []
    nodes = all_nodes
    for _ in range(max_iter):
        n_edges = e.count()
        if n_edges == 0:
            done.append(nodes.select("node", F.col("node").alias("scc")))
            break
        if n_edges <= local_finish_edges:
            # eager-checkpoint the kernel output and probe IT: the
            # kernel runs exactly once (the r13 single-kernel invariant,
            # now enforced by the checkpoint instead of by rerouting the
            # probe), the probe is one anti-join against the cached
            # node-sized RDD (the r13 u∪v union+distinct shuffles are
            # gone), and the kernel executes as its own job instead of
            # inside the final action (r14 opt)
            m = _local_scc(e).localCheckpoint(eager=True)
            lonely = nodes.join(
                m.select("node"), "node", "left_anti"
            ).select("node", F.col("node").alias("scc"))
            done.append(m)
            done.append(lonely)
            break
        # 1. trim to a fixpoint: no-in or no-out nodes are singletons;
        # peeling exposes new frontier nodes, so iterate before paying
        # a coloring round (node count is monotone — the count doubles
        # as the fixpoint check). Also re-checks the local-finish bound
        # after each peel.
        n_nodes = nodes.count()
        hit_local = False
        while True:
            srcs = e.select(F.col("u").alias("node")).distinct()
            dsts = e.select(F.col("v").alias("node")).distinct()
            # eager localCheckpoint, NOT persist: each peel's plan embeds
            # the previous peel's plan three times (interior twice + e
            # once), so without plan TRUNCATION the logical tree grows
            # 3^k and the driver OOMs optimizing it — persist shortcuts
            # execution but not the plan (the no-common-subplan trap,
            # plan-size edition)
            interior = srcs.join(dsts, "node").localCheckpoint(eager=True)
            n_int = interior.count()
            if n_int == n_nodes:
                break
            trimmed = nodes.join(interior, "node", "left_anti").select(
                "node", F.col("node").alias("scc")
            )
            done.append(trimmed.localCheckpoint(eager=True))
            nodes, n_nodes = interior, n_int
            e = (
                e.join(interior.withColumnRenamed("node", "u"), "u")
                .join(interior.withColumnRenamed("node", "v"), "v")
                .select("u", "v")
                .localCheckpoint(eager=True)
            )
            n_e = e.count()
            if n_e == 0:
                done.append(
                    nodes.select("node", F.col("node").alias("scc"))
                )
                hit_local = True
                break
            if n_e <= local_finish_edges:
                # same eager-checkpointed single-kernel discipline as
                # the entry local finish (r14 opt)
                m = _local_scc(e).localCheckpoint(eager=True)
                lonely = nodes.join(
                    m.select("node"), "node", "left_anti"
                ).select("node", F.col("node").alias("scc"))
                done.append(m)
                done.append(lonely)
                hit_local = True
                break
        if hit_local:
            break
        # 2. color to fixpoint
        colors = nodes.select("node", F.col("node").alias("c"))
        fp = digest(colors, "node", "c")
        for _ in range(max_iter * 4):
            upd = (
                e.join(
                    colors.select(
                        F.col("node").alias("u"), F.col("c").alias("cu")
                    ),
                    "u",
                )
                .groupBy(F.col("v").alias("node"))
                .agg(F.min("cu").alias("cin"))
            )
            colors = (
                colors.join(upd, "node", "left")
                .select(
                    "node",
                    F.least(
                        F.col("c"), F.coalesce(F.col("cin"), F.col("c"))
                    ).alias("c"),
                )
                .localCheckpoint(eager=False)
            )
            nfp = digest(colors, "node", "c")
            if nfp == fp:
                break
            fp = nfp
        else:
            raise RuntimeError(
                "strongly_connected_components: coloring fixpoint not "
                f"reached within {max_iter * 4} rounds"
            )
        colors = scoped_persist(colors)
        # 3. same-color edge set + backward closure from roots
        esame = scoped_persist(
            e.join(
                colors.select(F.col("node").alias("u"), F.col("c").alias("cu")),
                "u",
            )
            .join(
                colors.select(F.col("node").alias("v"), F.col("c").alias("cv")),
                "v",
            )
            .filter(F.col("cu") == F.col("cv"))
            .select("u", "v")
        )
        marked = colors.filter(F.col("node") == F.col("c")).select("node")
        marked = marked.localCheckpoint(eager=True)
        for _ in range(max_iter * 4):
            grown = (
                esame.join(marked.withColumnRenamed("node", "v"), "v")
                .select(F.col("u").alias("node"))
                .distinct()
                .join(marked, "node", "left_anti")
                .localCheckpoint(eager=True)
            )
            if grown.limit(1).count() == 0:
                break
            marked = marked.unionByName(grown).localCheckpoint(eager=True)
        else:
            raise RuntimeError(
                "strongly_connected_components: backward closure not "
                f"reached within {max_iter * 4} rounds"
            )
        # 4. emit SCCs of this wave, remove, continue
        wave = colors.join(marked, "node").select(
            "node", F.col("c").alias("scc")
        )
        done.append(wave.localCheckpoint(eager=True))
        # same plan-truncation discipline as the trim loop: outer rounds
        # compound too
        nodes = nodes.join(marked, "node", "left_anti").localCheckpoint(
            eager=True
        )
        e = (
            e.join(marked.withColumnRenamed("node", "u"), "u", "left_anti")
            .join(marked.withColumnRenamed("node", "v"), "v", "left_anti")
            .localCheckpoint(eager=True)
        )
    else:
        raise RuntimeError(
            f"strongly_connected_components: not finished within "
            f"max_iter={max_iter} outer rounds — raise max_iter"
        )

    out = done[0]
    for d in done[1:]:
        out = out.unionByName(d)
    return out


def triangle_count(
    edges: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Per-node triangle counts via degree orientation (the classic
    MapReduce scheme — Suri & Vassilvitskii, "Counting Triangles and
    the Curse of the Last Reducer", WWW 2011; public knowledge).

    Orient every undirected edge from the (degree, id)-smaller endpoint
    to the larger; each triangle then has exactly ONE node with two
    outgoing edges, so wedges joined on their common tail and closed
    against the oriented edge set count each triangle exactly once —
    and, the scale point, the wedge fan-out per node is bounded by its
    OUT-degree, which the orientation caps at O(√E) even for celebrity
    nodes (a high-degree hub's edges almost all point AT it).

    Plan: degree aggregate → two broadcast-eligible joins to attach
    endpoint ranks → wedge self-join on the tail → one equi-join
    against the oriented edges to close — all shuffle-bounded, no
    window, no iteration. Self-loops are dropped; duplicate/reverse
    edge rows are deduped.

    Output: ``node, triangles`` for every node in ≥1 triangle
    (zero-triangle nodes are omitted — the caller left-joins a node
    frame if a dense output is needed).
    """
    e = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .filter(
            F.col("u").isNotNull()
            & F.col("v").isNotNull()
            & (F.col("u") != F.col("v"))
        )
    )
    # canonical undirected form (lo, hi), deduped
    und = e.select(
        F.least("u", "v").alias("a"), F.greatest("u", "v").alias("b")
    ).distinct()

    deg = (
        und.select(F.col("a").alias("n"))
        .unionByName(und.select(F.col("b").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("d"))
    )

    withdeg = (
        und.join(deg.select(F.col("n").alias("a"), F.col("d").alias("da")), "a")
        .join(deg.select(F.col("n").alias("b"), F.col("d").alias("db")), "b")
    )
    # orient by (degree, id): lower rank -> higher rank
    a_first = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    oriented = withdeg.select(
        F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("t"),
        F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("h"),
        F.when(a_first, F.col("db")).otherwise(F.col("da")).alias("dh"),
    )

    # wedges at common tail t: unordered head pair, ordered by the SAME
    # (degree, id) rank so the closing edge — itself rank-oriented — can
    # be matched with one equi-join
    w1 = oriented.select(
        F.col("t"), F.col("h").alias("h1"), F.col("dh").alias("dh1")
    )
    w2 = oriented.select(
        F.col("t"), F.col("h").alias("h2"), F.col("dh").alias("dh2")
    )
    wedges = w1.join(w2, "t").filter(
        (F.col("dh1") < F.col("dh2"))
        | ((F.col("dh1") == F.col("dh2")) & (F.col("h1") < F.col("h2")))
    )
    closing = oriented.select(
        F.col("t").alias("h1"), F.col("h").alias("h2")
    )
    tris = wedges.join(closing, ["h1", "h2"]).select("t", "h1", "h2")

    per_node = (
        tris.select(F.explode(F.array("t", "h1", "h2")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("triangles"))
    )
    return per_node


def k_core(
    edges: DataFrame,
    k: int,
    *,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 100,
) -> DataFrame:
    """The k-core: the maximal subgraph in which every node has degree
    ≥ k, by iterative peeling (remove all sub-k nodes, recompute,
    repeat to fixpoint). Graph-density triage — in a near-dup graph the
    k-core is the boilerplate heart; in an interaction graph it is the
    engaged-user core.

    Each round: one degree aggregate over the surviving edge list + two
    semi-joins filtering both endpoints — all keyed on node ids, O(E)
    rows per round, localCheckpoint'd (the lineage discipline of
    ``connected_components``). Peeling cascades at most one "layer" per
    round, so round count is the graph's degeneracy-peeling depth (1–2
    on clique-ish graphs, O(n) on an adversarial path — bounded by
    ``max_iter``, raising rather than returning a wrong core).
    Convergence = node count unchanged, checked with a 1-row aggregate.

    Output: ``node, degree`` — nodes of the k-core with their
    within-core degree. Self-loops are dropped (a self-loop is not
    adjacency to another node); duplicate edges count once.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    e = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .select(
            F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v")
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    prev_nodes = -1
    for _ in range(max_iter):
        deg = (
            e.select(F.col("u").alias("n"))
            .unionAll(e.select(F.col("v").alias("n")))
            .groupBy("n")
            .agg(F.count(F.lit(1)).alias("degree"))
        )
        keep = deg.filter(F.col("degree") >= k).select("n")
        n_nodes = keep.count()
        if n_nodes == prev_nodes:
            return deg.filter(F.col("degree") >= k).select(
                F.col("n").alias("node"), F.col("degree").cast("long")
            )
        prev_nodes = n_nodes
        if n_nodes == 0:
            return deg.filter(F.lit(False)).select(
                F.col("n").alias("node"), F.col("degree").cast("long")
            )
        e = (
            e.join(keep.withColumnRenamed("n", "u"), "u", "left_semi")
            .join(keep.withColumnRenamed("n", "v"), "v", "left_semi")
            .select("u", "v")
            .localCheckpoint(eager=True)
        )
    raise RuntimeError(
        f"k_core did not converge within max_iter={max_iter} rounds"
    )


def graph_summary(
    edges: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    round_decimals: int = 6,
) -> DataFrame:
    """One-row structural summary of an undirected graph: ``n_nodes,
    n_edges, avg_degree, max_degree, density, assortativity`` — the
    sanity panel to read BEFORE running components/PageRank/k-core on
    an unfamiliar edge list (a near-complete graph or a +0.9
    assortative core changes which algorithm is affordable).

    Degree assortativity is the Pearson correlation of endpoint
    degrees over edges, both directions counted (Newman 2002) — NULL
    for degree-regular graphs (zero variance). Plan: canonical edge
    dedup, one degree aggregate, two node-keyed joins to decorate
    edges with endpoint degrees, one 1-row aggregate. Self-loops
    dropped, duplicate edges count once.
    """
    e = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .select(
            F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v")
        )
        .distinct()
    )
    e = scoped_persist(e)
    deg = (
        e.select(F.col("u").alias("n"))
        .unionAll(e.select(F.col("v").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).cast("long").alias("d"))
    )
    both = e.unionAll(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    du = deg.select(F.col("n").alias("u"), F.col("d").alias("__du"))
    dv = deg.select(F.col("n").alias("v"), F.col("d").alias("__dv"))
    decorated = both.join(du, "u").join(dv, "v")
    # Pearson from raw moments: F.corr raises DIVIDE_BY_ZERO under
    # ANSI on a degree-regular graph (zero variance); try_divide
    # nulls it instead. x/y moments are symmetric over the
    # both-directions edge list, so one set of sums suffices.
    x = F.col("__du").cast("double")
    y = F.col("__dv").cast("double")
    stats = decorated.agg(
        F.count(F.lit(1)).cast("double").alias("__m"),
        F.sum(x).alias("__sx"),
        F.sum(y).alias("__sy"),
        F.sum(x * y).alias("__sxy"),
        F.sum(x * x).alias("__sxx"),
        F.sum(y * y).alias("__syy"),
    ).select(
        F.try_divide(
            F.col("__m") * F.col("__sxy") - F.col("__sx") * F.col("__sy"),
            F.sqrt(
                (F.col("__m") * F.col("__sxx") - F.col("__sx") * F.col("__sx"))
                * (F.col("__m") * F.col("__syy") - F.col("__sy") * F.col("__sy"))
            ),
        ).alias("__assort")
    )
    base = deg.agg(
        F.count(F.lit(1)).cast("long").alias("n_nodes"),
        F.sum("d").cast("long").alias("__deg_sum"),
        F.max("d").cast("long").alias("max_degree"),
    )
    return (
        base.join(F.broadcast(stats))
        .select(
            "n_nodes",
            (F.col("__deg_sum") / 2).cast("long").alias("n_edges"),
            F.round(F.col("__deg_sum") / F.col("n_nodes"), round_decimals)
            .alias("avg_degree"),
            "max_degree",
            F.round(
                F.try_divide(
                    F.col("__deg_sum").cast("double"),
                    F.col("n_nodes").cast("double")
                    * (F.col("n_nodes") - 1),
                ),
                round_decimals,
            ).alias("density"),
            F.round("__assort", round_decimals).alias("assortativity"),
        )
    )


def degree_powerlaw(
    edges: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    d_min: int = 1,
    round_decimals: int = 6,
) -> DataFrame:
    """Discrete power-law exponent of the degree distribution by the
    continuous-MLE approximation (Clauset–Shalizi–Newman 2009,
    α̂ = 1 + n / Σ ln(d / (d_min − ½))) over nodes with degree ≥
    ``d_min`` — the "is this a heavy-tailed graph?" gauge that decides
    whether celebrity-node mitigations (degree caps, orientation) are
    load-bearing or dead code on this corpus.

    Output (1 row): ``n_tail, d_min, alpha`` — NULL alpha when the
    tail is empty or degenerate (all degrees exactly d_min makes the
    denominator 0). One degree aggregate + one 1-row aggregate.
    """
    if d_min < 1:
        raise ValueError("d_min must be >= 1")
    e = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .select(
            F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v")
        )
        .distinct()
    )
    deg = (
        e.select(F.col("u").alias("n"))
        .unionAll(e.select(F.col("v").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).cast("long").alias("d"))
        .filter(F.col("d") >= d_min)
    )
    return deg.agg(
        F.count(F.lit(1)).cast("long").alias("n_tail"),
        F.lit(d_min).cast("int").alias("d_min"),
        F.round(
            1
            + F.try_divide(
                F.count(F.lit(1)).cast("double"),
                F.sum(F.log(F.col("d") / F.lit(d_min - 0.5))),
            ),
            round_decimals,
        ).alias("alpha"),
    )


def hits(
    edges: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    n_iter: int = 8,
    step_decimals: int = 12,
    round_decimals: int = 6,
) -> DataFrame:
    """HITS hubs & authorities (Kleinberg 1999, public knowledge) over a
    directed edge frame — the bipartite-flavored companion to
    ``pagerank``: a good HUB points at good authorities, a good
    AUTHORITY is pointed at by good hubs. On a curation graph
    (curator → document, buyer → supplier, citing → cited) the two
    scores separate "who selects well" from "what is selected".

    Power iteration, ``n_iter`` fixed rounds: authority
    a(v) = Σ h(u) over in-edges, then hub h(u) = Σ a(v) over
    out-edges; each half-step L1-normalizes and rounds to
    ``step_decimals`` so the trajectory is identical across partition
    orders and engines (the k-means gate discipline — partial-sum
    reorder perturbs doubles at ~1e-16, rounding absorbs it; 12 dp
    keeps ~6 significant digits even at 1e-6-scale scores). Final
    scores rescale to max = 1 and round to ``round_decimals``.

    Scale shape per half-step: one hash join of the edge frame against
    the (node, score) frame (V rows — AQE broadcasts while small) and
    one groupBy partial-agg shuffle; edges are persisted once; 2·n_iter
    bounded rounds, no window, nothing collected.

    Output: ``node, hub, authority`` for every node in the edge frame
    (0.0 for a side the node never plays)."""
    from weaviate_txtai_spark.cache import scoped_persist

    if n_iter < 1:
        raise ValueError("hits: n_iter must be >= 1")

    e = scoped_persist(
        edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
        .filter(F.col("s").isNotNull() & F.col("d").isNotNull())
        .distinct()
    )
    srcs = e.select(F.col("s").alias("node")).distinct()
    dsts = e.select(F.col("d").alias("node")).distinct()

    def _l1(scores: DataFrame, col: str) -> DataFrame:
        tot = scores.agg(F.sum(col).alias("__tot"))
        return scores.join(F.broadcast(tot)).select(
            "node",
            F.round(F.col(col) / F.col("__tot"), step_decimals).alias(col),
        )

    h = _l1(srcs.withColumn("h", F.lit(1.0)), "h").localCheckpoint(
        eager=False
    )
    a = None
    for _ in range(n_iter):
        a = _l1(
            e.join(h.withColumnRenamed("node", "s"), "s")
            .groupBy(F.col("d").alias("node"))
            .agg(F.sum("h").alias("a")),
            "a",
        ).localCheckpoint(eager=False)
        h = _l1(
            e.join(a.withColumnRenamed("node", "d"), "d")
            .groupBy(F.col("s").alias("node"))
            .agg(F.sum("a").alias("h")),
            "h",
        ).localCheckpoint(eager=False)

    nodes = srcs.unionByName(dsts).distinct()
    hmax = h.agg(F.max("h").alias("__mh"))
    amax = a.agg(F.max("a").alias("__ma"))
    return (
        nodes.join(h, "node", "left")
        .join(a, "node", "left")
        .join(F.broadcast(hmax))
        .join(F.broadcast(amax))
        .select(
            "node",
            F.round(
                F.coalesce(F.col("h") / F.col("__mh"), F.lit(0.0)),
                round_decimals,
            ).alias("hub"),
            F.round(
                F.coalesce(F.col("a") / F.col("__ma"), F.lit(0.0)),
                round_decimals,
            ).alias("authority"),
        )
    )

def _local_hits_exact(e: DataFrame, n_iter: int, scale: int) -> DataFrame:
    """Single-task replica of the ``hits_exact`` integer recursion —
    bit-identical: the quantized-floor normalization below is the same
    pure-integer computation the distributed half-steps run, and every
    intermediate is bounded within int64 by the same argument (v2 ≤
    ~1e6, v2·scale ≤ ~1e18). See ``hits_exact`` for the algebra.
    Id-type-agnostic (masses live on indices; ids only name rows)."""
    import pandas as pd

    id_type = dict(e.dtypes)["s"]

    def run(batches):
        import numpy as np

        ss, ds = [], []
        for b in batches:
            ss.append(b["s"].to_numpy())
            ds.append(b["d"].to_numpy())
        if not ss:
            yield pd.DataFrame({"node": pd.Series([], dtype="object"),
                                "hub_fp": pd.Series([], dtype="int64"),
                                "auth_fp": pd.Series([], dtype="int64")})
            return
        s = np.concatenate(ss)
        d = np.concatenate(ds)
        nodes, inv = np.unique(np.concatenate([s, d]), return_inverse=True)
        si, di = inv[: len(s)], inv[len(s):]
        n = len(nodes)
        is_src = np.zeros(n, dtype=bool)
        is_src[si] = True

        def qnorm(vec):
            t = int(vec.sum())
            q = t // 1_000_000
            if q <= 0:
                # the previous half-step floored every value to 0: more
                # active near-equal-mass nodes than the 1e6-unit
                # quantization can resolve (independent of `scale` — at
                # n nodes each holds ~scale/n and survives the floor
                # only when n <= ~1e6). Raise rather than ZeroDivision:
                # the float hits() covers wider graphs.
                raise ValueError(
                    "hits_exact: quantization resolution exhausted "
                    "(> ~1e6 active equal-mass nodes); use hits() for "
                    "graphs this wide"
                )
            t2 = t // q
            return ((vec // q) * scale) // t2

        h = np.where(is_src, scale // int(is_src.sum()), 0).astype("int64")
        a = np.zeros(n, dtype="int64")
        for _ in range(n_iter):
            a = np.zeros(n, dtype="int64")
            np.add.at(a, di, h[si])
            a = qnorm(a)
            h = np.zeros(n, dtype="int64")
            np.add.at(h, si, a[di])
            h = qnorm(h)
        yield pd.DataFrame({"node": nodes, "hub_fp": h, "auth_fp": a})

    return e.repartition(1).mapInPandas(
        run, f"node {id_type}, hub_fp bigint, auth_fp bigint"
    )


def hits_exact(
    edges: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    n_iter: int = 4,
    scale: int = 10**12,
    round_decimals: int = 6,
    local_finish_edges: int = 2_000_000,
) -> DataFrame:
    """Fixed-point HITS — the ORACLE-GRADE variant of ``hits`` (the
    pagerank/pagerank_exact split): scores are scaled LONGs and each
    half-step's L1 normalization is the QUANTIZED pure-integer floor

        q = t div 10⁶;  t₂ = t div q;  out = ((v div q) · scale) div t₂

    (t = Σ raw scores). The exact ``(v·scale) div t`` needs 128-bit
    intermediates; the quantized form stays within int64 (v div q ≤
    ~10⁶, × scale ≤ ~10¹⁸) at the cost of ≤1e-6 RELATIVE quantization —
    applied IDENTICALLY by the distributed plan, the DuckDB oracle, and
    the numpy local kernel, so the trajectory is bit-identical
    everywhere, which per-step float rounding is not (a 1e-15 boundary
    flip re-feeds through the recursion — the holt_linear_exact
    lesson).

    Below ``local_finish_edges`` the whole recursion runs in one
    single-task pass (pure job overhead otherwise — 2·n_iter
    half-steps of join+agg on a tiny frame; measured 5.7 s → ~1.5 s at
    sf0.1 on the purchase graph).

    Output: ``node, hub, authority`` — fixed-point scores max-rescaled
    to 1 and rounded (doubles; the division of two longs is IEEE-exact
    identical on both engines)."""
    # mirror pagerank_exact's entry validation: the quantized norm
    # floor-divides by (t div 1e6), so scale < 1e6 would raise
    # ZeroDivisionError in the local kernel but NULL-out silently in
    # the distributed plan — reject divergent failure modes up front.
    # Resolution bound (independent of scale): the 1e6-unit quantized
    # norm can resolve at most ~1e6 active near-equal-mass nodes; past
    # that the floor zeroes the vector and the next half-step raises
    # (local kernel: ValueError; distributed: ANSI DIVIDE_BY_ZERO).
    # The float ``hits`` has no such bound — use it for wider graphs.
    if scale < 1_000_000:
        raise ValueError("hits_exact: scale must be >= 1e6")
    if n_iter < 1:
        raise ValueError("hits_exact: n_iter must be >= 1")
    e = scoped_persist(
        edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
        .filter(F.col("s").isNotNull() & F.col("d").isNotNull())
        .distinct()
    )

    if local_finish_edges and e.count() <= local_finish_edges:
        # EAGER checkpoint: the final score projection references the
        # fixed-point frame twice (the max aggregate's broadcast build
        # + the probe side), and a non-pinned reference re-planned —
        # and re-RAN — the whole single-task recursion per branch
        # (three copies in the gate plan before this; r13 opt). Lazy
        # left the kernel's first execution INSIDE the max aggregate's
        # broadcast-exchange thread (observed in the r14 job trace as a
        # multi-second single-task stage under withThreadLocalCaptured)
        # — racing any sibling consumer and, at scale, burning
        # spark.sql.broadcastTimeout; eager runs the kernel once as its
        # own job before any consumer plans against it (r14 opt)
        fp = _local_hits_exact(e, n_iter, scale).localCheckpoint(
            eager=True
        )
    else:
        srcs = e.select(F.col("s").alias("node")).distinct()
        n_src = srcs.count()
        h = srcs.withColumn("h", F.lit(scale // n_src))

        def qnorm_frame(scores: DataFrame, col: str) -> DataFrame:
            tot = scores.agg(F.sum(col).alias("__t"))
            return scores.join(F.broadcast(tot)).select(
                "node",
                F.expr(
                    f"(({col} div (__t div 1000000)) * {scale}L)"
                    f" div (__t div (__t div 1000000))"
                ).alias(col),
            )

        a = None
        for _ in range(n_iter):
            a = qnorm_frame(
                e.join(h.withColumnRenamed("node", "s"), "s")
                .groupBy(F.col("d").alias("node"))
                .agg(F.sum("h").alias("a")),
                "a",
            ).localCheckpoint(eager=False)
            h = qnorm_frame(
                e.join(a.withColumnRenamed("node", "d"), "d")
                .groupBy(F.col("s").alias("node"))
                .agg(F.sum("a").alias("h")),
                "h",
            ).localCheckpoint(eager=False)
        nodes = srcs.unionByName(
            e.select(F.col("d").alias("node")).distinct()
        ).distinct()
        fp = (
            nodes.join(h.withColumnRenamed("h", "hub_fp"), "node", "left")
            .join(a.withColumnRenamed("a", "auth_fp"), "node", "left")
            .select(
                "node",
                F.coalesce("hub_fp", F.lit(0)).alias("hub_fp"),
                F.coalesce("auth_fp", F.lit(0)).alias("auth_fp"),
            )
        )

    # ONE fused max aggregate (not one per score): two aggregates paid
    # two broadcast subtrees, each a full re-plan of fp's lineage
    mx = fp.agg(
        F.max("hub_fp").alias("__mh"), F.max("auth_fp").alias("__ma")
    )
    return (
        fp.join(F.broadcast(mx))
        .select(
            "node",
            F.round(
                F.col("hub_fp") / F.col("__mh"), round_decimals
            ).alias("hub"),
            F.round(
                F.col("auth_fp") / F.col("__ma"), round_decimals
            ).alias("authority"),
        )
    )


def bfs_hops(
    edges: DataFrame,
    seeds: DataFrame,
    *,
    max_hops: int,
    src_col: str = "src",
    dst_col: str = "dst",
    seed_col: str = "node",
) -> DataFrame:
    """Multi-source breadth-first shortest hop counts, level-synchronous.

    The bounded-radius reachability primitive curation pipelines run
    over entity/citation/co-purchase graphs ("everything within k hops
    of a seed set"): each level is ONE frontier-against-edges join plus
    a distinct and an anti-join against the settled set — the classic
    Pregel BFS superstep as DataFrame ops. Distances are INTEGERS, so
    the result is bit-identical on any engine with no rounding
    discipline needed (a recursive CTE replays it directly).

    Output: ``node, dist`` (int) for every node within ``max_hops`` of
    any seed; seeds themselves carry dist 0 (whether or not they touch
    an edge). Level-synchronous expansion guarantees minimality.

    Scale: per hop one shuffle on the node key; the settled set only
    grows, and newly-settled frontiers are lazily localCheckpointed so
    the k-level lineage never compounds (the order_scc 3^k lesson).
    Directed semantics — pass both directions for undirected graphs.
    """
    if max_hops < 0:
        raise ValueError("bfs_hops: max_hops must be >= 0")
    e = scoped_persist(
        # NULL endpoints excluded: a NULL dst would surface as a
        # reachable pseudo-"node" in the output (NULL src edges are
        # already unjoinable, but filter both for one clear contract)
        edges.select(F.col(src_col).alias("s"), F.col(dst_col).alias("d"))
        .filter(F.col("s").isNotNull() & F.col("d").isNotNull())
    )
    dist = (
        seeds.select(F.col(seed_col).alias("node"))
        .filter(F.col("node").isNotNull())  # a NULL seed is not a node
        .distinct()
        .select("node", F.lit(0).cast("int").alias("dist"))
    )
    frontier = dist.select("node")
    for h in range(1, max_hops + 1):
        nxt = (
            e.join(frontier, e.s == frontier.node)
            .select(F.col("d").alias("node"))
            .distinct()
        )
        newly = (
            nxt.join(dist, "node", "left_anti")
            .select("node", F.lit(h).cast("int").alias("dist"))
            .localCheckpoint(eager=False)
        )
        dist = dist.unionByName(newly)
        frontier = newly.select("node")
    return dist


def personalized_pagerank_exact(
    edges: DataFrame,
    seeds: DataFrame,
    *,
    iters: int = 3,
    damping_num: int = 85,
    damping_den: int = 100,
    scale: int = 10**12,
    src_col: str = "src",
    dst_col: str = "dst",
    seed_col: str = "id",
) -> DataFrame:
    """Personalized (topic-sensitive) PageRank: teleport mass returns
    to the SEED set instead of uniformly — the "expand this seed
    corpus by graph proximity" primitive (Haveliwala 2002) curation
    pipelines run to grow a trusted domain list or a seed document
    set along a similarity graph.

    Same fixed-point discipline as :func:`pagerank_exact` (scaled
    LONGS, floor division, bit-identical trajectories): starting mass
    and the (1−d) teleport split ``scale div |S|`` over seeds; dangling
    mass also returns to the seeds. Non-seed nodes receive mass only
    through edges, so scores decay with graph distance from the seeds.

    Output: ``id, rank_fp`` over all graph nodes ∪ seeds.

    Scale shape: per iteration one edges⋈ranks join + one groupBy(dst)
    partial agg + a 1-row dangling broadcast; the seed flag rides a
    broadcast-eligible join. No local-finish variant (the distributed
    arithmetic is already exact; small graphs just pay job overhead).
    """
    if scale <= 0 or damping_den <= 0 or not (
        0 <= damping_num <= damping_den
    ):
        raise ValueError("personalized_pagerank_exact: invalid damping/scale")
    if iters < 1:
        raise ValueError("personalized_pagerank_exact: iters must be >= 1")
    e = scoped_persist(
        # NULL endpoints excluded (same reason as pagerank: a grouped
        # NULL endpoint mints a mass-absorbing pseudo-node)
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
    )
    s = scoped_persist(
        # a NULL seed has no identity to teleport to — and it would
        # inflate n_seeds, diluting every real seed's share
        seeds.select(F.col(seed_col).alias("id"))
        .filter(F.col("id").isNotNull())
        .distinct()
    )
    n_seeds = s.count()
    if n_seeds == 0:
        raise ValueError("personalized_pagerank_exact: empty seed set")
    nodes = scoped_persist(
        e.select(F.col("src").alias("id"))
        .union(e.select(F.col("dst").alias("id")))
        .union(s.select("id"))
        .distinct()
        .join(s.withColumn("__s", F.lit(1)), "id", "left")
        .select("id", F.coalesce("__s", F.lit(0)).alias("is_seed"))
    )
    deg = scoped_persist(
        e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    )
    base = ((damping_den - damping_num) * scale) // (damping_den * n_seeds)
    ranks = nodes.select(
        "id",
        "is_seed",
        F.when(F.col("is_seed") == 1, F.lit(scale // n_seeds))
        .otherwise(F.lit(0)).cast("long").alias("r"),
    )
    for it in range(iters):
        if it:
            ranks = ranks.localCheckpoint(eager=False)
        dangling = (
            ranks.join(deg, ranks.id == deg.src, "left_anti")
            .agg(F.coalesce(F.sum("r"), F.lit(0)).cast("long").alias("dm"))
        )
        contrib = (
            e.join(
                ranks.select(F.col("id").alias("src"), "r"), "src"
            )
            .join(deg, "src")
            .groupBy("dst")
            .agg(F.sum(F.expr("r div deg")).alias("mass"))
        )
        ranks = (
            nodes.join(contrib, nodes.id == contrib.dst, "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "id",
                "is_seed",
                (
                    F.when(F.col("is_seed") == 1, F.lit(base)).otherwise(
                        F.lit(0)
                    )
                    + F.expr(
                        f"({damping_num} * (coalesce(mass, 0L)"
                        f" + if(is_seed = 1, dm div {n_seeds}L, 0L)))"
                        f" div {damping_den}"
                    )
                ).cast("long").alias("r"),
            )
        )
    return ranks.select("id", F.col("r").alias("rank_fp"))


def modularity(
    edges: DataFrame,
    labels: DataFrame,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    id_col: str = "id",
    label_col: str = "label",
    round_decimals: int = 6,
) -> DataFrame:
    """Newman modularity of a node partition over an undirected graph:
    Q = Σ_c [ e_c/m − (d_c/2m)² ] — the standard "do these labels
    respect the graph structure?" diagnostic, run over the kNN graph
    of an embedding corpus to score a clustering / topic labeling
    against geometric neighborhoods before trusting it for curation.

    The input edge frame is SYMMETRIZED and deduplicated internally
    (least/greatest endpoint ordering), so directed kNN edges are fine;
    self-loops are dropped. Every term is a ratio of exact integer
    counts — deterministic across engines with output-only rounding.

    Output: one row per label — ``label, n_nodes, e_in, d_sum,
    q_part`` — plus the graph totals repeated (``m_edges``) so
    Σ q_part is the modularity. Unlabeled endpoints count toward m and
    degrees but form no community row (document the labeling gap
    upstream).

    Scale: one distinct over the symmetrized edge key, one degree agg,
    two label joins (labels broadcast-eligible at dimension size), one
    groupBy(label) — no quadratic anywhere.
    """
    und = scoped_persist(
        edges.filter(F.col(src_col) != F.col(dst_col))
        .select(
            F.least(F.col(src_col), F.col(dst_col)).alias("u"),
            F.greatest(F.col(src_col), F.col(dst_col)).alias("v"),
        )
        .distinct()
    )
    lab = scoped_persist(
        labels.select(
            F.col(id_col).alias("__id"), F.col(label_col).alias("__lab")
        ).distinct()
    )
    m = und.agg(F.count(F.lit(1)).cast("double").alias("__m"))
    deg = (
        und.select(F.col("u").alias("__id"))
        .unionByName(und.select(F.col("v").alias("__id")))
        .groupBy("__id")
        .agg(F.count(F.lit(1)).alias("__d"))
    )
    d_c = (
        deg.join(lab, "__id")
        .groupBy("__lab")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_nodes"),
            F.sum("__d").cast("long").alias("d_sum"),
        )
    )
    e_c = (
        und.join(lab.withColumnRenamed("__id", "u"), "u")
        .withColumnRenamed("__lab", "__lu")
        .join(
            lab.withColumnRenamed("__id", "v").withColumnRenamed(
                "__lab", "__lv"
            ),
            "v",
        )
        .filter(F.col("__lu") == F.col("__lv"))
        .groupBy(F.col("__lu").alias("__lab"))
        .agg(F.count(F.lit(1)).cast("long").alias("e_in"))
    )
    return (
        d_c.join(e_c, "__lab", "left")
        .join(F.broadcast(m))
        .select(
            F.col("__lab").alias("label"),
            "n_nodes",
            F.coalesce("e_in", F.lit(0)).cast("long").alias("e_in"),
            "d_sum",
            F.col("__m").cast("long").alias("m_edges"),
            F.round(
                F.coalesce("e_in", F.lit(0)) / F.col("__m")
                - (F.col("d_sum") / (2 * F.col("__m")))
                * (F.col("d_sum") / (2 * F.col("__m"))),
                round_decimals,
            ).alias("q_part"),
        )
    )
