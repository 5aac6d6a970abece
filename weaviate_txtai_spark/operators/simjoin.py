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
) -> DataFrame:
    """All pairs with cosine >= threshold (no k cap). Broadcast-nested-loop
    with the filter applied before any shuffle; output is usually tiny."""
    l = F.broadcast(
        left.select(F.col(left_id).alias("__lid"), F.col(left_vec).alias("__lv"))
    )
    return (
        right.crossJoin(l)
        .select(
            F.col("__lid").alias(left_id),
            F.col(right_id),
            F.round(cosine_sim(F.col(right_vec), F.col("__lv")), 6).alias("score"),
        )
        .filter(F.col("score") >= threshold)
    )
