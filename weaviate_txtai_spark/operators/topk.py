"""Batch kNN top-k search (SURVEY §2.2 Q1/Q2/Q3/Q5 — the flagship operator).

The reference serves ONE query vector per call and silently drops the rest
(``queries[0]``, /root/reference/weaviate_txtai/ann/weaviate.py:177), asking
a server-side HNSW for the top ``limit`` by cosine distance, then rescoring
``1 - distance`` (weaviate.py:193-201). Our operator is batch-first and
strictly more general: N query vectors × M stored vectors in one plan.

Physical strategy (designed for 100 TB / 1000 executors):
- The query side is small (human-issued queries) → **broadcast** it; the
  index side streams through executors partition-by-partition. No shuffle
  of the big side ever happens.
- Scoring is a native column expression (JVM-side, no Python boundary;
  note the HOF fold inside it evaluates interpreted — see
  ``functions/vector.py`` — which is why ``knn_topk_gemm`` is the
  many-query path).
- Top-k per query = window ``row_number() <= k`` partitioned by query id.
  The map-side is embarrassingly parallel; the only shuffle is the final
  (num_queries × k × partitions)-row merge, which AQE coalesces.
- For a single query we use ``orderBy().limit(k)`` which Catalyst plans as
  ``TakeOrderedAndProject`` — per-partition heaps + driver merge, zero
  shuffle.
- ``knn_topk_gemm`` is the scale path for large query batches: Arrow-batched
  numpy GEMM over ``mapInPandas`` with per-partition top-k reduction, so the
  rows crossing the final shuffle are k per (query, partition), never M×N.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

from weaviate_txtai_spark.functions.vector import cosine_sim


def knn_topk(
    index_df: DataFrame,
    query_df: DataFrame,
    k: int,
    *,
    vector_col: str = "vector",
    id_col: str = "docid",
    query_vector_col: str = "query_vector",
    query_id_col: str = "query_id",
    score_round: int | None = None,
) -> DataFrame:
    """Top-k cosine neighbors for every query vector.

    Returns columns: ``query_id, docid(id_col), score, rank`` with the
    deterministic tie-break (score DESC, id ASC) so results are
    oracle-hashable.
    """
    q = F.broadcast(
        # NULL query ids excluded: the rank window partitions by query
        # id, so every unkeyed query's candidates would lump into ONE
        # ranked list interleaving unrelated queries' neighbors
        query_df.filter(F.col(query_id_col).isNotNull()).select(
            F.col(query_id_col).alias("__qid"), F.col(query_vector_col).alias("__qv")
        )
    )
    scored = index_df.crossJoin(q).select(
        F.col("__qid").alias(query_id_col),
        F.col(id_col),
        cosine_sim(F.col(vector_col), F.col("__qv")).alias("score"),
    )
    if score_round is not None:
        scored = scored.withColumn("score", F.round("score", score_round))
    w = Window.partitionBy(query_id_col).orderBy(F.desc("score"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def knn_single(
    index_df: DataFrame,
    query_vector: list[float],
    k: int,
    *,
    vector_col: str = "vector",
    id_col: str = "docid",
) -> DataFrame:
    """Single-query top-k, planned as TakeOrderedAndProject (no shuffle).

    This is the exact reference hot path (weaviate.py:175-201): one query
    vector, ``limit`` results, cosine similarity scores.
    """
    qv = F.lit([float(x) for x in query_vector])
    return (
        index_df.select(
            F.col(id_col), cosine_sim(F.col(vector_col), qv).alias("score")
        )
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(k)
    )


def _infer_query_id_type(qids):
    """Map the first query id's Python/numpy type onto a Spark DataType.

    Only int (→ Long) and str (→ String) ids are supported — anything
    else (float, bytes, bool …) raises instead of silently serializing
    as StringType and dying later inside Arrow (ADVICE r2). Callers that
    know the type (topk_join passes the left frame's schema) skip this.
    """
    from pyspark.sql.types import StringType

    first = qids[0]
    if hasattr(first, "item"):  # unwrap numpy scalar
        first = first.item()
    # bool is an int subclass in Python AND np.bool_.item() is bool —
    # check it first so boolean ids fail loudly, not as LongType
    if isinstance(first, bool):
        raise TypeError(
            "knn_topk_gemm: boolean query ids are not supported; pass "
            "query_id_type explicitly if the ids are genuinely 0/1 ints"
        )
    if isinstance(first, int):
        return LongType()
    if isinstance(first, str):
        return StringType()
    raise TypeError(
        f"knn_topk_gemm: unsupported query id type {type(first).__name__}; "
        "pass query_id_type= (a pyspark DataType) explicitly"
    )


def knn_topk_gemm(
    index_df: DataFrame,
    queries: "list[tuple[int, list[float]]] | pd.DataFrame",
    k: int,
    *,
    vector_col: str = "vector",
    id_col: str = "docid",
    query_id_type=None,
    metric: str = "cosine",
    dist_round_decimals: "int | None" = 6,
) -> DataFrame:
    """Scale-path batch kNN: numpy GEMM per Arrow batch + two-level top-k.

    Why: with Q queries, the expression path evaluates Q × M cosine exprs
    row-at-a-time; a BLAS matmul on (batch × dim) @ (dim × Q) does the same
    work vectorized. Queries ship to every task closure (they're small —
    same broadcast assumption the reference makes with its single query
    vector). Each partition emits only its local top-k per query, so the
    final window sees k × Q × num_partitions rows.

    ``query_id_type``: Spark DataType of ``query_id`` in the output.
    Callers holding the query frame should pass its schema type
    (``left.schema[left_id].dataType``); when omitted it is inferred from
    the first id — int → Long, str → String, anything else raises
    (ADVICE r2: silent StringType fallback crashed Arrow for float ids).

    ``metric``: ``"cosine"`` (score = cosine similarity, rank DESC — the
    reference's only metric) or ``"l2"`` (score = Euclidean distance,
    rank ASC — the truth metric for the PQ/IVF family). Both use one
    GEMM per Arrow batch: for l2 the distance matrix comes from
    ``||x||² − 2·x@qᵀ + ||q||²``, never a per-pair Python loop.

    ``dist_round_decimals`` (l2 only, default 6 — the repo's PQ-family
    convention): the expanded form carries ~1e-8 cancellation noise vs
    an in-order ``(x−q)²`` fold, so near-tied distances could flip
    ranks across the two formulations. Ranking (and the emitted score)
    uses the ROUNDED distance, making ties resolve by id ASC
    identically in both — up to the usual midpoint caveat: a true
    distance within ~1e-8 of a 0.5·10⁻⁶ rounding boundary can still
    round apart (same class as the ADC half-even/half-up note in
    operators/pq.py). ``None`` disables rounding.

    Output: query_id, docid, score, rank — same contract as knn_topk.
    """
    import numpy as np

    if metric not in ("cosine", "l2"):
        raise ValueError(
            f"knn_topk_gemm: unknown metric {metric!r}; use 'cosine' or 'l2'"
        )

    if isinstance(queries, pd.DataFrame):
        qids = queries.iloc[:, 0].to_numpy()
        qmat = np.asarray(list(queries.iloc[:, 1]), dtype=np.float64)
    else:
        qids = np.asarray([q[0] for q in queries])
        qmat = np.asarray([q[1] for q in queries], dtype=np.float64)
    # a None query id would lump queries under one window partition
    # downstream (and np.asarray silently object-types the whole id
    # array) — a query without an identity is a caller bug, raise
    if any(q is None for q in qids.tolist()):
        raise ValueError("knn_topk_gemm: query ids must not be None")
    if len(qids) == 0:
        # empty query set → empty result, not an AxisError mid-pipeline;
        # the id type honors query_id_type instead of hardcoding Long so
        # empty and non-empty results union cleanly in string-id pipelines
        return index_df.sparkSession.createDataFrame(
            [],
            StructType(
                [
                    StructField("query_id", query_id_type or LongType()),
                    StructField(id_col, index_df.schema[id_col].dataType),
                    StructField("score", DoubleType()),
                    StructField("rank", LongType()),
                ]
            ),
        )
    # zero-norm guard matches the index side below: a zero query vector
    # must score 0 everywhere (deterministic output), not NaN — NaN made
    # the local top-k select nothing and SILENTLY dropped the query
    # one metric-specific auxiliary array: the kernel closure serializes
    # every captured local to every task, so computing BOTH the
    # normalized query matrix and the squared norms shipped an unused
    # (Q x dim) float64 array per task
    if metric == "l2":
        qaux = (qmat * qmat).sum(axis=1)  # (Q,) squared query norms
    else:
        qn = np.linalg.norm(qmat, axis=1, keepdims=True)
        qn[qn == 0.0] = 1.0
        qaux = qmat / qn  # (Q, dim) normalized queries

    # derive id types from the inputs: hardcoding LongType crashed the
    # Arrow serializer for string ids, making topk_join succeed or fail
    # depending on which strategy its row-count probe picked
    idx_id_type = index_df.schema[id_col].dataType
    q_id_type = query_id_type or _infer_query_id_type(qids)
    out_schema = StructType(
        [
            StructField("query_id", q_id_type),
            StructField(id_col, idx_id_type),
            StructField("score", DoubleType()),
        ]
    )

    def score_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            mat = np.asarray(list(pdf[vector_col]), dtype=np.float64)
            if metric == "l2":
                # ||x||² − 2 x·q + ||q||², clipped: fp cancellation can
                # dip a true-zero distance to ~-1e-13 and sqrt would NaN
                xsq = (mat * mat).sum(axis=1, keepdims=True)
                d2 = xsq - 2.0 * (mat @ qmat.T) + qaux[None, :]
                dists = np.sqrt(np.clip(d2, 0.0, None))  # (batch, Q)
                if dist_round_decimals is not None:
                    # rank on the rounded key (see docstring) so the
                    # local tie-widening, the lexsort, and the final
                    # window all agree with an expr-side round
                    dists = np.round(dists, dist_round_decimals)
                sims = -dists  # shared top-k code keeps "larger is better"
            else:
                norms = np.linalg.norm(mat, axis=1, keepdims=True)
                norms[norms == 0.0] = 1.0
                sims = (mat / norms) @ qaux.T  # (batch, Q)
            ids = pdf[id_col].to_numpy()
            kk = min(k, sims.shape[0])
            # Local top-k per query. argpartition alone keeps ARBITRARY
            # members of a score-tied group at the k boundary, which would
            # make results differ from knn_topk's deterministic
            # (score DESC, id ASC) tie-break depending on which path
            # VectorIndex.search picks. So: partition for the threshold,
            # widen to ALL rows at-or-above it (ties included), then
            # lexsort (id ASC within score DESC) before cutting to k —
            # bit-identical to the expression path for any tie pattern.
            part = np.argpartition(-sims, kk - 1, axis=0)[:kk]  # (k, Q)
            rows = []
            for j in range(sims.shape[1]):
                thresh = sims[part[:, j], j].min()
                cand = np.flatnonzero(sims[:, j] >= thresh)
                order = np.lexsort((ids[cand], -sims[cand, j]))[:kk]
                sel = cand[order]
                rows.append(
                    pd.DataFrame(
                        {
                            "query_id": qids[j],
                            id_col: ids[sel],
                            # l2 emits the true distance, not the negated
                            # ranking key the shared top-k code used
                            "score": -sims[sel, j] if metric == "l2" else sims[sel, j],
                        }
                    )
                )
            yield pd.concat(rows, ignore_index=True)

    from weaviate_txtai_spark.sources.tables import spread

    local = spread(index_df.select(id_col, vector_col)).mapInPandas(
        score_partition, schema=out_schema
    )
    score_order = F.asc("score") if metric == "l2" else F.desc("score")
    w = Window.partitionBy("query_id").orderBy(score_order, F.asc(id_col))
    return local.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def hamming_topk(
    codes: DataFrame,
    query_code: list[int],
    n: int,
    *,
    id_col: str = "vec_id",
    code_col: str = "sign_code",
) -> DataFrame:
    """Top-n rows by Hamming distance to a packed sign code (the
    1-bit/dim tier — see ``functions.vector.sign_pack``): distance is
    a per-word xor+popcount (JVM intrinsics) over a words-long array,
    then TakeOrderedAndProject (per-partition top-n, one n-row merge).
    Ascending distance, ties to the lowest id. Output: id, hamming,
    rank."""
    from weaviate_txtai_spark.functions.vector import hamming_dist

    # NULL-id rows are excluded up front (r13 join census): results are
    # keyed by id, and in the rerank composition an unkeyed shortlist
    # row can never re-join its float vector — it would silently waste
    # a shortlist slot and shrink the final top-n
    codes = codes.filter(F.col(id_col).isNotNull())
    qlit = F.array(*[F.lit(int(w)).cast("long") for w in query_code])
    scored = codes.select(
        id_col, hamming_dist(F.col(code_col), qlit).alias("hamming")
    )
    top = scored.orderBy(F.asc("hamming"), F.asc(id_col)).limit(n)
    w = Window.orderBy(F.asc("hamming"), F.asc(id_col))
    return top.withColumn("rank", F.row_number().over(w))


def hamming_topk_rerank(
    codes: DataFrame,
    vectors: DataFrame,
    query: list[float],
    query_code: list[int],
    n: int,
    *,
    shortlist: int = 10,
    id_col: str = "vec_id",
    code_col: str = "sign_code",
    vector_col: str = "embedding",
) -> DataFrame:
    """Production composition for the binary tier: Hamming shortlist
    over the 1-bit codes (the only corpus-wide scan — 256× less I/O
    than float32), then exact cosine re-rank of the ``shortlist×n``
    survivors' float vectors (broadcast semi-join on the tiny id set).
    Same shape as ``pq.adc_topk_rerank``; exact when the shortlist
    covers the corpus regardless of how lossy the sign codes are.
    Output: id, score (cosine, descending), rank."""
    cand = hamming_topk(
        codes, query_code, shortlist * n, id_col=id_col, code_col=code_col
    ).select(id_col)
    qlit = F.array(*[F.lit(float(v)) for v in query])
    exact = (
        vectors.join(F.broadcast(cand), id_col)
        .select(
            id_col,
            F.round(cosine_sim(F.col(vector_col), qlit), 6).alias("score"),
        )
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(n)
    )
    w = Window.orderBy(F.desc("score"), F.asc(id_col))
    return exact.withColumn("rank", F.row_number().over(w))
