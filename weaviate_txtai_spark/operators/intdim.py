"""TwoNN intrinsic-dimension estimate for an embedding corpus.

Facco et al. 2017 ("Estimating the intrinsic dimension of datasets by
a minimal neighborhood information"): for each point take the
distances to its two nearest neighbors; under a locally-uniform
density the ratio μ = d₂/d₁ is Pareto(id) distributed, giving the MLE

    id = n / Σ ln μ_i .

Curation pipelines use this as an embedding-space health diagnostic —
a collapsed encoder (id ≈ 1-2) or an unstructured one (id ≈ ambient
dim) both flag trouble before any retrieval metric moves.

Built on the kNN machinery (``graph.knn_graph``, k=2), so the same
GEMM/blocked/IVF scale strategies apply; the gate-mode brute-force
pairing is quadratic but the estimator itself only ever consumes the
top-2 rows per point. Points with d₁ = 0 (exact duplicates) or
d₂ = d₁ (ties — zero information under the continuous model) are
excluded and reported via ``n_used``.

Determinism: neighbor scores arrive 6-dp-rounded from knn_graph, so
the μ ratios are built from identical doubles on both engines; the
final ln-sum is rounded on output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def twonn_intrinsic_dim(
    emb: DataFrame,
    *,
    id_col: str = "vec_id",
    vector_col: str = "embedding",
    round_decimals: int = 6,
) -> DataFrame:
    """One-row TwoNN MLE: ``n_used, id_mle`` (NULL when no usable
    pairs, e.g. an all-duplicates corpus)."""
    from weaviate_txtai_spark.operators.graph import knn_graph

    g = knn_graph(emb, 2, id_col=id_col, vector_col=vector_col)
    top2 = g.groupBy("src").agg(
        (1.0 - F.max("score")).alias("d1"),
        (1.0 - F.min("score")).alias("d2"),
    )
    mu = top2.filter(
        (F.col("d1") > 0) & (F.col("d2") > F.col("d1"))
    ).select(F.log(F.col("d2") / F.col("d1")).alias("__lnmu"))
    return mu.agg(
        F.count(F.lit(1)).cast("long").alias("n_used"),
        F.round(
            F.try_divide(
                F.count(F.lit(1)).cast("double"), F.sum("__lnmu")
            ),
            round_decimals,
        ).alias("id_mle"),
    )
