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


def knn_label_loo_accuracy(
    emb: DataFrame,
    *,
    k: int = 3,
    id_col: str = "vec_id",
    vector_col: str = "embedding",
    label_col: str = "label",
    round_decimals: int = 6,
) -> DataFrame:
    """Leave-one-out kNN label accuracy over an embedding corpus: each
    point is classified by the majority label of its k nearest cosine
    neighbors (self excluded by construction) and scored against its
    own label — the direct "do labels agree with geometry" readout,
    the classifier-view companion to the modularity diagnostic.

    Majority ties break on the smaller label (vote count DESC, label
    ASC) — deterministic and replayable. Output: one row per true
    label — ``label, n, n_correct, accuracy`` — so per-class collapse
    is visible, not averaged away.

    Scale: the kNN graph build (GEMM/IVF paths apply); then one
    label join + a per-point window over ≤k vote rows.
    """
    from pyspark.sql import Window as W

    from weaviate_txtai_spark.operators.graph import knn_graph

    g = knn_graph(emb, k, id_col=id_col, vector_col=vector_col)
    lab = emb.select(
        F.col(id_col).alias("__id"), F.col(label_col).alias("__lab")
    )
    votes = (
        g.join(lab.withColumnRenamed("__id", "dst"), "dst")
        .groupBy(F.col("src"), F.col("__lab").alias("pred"))
        .agg(F.count(F.lit(1)).alias("__votes"))
    )
    w = W.partitionBy("src").orderBy(F.desc("__votes"), F.asc("pred"))
    top = (
        votes.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("src", "pred")
    )
    scored = top.join(
        lab.withColumnRenamed("__id", "src").withColumnRenamed(
            "__lab", "truth"
        ),
        "src",
    )
    return (
        scored.groupBy(F.col("truth").alias(label_col))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(
                F.when(F.col("pred") == F.col("truth"), 1).otherwise(0)
            ).cast("long").alias("n_correct"),
        )
        .select(
            label_col,
            "n",
            "n_correct",
            F.round(
                F.col("n_correct") / F.col("n"), round_decimals
            ).alias("accuracy"),
        )
    )
