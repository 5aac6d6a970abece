"""DBSCAN density clustering (Ester et al. 1996), composed from the
engine's own primitives: an ε-neighbor pair table (exact broadcast
join, LSH bucketed join, or IVF — caller's choice, the
``dedup_survivors(docs, pairs)`` composition style) + degree counting
+ connected components over the core sub-graph.

Semantics (deterministic variant):
- CORE: a point with ≥ ``min_neighbors`` OTHER points within ε
  (standard minPts counts the point itself: minPts = min_neighbors+1);
- clusters: connected components of the core–core ε-graph (exactly
  the textbook result — two cores in one cluster iff core-chained);
- BORDER: a non-core point ε-adjacent to ≥1 core, assigned the
  MINIMUM cluster label among its adjacent cores (the textbook leaves
  border ties order-dependent; min makes the output a pure function
  of the data);
- NOISE: everything else (cluster NULL).

Scale notes: degrees and the border assignment are aggregates/joins on
the pair table; the only iteration is ``connected_components``
(large-star/small-star, O(log² n) rounds) over the CORE sub-graph —
the densest part of the ε-graph but only its edges, never all pairs.
The ε-pair generation dominates cost and is exactly the engine's
similarity-join problem, already tiered (exact / LSH / IVF-PQ).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from weaviate_txtai_spark.operators.graph import connected_components


def dbscan(
    ids: DataFrame,
    pairs: DataFrame,
    *,
    id_col: str = "id",
    left_col: str = "i",
    right_col: str = "j",
    min_neighbors: int = 3,
) -> DataFrame:
    """Cluster assignment from an undirected ε-pair table (one row per
    unordered pair, both columns ids). Output: one row per input id —
    ``id, role ('core'|'border'|'noise'), cluster`` (NULL for noise).
    """
    if min_neighbors < 1:
        raise ValueError("min_neighbors must be >= 1")
    e = pairs.select(
        F.col(left_col).alias("a"), F.col(right_col).alias("b")
    ).filter(F.col("a") != F.col("b"))
    both = e.unionAll(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
    from weaviate_txtai_spark.cache import scoped_persist

    both = scoped_persist(both.distinct(), eager=True)  # r14: fill first
    deg = both.groupBy("a").agg(F.count(F.lit(1)).alias("__deg"))
    core = deg.filter(F.col("__deg") >= min_neighbors).select(
        F.col("a").alias("n")
    )
    core_edges = (
        both.join(core.withColumnRenamed("n", "a"), "a", "left_semi")
        .join(core.withColumnRenamed("n", "b"), "b", "left_semi")
        .select(F.col("a").alias("src"), F.col("b").alias("dst"))
    )
    # isolated cores (no core neighbor) still form singleton clusters:
    # self-loops keep them in the component output
    comp_in = core_edges.unionByName(
        core.select(F.col("n").alias("src"), F.col("n").alias("dst"))
    )
    comp = connected_components(comp_in).select(
        F.col("node").alias("n"), F.col("component").alias("cluster")
    )
    core_out = core.join(comp, "n").select(
        F.col("n").alias(id_col),
        F.lit("core").alias("role"),
        "cluster",
    )
    # border: non-core adjacent to a core; min adjacent core cluster
    border = (
        both.join(comp.withColumnRenamed("n", "b"), "b")
        .join(core.withColumnRenamed("n", "a"), "a", "left_anti")
        .groupBy("a")
        .agg(F.min("cluster").alias("cluster"))
        .select(
            F.col("a").alias(id_col),
            F.lit("border").alias("role"),
            "cluster",
        )
    )
    assigned = core_out.unionByName(border)
    noise = (
        # NULL ids excluded: the pair table drops them by comparison
        # semantics, so restoring them here would mislabel an unkeyed
        # row as a real 'noise' point
        ids.filter(F.col(id_col).isNotNull())
        .select(F.col(id_col))
        .join(assigned.select(id_col), id_col, "left_anti")
        .select(
            id_col,
            F.lit("noise").alias("role"),
            F.lit(None).cast(dict(assigned.dtypes)["cluster"]).alias(
                "cluster"
            ),
        )
    )
    return assigned.unionByName(noise)
