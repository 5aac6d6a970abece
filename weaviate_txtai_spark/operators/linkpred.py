"""Link prediction over a bipartite relation: common-neighbors,
neighborhood Jaccard, and Adamic–Adar scores for entity pairs that
share items.

"Customers who bought the same rare parts", "documents citing the same
rare sources", "users touching the same rare files" — the standard
affinity signals (Liben-Nowell & Kleinberg 2003). Adamic–Adar weights
each shared item by 1/ln(degree), so ubiquitous items contribute ~0 and
rare items dominate.

Scale notes
-----------
The pair candidates come from a wedge self-join keyed on the ITEM — the
only join in the plan — and its fan-out per item is C(d, 2). A hot item
(a stopword-grade part everyone buys) would alone emit billions of
pairs, so ``max_item_degree`` drops items above the cap BEFORE the
join: per-item fan-out is bounded by C(cap, 2) and the hottest key the
shuffle ever sees is cap² rows. This is principled, not just
pragmatic — Adamic–Adar already discounts a degree-d item by 1/ln d, so
the capped items are precisely the ones carrying the least signal
(same df-cap move as dedup.py's inverted index and passages.py's
winnow_pairs). Items with degree 1 have no wedge and drop out
naturally, which also keeps 1/ln(d) defined (d ≥ 2 in any wedge).

Degrees for the Jaccard denominator are computed on the CAPPED graph
(consistent neighborhoods: |N(a) ∪ N(b)| = d_a + d_b − common) and
joined back by entity key — two hash joins against a degree table
bounded by the entity count, never a shuffle of the pair table beyond
its own aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def link_scores(
    edges: DataFrame,
    entity_col: str,
    item_col: str,
    *,
    max_item_degree: int = 1000,
    min_common: int = 1,
    round_decimals: int = 6,
) -> DataFrame:
    """Pairwise link-prediction scores over the bipartite ``edges``.

    Output: one row per entity pair (e1 < e2) sharing ≥ ``min_common``
    items of degree ≤ ``max_item_degree``: ``e1, e2, common,
    jaccard, adamic_adar`` (floats rounded)."""
    e = edges.select(
        F.col(entity_col).alias("e"), F.col(item_col).alias("i")
    ).distinct()
    deg = e.groupBy("i").agg(F.count(F.lit(1)).alias("__d"))
    # item-keyed join, same key as the wedge join below — no broadcast
    # hint: the degree table is one row per distinct item (can exceed
    # broadcast size at corpus scale), and AQE picks broadcast itself
    # when it fits
    g = e.join(deg.filter(F.col("__d") <= max_item_degree), "i")
    left = g.select(
        F.col("i"), F.col("e").alias("e1"), F.col("__d")
    )
    right = g.select(F.col("i"), F.col("e").alias("e2"))
    pairs = (
        left.join(right, "i")
        .filter(F.col("e1") < F.col("e2"))
        .groupBy("e1", "e2")
        .agg(
            F.count(F.lit(1)).cast("long").alias("common"),
            F.sum(1.0 / F.log("__d")).alias("__aa"),
        )
        .filter(F.col("common") >= min_common)
    )
    ent_deg = g.groupBy("e").agg(F.count(F.lit(1)).cast("long").alias("__ed"))
    d1 = ent_deg.select(F.col("e").alias("e1"), F.col("__ed").alias("__d1"))
    d2 = ent_deg.select(F.col("e").alias("e2"), F.col("__ed").alias("__d2"))
    return (
        pairs.join(d1, "e1")
        .join(d2, "e2")
        .select(
            "e1",
            "e2",
            "common",
            F.round(
                F.col("common")
                / (F.col("__d1") + F.col("__d2") - F.col("common")),
                round_decimals,
            ).alias("jaccard"),
            F.round("__aa", round_decimals).alias("adamic_adar"),
        )
    )
