"""Bradley–Terry pairwise-preference ranking (fixed-point).

Bradley & Terry 1952; the MM update of Hunter 2004 (public knowledge):
given pairwise win counts, item strengths p satisfy

    p_i ← W_i / Σ_{j≠i} n_ij / (p_i + p_j)

(W_i = total wins of i, n_ij = comparisons between i and j). This is
the ranking model behind arena-style LLM evaluation and preference-
data curation — aggregating noisy pairwise judgments into a scalar
strength per model/document/prompt.

ORACLE-GRADE arithmetic: the iteration is a float fixed-point that
never locks across engines (the pagerank_exact lesson), so strengths
are scaled LONGS and every division floors:

    t_ij = (n_ij · S) div max(p_i + p_j, 1)       [S = 1e9]
    p_i' = (W_i · S) div max(Σ_j t_ij, 1)
    p_i'' = least(p_i', CAP)                      [CAP = 1e12]

The CAP keeps ANSI int64 sums safe (Σ p over the item domain) and only
binds transiently for never-losing items; the floor at 1 keeps
never-winning items from zeroing the pair denominator. Identical
pure-integer steps run in the distributed plan and the unrolled-CTE
DuckDB oracle, so the T-step trajectory is bit-identical.

Scale shape per iteration: pair-table ⋈ strengths (both endpoints) +
one groupBy(item) partial-agg shuffle — the pagerank shape; the pair
table persists once; T is fixed and small.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from weaviate_txtai_spark.cache import scoped_persist

_S = 10**9
_CAP = 10**12


def bradley_terry_exact(
    pairs: DataFrame,
    *,
    winner_col: str = "winner",
    loser_col: str = "loser",
    n_iter: int = 8,
    round_decimals: int = 6,
) -> DataFrame:
    """Fixed-point Bradley–Terry strengths from a (winner, loser) pair
    frame (one row per decided comparison; ties excluded upstream).

    Output: ``item, strength`` — fixed-point strengths max-rescaled to
    1.0 and rounded (the hits_exact output convention)."""
    if n_iter < 1:
        raise ValueError("bradley_terry_exact: n_iter must be >= 1")
    w = pairs.select(
        F.col(winner_col).alias("i"), F.col(loser_col).alias("j")
    ).filter(
        # a NULL endpoint is not a decided comparison: it would leave
        # phantom rows in the symmetric count table whose join-misses
        # silently skew the surviving side's denominator
        F.col(winner_col).isNotNull() & F.col(loser_col).isNotNull()
    )
    # undirected comparison counts + per-item wins
    und = scoped_persist(
        w.select("i", "j")
        .unionByName(w.select(F.col("j").alias("i"), F.col("i").alias("j")))
        .groupBy("i", "j")
        .agg(F.count(F.lit(1)).alias("n"))
    )  # n(i,j) = comparisons between i and j (each decided pair counted
    #    once per direction row; the union makes the table symmetric)
    wins = scoped_persist(
        w.groupBy("i").agg(F.count(F.lit(1)).alias("wins"))
    )
    items = und.select("i").distinct()
    p = items.select("i", F.lit(_S).alias("p"))
    for _ in range(n_iter):
        t = (
            und.join(p.select(F.col("i"), F.col("p").alias("pi")), "i")
            .join(
                p.select(F.col("i").alias("j"), F.col("p").alias("pj")),
                "j",
            )
            .select(
                "i",
                F.expr(
                    f"(n * {_S}L) div greatest(pi + pj, 1L)"
                ).alias("t"),
            )
            .groupBy("i")
            .agg(F.sum("t").alias("denom"))
        )
        p = (
            t.join(wins, "i", "left")
            .select(
                "i",
                F.least(
                    F.expr(
                        f"(coalesce(wins, 0L) * {_S}L)"
                        f" div greatest(denom, 1L)"
                    ),
                    F.lit(_CAP),
                ).alias("p"),
            )
            .localCheckpoint(eager=False)
        )
    mx = p.agg(F.max("p").alias("__m"))
    return (
        p.join(F.broadcast(mx))
        .select(
            F.col("i").alias("item"),
            F.round(F.col("p") / F.col("__m"), round_decimals).alias(
                "strength"
            ),
        )
    )
