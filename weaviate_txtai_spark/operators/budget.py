"""Token-budget allocation across sources — capped water-filling.

The curation step between counting and sampling: a pretraining run has
a total token budget B and per-source token inventories a_i; taking
proportionally over-weights the giant sources (CommonCrawl swamps
Wikipedia), taking uniformly wastes budget on sources smaller than the
uniform share. Water-filling allocates

    alloc_i = min(a_i, θ)   with θ chosen so Σ alloc_i = B

— every source below the water level θ is taken whole, every larger
source is capped at θ (max-min fair allocation; the same θ-threshold
construction as network fair queuing — public knowledge). Downstream,
``functions.sampling.source_quota_sample`` turns the allocation into
actual row draws.

Scale shape: the input is the PER-SOURCE aggregate (counting tokens
over the raw corpus is the caller's fully-distributed groupBy; 100 TB
of text still aggregates to one row per source). θ comes from a
prefix-sum over sources sorted by inventory — a single unpartitioned
window over #sources rows, fine at any real source cardinality (tens
to low thousands); the closed form needs no iteration and no collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def waterfill_allocation(
    per_source: DataFrame,
    budget: float,
    *,
    key_col: str = "source",
    amount_col: str = "tokens",
    decimals: int = 6,
) -> DataFrame:
    """Allocate ``budget`` across sources by capped water-filling.

    ``per_source``: one row per source with its total inventory
    (non-negative). Returns (key, amount, alloc) where
    alloc = min(amount, θ) and Σ alloc = min(budget, Σ amount) exactly
    (when total inventory ≤ budget every source is taken whole).
    Allocations are fractional tokens rounded to ``decimals`` — the
    caller floors or samples to integers as needed.

    θ derivation over sources sorted ascending by inventory a_(1) ≤ …
    ≤ a_(n) with prefix sums S_j = Σ_{i≤j} a_(i): source j is taken
    whole iff S_{j-1} + (n-j+1)·a_(j) ≤ B (filling everyone remaining
    to a_(j) still fits); for the rest θ = (B − S_J) / (n − J) where J
    is the last whole-taken index.
    """
    if budget < 0:
        raise ValueError(f"waterfill_allocation: negative budget {budget}")
    amt = F.col(amount_col).cast("double")
    a = per_source.select(
        F.col(key_col).alias("__k"),
        # in-plan validation (no extra action): a NULL/negative/NaN
        # inventory silently corrupts the prefix sums and θ — Σ alloc
        # would no longer equal min(budget, Σ amount)
        F.when(
            amt.isNull() | (amt < 0) | F.isnan(amt),
            F.raise_error(
                F.concat(
                    F.lit(
                        "waterfill_allocation: inventory must be a "
                        "non-negative number; got "
                    ),
                    F.coalesce(amt.cast("string"), F.lit("NULL")),
                    F.lit(" for source "),
                    F.coalesce(F.col(key_col).cast("string"), F.lit("NULL")),
                )
            ).cast("double"),
        )
        .otherwise(amt)
        .alias("__a"),
    )
    # deterministic total order (amount, then key) so prefix sums are
    # reproducible across runs even with tied inventories
    w = Window.orderBy(F.asc("__a"), F.asc("__k"))
    ranked = a.withColumn("__j", F.row_number().over(w)).withColumn(
        "__prefix", F.sum("__a").over(w)
    )
    n = F.max("__j").over(Window.partitionBy())
    b = F.lit(float(budget))
    # whole-taken test: prefix BEFORE this source + everyone from here
    # up filled to this source's level still fits the budget
    whole = (F.col("__prefix") - F.col("__a")) + (
        n - F.col("__j") + 1
    ) * F.col("__a") <= b
    ranked = ranked.withColumn("__whole", whole)
    # S_J and J of the last whole-taken source (0 when none fits whole)
    agg = Window.partitionBy()
    s_j = F.max(F.when(F.col("__whole"), F.col("__prefix"))).over(agg)
    j = F.max(F.when(F.col("__whole"), F.col("__j"))).over(agg)
    theta = (b - F.coalesce(s_j, F.lit(0.0))) / (
        n - F.coalesce(j, F.lit(0))
    )
    return ranked.select(
        F.col("__k").alias(key_col),
        F.round("__a", decimals).alias(amount_col),
        F.round(
            F.when(F.col("__whole"), F.col("__a")).otherwise(
                F.least(F.col("__a"), theta)
            ),
            decimals,
        ).alias("alloc"),
    )
