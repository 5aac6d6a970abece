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


def capped_weighted_waterfill(
    per_source: DataFrame,
    budget: int,
    *,
    key_col: str = "source",
    weight_col: str = "weight",
    cap_col: str = "cap",
    decimals: int = 6,
) -> DataFrame:
    """WEIGHTED water-filling with per-source caps — the mixture-weight
    solver: alloc_i = min(cap_i, θ·w_i) with θ chosen so that
    Σ alloc = min(budget, Σ cap over w>0 sources). Plain water-filling
    (:func:`waterfill_allocation`) is the w_i ≡ 1 special case; here
    w_i encodes DESIRED mixture proportions (quality × temperature)
    and cap_i encodes HARD constraints (inventory, max corpus share).
    This is weighted max-min fairness (network fair queuing with
    weights — public knowledge); sources whose cap is below their
    fair-weighted share are taken whole and the surplus re-levels
    among the rest, closed-form, no iteration.

    ``weight_col`` and ``cap_col`` must be NON-NEGATIVE INTEGERS
    (longs): the capped/uncapped boundary test then runs in exact
    int64 arithmetic — w_j·Σ_{i≤j}c_i + c_j·(W − Σ_{i≤j}w_i) ≤ B·w_j
    over sources sorted by c_i/w_i — so any SQL engine reproduces the
    same capped set bit-for-bit (a float boundary test flips at ulp
    granularity across engines). Weights are scale-free (θ absorbs any
    common factor), so callers with huge magnitudes rescale weights,
    never losing exactness — ENFORCED: the solver raises if the
    boundary-test terms could exceed 2^62 (checked in double, which
    cannot itself overflow), rather than wrapping silently on
    non-ANSI engines. Fractional weights/caps are rejected, not
    truncated. Zero-weight sources get alloc 0 and are
    excluded from the θ computation (their cap must not absorb
    budget). Only θ itself and the final alloc are floats, rounded to
    ``decimals``.

    Scale shape: input is the per-source AGGREGATE (one row per
    source); the θ construction is two prefix-sum windows over
    #sources rows — no collect, no iteration.

    Output: the input columns plus ``alloc`` (double).
    """
    if budget < 0:
        raise ValueError(
            f"capped_weighted_waterfill: negative budget {budget}"
        )
    wl = F.col(weight_col).cast("long")
    cl = F.col(cap_col).cast("long")
    bad = (
        wl.isNull() | (wl < 0) | cl.isNull() | (cl < 0)
        # a fractional weight/cap (e.g. 2.9) would be silently
        # truncated by the long cast, quietly changing the allocation;
        # integral values round-trip the double comparison exactly
        # (both sides pass through the same long->double conversion)
        | (F.col(weight_col).cast("double") != wl.cast("double"))
        | (F.col(cap_col).cast("double") != cl.cast("double"))
    )
    checked = per_source.withColumn(
        "__w",
        F.when(
            bad,
            F.raise_error(
                F.concat(
                    F.lit(
                        "capped_weighted_waterfill: weight and cap must "
                        "be non-negative integers; got weight="
                    ),
                    F.coalesce(wl.cast("string"), F.lit("NULL")),
                    F.lit(" cap="),
                    F.coalesce(cl.cast("string"), F.lit("NULL")),
                    F.lit(" for key "),
                    F.coalesce(F.col(key_col).cast("string"), F.lit("NULL")),
                )
            ).cast("long"),
        ).otherwise(wl),
    ).withColumn("__c", cl)
    zero = checked.filter(F.col("__w") == 0).select(
        *per_source.columns, F.lit(0.0).alias("alloc")
    )
    pos = checked.filter(F.col("__w") > 0)
    # deterministic total order by the cap/weight ratio (the θ at which
    # a source saturates), key-tiebroken; ties in the ratio commute —
    # at θ = r the tied sources' θ·w equals their cap exactly
    r = F.col("__c").cast("double") / F.col("__w").cast("double")
    w = Window.orderBy(r.asc(), F.asc(key_col))
    agg0 = Window.partitionBy()
    ranked = (
        pos.withColumn("__pc", F.sum("__c").over(w))
        .withColumn("__pw", F.sum("__w").over(w))
        .withColumn("__tw", F.sum("__w").over(agg0))
    )
    b = F.lit(int(budget)).cast("long")
    # Overflow headroom for the exact-int64 boundary test below: each
    # term is bounded by max(w)*sum(c), max(c)*sum(w), and B*max(w).
    # The check runs in DOUBLE (so it cannot itself overflow) against
    # 2^62 — a 2x safety margin that dwarfs the 53-bit mantissa error.
    # Without it, huge weights (e.g. 1e6-scaled multi-billion-token
    # sources) would wrap silently on non-ANSI Spark and mis-flag the
    # capped set; weights are scale-free, so callers rescale.
    mw = F.max(F.col("__w").cast("double")).over(agg0)
    mc = F.max(F.col("__c").cast("double")).over(agg0)
    sc = F.sum(F.col("__c").cast("double")).over(agg0)
    sw = F.col("__tw").cast("double")
    headroom_bad = (
        (mw * sc + mc * sw >= F.lit(float(2 ** 62)))
        | (b.cast("double") * mw >= F.lit(float(2 ** 62)))
    )
    capped = (
        F.col("__w") * F.col("__pc")
        + F.col("__c") * (F.col("__tw") - F.col("__pw"))
        <= b * F.col("__w")
    )
    ranked = ranked.withColumn(
        "__capped",
        F.when(
            headroom_bad,
            F.raise_error(
                F.concat(
                    F.lit(
                        "capped_weighted_waterfill: weight/cap magnitudes "
                        "exceed int64 headroom for the exact boundary test "
                        "(max(w)*sum(c)+max(c)*sum(w) or budget*max(w) >= "
                        "2^62); weights are scale-free — divide them by a "
                        "common factor. max(w)="
                    ),
                    mw.cast("string"),
                    F.lit(" sum(c)="),
                    sc.cast("string"),
                )
            ).cast("boolean"),
        ).otherwise(capped),
    )
    agg = Window.partitionBy()
    s_c = F.max(F.when(F.col("__capped"), F.col("__pc"))).over(agg)
    s_w = F.max(F.when(F.col("__capped"), F.col("__pw"))).over(agg)
    theta = (b - F.coalesce(s_c, F.lit(0).cast("long"))).cast("double") / (
        F.col("__tw") - F.coalesce(s_w, F.lit(0).cast("long"))
    ).cast("double")
    alloc = F.round(
        F.when(F.col("__capped"), F.col("__c").cast("double")).otherwise(
            F.least(F.col("__c").cast("double"), theta * F.col("__w"))
        ),
        decimals,
    )
    return ranked.select(*per_source.columns, alloc.alias("alloc")).unionByName(
        zero
    )
