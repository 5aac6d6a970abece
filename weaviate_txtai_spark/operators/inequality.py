"""Concentration / inequality measures: per-group Gini coefficient.

Corpus governance needs concentration answers — how concentrated is
revenue across customers, token mass across sources, duplicate mass
across clusters. The Gini coefficient (0 = perfectly even, →1 = one
unit owns everything) is the standard scalar for it.

Formula (tie-averaged rank form, the midpoint-corrected standard):

    G = (2·Σ r_i·x_i − (n+1)·Σ x_i) / (n·Σ x_i)

with r_i the ascending tie-AVERAGED rank of x_i within its group.

Scale notes
-----------
Sorting per group is never materialized per ROW: ranks come from the
per-(group, value) count table — one map-side-combined groupBy — with
an exclusive prefix sum via a window PARTITIONED BY GROUP over the
count rows (distinct values per group, not rows; a group's window
partition is its value domain). Σ r·x folds the c copies of each value
into c·r̄·v algebraically, so the whole statistic is two shuffles and
one aggregate. Values must be non-negative for the Gini to be
meaningful (negative totals flip the sign); nulls are dropped.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def gini(
    df: DataFrame,
    value_col: str,
    *,
    group_col: "str | None" = None,
    round_decimals: int = 6,
) -> DataFrame:
    """Gini coefficient of ``value_col``, per ``group_col`` group (or
    one global row when ``group_col`` is None). Output: (group,)
    ``n, total, gini``; gini is NULL for groups with zero total.
    Negative values RAISE in-plan: they silently flip the statistic's
    sign (the rank-form numerator goes negative), which is the
    silently-corrupt failure mode, not a meaningful Gini."""
    g = F.lit("__all").alias("__g") if group_col is None else F.col(
        group_col
    ).alias("__g")
    v = F.col(value_col)
    checked = F.when(
        v < 0,
        F.raise_error(
            F.concat(
                F.lit("gini: negative value "),
                v.cast("string"),
                F.lit(" — Gini requires non-negative values"),
            )
        ).cast(df.schema[value_col].dataType),
    ).otherwise(v)
    base = df.select(g, checked.alias("__v")).filter(
        F.col("__v").isNotNull()
    )
    counts = base.groupBy("__g", "__v").agg(
        F.count(F.lit(1)).cast("double").alias("__c")
    )
    w = (
        Window.partitionBy("__g")
        .orderBy("__v")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ranked = counts.withColumn(
        "__r",
        F.coalesce(F.sum("__c").over(w), F.lit(0.0))
        + (F.col("__c") + 1) / 2.0,
    )
    agg = ranked.groupBy("__g").agg(
        F.sum("__c").cast("long").alias("n"),
        F.sum(F.col("__c") * F.col("__v")).alias("__sx"),
        F.sum(F.col("__c") * F.col("__r") * F.col("__v")).alias("__srx"),
    )
    gini_c = F.when(
        F.col("__sx") != 0,
        (2 * F.col("__srx") - (F.col("n") + 1) * F.col("__sx"))
        / (F.col("n") * F.col("__sx")),
    )
    out = agg.select(
        "__g",
        "n",
        F.round("__sx", round_decimals).alias("total"),
        F.round(gini_c, round_decimals).alias("gini"),
    )
    if group_col is None:
        return out.drop("__g")
    return out.withColumnRenamed("__g", group_col)


def theil_decomposition(
    df: DataFrame,
    value_col: str,
    group_col: str,
    *,
    round_decimals: int = 6,
) -> DataFrame:
    """Theil T inequality index with its exact between/within-group
    decomposition (Theil 1967) — the property Gini lacks: T_total =
    T_between + T_within ADDITIVELY, so "how much revenue inequality is
    across nations vs inside them" is a single readout.

        T_total   = (1/n) Σ_i (x_i/μ) ln(x_i/μ)
        T_between = Σ_g (n_g/n)(μ_g/μ) ln(μ_g/μ)
        T_within  = Σ_g (n_g/n)(μ_g/μ) T_g

    Non-positive values are excluded (ln); output (1 row): ``n,
    n_groups, theil_total, theil_between, theil_within`` — the identity
    total = between + within holds to float precision (pinned in
    tests).

    Scale: one groupBy(group) pass for the group moments plus one
    corpus aggregate for T_g's inner sum — two shuffles total, no pair
    expansion.
    """
    x = F.col(value_col).cast("double")
    base = df.filter(x.isNotNull() & (x > 0)).select(
        F.col(group_col).alias("__g"), x.alias("__x")
    )
    g = base.groupBy("__g").agg(
        F.count(F.lit(1)).cast("double").alias("__ng"),
        F.avg("__x").alias("__mug"),
    )
    tot = base.agg(
        F.count(F.lit(1)).cast("double").alias("__n"),
        F.avg("__x").alias("__mu"),
    )
    # within-group Theil T_g needs each row against ITS group mean
    tg = (
        base.join(F.broadcast(g), "__g")
        .select(
            "__g",
            ((F.col("__x") / F.col("__mug"))
             * F.log(F.col("__x") / F.col("__mug"))).alias("__t"),
        )
        .groupBy("__g")
        .agg(F.avg("__t").alias("__tg"))
    )
    parts = (
        g.join(tg, "__g")
        .join(F.broadcast(tot))
        .select(
            (
                (F.col("__ng") / F.col("__n"))
                * (F.col("__mug") / F.col("__mu"))
            ).alias("__w"),
            F.log(F.col("__mug") / F.col("__mu")).alias("__lb"),
            "__tg",
        )
    )
    total = (
        base.join(F.broadcast(tot))
        .agg(
            F.avg(
                (F.col("__x") / F.col("__mu"))
                * F.log(F.col("__x") / F.col("__mu"))
            ).alias("__tt")
        )
    )
    return (
        parts.agg(
            F.count(F.lit(1)).cast("long").alias("n_groups"),
            F.sum(F.col("__w") * F.col("__lb")).alias("__tb"),
            F.sum(F.col("__w") * F.col("__tg")).alias("__tw"),
        )
        .join(F.broadcast(total))
        .join(F.broadcast(tot))
        .select(
            F.col("__n").cast("long").alias("n"),
            "n_groups",
            F.round("__tt", round_decimals).alias("theil_total"),
            F.round("__tb", round_decimals).alias("theil_between"),
            F.round("__tw", round_decimals).alias("theil_within"),
        )
    )


def abc_classes(
    df: DataFrame,
    key_col: str,
    value_col: str,
    *,
    a_cut: float = 0.80,
    b_cut: float = 0.95,
    round_decimals: int = 6,
) -> DataFrame:
    """ABC (Pareto) classification: rank keys by summed value and class
    them by cumulative share — A up to ``a_cut`` (the vital few), B up
    to ``b_cut``, C the long tail. The inventory/priority workhorse
    ("which 20% of parts carry 80% of revenue"), and the concentration
    readout that pairs with :func:`gini`.

    Cumulative shares come from the value-domain prefix machinery
    (``rankstats._prefix_sums`` on the DESC-ordered revenue domain — no
    global-order window), with the whole tie group included in its own
    cumulative mass (tied keys always share a class). Sums are exact:
    per-row DECIMAL(28,8) casts, then integer units of 10⁻⁸ through the
    prefix (whose accumulator is a long), so shares and class
    boundaries are deterministic across engines. Requires total value
    below ~9·10¹⁰ in raw units (int64 at scale 8) — money-scale safe.

    Output: ``key_col, value, cum_share, abc_class`` — value rounded at
    2 (money convention), share at ``round_decimals``.
    """
    if not (0 < a_cut < b_cut < 1):
        raise ValueError("abc_classes: need 0 < a_cut < b_cut < 1")
    from weaviate_txtai_spark.operators.rankstats import _prefix_sums

    # NULL keys excluded: a grouped NULL would rank a pseudo-key's
    # pooled mass into the A/B/C cut points
    per_key = df.filter(F.col(key_col).isNotNull()).groupBy(
        F.col(key_col).alias("__k")
    ).agg(
        F.sum(F.col(value_col).cast("decimal(28,8)")).alias("__v")
    )
    # the prefix machinery is integer-only (long __before), so carry
    # the mass in EXACT integer units of 10^-8 (the decimal's scale):
    # the cast is lossless and every cumulative sum is exact
    units = (F.col("__v") * F.lit(10**8)).cast("long")
    per_key = per_key.select("__k", "__v", units.alias("__u"))
    vv = per_key.groupBy(F.col("__v")).agg(
        F.sum("__u").alias("__mass")
    ).select((-F.col("__v")).alias("__ord"), "__v", "__mass")
    pref = _prefix_sums(vv, "__ord", "__mass").select(
        "__v",
        (F.col("__before") + F.col("__mass")).alias("__cum"),
    )
    total = per_key.agg(F.sum("__u").alias("__tot"))
    share = (
        F.col("__cum").cast("double") / F.col("__tot").cast("double")
    )
    return (
        per_key.join(pref, "__v")
        .join(F.broadcast(total))
        .select(
            F.col("__k").alias(key_col),
            # round the EXACT decimal (half-up on true midpoints),
            # not the double — money values hit .005 midpoints exactly
            F.round(F.col("__v"), 2).cast("double").alias("value"),
            F.round(share, round_decimals).alias("cum_share"),
            F.when(share <= a_cut, "A")
            .when(share <= b_cut, "B")
            .otherwise("C").alias("abc_class"),
        )
    )
