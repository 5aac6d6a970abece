"""Distribution drift per group — exact two-sample Kolmogorov–Smirnov
statistic against the pooled corpus.

Corpus-health monitoring for a training pipeline: when one source's
length / quality-score / token-count distribution drifts away from the
corpus, its KS statistic sup_x |F_source(x) − F_corpus(x)| spikes long
before means or quantiles move. Computed EXACTLY (not sampled): both
empirical CDFs are step functions whose sup is attained at an observed
value, so evaluating |F_g − F| on the global value grid is the true
supremum.

Scale shape: one groupBy (group, value) count over the corpus, then
everything runs on the (groups × distinct-values) grid — bounded by
the VALUE DOMAIN, not the corpus (lengths, scores and counts are
discrete or pre-bucketed; 100 TB of documents still has ~10⁴ distinct
lengths). The grid is built with a broadcast crossJoin of two tiny
distinct frames; cumulative fractions are per-group windows over grid
rows. Callers with a genuinely continuous column bucket it first —
that is the standard KS-on-binned-data practice, and the docstring of
the gate pins the discrete case.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def ks_drift(
    df: DataFrame,
    *,
    group_col: str,
    value_col: str,
    decimals: int = 6,
) -> DataFrame:
    """Exact per-group KS statistic of ``value_col`` vs the pooled
    distribution (the group's own rows INCLUDED in the pool — drift of
    a part against the whole, the monitoring convention; a held-out
    comparison is one filter away). NULL values are dropped from both
    sides. Output: (group, n, ks) — group size and the statistic,
    rounded to ``decimals``."""
    base = df.select(
        F.col(group_col).alias("__g"), F.col(value_col).alias("__v")
    ).filter(F.col("__v").isNotNull())

    counts = base.groupBy("__g", "__v").agg(F.count(F.lit(1)).alias("__c"))

    # global step points + pooled cumulative fraction at each. The
    # total joins back LAZILY (broadcast 1-row), like jsd_drift: an
    # eager .collect() here ran the corpus (group,value) aggregate at
    # plan-construction time AND again in the returned plan (nothing
    # was persisted), and crashed on an all-null value column
    gvals = counts.groupBy("__v").agg(F.sum("__c").alias("__gc"))
    wg = Window.orderBy("__v")
    total = gvals.agg(F.sum("__gc").cast("double").alias("__tot"))
    gcdf = (
        gvals.join(F.broadcast(total))
        .withColumn("__gcum", F.sum("__gc").over(wg) / F.col("__tot"))
        .select("__v", "__gcum")
    )

    groups = counts.groupBy("__g").agg(F.sum("__c").alias("__n"))

    # grid: every group evaluated at every global step point
    grid = groups.crossJoin(F.broadcast(gcdf))
    grid = grid.join(counts, ["__g", "__v"], "left").fillna(0, ["__c"])
    wgr = Window.partitionBy("__g").orderBy("__v")
    grid = grid.withColumn(
        "__gcdf", F.sum("__c").over(wgr) / F.col("__n")
    )
    return (
        grid.groupBy("__g", "__n")
        .agg(
            F.round(F.max(F.abs(F.col("__gcdf") - F.col("__gcum"))), decimals)
            .alias("ks")
        )
        .select(
            F.col("__g").alias(group_col),
            F.col("__n").alias("n"),
            "ks",
        )
    )


def jsd_drift(
    df: DataFrame,
    *,
    group_col: str,
    token_col: str,
    decimals: int = 6,
) -> DataFrame:
    """Per-group Jensen–Shannon divergence (base-2, so 0 ≤ JSD ≤ 1) of
    the group's token distribution vs the pooled corpus distribution
    (group included in the pool, matching ``ks_drift``'s convention).
    Input is one row per token OCCURRENCE (caller explodes documents);
    output: (group, n_tokens, jsd).

    The companion to ``ks_drift``: KS watches a NUMERIC column's CDF,
    JSD watches the discrete token mass itself — vocabulary shifts,
    boilerplate floods, language mix changes.

    Scale shape — hit-rows-only decomposition (the QLM trick,
    operators/bm25.py): with p the group's token frequency and q the
    pooled frequency,

        JSD = ½ Σ_present p·log2(2p/(p+q))
            + ½ [ Σ_present q·log2(2q/(p+q)) + (1 − Σ_present q) ]

    because every token ABSENT from the group contributes exactly
    ½·q·log2(2q/q) = ½·q. So the plan only ever touches the group's
    OWN (group, token) rows: one (group, token) count, a token-keyed
    join to the 1-row-per-token pooled table, one group aggregate —
    never a groups × vocabulary grid. Hot tokens meet aggregates and
    a 1-row join side; skew-safe.
    """
    base = df.select(
        F.col(group_col).alias("__g"), F.col(token_col).alias("__t")
    ).filter(F.col("__t").isNotNull())
    counts = base.groupBy("__g", "__t").agg(F.count(F.lit(1)).alias("__c"))
    ntok = counts.groupBy("__g").agg(F.sum("__c").alias("__n"))
    pooled = counts.groupBy("__t").agg(F.sum("__c").alias("__pc"))
    total = pooled.agg(F.sum("__pc").alias("__tot"))

    j = (
        counts.join(ntok, "__g")
        .join(pooled, "__t")
        .join(F.broadcast(total))
    )
    p = F.col("__c") / F.col("__n")
    q = F.col("__pc") / F.col("__tot")
    lg2 = float(__import__("math").log(2.0))
    term_p = p * (F.log(2 * p / (p + q)) / lg2)
    term_q = q * (F.log(2 * q / (p + q)) / lg2)
    return (
        j.groupBy("__g")
        .agg(
            F.max("__n").cast("long").alias("n_tokens"),
            F.round(
                0.5 * F.sum(term_p)
                + 0.5 * (F.sum(term_q) + (1 - F.sum(q))),
                decimals,
            ).alias("jsd"),
        )
        .select(F.col("__g").alias(group_col), "n_tokens", "jsd")
    )


def psi_drift(
    df: DataFrame,
    *,
    group_col: str,
    value_col: str,
    baseline,
    n_bins: int = 10,
    decimals: int = 6,
) -> DataFrame:
    """Population stability index of each group vs a BASELINE group —
    the model-monitoring industry standard beside KS (CDF distance)
    and JSD (token mass): PSI = Σ_bins (p_g − p_b)·ln(p_g / p_b),
    with bins the baseline's equal-frequency quantile bins (the
    convention: the baseline defines the grid, each group is scored
    against it). Rule-of-thumb thresholds: <0.1 stable, 0.1–0.25
    drifting, >0.25 shifted.

    Scale: bin edges are ONE percentile aggregate over the baseline;
    every row maps to its bin with a codegen width_bucket-style
    comparison against the ≤n_bins broadcast edges; one (group, bin)
    count + a per-group aggregate. Empty bins are Laplace-floored at
    0.5 counts (PSI is undefined on zeros; the floor is the standard
    fix and both engines apply it identically).
    """
    base = df.filter(F.col(value_col).isNotNull()).select(
        F.col(group_col).alias("__g"),
        F.col(value_col).cast("double").alias("__v"),
    )
    edges_row = (
        base.filter(F.col("__g") == baseline)
        .agg(
            F.percentile(
                F.col("__v"),
                F.array(*[F.lit(i / n_bins) for i in range(1, n_bins)]),
            ).alias("e")
        )
        .collect()
    )
    if not edges_row or edges_row[0]["e"] is None:
        raise ValueError(f"baseline group {baseline!r} has no rows")
    edges = sorted(set(edges_row[0]["e"]))
    bin_expr = F.lit(0)
    for e in edges:
        bin_expr = bin_expr + F.when(F.col("__v") > e, 1).otherwise(0)
    counts = base.withColumn("__bin", bin_expr).groupBy(
        "__g", "__bin"
    ).agg(F.count(F.lit(1)).cast("double").alias("__c"))
    totals = counts.groupBy("__g").agg(F.sum("__c").alias("__n"))
    # dense (group × bin) grid so empty bins get the 0.5 floor
    bins_df = counts.sparkSession.range(len(edges) + 1).select(
        F.col("id").cast("int").alias("__bin")
    )
    grid = (
        totals.crossJoin(F.broadcast(bins_df))
        .join(counts, ["__g", "__bin"], "left")
        .withColumn("__c", F.coalesce("__c", F.lit(0.0)))
        .withColumn("__cf", F.greatest(F.col("__c"), F.lit(0.5)))
    )
    b_side = grid.filter(F.col("__g") == baseline).select(
        "__bin",
        (F.col("__cf") / F.col("__n")).alias("__pb"),
    )
    return (
        grid.join(F.broadcast(b_side), "__bin")
        .withColumn("__pg", F.col("__cf") / F.col("__n"))
        .groupBy("__g")
        .agg(
            F.max("__n").cast("long").alias("n"),
            F.round(
                F.sum(
                    (F.col("__pg") - F.col("__pb"))
                    * F.log(F.col("__pg") / F.col("__pb"))
                ),
                decimals,
            ).alias("psi"),
        )
        .select(F.col("__g").alias(group_col), "n", "psi")
    )
