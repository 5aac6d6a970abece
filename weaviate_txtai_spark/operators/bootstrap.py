"""Distributed bootstrap confidence intervals via Poisson resampling.

Why it's the 100 TB method: the classical bootstrap resamples n rows
WITH replacement — a global operation that can't run map-side. The
Poisson bootstrap (Hanley & MacGibbon 2006; the standard trick in
large-scale A/B platforms — public knowledge) replaces each replicate's
multinomial row counts with independent Poisson(1) draws, which are
row-local: every row decides its own weight in every replicate from a
hash, so B replicates cost ONE map-side pass and one (replicate)
aggregate — no resample shuffle, no driver data.

Determinism: the per-(row, replicate) Poisson(1) draw inverts a
Knuth-multiplicative hash uniform (the engine's established
SQL-replicable PRN shape: ``(((id + b·999983) mod 2³¹)·2654435761)
mod 2³² / 2³²`` (the inner mod keeps the multiplicand below 2³¹ so the
product fits int64 for ANY id — ids past ~3.5e9 overflowed without it) — the replicate index folds in pre-multiply so streams
decorrelate), so
the DuckDB oracle replays the exact draws — no Spark-only hash
function anywhere.

Output quantiles use the percentile-of-B-means convention over the
replicate DOMAIN (B rows), interpolated like quantile_cont.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Poisson(1) inverse-CDF thresholds: P(K <= k) for k = 0..7; a uniform
# below threshold[k] (first hit) maps to count k. P(K>7) < 1e-5 — the
# tail is folded into k=8 (bias < 1e-4 on any moment, identical on both
# engines since the constants are literal).
_POIS1_CDF = [
    0.36787944117144233,
    0.7357588823428847,
    0.9196986029286058,
    0.9810118431238462,
    0.9963401531726563,
    0.9994058151824183,
    0.999916758850712,
    0.9999897508033253,
]


def _poisson1(u):
    expr = F.lit(8)
    for k in range(len(_POIS1_CDF) - 1, -1, -1):
        expr = F.when(u < F.lit(_POIS1_CDF[k]), F.lit(k)).otherwise(expr)
    return expr


def poisson_bootstrap_mean_ci(
    df: DataFrame,
    value_col: str,
    *,
    id_col: str,
    n_replicates: int = 50,
    alpha: float = 0.05,
    round_decimals: int = 6,
) -> DataFrame:
    """Percentile-bootstrap CI for the MEAN of ``value_col``.

    Each row contributes Poisson(1) copies of itself to each of
    ``n_replicates`` replicate means (weighted mean = Σw·x / Σw); the
    CI is the (α/2, 1−α/2) interpolated percentile of the B replicate
    means. The point estimate is the plain sample mean.

    Plan: one explode of a ``sequence(0, B−1)`` literal (row × B,
    map-side), one (replicate) aggregate with map-side combine
    (B-domain reduce side), one B-row percentile fold. Rows with NULL
    value or id are dropped.

    Output (1 row): ``n, mean, lo, hi, n_replicates``."""
    if n_replicates < 2:
        raise ValueError("n_replicates must be >= 2")
    if not (0 < alpha < 1):
        raise ValueError("alpha must be in (0, 1)")
    base = df.filter(
        F.col(value_col).isNotNull() & F.col(id_col).isNotNull()
    ).select(
        F.col(id_col).cast("long").alias("__id"),
        F.col(value_col).cast("double").alias("__x"),
    )
    rep = base.select(
        "__id",
        "__x",
        F.explode(F.sequence(F.lit(0), F.lit(n_replicates - 1))).alias("__b"),
    )
    # the replicate index folds in BEFORE the multiply: an additive
    # post-multiply term only shifts u by b*eps and every replicate
    # would draw near-identical weights (observed: a tight CI around a
    # biased value); pre-multiply, one step of b wraps the product many
    # times and decorrelates the replicate streams
    u = (
        F.pmod(
            F.pmod(F.col("__id") + F.col("__b") * F.lit(999983),
                   F.lit(2147483648))
            * F.lit(2654435761),
            F.lit(4294967296),
        )
        / F.lit(4294967296.0)
    )
    weighted = rep.withColumn("__w", _poisson1(u).cast("double"))
    means = weighted.groupBy("__b").agg(
        F.round(
            F.try_divide(
                F.sum(F.col("__w") * F.col("__x")), F.sum("__w")
            ),
            round_decimals + 3,
        ).alias("__m")
    )
    # interpolated percentiles over the B replicate means: B rows —
    # F.percentile's buffering is fine at replicate-domain size
    lo_p, hi_p = alpha / 2, 1 - alpha / 2
    ci = means.agg(
        F.round(F.percentile("__m", F.lit(lo_p)), round_decimals).alias(
            "lo"
        ),
        F.round(F.percentile("__m", F.lit(hi_p)), round_decimals).alias(
            "hi"
        ),
        F.count(F.lit(1)).cast("long").alias("n_replicates"),
    )
    stats = base.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.round(F.avg("__x"), round_decimals).alias("mean"),
    )
    return stats.join(F.broadcast(ci)).select(
        "n", "mean", "lo", "hi", "n_replicates"
    )


def poisson_bootstrap_ratio_ci(
    df: DataFrame,
    num_col: str,
    den_col: str,
    *,
    id_col: str,
    n_replicates: int = 50,
    alpha: float = 0.05,
    round_decimals: int = 6,
) -> DataFrame:
    """Percentile-bootstrap CI for a RATIO OF SUMS — Σnum/Σden (CTR =
    clicks/views, revenue-per-session, tokens-kept/tokens-seen): THE
    metric shape a per-row mean CI gets wrong, because numerator and
    denominator co-vary within a unit. Each replicate reweights rows
    with the same Poisson(1) draws as ``poisson_bootstrap_mean_ci`` and
    computes Σw·num / Σw·den.

    CLUSTER bootstrap for free: pass the UNIT key (user_id, session_id)
    as ``id_col`` — every row of a unit shares the unit's draw in each
    replicate, which resamples UNITS, the correct procedure when rows
    within a unit are correlated (same property holds for the mean
    variant; pinned in tests).

    Output (1 row): ``n, ratio, lo, hi, n_replicates`` (NULL bounds
    when a replicate's denominator is 0 never happens — such replicates
    yield NULL means and percentile skips them; the ratio itself is
    NULL on a zero denominator)."""
    if n_replicates < 2:
        raise ValueError("n_replicates must be >= 2")
    if not (0 < alpha < 1):
        raise ValueError("alpha must be in (0, 1)")
    base = df.filter(
        F.col(num_col).isNotNull()
        & F.col(den_col).isNotNull()
        & F.col(id_col).isNotNull()
    ).select(
        F.col(id_col).cast("long").alias("__id"),
        F.col(num_col).cast("double").alias("__n"),
        F.col(den_col).cast("double").alias("__d"),
    )
    rep = base.select(
        "__id",
        "__n",
        "__d",
        F.explode(F.sequence(F.lit(0), F.lit(n_replicates - 1))).alias("__b"),
    )
    u = (
        F.pmod(
            F.pmod(F.col("__id") + F.col("__b") * F.lit(999983),
                   F.lit(2147483648))
            * F.lit(2654435761),
            F.lit(4294967296),
        )
        / F.lit(4294967296.0)
    )
    weighted = rep.withColumn("__w", _poisson1(u).cast("double"))
    ratios = weighted.groupBy("__b").agg(
        F.round(
            F.try_divide(
                F.sum(F.col("__w") * F.col("__n")),
                F.sum(F.col("__w") * F.col("__d")),
            ),
            round_decimals + 3,
        ).alias("__r")
    )
    lo_p, hi_p = alpha / 2, 1 - alpha / 2
    ci = ratios.agg(
        F.round(F.percentile("__r", F.lit(lo_p)), round_decimals).alias("lo"),
        F.round(F.percentile("__r", F.lit(hi_p)), round_decimals).alias("hi"),
        F.count(F.lit(1)).cast("long").alias("n_replicates"),
    )
    stats = base.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.round(
            F.try_divide(F.sum("__n"), F.sum("__d")), round_decimals
        ).alias("ratio"),
    )
    return stats.join(F.broadcast(ci)).select(
        "n", "ratio", "lo", "hi", "n_replicates"
    )


def jackknife_ratio(
    df: DataFrame,
    group_col: str,
    num_col: str,
    den_col: str,
    *,
    round_decimals: int = 6,
) -> DataFrame:
    """Delete-one-GROUP jackknife SE for a ratio metric θ = Σnum/Σden
    (Quenouille/Tukey; the deleted unit is the experimentation unit —
    user/cluster — so within-group correlation is respected, the same
    motivation as the cluster bootstrap, but deterministic and
    resample-free): θ_(i) = (N−num_i)/(D−den_i) in closed form from the
    grand totals, then

        se² = (g−1)/g · Σ_i (θ_(i) − θ̄_(.))² .

    Groups whose deletion empties the denominator are excluded from the
    pseudo-value set (reported via ``g_used``). Grand totals are exact
    DECIMAL sums, so every θ_(i) is a deterministic double.

    Output (1 row): ``g, g_used, theta, se_jack``.

    Scale: one groupBy(group) + one broadcast of the 1-row totals + one
    final aggregate — no resampling, no replicate fan-out.
    """
    per = df.groupBy(F.col(group_col).alias("__g")).agg(
        F.sum(F.col(num_col).cast("decimal(28,8)")).alias("__ni"),
        F.sum(F.col(den_col).cast("decimal(28,8)")).alias("__di"),
    )
    tot = per.agg(
        F.count(F.lit(1)).cast("long").alias("g"),
        F.sum("__ni").cast("double").alias("__N"),
        F.sum("__di").cast("double").alias("__D"),
    )
    loo = per.join(F.broadcast(tot)).select(
        "g",
        "__N",
        "__D",
        F.try_divide(
            F.col("__N") - F.col("__ni").cast("double"),
            F.col("__D") - F.col("__di").cast("double"),
        ).alias("__t"),
    )
    # center pseudo-values at θ̂ BEFORE summing: θ_(i) cluster within
    # ~1/g of θ̂, and Σθ² − g·θ̄² would cancel catastrophically; the
    # centered form keeps both sums at the deviation scale
    d = F.col("__t") - F.col("__N") / F.col("__D")
    agg = loo.agg(
        F.max("g").alias("g"),
        F.max("__N").alias("__N"),
        F.max("__D").alias("__D"),
        F.count(F.when(F.col("__t").isNotNull(), 1))
        .cast("long").alias("g_used"),
        F.sum(F.when(F.col("__t").isNotNull(), d)).alias("__sd"),
        F.sum(F.when(F.col("__t").isNotNull(), d * d)).alias("__sd2"),
    )
    gu = F.col("g_used").cast("double")
    ss = F.col("__sd2") - F.col("__sd") * F.col("__sd") / gu
    return agg.select(
        "g",
        "g_used",
        F.round(
            F.try_divide(F.col("__N"), F.col("__D")), round_decimals
        ).alias("theta"),
        F.round(
            F.when(
                F.col("g_used") >= 2,
                F.sqrt(
                    F.greatest((gu - 1) / gu * ss, F.lit(0.0))
                ),
            ),
            round_decimals,
        ).alias("se_jack"),
    )
