"""Per-group ordinary least squares: slope / intercept / R² as one
map-side-combined aggregate.

Trend monitoring over grouped time series — is a source's daily volume
drifting, is a nation's monthly revenue growing — needs the OLS line
per group, and at scale it must be a SINGLE aggregation pass, not a
per-group fit loop. The closed form needs only the five raw moments
(n, Σx, Σy, Σxy, Σx²[, Σy²]), all of which combine associatively, so
the whole fit is one groupBy with map-side partial aggregation — the
same shuffle shape as a sum.

slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)
intercept = (Σy − slope·Σx)/n
R² = corr(x,y)² from the same moments (NULL when x or y is constant)

Rows with a null in either column are dropped pairwise. The DuckDB
oracle uses its native regr_slope/regr_intercept/regr_r2 — an
independent implementation of the same estimator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def ols_trend(
    df: DataFrame,
    x_col: str,
    y_col: str,
    *,
    group_col: "str | None" = None,
    round_decimals: int = 6,
) -> DataFrame:
    """OLS fit of ``y_col`` on ``x_col`` per group (or one global row).
    Output: (group,) ``n, slope, intercept, r2`` — slope/intercept NULL
    for degenerate groups (n < 2 or constant x); r2 additionally NULL
    for constant y."""
    gcols = [group_col] if group_col is not None else []
    x = F.col(x_col).cast("double")
    y = F.col(y_col).cast("double")
    base = df.filter(x.isNotNull() & y.isNotNull()).select(
        *gcols, x.alias("__x"), y.alias("__y")
    )
    agg = base.groupBy(*gcols).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("__x").alias("__sx"),
        F.sum("__y").alias("__sy"),
        F.sum(F.col("__x") * F.col("__y")).alias("__sxy"),
        F.sum(F.col("__x") * F.col("__x")).alias("__sxx"),
        F.sum(F.col("__y") * F.col("__y")).alias("__syy"),
    )
    n = F.col("n")
    den = n * F.col("__sxx") - F.col("__sx") * F.col("__sx")
    slope = F.when(
        (n >= 2) & (den != 0),
        (n * F.col("__sxy") - F.col("__sx") * F.col("__sy")) / den,
    )
    intercept = (F.col("__sy") - slope * F.col("__sx")) / n
    # r² from the raw moments (F.corr throws DIVIDE_BY_ZERO under ANSI
    # for 1-row/constant groups; try_divide nulls those instead)
    sy2n = n * F.col("__syy") - F.col("__sy") * F.col("__sy")
    r2 = F.try_divide(
        (n * F.col("__sxy") - F.col("__sx") * F.col("__sy"))
        * (n * F.col("__sxy") - F.col("__sx") * F.col("__sy")),
        den * sy2n,
    )
    return agg.select(
        *gcols,
        "n",
        F.round(slope, round_decimals).alias("slope"),
        F.round(intercept, round_decimals).alias("intercept"),
        F.round(r2, round_decimals).alias("r2"),
    )


def woe_iv(
    df: DataFrame,
    feature_col: str,
    target_col: str,
    *,
    round_decimals: int = 6,
) -> DataFrame:
    """Weight of Evidence / Information Value of a CATEGORICAL feature
    against a binary target — the credit-scoring-lineage feature-triage
    statistic ("does this bucketed feature separate converters from
    non-converters, and how is the separation distributed?").

    Per level: WOE = ln(good% / bad%) with good = target 1, bad =
    target 0, each as a share of ITS OWN class total; the level's IV
    term is (good% − bad%)·WOE and Σ terms is the feature's IV
    (rules of thumb: <0.02 useless, 0.1–0.3 medium, >0.5 suspicious).
    Zero cells take the 0.5 Laplace floor (WOE undefined on zeros; the
    ``psi_drift`` convention). Continuous features: bin first
    (``group_percentile_rank`` / quantile bins).

    One (level) count aggregate + a broadcast 1-row class-total join —
    the cheapest possible plan. Output: one row per level —
    ``<feature>, n, n_good, n_bad, woe, iv_term``.
    """
    base = df.filter(
        F.col(feature_col).isNotNull() & F.col(target_col).isNotNull()
    ).select(
        F.col(feature_col).alias("__f"),
        F.col(target_col).cast("int").alias("__y"),
    )
    lv = base.groupBy("__f").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("__y").cast("double").alias("__g"),
        F.sum(1 - F.col("__y")).cast("double").alias("__b"),
    )
    tot = lv.agg(
        F.sum("__g").alias("__tg"), F.sum("__b").alias("__tb")
    )
    gf = F.greatest(F.col("__g"), F.lit(0.5)) / F.col("__tg")
    bf = F.greatest(F.col("__b"), F.lit(0.5)) / F.col("__tb")
    woe = F.log(gf / bf)
    return lv.join(F.broadcast(tot)).select(
        F.col("__f").alias(feature_col),
        "n",
        F.col("__g").cast("long").alias("n_good"),
        F.col("__b").cast("long").alias("n_bad"),
        F.round(woe, round_decimals).alias("woe"),
        F.round((gf - bf) * woe, round_decimals).alias("iv_term"),
    )
