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
    # try_divide: the 0.5 Laplace floor protects per-level CELLS but a
    # one-class target zeroes a class TOTAL — an undefined WOE must be
    # NULL, not an ANSI DIVIDE_BY_ZERO job kill
    gf = F.try_divide(F.greatest(F.col("__g"), F.lit(0.5)), F.col("__tg"))
    bf = F.try_divide(F.greatest(F.col("__b"), F.lit(0.5)), F.col("__tb"))
    woe = F.log(F.try_divide(gf, bf))
    return lv.join(F.broadcast(tot)).select(
        F.col("__f").alias(feature_col),
        "n",
        F.col("__g").cast("long").alias("n_good"),
        F.col("__b").cast("long").alias("n_bad"),
        F.round(woe, round_decimals).alias("woe"),
        F.round((gf - bf) * woe, round_decimals).alias("iv_term"),
    )


def ols2(
    df: DataFrame,
    y_col: str,
    x1_col: str,
    x2_col: str,
    *,
    round_decimals: int = 6,
) -> DataFrame:
    """Two-feature OLS with intercept, y ~ b0 + b1·x1 + b2·x2, via the
    normal equations solved in closed form (Cramer on the 3×3 Gram
    matrix) — multiple regression as ONE aggregation pass, the
    covariate-adjustment workhorse one step past :func:`ols_trend`.

    Cross-engine determinism (the nation_trade_volume discipline):
    every Gram/moment sum is a DECIMAL(38,10) sum of per-row-cast
    products — exact and order-independent — so the doubles entering
    Cramer are identical on both engines and all downstream arithmetic
    is reproducible without per-step rounding.

    Output (1 row): ``n, b0, b1, b2, r2`` — betas NULL when the Gram
    matrix is singular (collinear or constant features, n < 3); r2
    additionally NULL for constant y. SSE uses the fitted identity
    SSE = Σy² − b·X'y (no second pass over the data).

    Scale: one partial-agg shuffle producing 10 moments; everything
    after is scalar math on one row.
    """
    y = F.col(y_col).cast("double")
    x1 = F.col(x1_col).cast("double")
    x2 = F.col(x2_col).cast("double")
    base = df.filter(
        y.isNotNull() & x1.isNotNull() & x2.isNotNull()
    ).select(y.alias("__y"), x1.alias("__x1"), x2.alias("__x2"))

    def dsum(expr):
        return F.sum(expr.cast("decimal(38,10)")).cast("double")

    a = base.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        dsum(F.col("__x1")).alias("s1"),
        dsum(F.col("__x2")).alias("s2"),
        dsum(F.col("__y")).alias("sy"),
        dsum(F.col("__x1") * F.col("__x1")).alias("s11"),
        dsum(F.col("__x1") * F.col("__x2")).alias("s12"),
        dsum(F.col("__x2") * F.col("__x2")).alias("s22"),
        dsum(F.col("__x1") * F.col("__y")).alias("s1y"),
        dsum(F.col("__x2") * F.col("__y")).alias("s2y"),
        dsum(F.col("__y") * F.col("__y")).alias("syy"),
    )
    n = F.col("n").cast("double")
    s1, s2, sy = F.col("s1"), F.col("s2"), F.col("sy")
    s11, s12, s22 = F.col("s11"), F.col("s12"), F.col("s22")
    s1y, s2y, syy = F.col("s1y"), F.col("s2y"), F.col("syy")
    det = (
        n * (s11 * s22 - s12 * s12)
        - s1 * (s1 * s22 - s12 * s2)
        + s2 * (s1 * s12 - s11 * s2)
    )
    # Cramer columns: replace A's column i with c = (sy, s1y, s2y)
    d0 = (
        sy * (s11 * s22 - s12 * s12)
        - s1 * (s1y * s22 - s12 * s2y)
        + s2 * (s1y * s12 - s11 * s2y)
    )
    d1 = (
        n * (s1y * s22 - s12 * s2y)
        - sy * (s1 * s22 - s12 * s2)
        + s2 * (s1 * s2y - s1y * s2)
    )
    d2 = (
        n * (s11 * s2y - s1y * s12)
        - s1 * (s1 * s2y - s1y * s2)
        + sy * (s1 * s12 - s11 * s2)
    )
    ok = (F.col("n") >= 3) & (det != 0)
    b0 = F.when(ok, d0 / det)
    b1 = F.when(ok, d1 / det)
    b2 = F.when(ok, d2 / det)
    sse = syy - b0 * sy - b1 * s1y - b2 * s2y
    sst = syy - sy * sy / n
    r2 = F.when(ok, F.lit(1.0) - F.try_divide(sse, sst))
    return a.select(
        "n",
        F.round(b0, round_decimals).alias("b0"),
        F.round(b1, round_decimals).alias("b1"),
        F.round(b2, round_decimals).alias("b2"),
        F.round(r2, round_decimals).alias("r2"),
    )
