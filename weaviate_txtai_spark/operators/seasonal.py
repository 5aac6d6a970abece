"""Seasonality profiling over event streams: weekday indices and
centered moving-average trend — the decomposition-lite a volume
dashboard needs before any anomaly rule makes sense (a Saturday dip is
seasonality, not an incident).

Scale notes: everything runs on the DAILY GRID, never raw events — one
(group, date) count aggregate reduces the corpus to ≤ groups×days rows,
and every window after that is partitioned by group over that grid
(value-domain discipline). Raw-event cost is exactly one
map-side-combined shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def daily_counts(
    events: DataFrame,
    *,
    group_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """The (group, day, n) grid everything here runs on. NULL group
    keys are excluded alongside NULL timestamps: a grouped NULL would
    splice every unkeyed event into one pseudo-series that then flows
    through every profile/trend/anomaly consumer of this grid."""
    return (
        events.filter(
            F.col(ts_col).isNotNull() & F.col(group_col).isNotNull()
        )
        .groupBy(
            F.col(group_col).alias("grp"),
            F.to_date(ts_col).alias("day"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )


def weekday_profile(
    events: DataFrame,
    *,
    group_col: str = "event_type",
    ts_col: str = "ts",
    round_decimals: int = 6,
) -> DataFrame:
    """Per (group, weekday): mean daily volume and the seasonal index
    (weekday mean / the group's overall daily mean; 1.0 = flat).
    Weekday numbering is ISO ``dayofweek``-style 1=Sunday…7=Saturday
    (Spark's convention — the oracle twin mirrors it).

    Output: ``grp, weekday, n_days, avg_n, index``."""
    grid = daily_counts(events, group_col=group_col, ts_col=ts_col)
    wd = grid.withColumn("weekday", F.dayofweek("day"))
    per_wd = wd.groupBy("grp", "weekday").agg(
        F.count(F.lit(1)).alias("n_days"), F.avg("n").alias("__a")
    )
    overall = grid.groupBy("grp").agg(F.avg("n").alias("__o"))
    return (
        per_wd.join(F.broadcast(overall), "grp")
        .select(
            "grp",
            "weekday",
            F.col("n_days").cast("long").alias("n_days"),
            F.round("__a", round_decimals).alias("avg_n"),
            F.round(F.col("__a") / F.col("__o"), round_decimals).alias(
                "index"
            ),
        )
    )


def trend_ma(
    events: DataFrame,
    *,
    group_col: str = "event_type",
    ts_col: str = "ts",
    window_days: int = 7,
    round_decimals: int = 6,
) -> DataFrame:
    """Centered moving-average trend over the daily grid: for each
    (group, day), the mean daily count over the ±⌊w/2⌋ CALENDAR-day
    band (a range window over day offsets, so gap days are neither
    invented nor double-counted; edges average whatever the band
    holds — the convention the oracle replays).

    Output: ``grp, day, n, trend``."""
    if window_days < 1 or window_days % 2 == 0:
        raise ValueError("window_days must be odd and >= 1")
    half = window_days // 2
    grid = daily_counts(events, group_col=group_col, ts_col=ts_col)
    w = (
        Window.partitionBy("grp")
        .orderBy(F.unix_date("day"))
        .rangeBetween(-half, half)
    )
    return grid.select(
        "grp",
        "day",
        F.col("n").cast("long").alias("n"),
        F.round(F.avg("n").over(w), round_decimals).alias("trend"),
    )


def fill_daily_gaps(
    events: DataFrame,
    *,
    group_col: str = "event_type",
    ts_col: str = "ts",
    fill: str = "zero",
) -> DataFrame:
    """Dense daily grid per group: every calendar day in [group's first
    day, group's last day] gets a row — ``fill='zero'`` puts 0 on
    missing days (count semantics: no events IS zero events),
    ``fill='ffill'`` carries the last observed count forward (gauge
    semantics). Downstream smoothing/trend operators assume a dense
    grid; silently skipping gap days biases every window that spans
    one.

    Scale: the grid explodes one row per (group, day-in-span) from the
    per-group [min, max] — output-sized, no join against raw events
    beyond the initial daily count; the forward fill is a
    group-partitioned last-non-null window over the grid.

    Output: ``grp, day, n, observed``."""
    if fill not in ("zero", "ffill"):
        raise ValueError(f"fill must be zero|ffill, got {fill!r}")
    grid = daily_counts(events, group_col=group_col, ts_col=ts_col)
    span = grid.groupBy("grp").agg(
        F.min("day").alias("__d0"), F.max("day").alias("__d1")
    )
    dense = span.select(
        "grp",
        F.explode(F.sequence("__d0", "__d1")).alias("day"),
    )
    joined = dense.join(grid, ["grp", "day"], "left").select(
        "grp", "day", F.col("n").alias("__obs")
    )
    if fill == "zero":
        out = joined.select(
            "grp",
            "day",
            F.coalesce("__obs", F.lit(0)).cast("long").alias("n"),
            F.col("__obs").isNotNull().alias("observed"),
        )
    else:
        w = (
            Window.partitionBy("grp")
            .orderBy("day")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        out = joined.select(
            "grp",
            "day",
            F.last("__obs", ignorenulls=True).over(w).cast("long").alias("n"),
            F.col("__obs").isNotNull().alias("observed"),
        )
    return out


def volume_anomalies(
    events: DataFrame,
    *,
    group_col: str = "event_type",
    ts_col: str = "ts",
    window_days: int = 7,
    threshold: float = 0.5,
    round_decimals: int = 6,
) -> DataFrame:
    """The composed telemetry end-product: seasonally-adjusted volume
    anomaly flags. Expected daily volume = centered MA trend × the
    group's weekday index; a day is anomalous when
    |ln(actual/expected)| > ``threshold`` (symmetric in spikes and
    dips; 0.5 ≈ a ±65% departure). This is what a raw z-score can't do
    — a Saturday dip is SEASON, not incident.

    One daily-count shuffle; everything after runs on the grid (trend:
    group-partitioned range window; weekday index: a weekday-domain
    join). Output: ``grp, day, n, expected, log_ratio, anomaly``."""
    if window_days < 1 or window_days % 2 == 0:
        raise ValueError("window_days must be odd and >= 1")
    half = window_days // 2
    grid = daily_counts(events, group_col=group_col, ts_col=ts_col)
    wtr = (
        Window.partitionBy("grp")
        .orderBy(F.unix_date("day"))
        .rangeBetween(-half, half)
    )
    with_trend = grid.withColumn(
        "__trend", F.round(F.avg("n").over(wtr), round_decimals)
    ).withColumn("__wd", F.dayofweek("day"))
    per_wd = grid.withColumn("__wd", F.dayofweek("day")).groupBy(
        "grp", "__wd"
    ).agg(F.avg("n").alias("__a"))
    overall = grid.groupBy("grp").agg(F.avg("n").alias("__o"))
    idx = per_wd.join(F.broadcast(overall), "grp").select(
        "grp",
        "__wd",
        F.round(F.col("__a") / F.col("__o"), round_decimals).alias("__idx"),
    )
    out = with_trend.join(F.broadcast(idx), ["grp", "__wd"]).select(
        "grp",
        "day",
        F.col("n").cast("long").alias("n"),
        F.round(F.col("__trend") * F.col("__idx"), round_decimals).alias(
            "expected"
        ),
    )
    log_ratio = F.round(
        F.log(F.try_divide(F.col("n"), F.col("expected"))), round_decimals
    )
    return out.select(
        "grp",
        "day",
        "n",
        "expected",
        log_ratio.alias("log_ratio"),
        (F.abs(log_ratio) > F.lit(float(threshold))).alias("anomaly"),
    )


def acf(
    series: DataFrame,
    *,
    t_col: str = "t",
    y_col: str = "y",
    max_lag: int = 14,
    round_decimals: int = 6,
) -> DataFrame:
    """Sample autocorrelation function r_k for k = 1..``max_lag`` over a
    REGULAR integer-indexed series (caller gap-fills — pair formation
    joins on t+k, so holes silently shrink n_pairs instead of erroring):

        r_k = Σ_t (y_t − ȳ)(y_{t+k} − ȳ) / Σ_t (y_t − ȳ)²

    The seasonality fingerprint behind "is there a weekly cycle" checks
    (r₇ spike) and residual-whiteness tests after a trend fit.

    Scale: ONE join of the series against itself fanned out by a
    broadcast lag list (L·n rows, L small), one groupBy(lag); the mean
    and denominator are a single 1-row aggregate riding a broadcast.

    Output: ``lag, n_pairs, acf`` — NULL acf for a constant series
    (zero denominator).
    """
    if max_lag < 1:
        raise ValueError("acf: max_lag must be >= 1")
    s = series.select(
        F.col(t_col).cast("long").alias("t"),
        F.col(y_col).cast("double").alias("y"),
    ).filter(F.col("y").isNotNull())
    stats = s.agg(
        F.avg("y").alias("__mu"),
        F.count(F.lit(1)).cast("double").alias("__n"),
    )
    centered = s.join(F.broadcast(stats)).select(
        "t", (F.col("y") - F.col("__mu")).alias("c")
    )
    denom = centered.agg(F.sum(F.col("c") * F.col("c")).alias("__d"))
    lags = s.sparkSession.range(1, max_lag + 1).select(
        F.col("id").alias("lag")
    )
    a = centered.select(F.col("t"), F.col("c").alias("ca"))
    b = centered.select(
        F.col("t").alias("tb"), F.col("c").alias("cb")
    )
    pairs = (
        a.join(F.broadcast(lags))
        .join(b, F.col("tb") == F.col("t") + F.col("lag"))
        .groupBy("lag")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.sum(F.col("ca") * F.col("cb")).alias("__num"),
        )
    )
    return (
        pairs.join(F.broadcast(denom))
        .select(
            F.col("lag").cast("int").alias("lag"),
            "n_pairs",
            F.round(
                F.when(F.col("__d") > 0, F.col("__num") / F.col("__d")),
                round_decimals,
            ).alias("acf"),
        )
        .orderBy("lag")
    )


def sax_symbols(
    series: DataFrame,
    *,
    t_col: str = "t",
    y_col: str = "y",
    n_segments: int = 16,
    round_decimals: int = 6,
) -> DataFrame:
    """SAX symbolization (Lin, Keogh et al. 2003): z-normalize a regular
    integer-indexed series, reduce it with PAA (equal integer segments
    seg = ⌊t·w/n⌋), and map each segment mean to an alphabet-4 symbol
    at the standard Gaussian breakpoints ±0.6745 / 0 — the time-series
    "word" used for indexing, motif discovery, and cheap shape joins
    over metric streams.

    Determinism: the series values are exact (counts), so the moment
    sums stay below 2^53 and μ/σ are identical doubles on both engines;
    each segment's z-mean is ROUNDED before the breakpoint comparison,
    so the symbol is a pure function of the rounded value.

    Output: ``seg, n_points, paa_z, symbol`` — σ = 0 (constant series)
    yields NULL paa_z and symbol ``'b'`` (the zero bucket) everywhere.

    Scale: one 1-row moment aggregate + one groupBy(seg); the segment
    count is fixed and small.
    """
    if n_segments < 1:
        raise ValueError("sax_symbols: n_segments must be >= 1")
    s = series.select(
        F.col(t_col).cast("long").alias("t"),
        F.col(y_col).cast("double").alias("y"),
    ).filter(F.col("y").isNotNull())
    stats = s.agg(
        F.count(F.lit(1)).cast("double").alias("__n"),
        F.sum("y").alias("__sy"),
        F.sum(F.col("y") * F.col("y")).alias("__sq"),
        F.min("t").alias("__t0"),
        # span from min(t), not 0: a regular series starting at t0 > 0
        # must not skew its PAA segments (ADVICE r9)
        (F.max("t") - F.min("t") + 1).alias("__len"),
    )
    mu = F.col("__sy") / F.col("__n")
    var = (F.col("__sq") - F.col("__sy") * mu) / F.col("__n")
    segs = (
        s.join(F.broadcast(stats))
        .select(
            F.expr(f"((t - __t0) * {int(n_segments)}L) div __len").alias("seg"),
            "y", "__sy", "__sq", "__n",
        )
        .groupBy("seg")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_points"),
            F.sum("y").alias("__segsum"),
        )
    )
    z = (
        segs.join(F.broadcast(stats))
        .select(
            F.col("seg").cast("int").alias("seg"),
            "n_points",
            F.round(
                F.try_divide(
                    F.col("__segsum") / F.col("n_points") - mu,
                    F.sqrt(F.greatest(var, F.lit(0.0))),
                ),
                round_decimals,
            ).alias("paa_z"),
        )
    )
    sym = (
        F.when(F.col("paa_z").isNull(), "b")
        .when(F.col("paa_z") < -0.6745, "a")
        .when(F.col("paa_z") < 0.0, "b")
        .when(F.col("paa_z") < 0.6745, "c")
        .otherwise("d")
    )
    return z.select("seg", "n_points", "paa_z", sym.alias("symbol")) \
        .orderBy("seg")


def xcf(
    series_a: DataFrame,
    series_b: DataFrame,
    *,
    t_col: str = "t",
    y_col: str = "y",
    max_lag: int = 7,
    round_decimals: int = 6,
) -> DataFrame:
    """Sample cross-correlation r_k between two regular integer-indexed
    series for k = −``max_lag`` .. +``max_lag``:

        r_k = Σ_t (a_t − ā)(b_{t+k} − b̄) / √(Σ(a−ā)² · Σ(b−b̄)²)

    — the lead-lag detector ("do errors precede purchase dips, and by
    how many days?"); positive k means the A signal LEADS B by k steps.
    Same join shape as :func:`acf` with a signed lag list.

    Output: ``lag, n_pairs, xcf`` — NULL for a constant series.
    """
    if max_lag < 1:
        raise ValueError("xcf: max_lag must be >= 1")

    def prep(s, name):
        base = s.select(
            F.col(t_col).cast("long").alias("t"),
            F.col(y_col).cast("double").alias(name),
        ).filter(F.col(name).isNotNull())
        st = base.agg(F.avg(name).alias("__mu"))
        return base.join(F.broadcast(st)).select(
            "t", (F.col(name) - F.col("__mu")).alias(name)
        )

    ca = prep(series_a, "ca")
    cb = prep(series_b, "cb")
    da = ca.agg(F.sum(F.col("ca") * F.col("ca")).alias("__da"))
    db = cb.agg(F.sum(F.col("cb") * F.col("cb")).alias("__db"))
    lags = series_a.sparkSession.range(
        -max_lag, max_lag + 1
    ).select(F.col("id").alias("lag"))
    pairs = (
        ca.join(F.broadcast(lags))
        .join(
            cb.select(F.col("t").alias("tb"), "cb"),
            F.col("tb") == F.col("t") + F.col("lag"),
        )
        .groupBy("lag")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.sum(F.col("ca") * F.col("cb")).alias("__num"),
        )
    )
    return (
        pairs.join(F.broadcast(da))
        .join(F.broadcast(db))
        .select(
            F.col("lag").cast("int").alias("lag"),
            "n_pairs",
            F.round(
                F.when(
                    (F.col("__da") > 0) & (F.col("__db") > 0),
                    F.col("__num")
                    / F.sqrt(F.col("__da") * F.col("__db")),
                ),
                round_decimals,
            ).alias("xcf"),
        )
        .orderBy("lag")
    )


def mann_kendall(
    series: DataFrame,
    *,
    t_col: str = "t",
    y_col: str = "y",
    round_decimals: int = 6,
) -> DataFrame:
    """Mann–Kendall monotone-trend test (Mann 1945; Kendall 1975): the
    nonparametric "is this metric drifting" check run on daily series
    where a linear fit is distorted by outliers and seasonality —
    S = Σ_{i<j} sign(y_j − y_i), variance with the tie correction
    σ² = [n(n−1)(2n+5) − Σ t(t−1)(2t+5)]/18, and the ±1-continuity-
    corrected z. All INTEGER statistics on a count-valued series, so S
    and σ² replay exactly; p via the Zelen–Severo Φ polynomial.

    Output (1 row): ``n, s, var_s, z, p_value`` — z NULL when σ = 0
    (constant series).

    Scale: the time-domain pair join is quadratic in the SERIES length
    (a few hundred days after the daily reduction), not the corpus —
    the corpus-sized stage is the daily groupBy upstream.
    """
    from weaviate_txtai_spark.operators.abtest import normal_two_sided_p

    # NULL t drops UP FRONT: the tj > ti pair join would exclude such
    # rows from S while n and the tie correction still counted them,
    # deflating z — exclusion must be uniform across all three stats
    s = series.select(
        F.col(t_col).cast("long").alias("t"),
        F.col(y_col).cast("double").alias("y"),
    ).filter(F.col("y").isNotNull() & F.col(t_col).isNotNull())
    a = s.select(F.col("t").alias("ti"), F.col("y").alias("yi"))
    b = s.select(F.col("t").alias("tj"), F.col("y").alias("yj"))
    sgn = F.when(F.col("yj") > F.col("yi"), 1).when(
        F.col("yj") < F.col("yi"), -1
    ).otherwise(0)
    s_stat = (
        a.join(b, F.col("tj") > F.col("ti"))
        .agg(F.coalesce(F.sum(sgn), F.lit(0)).cast("long").alias("s"))
    )
    ties = (
        s.groupBy("y")
        .agg(F.count(F.lit(1)).cast("long").alias("__t"))
        .agg(
            F.coalesce(
                F.sum(
                    F.col("__t") * (F.col("__t") - 1)
                    * (2 * F.col("__t") + 5)
                ),
                F.lit(0),
            ).cast("long").alias("__tie"),
            F.sum("__t").cast("long").alias("n"),
        )
    )
    j = s_stat.join(F.broadcast(ties))
    n = F.col("n")
    var_s = (
        (n * (n - 1) * (2 * n + 5) - F.col("__tie")) / F.lit(18.0)
    )
    sc = F.col("s").cast("double")
    z = F.when(
        var_s > 0,
        F.when(sc > 0, (sc - 1) / F.sqrt(var_s))
        .when(sc < 0, (sc + 1) / F.sqrt(var_s))
        .otherwise(F.lit(0.0)),
    )
    out = j.select(
        "n",
        "s",
        F.round(var_s, round_decimals).alias("var_s"),
        F.round(z, round_decimals).alias("z"),
    )
    return out.select(
        "n",
        "s",
        "var_s",
        "z",
        F.round(
            F.when(F.col("z").isNotNull(),
                   normal_two_sided_p(F.col("z"))),
            round_decimals,
        ).alias("p_value"),
    )


def haar_dwt(
    series: DataFrame,
    *,
    t_col: str = "t",
    y_col: str = "y",
    levels: int = 4,
    round_decimals: int = 6,
) -> DataFrame:
    """Unnormalized Haar wavelet decomposition of a regular
    integer-indexed series: level ℓ pairs adjacent level-(ℓ−1)
    approximations into an approximation (mean) and a detail
    (half-difference) — the multi-resolution energy fingerprint used
    for burst localization ("WHICH week moved") and cheap compressed
    time-series matching, complementing SAX's symbolic view.

    Odd-length tails at any level carry their single element up
    unchanged (no padding is invented). All coefficients are dyadic
    rationals of the input values — exact doubles for count-valued
    input at any realistic magnitude, so no rounding discipline is
    needed beyond the output.

    Output: one row per (level, k): ``level, k, approx, detail`` —
    ``detail`` NULL for a carried odd tail; level 0 rows are absent
    (they ARE the input).

    Scale: ``levels`` aggregates, each a groupBy on the halved index —
    the series after the daily reduction is tiny; the corpus-sized
    stage is upstream.
    """
    if levels < 1:
        raise ValueError("haar_dwt: levels must be >= 1")
    cur = series.select(
        F.col(t_col).cast("long").alias("k"),
        F.col(y_col).cast("double").alias("a"),
    ).filter(F.col("a").isNotNull())
    outs = []
    for lvl in range(1, levels + 1):
        nxt = (
            cur.groupBy(F.expr("k div 2").alias("k"))
            .agg(
                F.count(F.lit(1)).alias("__c"),
                F.avg("a").alias("approx"),
                ((F.sum(F.when(F.expr("k % 2 = 0"), F.col("a")))
                  - F.sum(F.when(F.expr("k % 2 = 1"), F.col("a"))))
                 / 2.0).alias("detail"),
            )
        )
        nxt = nxt.select(
            "k",
            F.col("approx").alias("a"),
            F.when(F.col("__c") == 2, F.col("detail")).alias("detail"),
        )
        outs.append(
            nxt.select(
                F.lit(lvl).alias("level"),
                F.col("k").cast("long").alias("k"),
                F.round("a", round_decimals).alias("approx"),
                F.round("detail", round_decimals).alias("detail"),
            )
        )
        cur = nxt.select("k", "a")
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out.orderBy("level", "k")


def single_changepoint(
    series: DataFrame,
    t_col: str = "t",
    y_col: str = "y",
    *,
    score_scale: int = 10**6,
    max_points: int = 100_000,
) -> DataFrame:
    """Exact single-changepoint detection (binary segmentation step 1):
    the split k (1 ≤ k < n over the t-ordered series) minimizing the
    two-segment SSE, equivalently maximizing the between-segment sum of
    squares BSS(k) = D_k² / (n·k·(n−k)) with D_k = S_k·n − S·k (S_k the
    prefix sum) — integer-exact, so the argmax needs no float. Scores
    are compared as ``D²·score_scale // (k(n−k))`` (same truncation on
    every engine); ties break on the smaller k.

    Scale: one groupBy upstream to the time grid, driver fold over
    ≤ ``max_points`` rows (domain-sized iteration). Output (1 row):
    ``k, t_split, n, mean_before, mean_after, score`` — means are exact
    integer divisions emitted as doubles. Headroom bound: score ≈
    BSS·n·score_scale must fit int64 (LongType output / the oracle's
    BIGINT cast) — |Σy|·score_scale up to ~3e18 is safe; pre-scale
    larger-magnitude series (both engines error loudly past the bound,
    createDataFrame on the Spark side, CAST on DuckDB's).
    """
    rows = (
        series.filter(F.col(y_col).isNotNull())
        .select(
            F.col(t_col).cast("long").alias("t"),
            F.col(y_col).cast("long").alias("y"),
        )
        .orderBy("t")
        # cap guard BEFORE the collect: an oversized series (a mis-called
        # raw-timestamp input) pulls at most cap+1 rows, never all of them
        .limit(max_points + 1)
        .collect()
    )
    n = len(rows)
    if n > max_points:
        raise ValueError(
            f"single_changepoint: point domain exceeds cap {max_points}"
        )
    if n < 2:
        raise ValueError("single_changepoint: need at least 2 points")
    ys = [int(r["y"]) for r in rows]
    total = sum(ys)
    best_k, best_score = None, -1
    s1 = 0
    for k in range(1, n):
        s1 += ys[k - 1]
        d = s1 * n - total * k
        score = d * d * int(score_scale) // (k * (n - k))
        if score > best_score:
            best_k, best_score = k, score
    sb = sum(ys[:best_k])
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    schema = StructType(
        [
            StructField("k", LongType(), False),
            StructField("t_split", LongType(), False),
            StructField("n", LongType(), False),
            StructField("mean_before", DoubleType(), False),
            StructField("mean_after", DoubleType(), False),
            StructField("score", LongType(), False),
        ]
    )
    return series.sparkSession.createDataFrame(
        [
            (
                best_k,
                int(rows[best_k]["t"]),
                n,
                sb / best_k,
                (total - sb) / (n - best_k),
                best_score,
            )
        ],
        schema,
    )
