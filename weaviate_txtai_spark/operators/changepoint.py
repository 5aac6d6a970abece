"""CUSUM change-point detection per group — the Page (1954) cumulative
sum chart as pure window algebra.

Corpus telemetry (daily ingest volume per source, hourly error rate)
needs "when did the level shift?" answered cheaply. The CUSUM
statistics are the textbook recursions

    S⁺_t = max(0, S⁺_{t−1} + (x_t − target − drift))
    S⁻_t = max(0, S⁻_{t−1} − (x_t − target + drift))

with an alarm when either exceeds the threshold h.

Scale notes
-----------
The recursion is non-associative, so it looks window-hostile — but it
has the classic running-extremum closed form: with
P_t = Σ_{j≤t} (x_j − target − drift),

    S⁺_t = P_t − min_{j≤t} P_j       (and symmetrically for S⁻)

both of which are plain cumulative windows PARTITIONED BY GROUP and
ordered by time — no unpartitioned window, no recursion, no UDF; one
shuffle on the group key. The DuckDB oracle runs the literal recursion
in a RECURSIVE CTE, so the hash match PROVES the closed form, not just
replays it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def cusum(
    df: DataFrame,
    group_col: str,
    order_col: str,
    value_col: str,
    *,
    target: float,
    drift: float = 0.0,
    threshold: "float | None" = None,
    round_decimals: int = 6,
) -> DataFrame:
    """Per-group CUSUM trajectory: one row per input row with
    ``s_pos, s_neg`` (rounded) and, when ``threshold`` is given, an
    ``alarm`` flag (either side exceeding it). Rows with null value
    are dropped."""
    base = df.filter(
        # NULL series keys would splice unrelated series into one
        # trajectory (the monitor_stream lumping class)
        F.col(value_col).isNotNull() & F.col(group_col).isNotNull()
    ).select(
        group_col, order_col, value_col
    )
    wc = (
        Window.partitionBy(group_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    dev_p = F.col(value_col) - F.lit(target) - F.lit(drift)
    dev_n = F.col(value_col) - F.lit(target) + F.lit(drift)
    out = (
        base.withColumn("__pp", F.sum(dev_p).over(wc))
        .withColumn("__pn", F.sum(dev_n).over(wc))
        .withColumn(
            "s_pos",
            F.round(
                F.col("__pp") - F.least(F.min("__pp").over(wc), F.lit(0.0)),
                round_decimals,
            ),
        )
        .withColumn(
            "s_neg",
            F.round(
                F.greatest(F.max("__pn").over(wc), F.lit(0.0)) - F.col("__pn"),
                round_decimals,
            ),
        )
        .drop("__pp", "__pn")
    )
    if threshold is not None:
        out = out.withColumn(
            "alarm",
            (F.col("s_pos") > threshold) | (F.col("s_neg") > threshold),
        )
    return out


def ewma(
    df: DataFrame,
    group_col: str,
    order_col: str,
    value_col: str,
    *,
    alpha: float,
    round_decimals: int = 6,
) -> DataFrame:
    """Per-group exponentially weighted moving average:
    s_1 = x_1; s_t = α·x_t + (1−α)·s_{t−1} — the smoother behind every
    "trend line" on a volume dashboard and the EW baseline CUSUM-style
    monitors subtract.

    Scale notes: the recursion is evaluated as an ``aggregate`` fold
    over each group's time-sorted (order, value) array — ONE group-keyed
    shuffle, exact recursion semantics, no window tricks. The closed
    form Σ α(1−α)^j·x looks window-friendly but needs (1−α)^(−j)
    factors that overflow doubles after a few thousand steps, so the
    fold is the numerically honest distributed form. Per-group state is
    the group's own series — use on AGGREGATED grids (daily counts per
    source), not raw events; a series of millions of points in one
    group is a resample-first problem.

    Output: one row per input row — group, order, value, ``ewma``.
    """
    if not (0 < alpha <= 1):
        raise ValueError("alpha must be in (0, 1]")
    base = df.filter(
        # NULL series keys would splice unrelated series into one
        # trajectory (the monitor_stream lumping class)
        F.col(value_col).isNotNull() & F.col(group_col).isNotNull()
    ).select(
        group_col, order_col, F.col(value_col).cast("double").alias("__v")
    )
    per_group = base.groupBy(group_col).agg(
        F.sort_array(
            F.collect_list(F.struct(F.col(order_col).alias("o"), F.col("__v")))
        ).alias("__series")
    )
    # fold ONCE accumulating the output array (vs a prefix fold per
    # element, which is O(n²) FOLDS). Honest cost note: F.concat copies
    # the accumulator per step, so element COPIES are still quadratic —
    # acceptable only because the docstring contract bounds per-group
    # series at aggregated-grid size (thousands); for longer series
    # resample first or use a pandas ewm via applyInPandas.
    folded = F.aggregate(
        F.col("__series"),
        F.expr("CAST(array() AS ARRAY<DOUBLE>)"),
        lambda acc, x: F.concat(
            acc,
            F.array(
                F.when(
                    F.size(acc) == 0, x["__v"]
                ).otherwise(
                    F.lit(alpha) * x["__v"]
                    + F.lit(1.0 - alpha) * F.element_at(acc, -1)
                )
            ),
        ),
    )
    exploded = per_group.select(
        group_col,
        F.posexplode(
            F.arrays_zip(F.col("__series"), folded.alias("__e"))
        ).alias("__i", "__z"),
    )
    return exploded.select(
        group_col,
        F.col("__z.__series.o").alias(order_col),
        F.col("__z.__series.__v").alias(value_col),
        F.round(F.col("__z.__e"), round_decimals).alias("ewma"),
    )


def _holt_l(acc, x, alpha: float, round_decimals: int):
    # rounded new level: α·x + (1−α)(l_prev + b_prev)
    return F.round(
        F.lit(alpha) * x["__v"]
        + F.lit(1.0 - alpha)
        * (F.element_at(acc, -1)["l"] + F.element_at(acc, -1)["b"]),
        round_decimals,
    )


def holt_linear(
    df: DataFrame,
    group_col: str,
    order_col: str,
    value_col: str,
    *,
    alpha: float,
    beta: float,
    round_decimals: int = 6,
) -> DataFrame:
    """Per-group Holt double exponential smoothing (Holt 1957, public
    knowledge) — the trend-aware upgrade of ``ewma``:

        l_t = α·x_t + (1−α)(l_{t−1} + b_{t−1})
        b_t = β(l_t − l_{t−1}) + (1−β)·b_{t−1}

    initialized l_1 = x_1, b_1 = 0 (documented convention; a two-point
    slope init just shifts the burn-in). ``forecast`` is the one-step-
    ahead l_t + b_t, the value a volume monitor compares tomorrow
    against.

    Scale notes: same distributed form as ``ewma`` — the recursion
    folds over each group's time-sorted series with ONE group-keyed
    shuffle (per-group state = the group's own series; run on
    aggregated grids, not raw events). Both smoothed columns round per
    step so the trajectory replays identically in the recursive-CTE
    oracle.

    Output: one row per input row — group, order, value, ``level,
    trend, forecast``."""
    if not (0 < alpha <= 1) or not (0 <= beta <= 1):
        raise ValueError("alpha must be in (0,1], beta in [0,1]")
    base = df.filter(
        # NULL series keys would splice unrelated series into one
        # trajectory (the monitor_stream lumping class)
        F.col(value_col).isNotNull() & F.col(group_col).isNotNull()
    ).select(
        group_col, order_col, F.col(value_col).cast("double").alias("__v")
    )
    per_group = base.groupBy(group_col).agg(
        F.sort_array(
            F.collect_list(F.struct(F.col(order_col).alias("o"), F.col("__v")))
        ).alias("__series")
    )
    # one O(n) fold accumulating (level, trend) pairs; per-step rounding
    # pins the trajectory across engines (see ewma)
    folded = F.aggregate(
        F.col("__series"),
        F.expr(
            "CAST(array() AS ARRAY<STRUCT<l: DOUBLE, b: DOUBLE>>)"
        ),
        lambda acc, x: F.concat(
            acc,
            F.array(
                F.when(
                    F.size(acc) == 0,
                    F.struct(
                        x["__v"].alias("l"), F.lit(0.0).alias("b")
                    ),
                ).otherwise(
                    # the trend update reads the ROUNDED new level (the
                    # same value the struct stores), so the recursive-CTE
                    # oracle replays the exact trajectory from rounded
                    # state alone
                    F.struct(
                        _holt_l(acc, x, alpha, round_decimals).alias("l"),
                        F.round(
                            F.lit(beta)
                            * (
                                _holt_l(acc, x, alpha, round_decimals)
                                - F.element_at(acc, -1)["l"]
                            )
                            + F.lit(1.0 - beta) * F.element_at(acc, -1)["b"],
                            round_decimals,
                        ).alias("b"),
                    )
                )
            ),
        ),
    )
    exploded = per_group.select(
        group_col,
        F.posexplode(
            F.arrays_zip(F.col("__series"), folded.alias("__e"))
        ).alias("__i", "__z"),
    )
    return exploded.select(
        group_col,
        F.col("__z.__series.o").alias(order_col),
        F.col("__z.__series.__v").alias(value_col),
        F.col("__z.__e.l").alias("level"),
        F.col("__z.__e.b").alias("trend"),
        F.round(
            F.col("__z.__e.l") + F.col("__z.__e.b"), round_decimals
        ).alias("forecast"),
    )


def holt_linear_exact(
    df: DataFrame,
    group_col: str,
    order_col: str,
    value_col: str,
    *,
    alpha_num: int = 3,
    beta_num: int = 2,
    den: int = 10,
    scale: int = 10**6,
    round_decimals: int = 6,
) -> DataFrame:
    """Fixed-point Holt smoothing — the ORACLE-GRADE variant (the
    ``pagerank_exact`` discipline): state is scaled LONGs and every
    update is integer arithmetic with an exact floor division, so the
    trajectory is bit-identical on any engine / partitioning. The float
    ``holt_linear`` rounds per step, which is stable in isolation but a
    recursion RE-FEEDS each rounding, and a value landing within 1e-15
    of a rounding boundary flips differently on engines whose round()
    disagrees there (observed in gate testing, exactly as the pagerank
    float/exact split found).

    α = alpha_num/den, β = beta_num/den;
    l' = ⌊(αn·x + (den−αn)(l+b)) / den⌋, b' = ⌊(βn(l'−l) +
    (den−βn)b) / den⌋ — the floor is computed as
    (n − pmod(n, den)) / den so the numerator is an exact multiple and
    plain division is exact in both engines. Input values must be
    exactly representable at ``scale`` (integral grid counts are);
    |value|·scale must stay ≪ 2⁵³.

    Output: group, order, value, ``level, trend, forecast`` (doubles =
    fixed-point / scale, rounded)."""
    if not (0 < alpha_num <= den) or not (0 <= beta_num <= den):
        raise ValueError("need 0 < alpha_num <= den and 0 <= beta_num <= den")
    base = df.filter(
        # NULL series keys would splice unrelated series into one
        # trajectory (the monitor_stream lumping class)
        F.col(value_col).isNotNull() & F.col(group_col).isNotNull()
    ).select(
        group_col, order_col, F.col(value_col).cast("double").alias("__v")
    )
    per_group = base.groupBy(group_col).agg(
        F.sort_array(
            F.collect_list(F.struct(F.col(order_col).alias("o"), F.col("__v")))
        ).alias("__series")
    )

    d = F.lit(den)

    def fdiv(n):
        # exact floor division: subtract the non-negative remainder
        # first so the quotient is an exact multiple (long/long division
        # in Spark goes through double — exact because the numerator is
        # a multiple of den and ≪ 2^53)
        return ((n - F.pmod(n, d)) / d).cast("long")

    def x_fp(x):
        return F.round(x["__v"] * F.lit(float(scale)), 0).cast("long")

    def new_l(acc, x):
        prev = F.element_at(acc, -1)
        return fdiv(
            F.lit(alpha_num) * x_fp(x)
            + F.lit(den - alpha_num) * (prev["l"] + prev["b"])
        )

    folded = F.aggregate(
        F.col("__series"),
        F.expr("CAST(array() AS ARRAY<STRUCT<l: BIGINT, b: BIGINT>>)"),
        lambda acc, x: F.concat(
            acc,
            F.array(
                F.when(
                    F.size(acc) == 0,
                    F.struct(
                        x_fp(x).alias("l"),
                        F.lit(0).cast("long").alias("b"),
                    ),
                ).otherwise(
                    F.struct(
                        new_l(acc, x).alias("l"),
                        fdiv(
                            F.lit(beta_num)
                            * (new_l(acc, x) - F.element_at(acc, -1)["l"])
                            + F.lit(den - beta_num)
                            * F.element_at(acc, -1)["b"]
                        ).alias("b"),
                    )
                )
            ),
        ),
    )
    exploded = per_group.select(
        group_col,
        F.posexplode(
            F.arrays_zip(F.col("__series"), folded.alias("__e"))
        ).alias("__i", "__z"),
    )
    sc = F.lit(float(scale))
    return exploded.select(
        group_col,
        F.col("__z.__series.o").alias(order_col),
        F.col("__z.__series.__v").alias(value_col),
        F.round(F.col("__z.__e.l") / sc, round_decimals).alias("level"),
        F.round(F.col("__z.__e.b") / sc, round_decimals).alias("trend"),
        F.round(
            (F.col("__z.__e.l") + F.col("__z.__e.b")) / sc, round_decimals
        ).alias("forecast"),
    )
