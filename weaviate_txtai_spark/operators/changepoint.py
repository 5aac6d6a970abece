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
    base = df.filter(F.col(value_col).isNotNull()).select(
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
    base = df.filter(F.col(value_col).isNotNull()).select(
        group_col, order_col, F.col(value_col).cast("double").alias("__v")
    )
    per_group = base.groupBy(group_col).agg(
        F.sort_array(
            F.collect_list(F.struct(F.col(order_col).alias("o"), F.col("__v")))
        ).alias("__series")
    )
    # fold carries (index, prev_ewma); emit via transform over indices —
    # aggregate() alone returns only the final state, so the running
    # trajectory is rebuilt with a prefix fold per element. To stay
    # O(n) (not O(n²)), fold ONCE accumulating the output array.
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
