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
