"""Kaplan–Meier survival estimation per group — time-to-event analytics
with right-censoring (the statistic behind "how long until a user
converts / a document gets its first duplicate / a job fails", where
many subjects never experience the event inside the observation
window and dropping them would bias everything).

Product-limit estimator: at each distinct event time t with d_t events
among n_t at-risk subjects, S(t) multiplies by (1 − d_t/n_t); censored
subjects leave the risk set without moving the curve.

Scale notes: one (group, duration) count aggregate — the corpus-sized
shuffle — then every window runs over each group's DISTINCT duration
table (value domain, not subjects; the `ks_drift`/`gini` discipline).
The at-risk count is a reverse cumulative sum; the product folds as
exp(Σ ln) with an explicit zero-factor guard (the final time can
exhaust the risk set, and ln(0) must become S=0, not NULL/-inf
propagation surprises). The DuckDB oracle uses a literal product()
window — different arithmetic, same numbers to 6dp.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def kaplan_meier(
    df: DataFrame,
    duration_col: str,
    event_col: str,
    *,
    group_col: str,
    round_decimals: int = 6,
) -> DataFrame:
    """Per-group Kaplan–Meier curve. Input: one row per subject with
    ``duration`` (time observed) and ``event`` (1 = event occurred at
    duration, 0 = right-censored there). Output: one row per (group,
    distinct duration) — ``duration, n_risk, n_events, n_censored,
    survival`` (the curve value AT that time, after its drop)."""
    base = df.filter(
        F.col(duration_col).isNotNull() & F.col(event_col).isNotNull()
    ).select(
        group_col,
        F.col(duration_col).alias("__t"),
        F.col(event_col).cast("int").alias("__e"),
    )
    counts = base.groupBy(group_col, "__t").agg(
        F.sum("__e").cast("long").alias("n_events"),
        F.sum(1 - F.col("__e")).cast("long").alias("n_censored"),
    )
    w_rev = (
        Window.partitionBy(group_col)
        .orderBy("__t")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    w_cum = (
        Window.partitionBy(group_col)
        .orderBy("__t")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    at_risk = counts.withColumn(
        "n_risk",
        F.sum(F.col("n_events") + F.col("n_censored")).over(w_rev),
    )
    factor = 1 - F.col("n_events") / F.col("n_risk")
    # exp(Σ ln factor) with a zero-factor guard: once any factor is 0
    # (risk set exhausted by events), the curve is exactly 0 from
    # there on — ln(0) must not poison the fold
    curve = at_risk.withColumn("__f", factor).withColumn(
        "survival",
        F.round(
            F.when(F.min("__f").over(w_cum) == 0, F.lit(0.0)).otherwise(
                F.exp(
                    F.sum(
                        F.when(F.col("__f") > 0, F.log("__f")).otherwise(
                            F.lit(0.0)
                        )
                    ).over(w_cum)
                )
            ),
            round_decimals,
        ),
    )
    return curve.select(
        group_col,
        F.col("__t").alias(duration_col),
        "n_risk",
        "n_events",
        "n_censored",
        "survival",
    )
