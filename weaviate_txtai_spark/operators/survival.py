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


_LOGRANK_CAP = 100_000


def logrank_test(
    subjects: DataFrame,
    duration_col: str,
    event_col: str,
    group_col: str,
    *,
    scale: int = 10**6,
) -> DataFrame:
    """Two-sample log-rank test (Mantel 1966) — does one cohort's
    survival curve differ from the other's? At each distinct pooled
    event time t: O₁ accumulates group-1 events, E₁ the hypergeometric
    expectation d_t·n1_t/n_t, V the hypergeometric variance
    d_t·(n1_t/n_t)(1−n1_t/n_t)(n_t−d_t)/(n_t−1); the statistic is
    χ² = (O₁−E₁)²/V (1 df). The inference companion to
    :func:`kaplan_meier` — two curves that LOOK apart need this before
    anyone ships the conclusion.

    Determinism: E and V accumulate as SCALED-INTEGER truncating
    divisions per event time (term-by-term ``//``, exact ints in,
    exact ints out), so the sums are order-free integers that replay
    bit-identically in SQL; χ² is one double expression over the final
    integers. Groups are the two DISTINCT values of ``group_col``
    (ascending order defines group 1); more than two raises.

    Scale: one groupBy(duration, group) corpus reduction, then a
    driver fold over the pooled duration domain (≤ cap rows — the
    kaplan_meier discipline).

    Output (1 row): ``n1, n2, o1, e1, v, chi2`` (e1/v exact scaled
    divisions emitted as doubles; NULL chi2 when V = 0).
    """
    grp = (
        subjects.filter(
            F.col(duration_col).isNotNull()
            & (F.col(duration_col) >= 0)
            & F.col(group_col).isNotNull()
        )
        .groupBy(
            F.col(duration_col).cast("long").alias("t"),
            F.col(group_col).alias("g"),
        )
        .agg(
            F.sum(
                F.when(F.col(event_col).cast("int") == 1, 1).otherwise(0)
            ).cast("long").alias("d"),
            F.count(F.lit(1)).cast("long").alias("c"),
        )
        .orderBy("t", "g")
    )
    # Bound driver memory BEFORE materializing: limit(cap+1) makes an
    # oversized domain (a mis-called raw-timestamp input) surface as the
    # cap error after pulling at most cap+1 rows, never the full domain.
    rows = grp.limit(_LOGRANK_CAP + 1).collect()
    if len(rows) > _LOGRANK_CAP:
        raise ValueError(
            f"logrank_test: duration domain exceeds cap "
            f"{_LOGRANK_CAP}; coarsen the time unit"
        )
    groups = sorted({r["g"] for r in rows})
    if len(groups) != 2:
        raise ValueError(
            f"logrank_test: need exactly 2 groups, got {groups}"
        )
    g1 = groups[0]
    by_t: "dict[int, list]" = {}
    for r in rows:
        by_t.setdefault(int(r["t"]), []).append(r)
    n1 = sum(int(r["c"]) for r in rows if r["g"] == g1)
    n2 = sum(int(r["c"]) for r in rows if r["g"] != g1)
    rem1, rem = n1, n1 + n2
    sc = int(scale)
    o1 = 0
    e1_s = 0
    v_s = 0
    for t in sorted(by_t):
        d = sum(int(r["d"]) for r in by_t[t])
        c = sum(int(r["c"]) for r in by_t[t])
        d1 = sum(int(r["d"]) for r in by_t[t] if r["g"] == g1)
        c1 = sum(int(r["c"]) for r in by_t[t] if r["g"] == g1)
        if d > 0 and rem > 1:
            o1 += d1
            e1_s += d * rem1 * sc // rem
            v_s += (
                d * rem1 * (rem - rem1) * (rem - d) * sc
                // (rem * rem * (rem - 1))
            )
        rem1 -= c1
        rem -= c
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    # exact-rational half-away rounding, no float path: chi2 is a ratio
    # of exact ints, and a float-divide-then-round would use python's
    # half-EVEN against the oracle's half-away (the docs_robust_zscores
    # r10 lesson). num >= 0 and den > 0, so // == truncation here.
    chi2 = None
    if v_s > 0:
        num = (o1 * sc - e1_s) ** 2
        den = v_s * sc
        chi2 = ((2 * num * 10**6 + den) // (2 * den)) / 1e6
    schema = StructType(
        [
            StructField("n1", LongType(), False),
            StructField("n2", LongType(), False),
            StructField("o1", LongType(), False),
            StructField("e1", DoubleType(), False),
            StructField("v", DoubleType(), False),
            StructField("chi2", DoubleType(), True),
        ]
    )
    return subjects.sparkSession.createDataFrame(
        [
            (
                n1,
                n2,
                o1,
                e1_s / sc,
                v_s / sc,
                chi2,
            )
        ],
        schema,
    )
