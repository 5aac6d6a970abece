"""Split conformal prediction intervals (Vovk et al.; Lei et al. 2018 —
public knowledge): distribution-free coverage for ANY point predictor.

Why an LLM-data engine carries it: pipeline models score documents
(quality, toxicity, dedup confidence) and downstream gates need
"keep if quality > q" to come with a guarantee. Split conformal turns a
held-out calibration set's residuals into an interval with
finite-sample coverage ≥ 1−α, regardless of the model or the data
distribution — the honest wrapper around an uncalibrated scorer.

qhat is the ⌈(n+1)(1−α)⌉-th smallest absolute calibration residual
(the finite-sample corrected quantile); intervals are pred ± qhat.

Scale notes: the k-th order statistic comes from the residual VALUE
DOMAIN — one |residual| count aggregate, a cumulative window over
distinct values, and a min-pick at the rank threshold (the
weighted_percentiles discipline) — never a sort or buffer of the rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def conformal_qhat(
    cal: DataFrame,
    pred_col: str,
    actual_col: str,
    *,
    alpha: float = 0.1,
    round_decimals: int = 6,
) -> DataFrame:
    """One row: ``n_cal, k, qhat`` — qhat is the k = ⌈(n+1)(1−α)⌉-th
    smallest |pred − actual| over the calibration rows (residuals
    rounded to ``round_decimals`` BEFORE ranking so the domain table —
    and therefore qhat — is engine-reproducible). When k > n (tiny
    calibration sets can't certify the coverage) qhat is NULL."""
    if not (0 < alpha < 1):
        raise ValueError("alpha must be in (0, 1)")
    res = cal.filter(
        F.col(pred_col).isNotNull() & F.col(actual_col).isNotNull()
    ).select(
        F.round(
            F.abs(F.col(pred_col) - F.col(actual_col)), round_decimals
        ).alias("__r")
    )
    vc = res.groupBy("__r").agg(F.count(F.lit(1)).alias("__c"))
    w = Window.orderBy("__r").rowsBetween(Window.unboundedPreceding, 0)
    cum = vc.withColumn("__cum", F.sum("__c").over(w))
    tot = vc.agg(F.sum("__c").alias("__n"))
    k = F.ceil((F.col("__n") + 1) * F.lit(1.0 - alpha)).cast("long")
    return (
        cum.join(F.broadcast(tot))
        .withColumn("__k", k)
        .agg(
            F.first("__n").cast("long").alias("n_cal"),
            F.first("__k").alias("k"),
            F.min(
                F.when(F.col("__cum") >= F.col("__k"), F.col("__r"))
            ).alias("qhat"),
        )
    )


def conformal_apply(
    df: DataFrame,
    pred_col: str,
    qhat_df: DataFrame,
    *,
    out_lo: str = "lo",
    out_hi: str = "hi",
) -> DataFrame:
    """``df`` with ``[pred − qhat, pred + qhat]`` appended — one
    broadcast of the 1-row qhat frame, map-only otherwise."""
    q = qhat_df.select("qhat")
    return df.join(F.broadcast(q)).select(
        "*",
        (F.col(pred_col) - F.col("qhat")).alias(out_lo),
        (F.col(pred_col) + F.col("qhat")).alias(out_hi),
    ).drop("qhat")


def conformal_report(
    df: DataFrame,
    pred_col: str,
    actual_col: str,
    *,
    cal_col: str,
    alpha: float = 0.1,
    round_decimals: int = 6,
) -> DataFrame:
    """End-to-end split-conformal readout: rows where ``cal_col`` is
    true calibrate qhat; the rest are evaluated. One row: ``n_cal, k,
    qhat, n_eval, coverage`` — coverage is the evaluated fraction
    inside pred ± qhat (≥ 1−α in expectation, the guarantee under
    exchangeability)."""
    base = df.filter(
        F.col(pred_col).isNotNull() & F.col(actual_col).isNotNull()
    )
    qh = conformal_qhat(
        base.filter(F.col(cal_col)),
        pred_col,
        actual_col,
        alpha=alpha,
        round_decimals=round_decimals,
    )
    ev = base.filter(~F.col(cal_col)).select(
        F.round(
            F.abs(F.col(pred_col) - F.col(actual_col)), round_decimals
        ).alias("__r")
    )
    cov = ev.join(F.broadcast(qh)).agg(
        F.first("n_cal").alias("n_cal"),
        F.first("k").alias("k"),
        F.round(F.first("qhat"), round_decimals).alias("qhat"),
        F.count(F.lit(1)).cast("long").alias("n_eval"),
        F.round(
            # qhat NULL means the calibration set is too small to
            # certify (k > n): the interval is UNDEFINED, so report
            # NULL coverage — the otherwise(0.0) fallthrough would
            # misread as "measured zero coverage" (ADVICE r8)
            F.when(
                F.first("qhat").isNull(), F.lit(None).cast("double")
            ).otherwise(
                F.avg(
                    F.when(F.col("__r") <= F.col("qhat"), 1.0).otherwise(
                        0.0
                    )
                )
            ),
            round_decimals,
        ).alias("coverage"),
    )
    return cov
