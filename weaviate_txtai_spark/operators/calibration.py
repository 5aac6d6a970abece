"""Probability-calibration evaluation: reliability bins, Brier score,
expected calibration error (ECE).

Why an LLM-data engine carries it: pipeline classifiers gate data at
scale — quality filters, toxicity screens, language-ID confidences,
LLM-judge scores — and a threshold on an UNCALIBRATED score silently
shifts the kept distribution. The standard readout (Guo et al. 2017's
ECE formulation over equal-width bins; Brier 1950 — public knowledge)
is: bin predictions, compare each bin's mean predicted probability to
its empirical positive rate, and summarize with Brier / ECE.

Scale notes: pure aggregates — one groupBy over ``n_bins`` keys
(map-side combined; the reduce side is ≤ n_bins rows) and a 1-row
summary combine. Nothing row-wise survives the first exchange; no
window, no join against data. Scores are clamped to [0, 1]; rows with
NULL score or label are dropped.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _binned(df: DataFrame, prob_col: str, label_col: str, n_bins: int):
    if n_bins < 1:
        raise ValueError("n_bins must be >= 1")
    p = F.least(F.greatest(F.col(prob_col).cast("double"), F.lit(0.0)), F.lit(1.0))
    y = F.col(label_col).cast("double")
    base = df.filter(
        F.col(prob_col).isNotNull() & F.col(label_col).isNotNull()
    ).select(
        # equal-width bins over [0,1]; p == 1.0 folds into the top bin
        F.least(
            F.floor(p * n_bins).cast("int"), F.lit(n_bins - 1)
        ).alias("bin"),
        p.alias("__p"),
        y.alias("__y"),
    )
    return base.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("__p").alias("__sp"),
        F.sum("__y").alias("__sy"),
        F.sum((F.col("__p") - F.col("__y")) ** 2).alias("__sq"),
    )


def reliability_bins(
    df: DataFrame,
    prob_col: str,
    label_col: str,
    *,
    n_bins: int = 10,
    round_decimals: int = 6,
) -> DataFrame:
    """The reliability diagram as rows: one per non-empty bin —
    ``bin, n, avg_prob, frac_pos, gap`` (gap = avg_prob − frac_pos;
    positive = overconfident)."""
    b = _binned(df, prob_col, label_col, n_bins)
    return b.select(
        "bin",
        F.col("n").cast("long").alias("n"),
        F.round(F.col("__sp") / F.col("n"), round_decimals).alias("avg_prob"),
        F.round(F.col("__sy") / F.col("n"), round_decimals).alias("frac_pos"),
        F.round(
            (F.col("__sp") - F.col("__sy")) / F.col("n"), round_decimals
        ).alias("gap"),
    )


def calibration_summary(
    df: DataFrame,
    prob_col: str,
    label_col: str,
    *,
    n_bins: int = 10,
    round_decimals: int = 6,
) -> DataFrame:
    """One row: ``n, brier, ece`` — Brier = mean (p−y)², ECE =
    Σ (n_b/N)·|avg_prob_b − frac_pos_b| over the bins."""
    b = _binned(df, prob_col, label_col, n_bins)
    return b.agg(
        F.sum("n").cast("long").alias("n"),
        F.round(F.sum("__sq") / F.sum("n"), round_decimals).alias("brier"),
        F.round(
            F.sum(F.abs(F.col("__sp") - F.col("__sy"))) / F.sum("n"),
            round_decimals,
        ).alias("ece"),
    )
