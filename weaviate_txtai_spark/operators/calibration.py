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


def eb_beta_binomial_shrink(
    df: DataFrame,
    key_col: str,
    success_col: str,
    *,
    round_decimals: int = 6,
    prior_decimals: int = 9,
) -> DataFrame:
    """Empirical-Bayes beta-binomial shrinkage of per-key success
    rates (Robbins 1956 / the "sort by rating with few reviews" fix):
    fit Beta(α, β) to the observed per-key rates by method of moments,

        α+β = m(1−m)/v − 1,   α = m·(α+β)

    (m, v = mean and sample variance of raw rates), then shrink each
    key toward the prior: rate_eb = (c+α)/(n+α+β). Keys with few
    trials move most — exactly what a quality/return/defect ranking
    needs before trusting small-sample extremes.

    When the MoM solution is invalid (v = 0, v ≥ m(1−m), or a
    non-positive α/β), shrinkage degrades to the raw rate with NULL
    priors — the documented fallback, not an error.

    Determinism: α and β are rounded at ``prior_decimals`` BEFORE
    application, so every row's shrunken rate is a pure function of
    rounded doubles on both engines.

    Output: one row per key — ``key_col, n, c, rate_raw, rate_eb``
    plus the fitted ``alpha, beta`` repeated (flat schema).

    Scale: one groupBy(key) + a 1-row moment aggregate riding a
    broadcast; no quadratic anywhere.
    """
    per_key = df.groupBy(F.col(key_col).alias("__k")).agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(F.col(success_col).cast("int")).cast("double").alias("c"),
    )
    rates = per_key.select("__k", "n", "c", (F.col("c") / F.col("n")).alias("__r"))
    mom = rates.agg(
        F.avg("__r").alias("__m"),
        F.var_samp("__r").alias("__v"),
    )
    m, v = F.col("__m"), F.col("__v")
    ok = (
        v.isNotNull() & (v > 0) & (m > 0) & (m < 1)
        & (v < m * (1 - m))
    )
    ab = F.when(ok, m * (1 - m) / v - 1)
    prior = mom.select(
        F.round(ab * m, prior_decimals).alias("alpha"),
        F.round(ab * (1 - m), prior_decimals).alias("beta"),
    ).select(
        # a non-positive fitted prior is as unusable as a degenerate one
        F.when(F.col("alpha") > 0, F.col("alpha")).alias("alpha"),
        F.when(F.col("beta") > 0, F.col("beta")).alias("beta"),
    )
    both = (F.col("alpha").isNotNull()) & (F.col("beta").isNotNull())
    return (
        rates.join(F.broadcast(prior))
        .select(
            F.col("__k").alias(key_col),
            F.col("n").cast("long").alias("n"),
            F.col("c").cast("long").alias("c"),
            F.round("__r", round_decimals).alias("rate_raw"),
            F.round(
                F.when(
                    both,
                    (F.col("c") + F.col("alpha"))
                    / (F.col("n") + F.col("alpha") + F.col("beta")),
                ).otherwise(F.col("__r")),
                round_decimals,
            ).alias("rate_eb"),
            "alpha",
            "beta",
        )
    )
