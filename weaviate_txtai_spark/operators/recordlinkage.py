"""Fellegi–Sunter probabilistic record linkage scoring.

Fellegi & Sunter 1969 (public knowledge): given candidate record pairs
and per-field agreement indicators, weight each field by how much more
likely agreement is under a match than a non-match —

    w_agree(k)    = log2( m_k / u_k )
    w_disagree(k) = log2( (1−m_k) / (1−u_k) )

with m_k = P(field k agrees | pair is a match) and u_k = P(agrees |
non-match) — and score a pair by the sum of its fields' weights. The
entity-resolution operator every dedup/linkage pipeline runs after
BLOCKING cuts the cross product down to candidate pairs.

This implementation estimates m/u from a LABELED candidate frame (the
supervised variant: a truth column marks known matches — e.g. pairs
sharing a stable key in a re-linkage benchmark, or a hand-labeled
sample). The EM-fitted unsupervised variant shares the scoring half.

Scale shape: ONE 1-row aggregate over the candidate frame collects the
2·K+2 agreement counts (map-side combined; K = number of compared
fields, driver state is K-bounded), the weights become literals, and
scoring is a pure map — no shuffle after the aggregate. Candidate
generation (blocking) is the caller's join and carries the real cost.

Determinism: m/u derive from exact integer counts (identical on any
engine); weights round to 9 dp before scoring so a last-ulp libm
difference in log2 cannot reach the 6-dp score (the pow-key lesson,
NOTES.md); probabilities clamp to [1e-6, 1−1e-6] so degenerate fields
(always/never agreeing) keep finite weights.
"""

from __future__ import annotations

import math
from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fs_weights(
    pairs: DataFrame,
    agree_cols: Sequence[str],
    match_col: str,
    *,
    clamp: float = 1e-6,
    weight_decimals: int = 9,
) -> "dict[str, tuple[float, float]]":
    """Estimate per-field (w_agree, w_disagree) from a labeled candidate
    frame. One 1-row aggregate; returns a K-entry dict."""
    if not agree_cols:
        raise ValueError("fs_weights: no agreement columns")
    aggs = [
        F.sum(F.when(F.col(match_col), 1).otherwise(0)).alias("__nm"),
        F.sum(F.when(~F.col(match_col), 1).otherwise(0)).alias("__nu"),
    ]
    for c in agree_cols:
        aggs.append(
            F.sum(
                F.when(F.col(match_col) & F.col(c), 1).otherwise(0)
            ).alias(f"__am_{c}")
        )
        aggs.append(
            F.sum(
                F.when(~F.col(match_col) & F.col(c), 1).otherwise(0)
            ).alias(f"__au_{c}")
        )
    row = pairs.agg(*aggs).collect()[0]
    nm, nu = row["__nm"] or 0, row["__nu"] or 0
    if nm == 0 or nu == 0:
        raise ValueError(
            f"fs_weights: need both matches and non-matches in the "
            f"labeled frame (got {nm} / {nu})"
        )
    lo, hi = clamp, 1.0 - clamp
    out = {}
    for c in agree_cols:
        m = min(max(row[f"__am_{c}"] / nm, lo), hi)
        u = min(max(row[f"__au_{c}"] / nu, lo), hi)
        out[c] = (
            round(math.log2(m / u), weight_decimals),
            round(math.log2((1 - m) / (1 - u)), weight_decimals),
        )
    return out


def fs_score(
    pairs: DataFrame,
    weights: "dict[str, tuple[float, float]]",
    *,
    out_col: str = "score",
    round_decimals: int = 6,
) -> DataFrame:
    """Append the Fellegi–Sunter match score: Σ per-field agree /
    disagree weights (literals — pure map, no shuffle)."""
    expr = F.lit(0.0)
    for c, (wa, wd) in weights.items():
        expr = expr + F.when(F.col(c), F.lit(wa)).otherwise(F.lit(wd))
    return pairs.withColumn(out_col, F.round(expr, round_decimals))
