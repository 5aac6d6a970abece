"""Linear quality classifier trained by exact fixed-point gradient descent.

The GPT-3 / CCNet / FineWeb data recipe trains a cheap linear classifier
to tell a REFERENCE corpus (Wikipedia, curated sources) from raw crawl
and keeps documents the classifier scores as reference-like
(GPT-3 appendix A; CCNet §4.3 uses the same shape with fastText). The
reference repo itself stops at LM-perplexity scoring; this operator adds
the supervised-classifier tier of that pipeline.

Spark shape (the ``pagerank_exact`` / ``pca_power_fit_exact`` fixed-point
discipline):

- The corpus reduces ONCE to a persisted integer feature table (one
  tokenize pass + one max-aggregate for normalization) — the per-doc
  features are fixed-point ints at ``X_SCALE``.
- Each training iteration is ONE whole-corpus aggregate producing d+1
  gradient sums (decimal — overflow-safe); the d+1 weights update
  DRIVER-side in exact python int arithmetic. No per-row state, no
  growing lineage: the plan per iteration is scan-cached-features →
  partial agg → 1 row.
- Scoring is map-only over the same cached features.

Determinism across engines: every operation is integer arithmetic with
truncate-toward-zero division (python ``_tdiv`` == DuckDB ``//`` ==
Spark ``div`` — all three verified to truncate), so the whole training
trajectory is bit-exact and the DuckDB oracle can replay it as unrolled
MATERIALIZED CTEs. The logistic sigmoid is replaced by the HARD sigmoid
``clamp((z + 2) / 4, 0, 1)`` (the standard integer-exact surrogate from
quantized training); the gradient ``(p - y) * x`` is unchanged.

Scale bounds (documented invariants, asserted in tests):
- features ``x_j`` are normalized into ``[0, X_SCALE=10^4]``;
- predictions/weights live at ``W_SCALE=10^6``; the residual
  ``|p - y*W_SCALE| <= 10^6``;
- a per-row gradient term ``|r * x_j| <= 10^10`` fits a long with
  8 orders of headroom; the corpus SUM is aggregated as decimal(38,0)
  (Spark) / HUGEINT (DuckDB), exact at any corpus size.

100 TB story: per iteration the corpus is scanned from the cached
integer feature table (4 longs + a bit per doc — ~40 bytes/doc, far
smaller than the text) with a map-side partial aggregate; the shuffle
carries one row per partition. T iterations = T cheap scans; weights
(d+1 ints) never leave the driver except as broadcast literals in the
final map-only scoring pass.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

X_SCALE = 10_000  # feature fixed-point scale (features in [0, X_SCALE])
W_SCALE = 1_000_000  # weight / prediction fixed-point scale


def _tdiv(a: int, b: int) -> int:
    """Integer division truncating toward zero (DuckDB ``//`` and Spark
    ``div`` semantics; python ``//`` floors, which differs on negatives)."""
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def _z_sql(feature_cols: Sequence[str], weights: Sequence[int]) -> str:
    """Fixed-point logit as a SQL fragment:
    z = tdiv(X_SCALE*w0 + sum x_j*w_j, X_SCALE) at W_SCALE.

    The bias carries an implicit constant feature x0 = X_SCALE. Weight
    literals are driver ints; the whole expression is JVM-side long
    arithmetic (bounded: |x*w| <= 1e4 * ~1e7, summed over d+1 terms).
    """
    if len(weights) != len(feature_cols) + 1:
        raise ValueError(
            f"_z_sql: got {len(weights)} weights for {len(feature_cols)} "
            f"features (+1 bias expected) — a silent zip-truncation here "
            f"would score with features dropped"
        )
    terms = [f"{int(X_SCALE)}L * {int(weights[0])}L"] + [
        f"{c} * {int(w)}L" for c, w in zip(feature_cols, weights[1:])
    ]
    return "((" + " + ".join(terms) + f") div {int(X_SCALE)}L)"


def hard_sigmoid_fp(z_sql: str) -> Column:
    """clamp(tdiv(z + 2*W_SCALE, 4), 0, W_SCALE) — p at W_SCALE.

    ``z + 2*W_SCALE`` keeps truncate-vs-floor irrelevant at the clamp
    boundaries: any negative quotient clamps to 0 under either rule.
    """
    return F.expr(
        f"greatest(0L, least({int(W_SCALE)}L, "
        f"({z_sql} + {2 * W_SCALE}L) div 4L))"
    )


def fit_hard_sigmoid_gd(
    features: DataFrame,
    feature_cols: Sequence[str],
    label_col: str,
    *,
    n_iter: int = 8,
    lr_num: int = 5,
    lr_den: int = 10,
) -> list[int]:
    """Train d+1 fixed-point weights (bias first) by full-batch GD.

    ``features`` must already hold integer fixed-point features in
    ``[0, X_SCALE]`` and an int 0/1 ``label_col`` — build them with
    :func:`normalized_features`. ``label_col`` must be NON-NULL on every
    row (a NULL label would drop its row from the gradient sums while
    still counting in N — coalesce labels upstream, as the gate's
    CASE/otherwise construction does). The caller should persist
    ``features`` (this runs ``n_iter + 1`` aggregates over it).

    Update (all exact ints):
        r_i  = p_i - y_i * W_SCALE
        G_j  = sum_i r_i * x_ij        (x_i0 = X_SCALE)
        w_j -= tdiv(lr_num * G_j, lr_den * N * X_SCALE)
    """
    d = len(feature_cols)
    w = [0] * (d + 1)
    n_rows: int | None = None
    for _ in range(n_iter):
        z = _z_sql(feature_cols, w)
        r = (hard_sigmoid_fp(z) - F.col(label_col).cast("long") * F.lit(int(W_SCALE))).alias("__r")
        grads = [
            F.sum((F.col("__r") * F.lit(int(X_SCALE))).cast("decimal(38,0)")).alias("__g0")
        ] + [
            F.sum((F.col("__r") * F.col(c)).cast("decimal(38,0)")).alias(f"__g{j + 1}")
            for j, c in enumerate(feature_cols)
        ]
        aggs = grads + ([F.count(F.lit(1)).alias("__n")] if n_rows is None else [])
        row = features.select(r, *[F.col(c) for c in feature_cols]).agg(*aggs).collect()[0]
        if n_rows is None:
            n_rows = int(row["__n"])
        if n_rows == 0:
            raise ValueError("fit_hard_sigmoid_gd: empty feature table")
        w = [
            w[j] - _tdiv(lr_num * int(row[f"__g{j}"]), lr_den * n_rows * X_SCALE)
            for j in range(d + 1)
        ]
    return w


def score_hard_sigmoid(
    feature_cols: Sequence[str],
    weights: Sequence[int],
) -> Column:
    """Map-only fixed-point prediction p at W_SCALE (exact integer)."""
    return hard_sigmoid_fp(_z_sql(feature_cols, weights))


def normalized_features(
    raw: DataFrame,
    raw_cols: Sequence[str],
    *,
    out_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Normalize non-negative integer raw features into [0, X_SCALE] by
    the corpus max: x = tdiv(raw * X_SCALE, max(raw)). One aggregate,
    broadcast back (all other columns pass through). Zero-max columns
    normalize to all-zero (GREATEST(max, 1) guard)."""
    out_cols = list(out_cols or raw_cols)
    mx = raw.agg(
        *[
            F.greatest(F.max(F.coalesce(F.col(c), F.lit(0))), F.lit(1)).alias(f"__mx_{c}")
            for c in raw_cols
        ]
    )
    passthrough = [c for c in raw.columns if c not in raw_cols]
    proj = [F.col(c) for c in passthrough] + [
        F.expr(f"(coalesce({c}, 0L) * {int(X_SCALE)}L) div __mx_{c}").alias(o)
        for c, o in zip(raw_cols, out_cols)
    ]
    return raw.join(F.broadcast(mx)).select(*proj)
