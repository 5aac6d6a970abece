"""Leakage-safe categorical feature encoding: out-of-fold target
encoding with additive smoothing.

Why an LLM-data engine carries it: replacing a high-cardinality
categorical (source domain, crawl host, doc license bucket) with the
mean of a downstream target (quality label, conversion, keep-rate) is
the strongest single-feature transform in tabular practice — and the
most leakage-prone: encoding a row with a mean that includes the row's
OWN target leaks the label into the feature. The standard fix is
K-fold out-of-fold (OOF) encoding: each row's category mean is computed
from every fold EXCEPT its own.

Scale notes: the encoding never touches row pairs. One
(category, fold) aggregate (map-side combined), per-(category) totals
via a window over the FOLD DOMAIN (≤ n_folds rows per category — a
value-domain window, never a row window), and one join back keyed on
(category, fold) — the mapping side is category-domain-sized, so AQE
broadcasts it when small and hash-joins otherwise. The OOF identity
avoids any per-fold re-aggregation:

    oof_mean(c, f) = (sum(c) − sum(c, f)) / (cnt(c) − cnt(c, f))

Smoothing (Micci-Barreca 2001, public knowledge): the encoding shrinks
toward the GLOBAL out-of-fold mean by pseudo-count ``smoothing`` so
rare categories don't memorize their few labels:

    enc = (oof_sum + smoothing · oof_global_mean) / (oof_cnt + smoothing)

Determinism: fold assignment is a hash of ``id_col`` (stable across
partitionings); outputs round to ``round_decimals``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _fold_expr(id_col: str | None, fold_col: str | None, n_folds: int):
    if (id_col is None) == (fold_col is None):
        raise ValueError("pass exactly one of id_col / fold_col")
    if fold_col is not None:
        return F.col(fold_col).cast("int")
    return F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_folds)).cast("int")


def target_encoding_map(
    df: DataFrame,
    cat_col: str,
    target_col: str,
    *,
    id_col: str | None = None,
    fold_col: str | None = None,
    n_folds: int = 5,
    smoothing: float = 20.0,
    round_decimals: int = 6,
) -> DataFrame:
    """The (category, fold) → encoding mapping table.

    Fold assignment: ``xxhash64(id_col) mod n_folds`` (stable across
    partitionings), or an explicit precomputed ``fold_col`` — exactly
    one of the two.

    Output: ``cat_col, fold, n_oof, enc`` — one row per (category,
    fold) present in ``df``; ``n_oof`` is the out-of-fold row count
    backing the mean (0 for a category seen in only one fold — the
    encoding falls back to the global OOF mean by the smoothing
    identity). Rows with a NULL category or target are excluded.
    """
    if n_folds < 2:
        raise ValueError("n_folds must be >= 2")
    base = df.filter(
        F.col(cat_col).isNotNull() & F.col(target_col).isNotNull()
    ).select(
        cat_col,
        F.col(target_col).cast("double").alias("__y"),
        _fold_expr(id_col, fold_col, n_folds).alias("fold"),
    )
    cf = base.groupBy(cat_col, "fold").agg(
        F.count(F.lit(1)).alias("__n"), F.sum("__y").alias("__s")
    )
    wcat = Window.partitionBy(cat_col)
    # global totals: one scalar row, broadcast by construction
    tot = cf.agg(
        F.sum("__n").alias("__tn"), F.sum("__s").alias("__ts")
    )
    # per-fold global OOF mean: (T_s − s_f) / (T_n − n_f) over the fold
    # domain (≤ n_folds rows)
    fold_tot = cf.groupBy("fold").agg(
        F.sum("__n").alias("__fn"), F.sum("__s").alias("__fs")
    )
    # try_divide: a fold holding EVERY row has no out-of-fold data —
    # fall back to the overall mean (degenerate input, defined output)
    gmean = fold_tot.join(F.broadcast(tot)).select(
        "fold",
        F.coalesce(
            F.try_divide(
                F.col("__ts") - F.col("__fs"), F.col("__tn") - F.col("__fn")
            ),
            F.col("__ts") / F.col("__tn"),
        ).alias("__gm"),
    )
    oof = cf.select(
        cat_col,
        "fold",
        (F.sum("__n").over(wcat) - F.col("__n")).alias("__on"),
        (F.sum("__s").over(wcat) - F.col("__s")).alias("__os"),
    )
    return (
        oof.join(F.broadcast(gmean), "fold")
        .select(
            cat_col,
            "fold",
            F.col("__on").cast("long").alias("n_oof"),
            # try_divide: with smoothing=0 a single-fold category has
            # n_oof=0 and the ratio is 0/0 — undefined, so fall back to
            # the global OOF mean (what any smoothing>0 converges to)
            F.round(
                F.coalesce(
                    F.try_divide(
                        F.col("__os")
                        + F.lit(float(smoothing)) * F.col("__gm"),
                        F.col("__on") + F.lit(float(smoothing)),
                    ),
                    F.col("__gm"),
                ),
                round_decimals,
            ).alias("enc"),
        )
    )


def target_encode(
    df: DataFrame,
    cat_col: str,
    target_col: str,
    *,
    id_col: str | None = None,
    fold_col: str | None = None,
    n_folds: int = 5,
    smoothing: float = 20.0,
    out_col: str = "te",
    round_decimals: int = 6,
) -> DataFrame:
    """``df`` with the out-of-fold target encoding appended as
    ``out_col``. NULL-category rows get NULL (no mapping key). NULL-
    TARGET rows are excluded from FITTING the mapping but are still
    encoded from their (category, fold) like any inference row — the
    standard train/score asymmetry of OOF target encoding. One join
    against the (category, fold) mapping — the corpus shuffles at most
    once. Exactly ONE column (``out_col``) is appended: the internal
    fold key is join-scoped and dropped (a bare ``fold`` name here
    leaked into the output and silently overwrote any pre-existing
    ``fold`` column of ``df``)."""
    if out_col in df.columns:
        raise ValueError(
            f"target_encode: out_col {out_col!r} already exists in df"
        )
    mapping = (
        target_encoding_map(
            df,
            cat_col,
            target_col,
            id_col=id_col,
            fold_col=fold_col,
            n_folds=n_folds,
            smoothing=smoothing,
            round_decimals=round_decimals,
        )
        .select(cat_col, "fold", "enc")
        .withColumnRenamed("fold", "__te_fold")
        .withColumnRenamed("enc", out_col)
    )
    keyed = df.withColumn(
        "__te_fold", _fold_expr(id_col, fold_col, n_folds)
    )
    return keyed.join(mapping, [cat_col, "__te_fold"], "left").drop(
        "__te_fold"
    )
