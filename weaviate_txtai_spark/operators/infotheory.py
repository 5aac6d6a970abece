"""Information-theoretic dependence between two categorical columns:
entropies, mutual information, χ² independence, Cramér's V.

The feature-triage questions a pipeline asks before trusting a
stratification or suspecting a leak — "does source predict language?",
"is event type independent of hour?" — are all functions of one
contingency table. One operator computes the table once and derives
every statistic from it.

Scale notes: ONE corpus-sized shuffle (groupBy(x, y) count); marginals
and totals are aggregates OVER THE JOINT TABLE (|X|·|Y| rows — the
category-domain size, not the corpus), joined back by x / y keys. All
logs base 2; conventions: 0·log 0 = 0. NULL categories participate as
their own level only if the caller keeps them — rows with a NULL in
either column are dropped here (document the cast upstream).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_LN2 = math.log(2.0)


def categorical_dependence(
    df: DataFrame,
    col_x: str,
    col_y: str,
    *,
    round_decimals: int = 6,
) -> DataFrame:
    """One row: ``n, h_x, h_y, h_xy, mi, nmi, chi2, dof, cramers_v``.

    - h_* are Shannon entropies (bits); mi = h_x + h_y − h_xy ≥ 0;
      nmi = mi / sqrt(h_x·h_y) (NULL when either marginal entropy is
      0 — a constant column carries no information to normalize by);
    - chi2 = Σ (o − e)²/e with e = row·col/n; dof = (|X|−1)(|Y|−1);
      cramers_v = sqrt(chi2 / (n·min(|X|−1, |Y|−1))), NULL for
      1-level columns.
    """
    base = df.filter(
        F.col(col_x).isNotNull() & F.col(col_y).isNotNull()
    ).select(F.col(col_x).alias("__x"), F.col(col_y).alias("__y"))
    joint = base.groupBy("__x", "__y").agg(
        F.count(F.lit(1)).cast("double").alias("__c")
    )
    from weaviate_txtai_spark.cache import scoped_persist

    joint = scoped_persist(joint, eager=True)  # r14: fill before fan-out
    rx = joint.groupBy("__x").agg(F.sum("__c").alias("__cx"))
    ry = joint.groupBy("__y").agg(F.sum("__c").alias("__cy"))
    tot = joint.agg(
        F.sum("__c").alias("__n"),
        F.count(F.lit(1)).cast("double").alias("__cells"),
        F.count_distinct("__x").cast("double").alias("__kx"),
        F.count_distinct("__y").cast("double").alias("__ky"),
    )
    dec = (
        joint.join(rx, "__x")
        .join(ry, "__y")
        .join(F.broadcast(tot))
    )
    p = F.col("__c") / F.col("__n")
    px = F.col("__cx") / F.col("__n")
    py = F.col("__cy") / F.col("__n")
    e = F.col("__cx") * F.col("__cy") / F.col("__n")
    stats = dec.agg(
        F.max("__n").alias("__n"),
        F.max("__kx").alias("__kx"),
        F.max("__ky").alias("__ky"),
        (-F.sum(p * F.log(p)) / _LN2).alias("__hxy"),
        # marginal entropies from the joint rows: each (x,y) cell
        # contributes p·(−log px) — sums to Σ px·(−log px)
        (-F.sum(p * F.log(px)) / _LN2).alias("__hx"),
        (-F.sum(p * F.log(py)) / _LN2).alias("__hy"),
        F.sum(
            (F.col("__c") - e) * (F.col("__c") - e) / e
        ).alias("__chi2_obs"),
        # absent cells (o = 0) still contribute e to χ²: Σ_cells e over
        # MISSING cells = n − Σ_present e
        F.sum(e).alias("__e_present"),
    )
    mi = F.col("__hx") + F.col("__hy") - F.col("__hxy")
    chi2 = F.col("__chi2_obs") + (F.col("__n") - F.col("__e_present"))
    dof = (F.col("__kx") - 1) * (F.col("__ky") - 1)
    return stats.select(
        F.col("__n").cast("long").alias("n"),
        F.round("__hx", round_decimals).alias("h_x"),
        F.round("__hy", round_decimals).alias("h_y"),
        F.round("__hxy", round_decimals).alias("h_xy"),
        F.round(mi, round_decimals).alias("mi"),
        F.round(
            F.try_divide(mi, F.sqrt(F.col("__hx") * F.col("__hy"))),
            round_decimals,
        ).alias("nmi"),
        F.round(chi2, round_decimals).alias("chi2"),
        dof.cast("long").alias("dof"),
        F.round(
            F.sqrt(
                F.try_divide(
                    chi2,
                    F.col("__n")
                    * F.least(F.col("__kx") - 1, F.col("__ky") - 1),
                )
            ),
            round_decimals,
        ).alias("cramers_v"),
    )


def llr_keyterms(
    fg: DataFrame,
    bg: DataFrame,
    term_col: str,
    count_col: str,
    *,
    top_k: int = 20,
    round_decimals: int = 6,
) -> DataFrame:
    """Dunning log-likelihood-ratio keyness (Dunning 1993, public
    knowledge): which terms are OVER-represented in a foreground corpus
    vs a background — the domain-salience test behind "what makes this
    source/cluster different", robust where raw frequency ratios
    explode on rare terms.

    Per term the 2×2 contingency (term-in-fg, term-in-bg, rest-fg,
    rest-bg) scores G² = 2·Σ k·ln(k/E) (0·ln0 = 0). Only
    over-represented terms (fg rate > bg rate) are returned, top_k by
    G² (ties: term ASC).

    Scale: one full-outer join of the two term-count tables
    (term-domain-sized), scalar totals broadcast, a TakeOrdered top_k —
    the rank is never a window over the corpus.

    Output: ``term, fg_count, bg_count, g2`` (top_k rows)."""
    f = fg.select(
        F.col(term_col).alias("term"),
        F.col(count_col).cast("double").alias("__a"),
    )
    b = bg.select(
        F.col(term_col).alias("term"),
        F.col(count_col).cast("double").alias("__b"),
    )
    m = (
        f.join(b, "term", "full_outer")
        .select(
            "term",
            F.coalesce("__a", F.lit(0.0)).alias("__a"),
            F.coalesce("__b", F.lit(0.0)).alias("__b"),
        )
    )
    tot = m.agg(
        F.sum("__a").alias("__ta"), F.sum("__b").alias("__tb")
    )

    def xlnx_ratio(k, e):
        # k·ln(k/E) with the 0·ln0 = 0 convention
        return F.when(k > 0, k * F.log(k / e)).otherwise(F.lit(0.0))

    with_tot = m.join(F.broadcast(tot))
    a, bb = F.col("__a"), F.col("__b")
    c, d = F.col("__ta") - a, F.col("__tb") - bb
    n = F.col("__ta") + F.col("__tb")
    row1, row2 = a + bb, c + d
    e_a = row1 * F.col("__ta") / n
    e_b = row1 * F.col("__tb") / n
    e_c = row2 * F.col("__ta") / n
    e_d = row2 * F.col("__tb") / n
    g2 = 2 * (
        xlnx_ratio(a, e_a)
        + xlnx_ratio(bb, e_b)
        + xlnx_ratio(c, e_c)
        + xlnx_ratio(d, e_d)
    )
    over = a / F.col("__ta") > bb / F.col("__tb")
    return (
        with_tot.filter(over)
        .select(
            "term",
            a.cast("long").alias("fg_count"),
            bb.cast("long").alias("bg_count"),
            F.round(g2, round_decimals).alias("g2"),
        )
        .orderBy(F.desc("g2"), F.asc("term"))
        .limit(top_k)
    )
