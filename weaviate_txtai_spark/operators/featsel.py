"""Chi-square term selection per class (feature selection).

The standard supervised term-selection statistic (Manning, Raghavan &
Schütze, IIR §13.5): for each (class c, term t) build the 2×2
document-presence contingency table

    N11 = docs in c containing t        N10 = docs not-in-c containing t
    N01 = docs in c without t           N00 = docs not-in-c without t

and score χ²(t, c) = N·(N11·N00 − N10·N01)² /
(n_c · (N − n_c) · df_t · (N − df_t)) — the four marginals factor the
denominator, so only three count tables are needed. Pipelines use the
top-χ² terms per class as cheap routing vocabularies / domain lexica.

Only POSITIVELY associated terms are kept (N11·N00 > N10·N01): the
negative tail ranks terms *absent* from the class, which is not what a
per-class lexicon wants. Terms present in every document (df_t = N)
carry no signal and are excluded (they would also zero the
denominator).

Scale shape: per-doc DISTINCT terms explode once; (class, term) doc
frequencies and per-term document frequencies are two partial-agg
shuffles; class sizes and the corpus total ride broadcast joins. The
top-k cut is a window PARTITIONED by class (bounded by the class
domain). Products use doubles — exact for any corpus below 2^53 docs,
and the statistic is a float anyway.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from weaviate_txtai_spark.functions.text import tokens


def chi2_terms(
    docs: DataFrame,
    *,
    class_col: str = "source",
    text_col: str = "text",
    top_k: int = 10,
    round_decimals: int = 4,
) -> DataFrame:
    """Top-``top_k`` positively χ²-associated terms per class.

    Output: ``class, term, chi2, n11`` ordered by (class, χ² desc,
    term asc); ties broken by term for cross-engine determinism.
    """
    if top_k < 1:
        raise ValueError("chi2_terms: top_k must be >= 1")
    # unlabeled docs carry no class evidence: a NULL label would form
    # its own pseudo-class AND shift every other class's N/n00 cells
    docs = docs.filter(F.col(class_col).isNotNull())
    present = docs.select(
        F.col(class_col).alias("class"),
        F.explode(F.array_distinct(tokens(text_col))).alias("term"),
    )
    n11 = present.groupBy("class", "term").agg(
        F.count(F.lit(1)).cast("double").alias("n11")
    )
    df_t = n11.groupBy("term").agg(F.sum("n11").alias("df_t"))
    n_c = docs.groupBy(F.col(class_col).alias("class")).agg(
        F.count(F.lit(1)).cast("double").alias("n_c")
    )
    total = docs.agg(F.count(F.lit(1)).cast("double").alias("n_total"))

    t = (
        n11.join(df_t, "term")
        .join(F.broadcast(n_c), "class")
        .join(F.broadcast(total))
    )
    big_n = F.col("n_total")
    n10 = F.col("df_t") - F.col("n11")
    n01 = F.col("n_c") - F.col("n11")
    n00 = big_n - F.col("n_c") - F.col("df_t") + F.col("n11")
    det = F.col("n11") * n00 - n10 * n01
    chi2 = (
        big_n
        * det
        * det
        / (
            F.col("n_c")
            * (big_n - F.col("n_c"))
            * F.col("df_t")
            * (big_n - F.col("df_t"))
        )
    )
    scored = t.filter(
        (F.col("df_t") < big_n) & (det > 0)
    ).select(
        "class",
        "term",
        F.round(chi2, round_decimals).alias("chi2"),
        F.col("n11").cast("long").alias("n11"),
    )
    w = Window.partitionBy("class").orderBy(F.desc("chi2"), F.asc("term"))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= top_k)
        .drop("__rn")
        .orderBy("class", F.desc("chi2"), "term")
    )
