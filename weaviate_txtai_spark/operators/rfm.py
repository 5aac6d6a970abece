"""RFM (recency / frequency / monetary) customer segmentation.

The classic behavioral segmentation (Hughes 1994): score every
customer 1..k on how recently, how often, and how much they purchased,
then treat the (R,F,M) triple as the segment key — the workhorse
labeling for lifecycle campaigns and for stratifying event corpora
before sampling.

Scores use EXACT equi-depth buckets (``sampling.exact_ntile``) over
the purchaser domain — one row per customer after the groupBy, so the
global-order window is domain-bounded (the customer_value_deciles
precedent; ``quantile_buckets`` is the documented sketch twin at
corpus scale). Every ntile ordering carries the customer id as the
final tie-break so bucket assignment is deterministic and replayable.

Recency is integer epoch-microseconds from the corpus max (timestamp
arithmetic differs in precision across engines — NOTES r2 lesson);
frequency is a count; monetary a float sum ordered raw (IEEE doubles
sort identically everywhere).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def rfm_segments(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    n_buckets: int = 5,
    warn_rows: "int | None" = 10_000_000,
) -> DataFrame:
    """Per-user RFM scores and segment key.

    Output: ``user_col, recency_us, frequency, monetary, r_score,
    f_score, m_score, segment`` — scores are 1..n_buckets with
    n_buckets = best (most recent / most frequent / highest spend),
    segment the "RFM" digit string. Rows with NULL ts/value are
    excluded.
    """
    from weaviate_txtai_spark.functions.sampling import exact_ntile

    if n_buckets < 2:
        raise ValueError("rfm_segments: n_buckets must be >= 2")
    base = events.filter(
        F.col(ts_col).isNotNull()
        & F.col(value_col).isNotNull()
        # a NULL user would lump every unkeyed event into one
        # pseudo-customer with corpus-level frequency/monetary
        & F.col(user_col).isNotNull()
    ).select(
        F.col(user_col).alias("user"),
        F.unix_micros(F.col(ts_col)).alias("__us"),
        F.col(value_col).cast("double").alias("__v"),
    )
    per_user = base.groupBy("user").agg(
        F.max("__us").alias("__last"),
        F.count(F.lit(1)).cast("long").alias("frequency"),
        F.sum("__v").alias("monetary"),
    )
    corpus_max = per_user.agg(F.max("__last").alias("__cmax"))
    u = per_user.join(F.broadcast(corpus_max)).select(
        "user",
        (F.col("__cmax") - F.col("__last")).alias("recency_us"),
        "frequency",
        "monetary",
    )
    # n_buckets = best: recency ascending (small = recent), freq/monetary
    # descending; user id tie-break everywhere for determinism
    u = exact_ntile(
        u, n_buckets, F.desc("recency_us"), F.asc("user"),
        bucket_col="r_score", warn_rows=warn_rows,
    )
    u = exact_ntile(
        u, n_buckets, F.asc("frequency"), F.asc("user"),
        bucket_col="f_score", warn_rows=None,
    )
    u = exact_ntile(
        u, n_buckets, F.asc("monetary"), F.asc("user"),
        bucket_col="m_score", warn_rows=None,
    )
    return u.select(
        F.col("user").alias(user_col),
        "recency_us",
        "frequency",
        F.round("monetary", 6).alias("monetary"),
        "r_score",
        "f_score",
        "m_score",
        F.concat(
            F.col("r_score").cast("string"),
            F.col("f_score").cast("string"),
            F.col("m_score").cast("string"),
        ).alias("segment"),
    )
