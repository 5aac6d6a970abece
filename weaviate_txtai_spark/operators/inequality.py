"""Concentration / inequality measures: per-group Gini coefficient.

Corpus governance needs concentration answers — how concentrated is
revenue across customers, token mass across sources, duplicate mass
across clusters. The Gini coefficient (0 = perfectly even, →1 = one
unit owns everything) is the standard scalar for it.

Formula (tie-averaged rank form, the midpoint-corrected standard):

    G = (2·Σ r_i·x_i − (n+1)·Σ x_i) / (n·Σ x_i)

with r_i the ascending tie-AVERAGED rank of x_i within its group.

Scale notes
-----------
Sorting per group is never materialized per ROW: ranks come from the
per-(group, value) count table — one map-side-combined groupBy — with
an exclusive prefix sum via a window PARTITIONED BY GROUP over the
count rows (distinct values per group, not rows; a group's window
partition is its value domain). Σ r·x folds the c copies of each value
into c·r̄·v algebraically, so the whole statistic is two shuffles and
one aggregate. Values must be non-negative for the Gini to be
meaningful (negative totals flip the sign); nulls are dropped.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def gini(
    df: DataFrame,
    value_col: str,
    *,
    group_col: "str | None" = None,
    round_decimals: int = 6,
) -> DataFrame:
    """Gini coefficient of ``value_col``, per ``group_col`` group (or
    one global row when ``group_col`` is None). Output: (group,)
    ``n, total, gini``; gini is NULL for groups with zero total."""
    g = F.lit("__all").alias("__g") if group_col is None else F.col(
        group_col
    ).alias("__g")
    base = df.select(g, F.col(value_col).alias("__v")).filter(
        F.col("__v").isNotNull()
    )
    counts = base.groupBy("__g", "__v").agg(
        F.count(F.lit(1)).cast("double").alias("__c")
    )
    w = (
        Window.partitionBy("__g")
        .orderBy("__v")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ranked = counts.withColumn(
        "__r",
        F.coalesce(F.sum("__c").over(w), F.lit(0.0))
        + (F.col("__c") + 1) / 2.0,
    )
    agg = ranked.groupBy("__g").agg(
        F.sum("__c").cast("long").alias("n"),
        F.sum(F.col("__c") * F.col("__v")).alias("__sx"),
        F.sum(F.col("__c") * F.col("__r") * F.col("__v")).alias("__srx"),
    )
    gini_c = F.when(
        F.col("__sx") != 0,
        (2 * F.col("__srx") - (F.col("n") + 1) * F.col("__sx"))
        / (F.col("n") * F.col("__sx")),
    )
    out = agg.select(
        "__g",
        "n",
        F.round("__sx", round_decimals).alias("total"),
        F.round(gini_c, round_decimals).alias("gini"),
    )
    if group_col is None:
        return out.drop("__g")
    return out.withColumnRenamed("__g", group_col)
