"""Diverse coreset selection: greedy k-center (Gonzalez 1985,
farthest-point traversal) over an embedding column — "pick k documents
that COVER the embedding space", the diversity-first data-selection
move (active learning seeds, eval-set curation, `semantic_dedup`'s
complement: instead of dropping redundancy, pick the spread).

2-approximation guarantee: greedy's covering radius is at most twice
the optimal k-center radius — the strongest thing any polynomial
algorithm can promise (the problem is NP-hard to beat 2).

Scale notes: k driver-side iterations, each ONE distributed job — the
selected set (≤ k vectors) rides in the closure as column literals,
every row computes its distance to the NEWEST center (a codegen
expression), the running min-to-selected folds via ``least``, and the
next center is a TakeOrdered(1) argmax. Nothing corpus-sized ever
collects; driver state is k vectors. Ties break (rounded distance
DESC, id ASC) so the traversal is engine-reproducible — rounding
BEFORE the argmax is what lets an oracle replay the same walk.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from weaviate_txtai_spark.functions.vector import cosine_sim


def kcenter_coreset(
    df: DataFrame,
    k: int,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed_id=None,
    round_decimals: int = 6,
) -> DataFrame:
    """Greedy k-center selection. ``seed_id`` anchors the walk (default:
    minimum id — deterministic). Output: one row per selected point in
    selection order — ``rank (1-based), id, min_dist`` where min_dist
    is the point's cosine distance to the set selected BEFORE it
    (0.0 for the seed); min_dist is non-increasing and the last value
    bounds the covering radius within 2× of optimal."""
    if k < 1:
        raise ValueError("k must be >= 1")
    base = df.select(
        F.col(id_col).alias("__id"), F.col(vec_col).alias("__v")
    ).filter(F.col("__v").isNotNull())
    if seed_id is None:
        seed_id = base.agg(F.min("__id")).collect()[0][0]
    seed_row = base.filter(F.col("__id") == seed_id).limit(1).collect()
    if not seed_row:
        raise ValueError(f"seed id {seed_id!r} not found")
    selected = [(1, seed_row[0]["__id"], 0.0)]
    sel_vec = [list(seed_row[0]["__v"])]

    cur = base.withColumn(
        "__dmin",
        F.round(
            1 - cosine_sim(
                "__v", F.lit(sel_vec[0]).cast("array<float>")
            ),
            round_decimals,
        ),
    )
    for rank in range(2, k + 1):
        pick = (
            cur.filter(~F.col("__id").isin([s[1] for s in selected]))
            .orderBy(F.desc("__dmin"), F.asc("__id"))
            .limit(1)
            .collect()
        )
        if not pick:
            break
        selected.append((rank, pick[0]["__id"], float(pick[0]["__dmin"])))
        # the limit(1) row already carries __v — re-fetching it with a
        # base.filter(...).collect() launched one avoidable full-scan
        # job per iteration (k-1 extra jobs at k picks)
        new_vec = pick[0]["__v"]
        cur = cur.withColumn(
            "__dmin",
            F.least(
                F.col("__dmin"),
                F.round(
                    1 - cosine_sim(
                        "__v", F.lit(list(new_vec)).cast("array<float>")
                    ),
                    round_decimals,
                ),
            ),
        )
        # each round nests another F.least over __dmin; truncate the
        # O(k) expression lineage periodically so analysis time stays
        # flat at large k (same checkpoint discipline as graph/rankstats)
        if rank % 16 == 0:
            cur = cur.localCheckpoint(eager=False)
    spark = df.sparkSession
    # the id keeps its INPUT dtype (string doc ids are legitimate):
    # a hardcoded LONG crashed createDataFrame for non-integer ids
    id_type = dict(df.dtypes)[id_col]
    return spark.createDataFrame(
        selected, f"rank INT, {id_col} {id_type}, min_dist DOUBLE"
    )
