"""Scalable edit-distance self-join: all string pairs within
Levenshtein distance k, via positional q-gram filtering
(Gravano et al., VLDB 2001) + exact verify.

`fuzzy_source_match` (plans/relational.py) does the quadratic
levenshtein join on a DISTINCT-value table — right when the value
domain is small. This operator is the corpus-scale path: entity names,
near-identical titles, OCR'd strings, where the naive join is N².

Scale notes
-----------
1. **q-gram inverted index, never all-pairs**: each string explodes
   into its L−q+1 positional q-grams; candidates come from an
   equi-join on (gram, position bucket). An edit operation destroys at
   most q q-grams, so two strings with ed ≤ k share at least
   max(L1,L2) − q + 1 − k·q positional q-grams aligned within k — the
   COUNT FILTER. Pairs below the threshold never reach the verifier.
2. **Position bucketing bounds hot grams**: the join key is
   (gram, ⌊pos/(k+1)⌋); the probe side fans out to the ≤2 buckets its
   ±k window can touch (the events_range_join bucket-explode move), so
   a gram repeated at every position of every string still meets a
   bounded per-key population instead of an all-positions cross.
3. **Exact verify**: surviving candidates run JVM-codegen
   ``levenshtein(s1, s2) ≤ k`` — overcounting from repeated grams can
   only ADD candidates, never lose one, so the result is exact.
4. **Short strings** (len < q·(k+1), where the count bound is
   vacuous and two strings can be within k while sharing NO q-gram)
   pair among themselves in a separate broadcast cross of the short
   pool — bounded by construction (there are only |Σ|^(q(k+1)) short
   strings of a finite alphabet, and the length filter keeps
   long×short pairs impossible for k < q).

The length filter ||s1|−|s2|| ≤ k applies everywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _grams(s: Column, q: int) -> Column:
    """Array of (pos, gram) structs for all positional q-grams."""
    return F.transform(
        F.sequence(F.lit(0), F.length(s) - q),
        lambda i: F.struct(
            i.alias("pos"), F.substring(s, i + 1, q).alias("gram")
        ),
    )


def edit_distance_join(
    df: DataFrame,
    id_col: str,
    str_col: str,
    *,
    k: int = 1,
    q: int = 2,
) -> DataFrame:
    """All pairs (id1 < id2) with ``levenshtein(s1, s2) <= k``.
    Output: ``id1, id2, s1, s2, dist``. Null/empty-vs-long handling
    follows levenshtein itself; strings shorter than q·(k+1) take the
    short-pool path."""
    if k < 1:
        raise ValueError("k must be >= 1")
    base = df.select(
        F.col(id_col).alias("id"), F.col(str_col).alias("s")
    ).filter(F.col("s").isNotNull())
    base = base.withColumn("l", F.length("s"))
    lmin = q * (k + 1)
    long_s = base.filter(F.col("l") >= lmin)
    short_s = base.filter(F.col("l") < lmin)

    w = k + 1  # bucket width
    gr = long_s.select(
        "id", "s", "l", F.explode(_grams(F.col("s"), q)).alias("g")
    ).select("id", "s", "l", F.col("g.pos").alias("pos"), F.col("g.gram").alias("gram"))
    # index side: its own bucket; probe side: every bucket its ±k
    # window can touch (≤2 for width k+1)
    idx = gr.select(
        F.col("id").alias("id2"),
        F.col("s").alias("s2"),
        F.col("l").alias("l2"),
        F.col("pos").alias("pos2"),
        "gram",
        F.floor(F.col("pos") / w).alias("b"),
    )
    probe = gr.select(
        F.col("id").alias("id1"),
        F.col("s").alias("s1"),
        F.col("l").alias("l1"),
        F.col("pos").alias("pos1"),
        "gram",
        F.explode(
            F.sequence(
                F.floor((F.col("pos") - k) / w), F.floor((F.col("pos") + k) / w)
            )
        ).alias("b"),
    )
    cand = (
        probe.join(idx, ["gram", "b"])
        .filter(
            (F.col("id1") < F.col("id2"))
            & (F.abs(F.col("pos1") - F.col("pos2")) <= k)
            & (F.abs(F.col("l1") - F.col("l2")) <= k)
        )
        .groupBy("id1", "id2", "s1", "s2", "l1", "l2")
        .agg(F.count(F.lit(1)).alias("__shared"))
        .filter(
            F.col("__shared")
            >= F.greatest("l1", "l2") - F.lit(q - 1) - F.lit(k * q)
        )
        .select("id1", "id2", "s1", "s2")
    )
    # short pool: count bound vacuous there; broadcast cross within the
    # pool (long×short impossible past the length filter when k < lmin
    # gap, enforced explicitly for safety)
    sh1 = short_s.select(
        F.col("id").alias("id1"), F.col("s").alias("s1"), F.col("l").alias("l1")
    )
    sh2 = short_s.select(
        F.col("id").alias("id2"), F.col("s").alias("s2"), F.col("l").alias("l2")
    )
    short_cand = (
        sh1.join(F.broadcast(sh2), F.col("id1") < F.col("id2"))
        .filter(F.abs(F.col("l1") - F.col("l2")) <= k)
        .select("id1", "id2", "s1", "s2")
    )
    # boundary pairs: one side just under lmin, the other at/above —
    # the long side's gram table can't be trusted to share grams with
    # the short side, so pair the short pool against the boundary band
    # of the long pool too (lengths ≤ lmin−1+k)
    band = long_s.filter(F.col("l") <= lmin - 1 + k).select(
        F.col("id").alias("id2"), F.col("s").alias("s2"), F.col("l").alias("l2")
    )
    boundary = (
        sh1.join(F.broadcast(band), F.abs(F.col("l1") - F.col("l2")) <= k)
        .filter(F.col("id1") != F.col("id2"))
        .select(
            F.least("id1", "id2").alias("id1"),
            F.greatest("id1", "id2").alias("id2"),
            F.when(F.col("id1") < F.col("id2"), F.col("s1"))
            .otherwise(F.col("s2"))
            .alias("s1"),
            F.when(F.col("id1") < F.col("id2"), F.col("s2"))
            .otherwise(F.col("s1"))
            .alias("s2"),
        )
    )
    all_cand = cand.unionByName(short_cand).unionByName(boundary).distinct()
    return all_cand.withColumn(
        "dist", F.levenshtein("s1", "s2").cast("int")
    ).filter(F.col("dist") <= k)
