"""Exact set-similarity self-join with PREFIX FILTERING (PPJoin family
— Xiao, Wang, Lin & Yu, "Efficient Similarity Joins for Near Duplicate
Detection", WWW 2008; public knowledge).

The third exact strategy in the dedup stack, and the one whose index
SHRINKS with the threshold:

- ``dedup.jaccard_pairs``     — inverted index over ALL set items;
  every shared item generates a candidate row.
- ``dedup.minhash_lsh_pairs`` — probabilistic banding; tunable but has
  a nonzero false-negative rate.
- this module                 — inverted index over only each set's
  PREFIX: order the universe rarest-item-first; a set of size n can
  reach Jaccard ≥ θ with some other set only if the two share at least
  one of each other's first p = n − ⌈θ·n⌉ + 1 items (pigeonhole: two
  sets disjoint on both prefixes overlap in < the required union
  fraction). So only p items per set enter the join — at θ = 0.8
  that's ~20% of the index volume and, because prefixes hold the
  RAREST items, the candidate join hits the frequent-item hot keys
  (the O(df²) stopword blowup, SCALING.md) far less often. No false
  negatives: candidates are a provable superset of true pairs, then
  verified exactly.

Scale shape: one explode (distinct items), one frequency aggregate, a
per-set window to order items (partitioned by set id — bounded by set
size), the prefix self-equi-join (the pruned quadratic step), and an
exact verify on the candidate pairs only via sorted-array
intersection (JVM ``array_intersect``, no Python). Size-band pruning
(θ·max ≤ min) applies before the pair aggregate exactly as in
``jaccard_pairs``.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from weaviate_txtai_spark.cache import scoped_persist


def prefix_filtered_pairs(
    items: DataFrame,
    threshold: float,
    *,
    id_col: str = "__id",
    item_col: str = "__item",
    decimals: int = 6,
) -> DataFrame:
    """All pairs of sets with Jaccard ≥ ``threshold`` — exact, via
    prefix filtering.

    ``items``: (id, item) rows, DISTINCT per (id, item) not required —
    deduped internally. Output: ``d1, d2, jaccard`` with d1 < d2 and
    jaccard rounded to ``decimals`` (same contract as
    ``dedup.jaccard_pairs``).
    """
    if not (0 < threshold <= 1):
        raise ValueError(
            f"prefix_filtered_pairs: threshold must be in (0, 1], got "
            f"{threshold}"
        )
    t = float(threshold)
    # NULL ids/items excluded: a grouped NULL id would merge every
    # unkeyed row into one pseudo-set (whose prefix then candidates
    # against half the corpus); a NULL item is not a set element
    s = items.filter(
        F.col(id_col).isNotNull() & F.col(item_col).isNotNull()
    ).select(
        F.col(id_col).alias("__id"), F.col(item_col).alias("__it")
    ).distinct()
    s = scoped_persist(s, eager=True)  # r14: fill before fan-out

    # global rarest-first order: (document frequency, item) — ties on
    # frequency break by item value so the order is total and both join
    # sides agree on every prefix
    freq = s.groupBy("__it").agg(F.count(F.lit(1)).alias("__df"))
    ranked = s.join(freq, "__it")
    wp = Window.partitionBy("__id").orderBy(F.asc("__df"), F.asc("__it"))
    wn = Window.partitionBy("__id")
    ranked = ranked.select(
        "__id",
        "__it",
        F.row_number().over(wp).alias("__pos"),
        F.count(F.lit(1)).over(wn).alias("__sz"),
    )
    ranked = scoped_persist(ranked, eager=True)  # r14: fill before fan-out

    # prefix length p = n − ⌈θ·n⌉ + 1. The 1e-9 nudge keeps ⌈·⌉ exact
    # when θ·n IS an integer in real arithmetic but lands a hair above
    # it in binary (0.8·5 = 4.0000000000000004 → ceil 5 would SHORTEN
    # the prefix and silently drop true pairs — a false-negative bug,
    # not a rounding nit)
    prefix = ranked.filter(
        F.col("__pos")
        <= F.col("__sz")
        - F.ceil(F.lit(t) * F.col("__sz") - F.lit(1e-9))
        + 1
    )

    a = prefix.alias("a")
    b = prefix.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.__it") == F.col("b.__it"))
            & (F.col("a.__id") < F.col("b.__id"))
            # size band: jaccard ≤ min/max, so θ·max ≤ min is necessary
            # (same 1e-9 nudge: an exact-boundary pair must survive)
            & (F.least("a.__sz", "b.__sz")
               >= F.lit(t) * F.greatest("a.__sz", "b.__sz") - F.lit(1e-9)),
        )
        .select(
            F.col("a.__id").alias("d1"),
            F.col("b.__id").alias("d2"),
            F.col("a.__sz").alias("__n1"),
            F.col("b.__sz").alias("__n2"),
        )
        .distinct()
    )

    # exact verify on candidates only: sorted full item arrays meet once
    # per side, intersection counted JVM-side
    arrs = ranked.groupBy("__id").agg(
        F.sort_array(F.collect_list("__it")).alias("__arr")
    )
    verified = (
        cands.join(arrs.select(F.col("__id").alias("d1"),
                               F.col("__arr").alias("__a1")), "d1")
        .join(arrs.select(F.col("__id").alias("d2"),
                          F.col("__arr").alias("__a2")), "d2")
        .withColumn(
            "__c", F.size(F.array_intersect("__a1", "__a2")).cast("double")
        )
        .withColumn(
            "jaccard",
            F.round(
                F.col("__c")
                / (F.col("__n1") + F.col("__n2") - F.col("__c")),
                decimals,
            ),
        )
        .filter(F.col("jaccard") >= t)
        .select("d1", "d2", "jaccard")
    )
    return verified


def jaccard_prefix_pairs(
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """``prefix_filtered_pairs`` over n-gram shingle sets — the PPJoin
    twin of ``dedup.jaccard_pairs`` (same output contract, same
    oracle), with shingles hashed to int64 exactly as there so the
    prefix join compares 8-byte keys."""
    from weaviate_txtai_spark.operators.dedup import _shingle_table

    sh = _shingle_table(docs, text_col, id_col, n).select(
        "__id", F.xxhash64("__sh").alias("__sh")
    )
    return prefix_filtered_pairs(
        sh, threshold, id_col="__id", item_col="__sh"
    )
