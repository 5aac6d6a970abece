"""Rendezvous (highest-random-weight) shard assignment — consistent
placement with provable minimal movement on resharding.

``balanced_shards`` (plans/pipeline.py) balances a static snapshot by
size. The operational companion problem is RE-sharding a living corpus:
``hash(key) % n`` moves (n−1)/n of all keys when n changes — every
cache, co-location, and incremental-index assumption breaks at once.
Rendezvous hashing (Thaler & Ravishankar 1998) assigns each key to
``argmax over shards of h(key, shard)``; adding a shard moves ONLY the
keys whose new shard wins the argmax — an expected 1/(n+1) of the
corpus — and removing one moves only that shard's own keys.

Scale notes: the assignment is a pure codegen projection — per key,
|shards| hash evaluations and an argmax, no shuffle, no state, no
lookup table. h is md5 over (key, ':', shard) compared as hex (uniform
per (key, shard), engine-portable, deterministic). |shards| is
inherently small (a cluster's shard count); for thousands of shards use
two-level rendezvous (groups, then members) — same operator applied
twice.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _weight(key: Column, shard: str) -> Column:
    return F.md5(F.concat(key.cast("string"), F.lit(":" + shard)))


def rendezvous_assign(
    df: DataFrame,
    key_col: str,
    shards: Sequence[str],
    *,
    out_col: str = "shard",
) -> DataFrame:
    """``df`` plus ``out_col``: the rendezvous-chosen shard name for
    each row's key. Deterministic; equal keys always land together."""
    shards = list(shards)
    if not shards:
        raise ValueError("no shards")
    if len(set(shards)) != len(shards):
        raise ValueError(f"duplicate shard names: {shards}")
    key = F.col(key_col)
    # struct comparison is lexicographic on (w, s): ties on the md5 hex
    # (impossible in practice) break by shard name, keeping the argmax
    # total and deterministic. greatest() keeps the expression LINEAR in
    # |shards| — the previous when(cand > best).otherwise(best) chain
    # re-embedded `best` twice per level, growing the codegen'd
    # projection 2^|shards|-fold and blowing Janino's 64 KB method limit
    # at 8 shards (whole-stage codegen then silently fell back to
    # interpreted execution).
    cands = [
        F.struct(_weight(key, s).alias("w"), F.lit(s).alias("s"))
        for s in shards
    ]
    best = cands[0] if len(cands) == 1 else F.greatest(*cands)
    return df.withColumn(out_col, best["s"])


def movement_on_reshard(
    df: DataFrame,
    key_col: str,
    shards_before: Sequence[str],
    shards_after: Sequence[str],
) -> DataFrame:
    """1-row report of a reshard's blast radius: ``n_keys, moved,
    moved_frac`` — the fraction of keys whose assignment changes
    between the two shard sets (rendezvous guarantee: ≈ |added|/|after|
    for pure additions, exactly the removed shards' share for pure
    removals; mod-n hashing would move ~(n−1)/n)."""
    a = rendezvous_assign(df, key_col, shards_before, out_col="__a")
    ab = rendezvous_assign(a, key_col, shards_after, out_col="__b")
    return ab.agg(
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.sum(
            F.when(F.col("__a") != F.col("__b"), 1).otherwise(0)
        ).cast("long").alias("moved"),
        F.round(
            F.avg(F.when(F.col("__a") != F.col("__b"), 1.0).otherwise(0.0)),
            6,
        ).alias("moved_frac"),
    )


def largest_remainder_apportion(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    *,
    total: int,
) -> DataFrame:
    """Hamilton (largest-remainder) apportionment of ``total`` integer
    units across keys, proportional to summed ``weight_col`` — the
    shard/budget allocator for "give each source its fair share of N
    output shards (or N training slots)" where fractional shares are
    meaningless and Σ alloc == total must hold EXACTLY.

    Pure integer arithmetic end to end: base_s = ⌊T·w_s/W⌋ and the
    remainder rank uses rem_s = (T·w_s) mod W — both longs — so there
    is no float quota anywhere and the result is bit-identical across
    engines. Remainder ties break on the key ascending.

    Output: ``key_col, weight, alloc`` with Σ alloc == total. Weights
    are cast to long (fractional weights should be pre-scaled by the
    caller). Zero/negative-weight keys keep base 0 but still compete
    for remainders deterministically at rem 0.

    Scale: one groupBy(key) corpus reduction, then key-domain-sized
    math: the remainder rank is a domain² self-join (no unpartitioned
    window), fine for the |sources|-scale domains this targets.
    """
    if total < 0:
        raise ValueError("largest_remainder_apportion: total must be >= 0")
    from weaviate_txtai_spark.cache import scoped_persist

    w = scoped_persist(
        # a NULL key would be apportioned a share as its own "source"
        df.filter(F.col(key_col).isNotNull())
        .groupBy(F.col(key_col).alias("k")).agg(
            # negative totals clamp to 0: a negative share is
            # meaningless and trunc-vs-floor division would diverge
            F.greatest(
                F.sum(F.col(weight_col).cast("long")), F.lit(0)
            ).alias("w")
        )
    )
    big_w = w.agg(
        F.sum("w").cast("long").alias("__W0"),
        F.greatest(F.count(F.lit(1)), F.lit(1)).cast("long").alias("__K"),
    )
    # all-zero weights fall back to equal weights (round-robin): with
    # W clamped to 1 every base would be 0 and leftover = total could
    # exceed the key count, breaking Σ alloc == total (ADVICE r9)
    we = "(CASE WHEN __W0 = 0 THEN 1L ELSE w END)"
    big = "(CASE WHEN __W0 = 0 THEN __K ELSE __W0 END)"
    # eager: one barrier fills w (scanned by the big_w broadcast build
    # inside the same job) AND quot0 before the fan-out (r14)
    quot0 = scoped_persist(
        w.join(F.broadcast(big_w)).select(
            "k",
            "w",
            F.expr(f"({total}L * {we}) div {big}").alias("base"),
            F.expr(f"({total}L * {we}) % {big}").alias("rem"),
        ),
        eager=True,
    )
    base_sum = quot0.agg(F.sum("base").cast("long").alias("__bs"))
    quot = quot0.join(F.broadcast(base_sum)).select(
        "k", "w", "base", "rem",
        (F.lit(total) - F.col("__bs")).alias("leftover"),
    )
    a, b = quot.alias("a"), quot.alias("b")
    rank = (
        a.join(
            b,
            (F.col("b.rem") > F.col("a.rem"))
            | ((F.col("b.rem") == F.col("a.rem"))
               & (F.col("b.k") < F.col("a.k"))),
            "left",
        )
        .groupBy(F.col("a.k").alias("k"))
        .agg((F.count(F.col("b.k")) + 1).alias("rk"))
    )
    return (
        quot.join(rank, "k")
        .select(
            F.col("k").alias(key_col),
            F.col("w").alias("weight"),
            (
                F.col("base")
                + F.when(F.col("rk") <= F.col("leftover"), 1).otherwise(0)
            ).cast("long").alias("alloc"),
        )
    )
