"""Skew-aware join: salting for hot keys (scale path, SURVEY §4).

AQE's skew-join handles skew *inside* sort-merge joins automatically when
statistics notice it; salting is the explicit form for the cases AQE can't
fix — a handful of keys so hot that one task would receive gigabytes (the
classic 100 TB-pipeline failure: a null-ish default key, one viral
document id).

``salted_join``: the big/skewed side gets a uniform random salt in
[0, salt_factor); the smaller (but not broadcastable) side is replicated
``salt_factor`` times, once per salt value, via a tiny literal-range
explode. The join key becomes (key, salt), spreading each hot key over
``salt_factor`` tasks. Replication multiplies the small side's shuffle
volume by salt_factor — that's the price, choose salt_factor ≈ the
worst-key imbalance ratio.

Results are identical to the plain equi-join (inner/left) — only the
physical distribution changes; a property test asserts that.

``join_skew_topk`` / ``join_size_estimate`` are the MEASUREMENT side:
per-side key histograms (map-side combined, key-domain output) joined
into per-key output estimates — exact inner-join cardinality, hottest
key's share, skew ratio, and the top keys to salt, all BEFORE the join
runs. Use them to pick salt_factor instead of guessing.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: str | list[str],
    *,
    how: str = "inner",
    salt_factor: int = 16,
    seed: int | None = None,
) -> DataFrame:
    """Equi-join with the skewed side salted over ``salt_factor`` buckets.

    ``on`` is a column name (or list) present in both frames, like the
    string form of ``DataFrame.join``. ``how`` supports the outer-safe
    subset: 'inner' and 'left' (the salted side is the left/preserved
    side; 'right'/'full' would need the replicated side preserved, which
    salting breaks by construction).
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports how='inner' or 'left'")
    keys = [on] if isinstance(on, str) else list(on)
    # DETERMINISTIC per-row salt (hash of the row's hashable columns,
    # seedable), never F.rand(): rand is re-evaluated on stage retry, so
    # a shuffle-fetch failure recomputes lost map tasks with DIFFERENT
    # salts and rows go missing or duplicate vs the plain join. Hashing
    # row content is retry-stable; rows with the same key still spread
    # whenever any hashable column differs. MapType columns are excluded
    # (xxhash64 rejects maps); rows identical in every hashable column
    # share a bucket — unavoidable under any content-deterministic
    # scheme.
    def _hashable(dt) -> bool:
        from pyspark.sql.types import ArrayType, MapType, StructType

        if isinstance(dt, MapType):
            return False
        if isinstance(dt, ArrayType):
            return _hashable(dt.elementType)
        if isinstance(dt, StructType):
            return all(_hashable(f.dataType) for f in dt.fields)
        return True

    hash_cols = [f.name for f in skewed.schema.fields if _hashable(f.dataType)]
    salt_src = (
        F.xxhash64(*hash_cols, F.lit(int(seed)))
        if seed is not None
        else F.xxhash64(*hash_cols)
    )
    left = skewed.withColumn(_SALT, F.pmod(salt_src, F.lit(salt_factor)).cast("int"))
    right = other.withColumn(
        _SALT,
        F.explode(F.sequence(F.lit(0), F.lit(salt_factor - 1))),
    )
    joined = left.join(right, keys + [_SALT], how)
    return joined.drop(_SALT)


def _key_histograms(
    left: DataFrame, right: DataFrame, keys: Sequence[str]
) -> DataFrame:
    lh = left.groupBy(*keys).agg(F.count(F.lit(1)).alias("n_left"))
    rh = right.groupBy(*keys).agg(F.count(F.lit(1)).alias("n_right"))
    return (
        lh.join(rh, list(keys), "full_outer")
        .select(
            *keys,
            F.coalesce("n_left", F.lit(0)).cast("long").alias("n_left"),
            F.coalesce("n_right", F.lit(0)).cast("long").alias("n_right"),
        )
        .withColumn(
            "out_rows", (F.col("n_left") * F.col("n_right")).cast("long")
        )
    )


def join_skew_topk(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str] | str,
    k: int = 10,
) -> DataFrame:
    """The ``k`` keys contributing the most inner-join output rows:
    ``<keys...>, n_left, n_right, out_rows`` ordered by out_rows DESC
    (ties: key ASC — deterministic). Keys present on only one side
    appear with out_rows 0 only if they make the top-k of an otherwise
    empty join (i.e. effectively never) — the interesting rows are the
    multiplying ones."""
    ks = [keys] if isinstance(keys, str) else list(keys)
    h = _key_histograms(left, right, ks)
    return (
        h.orderBy(F.desc("out_rows"), *[F.asc(c) for c in ks]).limit(k)
    )


def join_size_estimate(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str] | str,
    *,
    round_decimals: int = 6,
) -> DataFrame:
    """One row: ``n_keys_both, out_rows, max_key_rows, max_share,
    skew_ratio`` — out_rows is the EXACT inner-join output cardinality
    (Σ n_l·n_r over shared keys), max_share the hottest key's fraction
    of it, and skew_ratio = max key contribution / mean contribution
    (1.0 = perfectly uniform; a cluster plans salting when this is
    10³+). NULL metrics on an empty join."""
    ks = [keys] if isinstance(keys, str) else list(keys)
    h = _key_histograms(left, right, ks).filter(F.col("out_rows") > 0)
    return h.agg(
        F.count(F.lit(1)).cast("long").alias("n_keys_both"),
        F.sum("out_rows").cast("long").alias("out_rows"),
        F.max("out_rows").cast("long").alias("max_key_rows"),
        F.round(
            F.try_divide(F.max("out_rows"), F.sum("out_rows")),
            round_decimals,
        ).alias("max_share"),
        F.round(
            F.try_divide(
                F.max("out_rows"), F.avg("out_rows")
            ),
            round_decimals,
        ).alias("skew_ratio"),
    )
