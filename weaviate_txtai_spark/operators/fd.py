"""Approximate functional-dependency discovery and key profiling.

Why an LLM-data engine carries it: a 100 TB ingest has no DBA — whether
``doc_url → license``, ``(source, shard) → schema_version``, or
``user_id`` is actually unique is DISCOVERED from the data, and the
answer gates pipeline assumptions (dedup keys, join keys, SCD grain).
The standard measure is the g3 error (Kivinen & Mannila 1995, public
knowledge): the minimum fraction of rows to delete so the dependency
X → Y holds exactly — computed as 1 − Σ_groups max_y count(X=x, Y=y) / N.

Scale notes: each candidate is two cascaded aggregates —
groupBy(X, Y).count (map-side combined) then a max-per-X fold — and a
1-row combine; no join against data, no window over rows. Multiple
candidates run as independent plan branches unioned at the end (each
usually prunes to its own two columns at the scan).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fd_error(
    df: DataFrame,
    determinant: Sequence[str] | str,
    dependent: str,
    *,
    round_decimals: int = 6,
) -> DataFrame:
    """g3 error of ``determinant → dependent``. One row:
    ``determinant, dependent, n_rows, n_groups, n_violating_groups,
    g3_error`` (0.0 = exact FD). NULLs participate as ordinary values
    (two NULLs agree — the SQL ``GROUP BY`` convention)."""
    det = [determinant] if isinstance(determinant, str) else list(determinant)
    xy = df.groupBy(*det, dependent).agg(F.count(F.lit(1)).alias("__c"))
    per_x = xy.groupBy(*det).agg(
        F.max("__c").alias("__keep"),
        F.sum("__c").alias("__n"),
        F.count(F.lit(1)).alias("__ny"),
    )
    return per_x.agg(
        F.lit("+".join(det)).alias("determinant"),
        F.lit(dependent).alias("dependent"),
        F.sum("__n").cast("long").alias("n_rows"),
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.sum(F.when(F.col("__ny") > 1, 1).otherwise(0))
        .cast("long")
        .alias("n_violating_groups"),
        F.round(
            1 - F.sum("__keep") / F.sum("__n"), round_decimals
        ).alias("g3_error"),
    )


def fd_profile(
    df: DataFrame,
    candidates: Sequence[tuple[Sequence[str] | str, str]],
    *,
    round_decimals: int = 6,
) -> DataFrame:
    """g3 error for each candidate ``(determinant, dependent)`` pair —
    one output row per candidate, independent plan branches unioned."""
    if not candidates:
        raise ValueError("no FD candidates")
    outs = [
        fd_error(df, det, dep, round_decimals=round_decimals)
        for det, dep in candidates
    ]
    res = outs[0]
    for o in outs[1:]:
        res = res.unionByName(o)
    return res


def key_uniqueness(
    df: DataFrame,
    key_cols: Sequence[str] | str,
    *,
    round_decimals: int = 6,
) -> DataFrame:
    """Is ``key_cols`` a key? One row: ``key, n_rows, n_keys,
    n_dup_rows, dup_fraction`` — n_dup_rows counts rows beyond the
    first per key (what an exact dedup would drop)."""
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    per = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("__c"))
    return per.agg(
        F.lit("+".join(keys)).alias("key"),
        F.sum("__c").cast("long").alias("n_rows"),
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        (F.sum("__c") - F.count(F.lit(1))).cast("long").alias("n_dup_rows"),
        F.round(
            (F.sum("__c") - F.count(F.lit(1))) / F.sum("__c"), round_decimals
        ).alias("dup_fraction"),
    )


def referential_integrity(
    child: DataFrame,
    parent: DataFrame,
    *,
    child_keys: Sequence[str] | str,
    parent_keys: Sequence[str] | str,
    round_decimals: int = 6,
) -> DataFrame:
    """Orphan-foreign-key audit: how many child rows reference a parent
    key that does not exist — the referential check a lakehouse ingest
    runs where a database would have had a constraint. NULL child keys
    are counted separately (a null FK is "unlinked", not "broken").

    Plan: one left-anti join of the child's KEY HISTOGRAM (map-side
    combined — the anti-join touches key-domain rows, not child rows)
    against the parent's distinct keys, plus a 1-row child aggregate.

    Output (1 row): ``n_child, n_null_fk, n_orphan_rows,
    n_orphan_keys, orphan_fraction`` (fraction over non-null rows;
    NULL when no non-null rows)."""
    ck = [child_keys] if isinstance(child_keys, str) else list(child_keys)
    pk = [parent_keys] if isinstance(parent_keys, str) else list(parent_keys)
    if len(ck) != len(pk):
        raise ValueError("child_keys and parent_keys must align")
    nonnull = F.lit(True)
    for c in ck:
        nonnull = nonnull & F.col(c).isNotNull()
    base = child.select(*ck).withColumn("__ok", nonnull)
    totals = base.agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum(F.when(~F.col("__ok"), 1).otherwise(0)).alias("__nn"),
    )
    hist = (
        base.filter("__ok")
        .groupBy(*ck)
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    pkeys = parent.select(
        *[F.col(p).alias(c) for c, p in zip(ck, pk)]
    ).distinct()
    orphans = hist.join(pkeys, ck, "left_anti").agg(
        F.coalesce(F.sum("__c"), F.lit(0)).alias("__or"),
        F.count(F.lit(1)).alias("__ok_keys"),
    )
    return (
        totals.join(F.broadcast(orphans))
        .select(
            F.col("__n").cast("long").alias("n_child"),
            F.col("__nn").cast("long").alias("n_null_fk"),
            F.col("__or").cast("long").alias("n_orphan_rows"),
            F.col("__ok_keys").cast("long").alias("n_orphan_keys"),
            F.round(
                F.try_divide(F.col("__or"), F.col("__n") - F.col("__nn")),
                round_decimals,
            ).alias("orphan_fraction"),
        )
    )
