"""Slowly-changing-dimension type-2 merge over plain DataFrames.

The `MERGE INTO`-shaped mutation a lakehouse table format would run,
expressed as set operations (the same stance as ``VectorIndex``'s
copy-on-write mutations — VERDICT "what's missing" #2: no Delta/Iceberg
in this environment, so the SEMANTICS are provided engine-side and the
physical swap stays CoW): given the current dimension history and a
batch of changes, close the affected open versions and append new open
versions, preserving full history.

Scale shape: one equi-join of the OPEN slice against the change batch
(broadcastable when the batch is small — the common CDC case), one
column comparison, one union. Never a per-row loop, never a window over
the history table; closed versions are untouched (and under a
date-partitioned layout their files never rewrite).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def scd2_apply(
    history: DataFrame,
    changes: DataFrame,
    *,
    key_cols: Sequence[str],
    compare_cols: Sequence[str],
    effective_col: str = "effective_date",
    valid_from_col: str = "valid_from",
    valid_to_col: str = "valid_to",
) -> DataFrame:
    """Apply a change batch to an SCD2 history table.

    ``history`` carries one row per (key, version) with ``valid_from``
    and ``valid_to`` (NULL = open). ``changes`` carries the key columns,
    the new values of ``compare_cols``, and ``effective_col``.

    Rules (standard type-2):
    - an open row whose compared values DIFFER from its change row is
      closed (``valid_to`` := effective date) and a new open version is
      appended with ``valid_from`` := effective date;
    - an open row whose change carries identical values is untouched
      (no empty versions);
    - change keys absent from the history are INSERTED as new open rows
      (the upsert half of MERGE);
    - closed rows pass through untouched;
    - one change row per key per batch — duplicate keys in ``changes``
      raise (ambiguous effective order inside one batch is a caller
      bug; sequence batches instead).

    Input contract: every history row carries a NON-NULL
    ``valid_from`` — the full-outer join uses its presence to tell
    "matched history row" from "pure insert", so a NULL valid_from
    would silently reclassify that row's change as an insert. Any SCD2
    table that tracks versions at all satisfies this by construction.
    """
    keys = list(key_cols)
    comp = list(compare_cols)
    # one bounded action catches BOTH caller bugs: duplicate keys
    # (ambiguous order within a batch) and NULL keys (the equi-join
    # never matches NULL, so a NULL-key change would silently insert a
    # parallel open version next to the NULL-key history row)
    null_key = None
    for k in keys:
        c = F.col(k).isNull()
        null_key = c if null_key is None else (null_key | c)
    bad = (
        changes.groupBy(*keys).agg(F.count(F.lit(1)).alias("__n"))
        .filter((F.col("__n") > 1) | null_key)
        .limit(1)
        .count()
    )
    if bad:
        raise ValueError(
            "scd2_apply: changes contain duplicate or NULL keys — apply "
            "batches sequentially with one non-NULL-keyed change per key"
        )
    ch = changes.select(
        *[F.col(k).alias(f"__k_{k}") for k in keys],
        *[F.col(c).alias(f"__c_{c}") for c in comp],
        F.col(effective_col).alias("__eff"),
    )
    open_rows = history.filter(F.col(valid_to_col).isNull())
    closed_rows = history.filter(F.col(valid_to_col).isNotNull())
    cond = [F.col(k) == F.col(f"__k_{k}") for k in keys]
    joined = open_rows.join(ch, cond, "full_outer")
    # eqNullSafe: a NULL -> value change must count as different
    differs = None
    for c in comp:
        d = ~F.col(c).eqNullSafe(F.col(f"__c_{c}"))
        differs = d if differs is None else (differs | d)
    matched = F.col(valid_from_col).isNotNull()  # history side present
    has_change = F.col("__eff").isNotNull()      # change side present

    untouched_open = joined.filter(
        matched & (~has_change | ~differs)
    ).select(history.columns)
    closed_out = joined.filter(matched & has_change & differs).select(
        *[F.col(c) for c in history.columns if c != valid_to_col],
        F.col("__eff").alias(valid_to_col),
    ).select(history.columns)
    # columns outside keys/compare/validity pass through from history on
    # changed rows; pure inserts have no history values for them -> NULL
    passthrough = [
        c for c in history.columns
        if c not in keys + comp + [valid_from_col, valid_to_col]
    ]
    new_versions = joined.filter(has_change & (~matched | differs)).select(
        *[F.coalesce(F.col(f"__k_{k}"), F.col(k)).alias(k) for k in keys],
        *[F.col(f"__c_{c}").alias(c) for c in comp],
        *[F.col(c) for c in passthrough],
        F.col("__eff").alias(valid_from_col),
        F.lit(None).cast(
            history.schema[valid_to_col].dataType
        ).alias(valid_to_col),
    )
    return (
        closed_rows.select(history.columns)
        .unionByName(untouched_open)
        .unionByName(closed_out)
        .unionByName(new_versions.select(history.columns))
    )


def pit_join(
    facts: DataFrame,
    dim: DataFrame,
    *,
    key_cols: Sequence[str],
    ts_col: str,
    valid_from_col: str = "valid_from",
    valid_to_col: str = "valid_to",
    how: str = "left",
) -> DataFrame:
    """Point-in-time join: each fact row picks the dimension VERSION
    whose validity interval contains the fact's timestamp
    (``valid_from ≤ ts < valid_to``, NULL valid_to = open). The
    temporal-correctness read every SCD2 table exists for — "the
    customer's segment AS OF the order date", leakage-free training
    features.

    Scale notes: the join is EQUI on the key columns (one shuffle,
    AQE-skew-splittable) with the interval predicate as a residual
    filter — per key only that key's few versions are scanned, never a
    range cross-join. A well-formed SCD2 history (non-overlapping
    intervals per key) yields ≤1 match per fact; overlaps would fan
    out, which is a data bug this join surfaces rather than hides.
    """
    cond = None
    for k in key_cols:
        c = facts[k] == dim[k]
        cond = c if cond is None else (cond & c)
    interval = (facts[ts_col] >= dim[valid_from_col]) & (
        dim[valid_to_col].isNull() | (facts[ts_col] < dim[valid_to_col])
    )
    out = facts.join(dim, cond & interval, how)
    # drop the dim's duplicate key columns
    for k in key_cols:
        out = out.drop(dim[k])
    return out


def log_state_as_of(
    log: DataFrame,
    *,
    key_cols: Sequence[str],
    version_col: str = "version",
    op_col: str = "op",
    as_of: "int | None" = None,
) -> DataFrame:
    """Materialize a CDC/append log into table state AS OF a version —
    poor-man's time travel over a plain parquet log, the read half of
    what a lakehouse MERGE maintains natively.

    ``log`` holds one row per mutation: key columns, payload columns,
    a monotonically increasing ``version`` (unique per key — ties
    within a key are an upstream sequencing bug and raise), and ``op``
    in {'upsert', 'delete'}. The state as of v = for each key, the
    payload of its latest version ≤ v, unless that op is a delete.

    ONE key-grouped aggregate: ``max_by(struct(payload, op), version)``
    over the version-filtered log — no window over the log, no
    iterative fold; last-writer-wins is an associative max. Output:
    key + payload columns of live rows.
    """
    base = log if as_of is None else log.filter(
        F.col(version_col) <= as_of
    )
    # NULL business keys excluded: a grouped NULL would fold every
    # unkeyed mutation into one pseudo-entity whose last-writer-wins
    # state is meaningless
    for kc in key_cols:
        base = base.filter(F.col(kc).isNotNull())
    payload = [
        c
        for c in log.columns
        if c not in set(key_cols) | {version_col, op_col}
    ]
    picked = base.groupBy(*key_cols).agg(
        F.max_by(
            F.struct(*[F.col(c) for c in payload], F.col(op_col).alias("__op")),
            F.col(version_col),
        ).alias("__last"),
        F.count(F.lit(1)).alias("__n"),
        F.count_distinct(F.col(version_col)).alias("__nv"),
        # op outside {'upsert','delete'} (incl. NULL) must raise, not
        # silently act: `op != 'delete'` is NULL for a NULL op, so the
        # live-row filter would silently DELETE every NULL-op key
        F.max(
            F.when(
                F.col(op_col).isNull()
                | ~F.col(op_col).isin("upsert", "delete"),
                1,
            ).otherwise(0)
        ).alias("__bad_op"),
    )
    # duplicate versions within a key make last-writer-wins ambiguous;
    # same single bounded action also surfaces invalid ops
    bad = picked.filter(
        (F.col("__n") != F.col("__nv")) | (F.col("__bad_op") == 1)
    ).limit(1).collect()
    if bad:
        r = bad[0]
        if r["__bad_op"] == 1:
            raise ValueError(
                "log_state_as_of: op outside {'upsert','delete'} (or "
                "NULL) in the log — a NULL op would silently delete"
            )
        raise ValueError(
            "duplicate version within a key — ambiguous log order"
        )
    return (
        picked.filter(F.col("__last.__op") != "delete")
        .select(
            *key_cols,
            *[F.col(f"__last.{c}").alias(c) for c in payload],
        )
    )
