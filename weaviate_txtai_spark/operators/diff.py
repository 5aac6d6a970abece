"""Snapshot diff — typed row-level delta between two versions of a
table (added / removed / changed, with the changed column names).

The CDC companion to ``operators.scd``: ``scd2_apply`` consumes a
change batch; ``table_diff`` PRODUCES one from two snapshots — the
standard reconciliation step when an upstream republishes full extracts
instead of deltas (then the diff, not the snapshot, feeds the merge,
shrinking the write from O(table) to O(changes)).

Scale shape: ONE full-outer sort-merge join on the key columns — the
minimum possible for an unordered diff — with all change logic in
codegen expressions (null-safe ``<=>`` per compared column; the
changed-column list is a ``filter`` over a literal name array). No
window, no driver state, no second pass. Both sides bucketed on the
key would delete even that shuffle (``sources.bucketed``).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def table_diff(
    old: DataFrame,
    new: DataFrame,
    *,
    key_cols: Sequence[str],
    compare_cols: Optional[Sequence[str]] = None,
) -> DataFrame:
    """Row-level diff of ``new`` against ``old`` keyed by ``key_cols``.

    Output: key columns + ``change`` ('added' | 'removed' | 'changed')
    + ``changed_cols`` (sorted array of compared column names whose
    values differ — empty for added/removed). Unchanged rows are NOT
    emitted (the output is the delta, O(changes) not O(table)).
    Comparison is null-safe: NULL→value, value→NULL and value→value
    all count as changes; NULL→NULL does not. ``compare_cols`` defaults
    to every shared non-key column; a compared column missing from
    either side raises.
    """
    keys = list(key_cols)
    if compare_cols is None:
        compare_cols = [
            c for c in new.columns if c in set(old.columns) and c not in keys
        ]
    compare_cols = list(compare_cols)
    missing = [
        c
        for c in compare_cols
        if c not in old.columns or c not in new.columns
    ]
    if missing:
        raise ValueError(f"table_diff: compare_cols missing from a side: {missing}")

    o = old.select(
        *[F.col(k).alias(f"__ko_{k}") for k in keys],
        *[F.col(c).alias(f"__o_{c}") for c in compare_cols],
        F.lit(1).alias("__po"),
    )
    n = new.select(
        *[F.col(k).alias(f"__kn_{k}") for k in keys],
        *[F.col(c).alias(f"__n_{c}") for c in compare_cols],
        F.lit(1).alias("__pn"),
    )
    cond = o[f"__ko_{keys[0]}"].eqNullSafe(n[f"__kn_{keys[0]}"])
    for k in keys[1:]:
        cond = cond & o[f"__ko_{k}"].eqNullSafe(n[f"__kn_{k}"])
    joined = o.join(n, on=cond, how="full_outer")

    # presence via literal markers, NOT the key columns: the join
    # matches NULL keys null-safely, so keying presence off the key
    # column would misreport an unchanged NULL-key row present on both
    # sides as 'added'
    present_old = F.col("__po").isNotNull()
    present_new = F.col("__pn").isNotNull()

    diff_flags = F.array(
        *[
            F.when(
                ~F.col(f"__o_{c}").eqNullSafe(F.col(f"__n_{c}")), F.lit(c)
            ).otherwise(F.lit(None))
            for c in sorted(compare_cols)
        ]
    )
    changed_cols = F.filter(diff_flags, lambda x: x.isNotNull())
    change = (
        F.when(~present_old, F.lit("added"))
        .when(~present_new, F.lit("removed"))
        .when(F.size(changed_cols) > 0, F.lit("changed"))
    )
    return (
        joined.withColumn("change", change)
        .filter(F.col("change").isNotNull())
        .select(
            *[
                F.coalesce(F.col(f"__kn_{k}"), F.col(f"__ko_{k}")).alias(k)
                for k in keys
            ],
            "change",
            F.when(
                F.col("change") == "changed", changed_cols
            ).otherwise(F.array().cast("array<string>")).alias("changed_cols"),
        )
    )
