"""As-of (nearest-prior) join and bounded time-range join.

The reference has no temporal joins at all (SURVEY §2.4 — its only join is
the implicit docid↔uuid lookup, weaviate.py:151-165); these are north-star
extensions for event/training-data pipelines: click attribution, feature
look-back ("latest signal as of example time"), and bounded-window
follow-up aggregation.

Scale design (100 TB / 1000 executors):

- ``asof_join`` is the union-of-sides + windowed ``last(ignorenulls)``
  formulation: ONE shuffle on the join key, a per-key sort, no range
  explosion and no per-key driver loop. This is the standard distributed
  as-of strategy (Flint/pandas ``merge_asof`` semantics re-expressed as a
  window) — cost is identical to any windowed analytic over the same key.
  Skewed keys hit the window sort; AQE skew handling and (if needed)
  time-bucket pre-splitting are the mitigations.

- ``range_join`` avoids the O(N×M) inequality cross-join by bucketing
  both sides to ``window`` wide epochs: a right row in ``(l.ts, l.ts+w]``
  must land in the left row's bucket or the next one, so the left side
  explodes ×2 onto {b, b+1} and the join becomes an equi-join on
  (keys…, bucket) — shuffle is linear in input size, never quadratic.
  Catalyst cannot do this rewrite itself (it plans inequality joins as
  BNLJ); this is exactly the kind of operator worth hand-bucketing.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    matched_ts_col: str = "matched_ts",
    direction: str = "backward",
) -> DataFrame:
    """As-of LEFT join: attach to every left row the nearest right row
    for the same key(s) — ``direction='backward'`` (default) takes the
    greatest ``right_ts <= left_ts`` (feature look-back),
    ``'forward'`` the smallest ``right_ts >= left_ts`` (next-outcome
    attribution: "first purchase after this exposure"). Same one-shuffle
    union + window plan either way — forward just flips the frame to
    [current, following] with ``first(ignorenulls)``.

    Right payload = every right column except keys/ts; its values ride
    along unchanged; ``matched_ts_col`` carries the matched right ts.
    Unmatched left rows keep NULLs (left-join semantics). Right rows are
    expected unique per (keys…, ts). The whole payload is stitched from
    ONE matched right row: the window fills a single struct(ts,
    payload…) — never per-column — so a NULL in one payload column stays
    NULL rather than being back-filled from a different, farther right
    row, and ``matched_ts_col`` describes every output column (ADVICE
    r4).

    A right payload column sharing a name with a left non-key column
    would produce an ambiguous duplicate output column; that collision
    raises ``ValueError`` (rename on either side first) rather than
    silently dropping data the way ``range_join``'s exclusion does.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"asof_join: unknown direction {direction!r}")
    keys = list(on)
    payload = [c for c in right.columns if c not in keys and c != right_ts]
    clash = sorted(set(payload) & {c for c in left.columns if c not in keys})
    if clash:
        raise ValueError(
            "asof_join: right payload column(s) collide with left "
            f"columns: {clash}; rename them on one side before joining"
        )
    if matched_ts_col in left.columns or matched_ts_col in payload:
        raise ValueError(
            f"asof_join: matched_ts_col {matched_ts_col!r} collides with "
            "an input column; pick a different name"
        )

    lhs = left.select(
        *[F.col(k) for k in keys],
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__is_left"),
        *[F.col(c) for c in left.columns if c not in keys],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in payload],
        F.lit(None).cast(right.schema[right_ts].dataType).alias("__r_ts"),
    )
    rhs = right.select(
        *[F.col(k) for k in keys],
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__is_left"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns if c not in keys],
        *[F.col(c).alias(f"__r_{c}") for c in payload],
        F.col(right_ts).alias("__r_ts"),
    )

    # One NULLABLE struct per row carries the entire right payload: the
    # struct is NULL on left rows (so ignorenulls skips them) and the
    # window fills it ATOMICALLY — per-column fills would stitch a NULL
    # payload value from a different right row than matched_ts names.
    packed = lhs.unionByName(rhs).withColumn(
        "__r",
        F.when(
            F.col("__is_left") == 0,
            F.struct(
                F.col("__r_ts").alias("__mts"),
                *[F.col(f"__r_{c}").alias(c) for c in payload],
            ),
        ),
    )
    if direction == "backward":
        # Right rows sort before left rows at equal ts (__is_left ASC),
        # making the as-of inclusive: a right row AT left_ts matches.
        w = (
            Window.partitionBy(*keys)
            .orderBy(F.col("__ts"), F.col("__is_left"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        filled = packed.withColumn(
            "__f", F.last("__r", ignorenulls=True).over(w)
        )
    else:
        # forward: frame looks ahead; right rows sort AFTER left rows at
        # equal ts (__is_left DESC) so an equal-ts right row stays inside
        # the left row's [current, following] frame -> inclusive match
        w = (
            Window.partitionBy(*keys)
            .orderBy(F.col("__ts"), F.col("__is_left").desc())
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        filled = packed.withColumn(
            "__f", F.first("__r", ignorenulls=True).over(w)
        )
    out_left = [c for c in left.columns if c not in keys]
    return (
        filled.filter(F.col("__is_left") == 1)
        .select(
            *keys,
            *out_left,
            *[F.col("__f").getField(c).alias(c) for c in payload],
            F.col("__f").getField("__mts").alias(matched_ts_col),
        )
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    *,
    window_seconds: int,
    on: Sequence[str] = (),
    left_ts: str = "ts",
    right_ts: str = "ts",
) -> DataFrame:
    """Inner pair-join of every right row in ``(l.ts, l.ts + window]``.

    Returns left columns + right payload columns (caller renames to avoid
    collisions before the call). Equi-join on (keys…, epoch bucket) — the
    ×2 left explosion replaces the quadratic inequality join.
    """
    keys = list(on)
    w_us = int(window_seconds) * 1_000_000
    r_payload = [
        c for c in right.columns if c not in keys and c not in left.columns
    ]

    lb = F.floor(F.unix_micros(F.col(left_ts)) / w_us)
    lhs = left.withColumn("__bucket", F.explode(F.array(lb, lb + 1)))
    rhs = right.withColumn(
        "__bucket", F.floor(F.unix_micros(F.col(right_ts)) / w_us)
    )
    cond = [lhs["__bucket"] == rhs["__bucket"]] + [
        lhs[k] == rhs[k] for k in keys
    ]
    in_range = (F.unix_micros(rhs[right_ts]) > F.unix_micros(lhs[left_ts])) & (
        F.unix_micros(rhs[right_ts]) <= F.unix_micros(lhs[left_ts]) + w_us
    )
    joined = lhs.join(rhs, cond).filter(in_range)
    return joined.select(
        *[lhs[c] for c in left.columns],
        *[rhs[c] for c in r_payload],
    )
