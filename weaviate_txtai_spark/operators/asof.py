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
    Unmatched left rows keep NULLs (left-join semantics). Right rows
    should be unique per (keys…, ts); when they are NOT, the tie is
    resolved CONTENT-deterministically (r13 window-order census): the
    payload struct itself is the final window sort key, so backward
    matches the greatest payload and forward the least — never the
    physical row order, which Spark does not define across
    partitionings/AQE plans. (If a payload column is a non-orderable
    type — a map — the struct tiebreak is skipped and ties fall back to
    any-of-equals.) The whole payload is stitched from
    ONE matched right row: the window fills a single struct(ts,
    payload…) — never per-column — so a NULL in one payload column stays
    NULL rather than being back-filled from a different, farther right
    row, and ``matched_ts_col`` describes every output column (ADVICE
    r4).

    A right payload column sharing a name with a left non-key column
    would produce an ambiguous duplicate output column; that collision
    raises ``ValueError`` (rename on either side first) rather than
    silently dropping data the way ``range_join``'s exclusion does.

    NULL timestamps: a right row with NULL ts matches NOTHING (there is
    no "as of NULL"), and a left row with NULL ts gets a NULL payload —
    without this, NULLS-FIRST window ordering silently matched NULL-ts
    left rows to NULL-ts right rows (and, forward, would attribute the
    first REAL outcome to a NULL exposure time).
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

    lnull = left.filter(F.col(left_ts).isNull())
    lok = left.filter(F.col(left_ts).isNotNull())
    right = right.filter(F.col(right_ts).isNotNull())

    lhs = lok.select(
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
    # Duplicate (keys…, ts) right rows: the payload struct is the final
    # sort key, so the pick among ties depends only on CONTENT, never on
    # the physical row order (which changes across partitionings). Ties
    # among left rows are harmless — right rows sort strictly before
    # (backward) / after (forward) them, so each left row's frame sees
    # the same right rows regardless. Maps are not orderable in Spark;
    # a map payload column disables the tiebreak (documented fallback).
    from pyspark.sql.types import ArrayType, MapType, StructType as _St

    def _orderable(dt):
        if isinstance(dt, MapType):
            return False
        if isinstance(dt, ArrayType):
            return _orderable(dt.elementType)
        if isinstance(dt, _St):
            return all(_orderable(f.dataType) for f in dt.fields)
        return True

    tiebreak = (
        [F.col("__r").asc()]
        if all(_orderable(right.schema[c].dataType) for c in payload)
        else []
    )
    if direction == "backward":
        # Right rows sort before left rows at equal ts (__is_left ASC),
        # making the as-of inclusive: a right row AT left_ts matches.
        w = (
            Window.partitionBy(*keys)
            .orderBy(F.col("__ts"), F.col("__is_left"), *tiebreak)
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
            .orderBy(F.col("__ts"), F.col("__is_left").desc(), *tiebreak)
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        filled = packed.withColumn(
            "__f", F.first("__r", ignorenulls=True).over(w)
        )
    out_left = [c for c in left.columns if c not in keys]
    matched = (
        filled.filter(F.col("__is_left") == 1)
        .select(
            *keys,
            *out_left,
            *[F.col("__f").getField(c).alias(c) for c in payload],
            F.col("__f").getField("__mts").alias(matched_ts_col),
        )
    )
    null_out = lnull.select(
        *keys,
        *out_left,
        *[
            F.lit(None).cast(right.schema[c].dataType).alias(c)
            for c in payload
        ],
        F.lit(None).cast(right.schema[right_ts].dataType).alias(
            matched_ts_col
        ),
    )
    return matched.unionByName(null_out)


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

    Rows with a NULL timestamp or NULL key never pair (inner-join
    semantics) and are absent from the output — the SQL contract, and
    what the DuckDB oracles compute (r13 join census).
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


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    *,
    bucket_seconds: int,
    on: Sequence[str] = (),
    left_start: str = "start",
    left_end: str = "end",
    right_start: str = "start",
    right_end: str = "end",
    max_buckets_per_interval: int = 1000,
) -> DataFrame:
    """Inner join of every (left, right) INTERVAL pair that overlaps:
    ``l.start ≤ r.end AND r.start ≤ l.end`` (closed intervals) — the
    generalization of ``range_join`` from point-in-window to
    interval×interval (sessions × incidents, maintenance windows ×
    job runs, speech segments × transcript spans).

    Scale: both sides explode to the epoch buckets their interval
    covers and equi-join on (keys…, bucket); two overlapping intervals
    must share ≥ 1 covered bucket, so the overlap predicate is a
    residual on a LINEAR-size join — never the quadratic inequality
    cross-join. Pairs sharing several buckets are deduped on the
    bucket-domain join OUTPUT via the smaller "meet bucket" trick: a
    pair is kept only in the FIRST bucket both cover (max of the two
    start buckets), so no distinct over payload columns is needed.

    ``max_buckets_per_interval`` bounds the explode of pathological
    intervals (an interval spanning the whole corpus would explode to
    every bucket): longer intervals RAISE, loudly — pick a coarser
    ``bucket_seconds`` instead (the fan-out/selectivity knob, exactly
    like range_join's window).

    Returns left columns + right payload columns (caller renames to
    avoid collisions before the call). NULL bounds are dropped, and so
    are INVERTED intervals (end < start): a closed interval with
    end < start denotes the empty set, which overlaps nothing — left
    in, its descending bucket sequence could still pair it with a right
    interval spanning the inverted gap.
    """
    keys = list(on)
    w_us = int(bucket_seconds) * 1_000_000
    r_payload = [
        c for c in right.columns if c not in keys and c not in left.columns
    ]

    def buckets(start, end, side):
        s_us = F.unix_micros(F.col(start))
        e_us = F.unix_micros(F.col(end))
        b0 = F.floor(s_us / w_us)
        b1 = F.floor(e_us / w_us)
        n = b1 - b0 + 1
        guard = F.when(
            n > max_buckets_per_interval,
            F.raise_error(
                F.concat(
                    F.lit(
                        f"interval_overlap_join: a {side} interval covers "
                    ),
                    n.cast("string"),
                    F.lit(
                        f" buckets (> {max_buckets_per_interval}); widen "
                        "bucket_seconds"
                    ),
                )
            ),
        ).otherwise(b0)
        return F.explode(F.sequence(guard, b1)), b0

    lf = left.filter(
        F.col(left_start).isNotNull()
        & F.col(left_end).isNotNull()
        & (F.col(left_start) <= F.col(left_end))
    )
    rf = right.filter(
        F.col(right_start).isNotNull()
        & F.col(right_end).isNotNull()
        & (F.col(right_start) <= F.col(right_end))
    )
    lex, lb0 = buckets(left_start, left_end, "left")
    rex, rb0 = buckets(right_start, right_end, "right")
    lhs = lf.withColumn("__b0", lb0).withColumn("__bucket", lex)
    rhs = rf.withColumn("__rb0", rb0).withColumn("__bucket", rex)
    cond = [lhs["__bucket"] == rhs["__bucket"]] + [
        lhs[k] == rhs[k] for k in keys
    ]
    overlap = (
        F.unix_micros(lhs[left_start]) <= F.unix_micros(rhs[right_end])
    ) & (F.unix_micros(rhs[right_start]) <= F.unix_micros(lhs[left_end]))
    # dedup without distinct: keep the pair only in its MEET bucket
    meet = F.greatest(lhs["__b0"], rhs["__rb0"])
    joined = (
        lhs.join(rhs, cond)
        .filter(overlap & (lhs["__bucket"] == meet))
    )
    return joined.select(
        *[lhs[c] for c in lf.columns],
        *[rhs[c] for c in r_payload],
    )
