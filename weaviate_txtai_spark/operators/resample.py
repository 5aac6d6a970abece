"""Time-grid resampling with gap fill — regularize an event stream onto
a dense per-key time grid (the feature-engineering step before any
sequence model: fixed-rate inputs from irregular events).

The reference has no temporal operators at all (SURVEY §2.4); this is a
north-star extension alongside ``operators.asof``.

Scale shape: one aggregation shuffle on (keys, bucket) — the only pass
over the raw events — then the dense grid is generated from the
PER-KEY span aggregate (keys × min/max rows, tiny) with
``sequence``/``explode``: grid size is keys × span/step rows and never
touches the event table again. The gap join is an equi-join on
(keys, bucket) between the grid and the pre-aggregated frame (both
already small), and forward fill is one window ``last(ignorenulls)``
per key — the same one-shuffle-per-analytic cost model as
``asof_join``. No driver loops, no per-key collects.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_UNITS = ("minute", "hour", "day", "week")


def resample_ffill(
    df: DataFrame,
    *,
    keys: Sequence[str],
    ts_col: str = "ts",
    value_col: str = "value",
    unit: str = "hour",
    agg_round: int = 6,
) -> DataFrame:
    """Aggregate ``value_col`` onto a dense ``unit`` grid per key and
    forward-fill empty buckets.

    Output per (keys…, bucket_ts): ``n_events`` (0 on gap buckets),
    ``avg_value`` (NULL on gaps), ``filled_value`` (last non-null
    average at or before this bucket — NULL only before a key's first
    event), ``is_gap``. The grid spans each key's OWN [first, last]
    bucket — keys are never padded to a global range, so a key active
    for an hour costs one row, not the corpus's whole span.
    """
    if unit not in _UNITS:
        raise ValueError(f"resample_ffill: unit must be one of {_UNITS}")
    keys = list(keys)
    bucket = F.date_trunc(unit, F.col(ts_col))
    # persist the aggregate: both the span derivation and the gap join
    # consume it, and without the persist each consumer re-scans the
    # RAW event table (verified in the plan: 2 parquet scans, no
    # ReusedExchange) — the aggregate is keys × active buckets, tiny
    # relative to the events it summarizes. Released via cache_scope.
    from weaviate_txtai_spark.cache import scoped_persist

    # NULL series keys / timestamps excluded: a grouped NULL key would
    # splice every unkeyed event into one pseudo-series, and a NULL ts
    # (NULL bucket) would add a phantom grid row outside the span
    guard = F.col(ts_col).isNotNull()
    for kc in keys:
        guard = guard & F.col(kc).isNotNull()
    df = df.filter(guard)
    aggd = scoped_persist(
        df.groupBy(*keys, bucket.alias("bucket_ts")).agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.avg(value_col), agg_round).alias("avg_value"),
        ),
        eager=True,  # r14: fill before the consumer fan-out
    )
    spans = aggd.groupBy(*keys).agg(
        F.min("bucket_ts").alias("__lo"), F.max("bucket_ts").alias("__hi")
    )
    grid = spans.select(
        *keys,
        F.explode(
            F.sequence("__lo", "__hi", F.expr(f"interval 1 {unit}"))
        ).alias("bucket_ts"),
    )
    joined = grid.join(aggd, [*keys, "bucket_ts"], "left")
    w = (
        Window.partitionBy(*keys)
        .orderBy("bucket_ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        *keys,
        "bucket_ts",
        F.coalesce(F.col("n_events"), F.lit(0)).alias("n_events"),
        "avg_value",
        F.last("avg_value", ignorenulls=True).over(w).alias("filled_value"),
        F.col("n_events").isNull().alias("is_gap"),
    )


def rolling_distinct(
    df: DataFrame,
    *,
    ts_col: str,
    key_col: str,
    window_days: int = 7,
) -> DataFrame:
    """Trailing-window distinct count per day — WAU/MAU-style "distinct
    users in the last N days ending each day". Sliding DISTINCT does
    not decompose into per-day partials (the same key must count once
    across the window), so the exact distributed form is cover-explode:
    each distinct (key, active-day) pair is emitted into the N window
    ends it covers, then ONE countDistinct per window end.

    Shuffle volume: N × |distinct (key, day)| rows — linear with a
    bounded ×N factor, vs the window-join formulation's day×day range
    join. For monthly windows over years of data, the HLL sketch path
    (approx_count_distinct per day + sketch union) is the cheap
    alternative; this is the exact tier. Output: one row per day that
    has ≥1 active key in its trailing window: ``day, n_distinct``.
    """
    if window_days < 1:
        raise ValueError("window_days must be >= 1")
    # NULL keys/timestamps excluded: a NULL ts would emit a phantom
    # NULL-day window; a NULL key would land count-0 days on the grid
    # (countDistinct skips NULLs) — neither is an observation
    kd = df.filter(
        F.col(key_col).isNotNull() & F.col(ts_col).isNotNull()
    ).select(
        F.col(key_col).alias("__k"),
        F.date_trunc("day", F.col(ts_col)).cast("date").alias("__d"),
    ).distinct()
    covered = kd.select(
        "__k",
        F.explode(
            F.sequence(
                F.col("__d"),
                F.date_add(F.col("__d"), window_days - 1),
            )
        ).alias("day"),
    )
    # windows ending after the last active day describe no real day
    last_day = df.agg(
        F.date_trunc("day", F.max(ts_col)).cast("date").alias("__mx")
    )
    return (
        covered.join(F.broadcast(last_day))
        .filter(F.col("day") <= F.col("__mx"))
        .groupBy("day")
        .agg(F.countDistinct("__k").cast("long").alias("n_distinct"))
    )


def time_weighted_avg(
    df: DataFrame,
    *,
    group_col: str,
    ts_col: str,
    value_col: str,
    round_decimals: int = 6,
) -> DataFrame:
    """Time-weighted average per group over IRREGULAR samples: each
    observation holds its value until the next one, so its weight is
    the seconds until the next sample (the last sample gets zero
    weight — it has held for no observable time). The honest mean for
    unevenly-sampled state (price feeds, gauge metrics, queue depths),
    where the arithmetic mean over-weights busy periods.

    One group-partitioned lead() window + one aggregate. Groups with a
    single sample (no held interval) return NULL. Output: ``group,
    n_samples, twa``.
    """
    from pyspark.sql.window import Window

    base = df.filter(F.col(value_col).isNotNull()).select(
        group_col,
        F.col(ts_col).alias("__t"),
        F.col(value_col).cast("double").alias("__v"),
    )
    w = Window.partitionBy(group_col).orderBy("__t", "__v")
    held = base.withColumn(
        "__w",
        (
            F.unix_micros(F.lead("__t").over(w)) - F.unix_micros("__t")
        ).cast("double") / 1e6,
    )
    return held.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_samples"),
        F.round(
            F.try_divide(
                F.sum(F.col("__v") * F.col("__w")), F.sum("__w")
            ),
            round_decimals,
        ).alias("twa"),
    )
