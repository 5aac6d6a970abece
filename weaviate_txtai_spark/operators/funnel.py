"""Behavioral-sequence analytics over event streams: ordered funnels and
cohort retention.

The reference's unit of analysis is the document object
(`/root/reference/weaviate_txtai/ann/weaviate.py:140-147`); these
operators extend the engine to the event-log side of a training-data /
product-analytics pipeline (the `events` table): "of the users who
signed up, how many then viewed, then clicked, then purchased — in that
order?" and "of the users whose first event fell in week W, how many
were still active k weeks later?".

Scale notes
-----------
``funnel``: ONE user-keyed shuffle. Events are filtered to the funnel's
types at the scan (predicate pushdown), pre-aggregated to a per-(user)
row of per-step sorted timestamp arrays (map-side combine collapses
each user's events before the exchange), and the sequential
"first event of step i strictly after the step-i-1 time" recurrence is
pure array expressions (`element_at` / `filter` / `array_min`) inside
one codegen projection — no joins, no windows, no UDF. The k-way
self-join formulation (the oracle SQL twin) shuffles the event table k
times; this form shuffles it once. Per-user state is the user's own
funnel-type timestamps — the same per-key bound every sessionizer
carries; a user with millions of events is an upstream bot-filter
problem, not a plan problem.

``cohort_retention``: two shuffles — per-user min (first event week),
then distinct (cohort, offset, user) pre-count — both map-side
combined. The join carrying each user's cohort week back onto their
activity weeks is user-keyed and reuses the first aggregate's
partitioning.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def funnel(
    events: DataFrame,
    steps: Sequence[str],
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    window: "int | None" = None,
    round_decimals: int = 6,
) -> DataFrame:
    """Strict-order funnel conversion: a user reaches step i when they
    have an event of type ``steps[i]`` STRICTLY after their step-i-1
    completion time (step 0: their earliest ``steps[0]`` event).
    Re-doing an earlier step never un-completes a later one; each
    step's completion time is the EARLIEST possible (greedy), which is
    optimal for strict-order funnels — if any event sequence completes
    the funnel, the greedy recurrence does.

    ``window`` (seconds) switches to ANCHORED conversion-window
    semantics (ClickHouse ``windowFunnel``): a user reaches step i when
    SOME step-0 event anchors a strictly-increasing chain through
    steps 1..i that stays within ``window`` seconds of the anchor.
    Greedy-from-the-first-anchor is NOT optimal here (a late anchor can
    succeed where the earliest fails), so every step-0 timestamp is
    tried as an anchor — a ``transform`` over the step-0 array; within
    a FIXED anchor the greedy earliest-next chain is optimal (exchange
    argument: replacing any chain element with an earlier valid one
    never shrinks the feasible set), so max-over-anchors is exact.
    Still one shuffle, still pure array expressions; per-user cost is
    |step-0 events| × Σ|step-i events|.

    Returns one row per step: ``step_idx, step, n_users, conversion``
    (conversion = n_users / step-0 users, NULL when no user enters).
    """
    if len(steps) < 2:
        raise ValueError(f"a funnel needs >= 2 steps, got {list(steps)!r}")
    if len(set(steps)) != len(steps):
        raise ValueError(f"funnel steps must be distinct, got {list(steps)!r}")
    if window is not None and window <= 0:
        raise ValueError(f"window must be positive seconds, got {window!r}")
    per_user = (
        events.filter(
            # NULL users would lump unrelated events into one
            # pseudo-user that "converts" through every step
            F.col(type_col).isin(list(steps))
            & F.col(user_col).isNotNull()
        )
        .select(user_col, type_col, ts_col)
        .groupBy(user_col)
        .pivot(type_col, list(steps))
        .agg(F.sort_array(F.collect_list(ts_col)))
    )
    # pivot names columns by the raw step strings; the recurrence reads
    # them positionally
    cols = [F.col(f"`{s}`") for s in steps]

    def _first_after(arr: Column, prev: Column) -> Column:
        # NOTE: the lambda must take exactly ONE parameter — a default
        # arg (lambda x, p=prev: ...) reads as the (x, idx) two-arg
        # form and binds prev to the array INDEX variable
        return F.array_min(F.filter(arr, lambda x: x > prev))

    if window is None:
        # try_element_at: a user with no step-0 events has an EMPTY
        # array after the pivot, and plain element_at throws under
        # ANSI mode
        t: list[Column] = [F.try_element_at(cols[0], F.lit(1))]
        for i in range(1, len(steps)):
            t.append(_first_after(cols[i], t[i - 1]))
        reached = per_user.select(
            *[
                F.count(t[i]).cast("long").alias(f"__n{i}")
                for i in range(len(steps))
            ]
        )
    else:

        def _first_in_window(arr: Column, prev: Column, hi: Column) -> Column:
            # one-parameter lambda (see _first_after's note); prev/hi
            # captured by closure. A null prev nulls the predicate, so
            # every element drops and the chain stays null — exactly
            # the wanted "stuck at the previous step" propagation.
            return F.array_min(
                F.filter(
                    arr, lambda x: (x > prev) & (x.cast("double") <= hi)
                )
            )

        def _anchor_depth(a: Column) -> Column:
            hi = a.cast("double") + F.lit(float(window))
            prev, depth = a, F.lit(1)
            for i in range(1, len(steps)):
                prev = _first_in_window(cols[i], prev, hi)
                depth = depth + F.when(prev.isNotNull(), 1).otherwise(0)
            return depth

        level = F.array_max(F.transform(cols[0], _anchor_depth))
        reached = per_user.select(
            *[
                F.count(F.when(level >= i + 1, 1)).cast("long").alias(f"__n{i}")
                for i in range(len(steps))
            ]
        )
    def _sq(s: str) -> str:
        # step names are caller DATA interpolated into SQL literals —
        # escape them (an apostrophe in an event type broke the parse)
        return s.replace("\\", "\\\\").replace("'", "\\'")

    stack_args = ", ".join(
        f"{i}, '{_sq(s)}', __n{i}" for i, s in enumerate(steps)
    )
    long = reached.selectExpr(
        f"stack({len(steps)}, {stack_args}) AS (step_idx, step, n_users)"
    )
    from pyspark.sql.window import Window

    # the stack output is k rows in one partition; this window never
    # moves corpus-scale data
    w = Window.partitionBy(F.lit(1))
    return long.select(
        "step_idx",
        "step",
        "n_users",
        F.when(
            F.max(F.when(F.col("step_idx") == 0, F.col("n_users"))).over(w)
            > 0,
            F.round(
                F.col("n_users")
                / F.max(
                    F.when(F.col("step_idx") == 0, F.col("n_users"))
                ).over(w),
                round_decimals,
            ),
        ).alias("conversion"),
    )


def cohort_retention(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    max_offset: int | None = None,
) -> DataFrame:
    """Weekly cohort retention matrix: cohort = ISO week (Monday
    date_trunc) of the user's FIRST event; one output row per
    (cohort_week, week_offset) with the count of cohort users active in
    that offset week. Offset 0 always contains the full cohort.

    Output: ``cohort_week (date), week_offset (int), n_users (long)``.
    """
    wk = F.date_trunc("week", F.col(ts_col)).cast("date")
    events = events.filter(F.col(user_col).isNotNull())
    first = (
        events.groupBy(user_col).agg(F.min(wk).alias("cohort_week"))
    )
    activity = events.select(
        user_col, wk.alias("__wk")
    ).distinct()
    off = (F.datediff("__wk", "cohort_week") / 7).cast("int")
    out = (
        activity.join(first, user_col)
        .select(user_col, "cohort_week", off.alias("week_offset"))
        .groupBy("cohort_week", "week_offset")
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
    )
    if max_offset is not None:
        out = out.filter(F.col("week_offset") <= max_offset)
    return out


def funnel_latency(
    events: DataFrame,
    steps: Sequence[str],
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    percentiles: Sequence[float] = (0.5, 0.9),
    round_decimals: int = 6,
) -> DataFrame:
    """How LONG each funnel transition takes: for every adjacent step
    pair (i−1 → i), the exact interpolated percentiles of the
    transition time in seconds over the users who completed step i —
    computed on the same greedy earliest-completion times ``funnel``
    counts, so the two operators describe one cohort.

    Output: one row per step 1..k−1 — ``step_idx, step, n_users,
    p<percentile...>`` (e.g. p50, p90), NULL percentiles when no user
    converts. One user-keyed shuffle + one small percentile aggregate
    (exact interpolated percentile over the converting-user rows;
    swap in approx_percentile at corpora where even that column is
    huge)."""
    if len(steps) < 2:
        raise ValueError(f"a funnel needs >= 2 steps, got {list(steps)!r}")
    if len(set(steps)) != len(steps):
        raise ValueError(f"funnel steps must be distinct, got {list(steps)!r}")
    per_user = (
        events.filter(
            # NULL users would lump unrelated events into one
            # pseudo-user that "converts" through every step
            F.col(type_col).isin(list(steps))
            & F.col(user_col).isNotNull()
        )
        .select(user_col, type_col, ts_col)
        .groupBy(user_col)
        .pivot(type_col, list(steps))
        .agg(F.sort_array(F.collect_list(ts_col)))
    )
    cols = [F.col(f"`{s}`") for s in steps]

    def _first_after(arr: Column, prev: Column) -> Column:
        return F.array_min(F.filter(arr, lambda x: x > prev))

    t: list[Column] = [F.try_element_at(cols[0], F.lit(1))]
    for i in range(1, len(steps)):
        t.append(_first_after(cols[i], t[i - 1]))
    # unix_micros diff, THEN divide: casting each timestamp to double
    # first loses sub-microsecond bits at epoch magnitude (~4e-7 s),
    # enough to flip a round-6 oracle comparison
    gaps = per_user.select(
        *[
            (
                (F.unix_micros(t[i]) - F.unix_micros(t[i - 1]))
                / F.lit(1e6)
            ).alias(f"__g{i}")
            for i in range(1, len(steps))
        ]
    )
    rows = []
    for i in range(1, len(steps)):
        aggs = [
            F.count(F.col(f"__g{i}")).cast("long").alias("n_users"),
        ]
        for p in percentiles:
            aggs.append(
                F.round(
                    F.percentile(F.col(f"__g{i}"), F.lit(p)), round_decimals
                ).alias(f"p{int(p * 100)}")
            )
        rows.append(
            gaps.agg(
                F.lit(i).alias("step_idx"), F.lit(steps[i]).alias("step"), *aggs
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionAll(r)
    return out


def funnel_ab(
    events: DataFrame,
    steps: Sequence[str],
    *,
    variant_col: str,
    group_a,
    group_b,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    window: "int | None" = None,
    round_decimals: int = 6,
) -> DataFrame:
    """Funnel comparison between two variants: per step, each cohort's
    reach rate (n_step / n_step0) and the pooled two-proportion z on
    those rates — the experiment readout for "did the new flow move
    step-3 conversion?", composed from :func:`funnel` (same greedy /
    windowed semantics) and the `abtest` z formula on the step counts.

    Output: one row per step — ``step_idx, step, n_a, n_b, rate_a,
    rate_b, z`` (z NULL at step 0 — both rates are 1 by construction —
    and whenever the pooled rate is degenerate).
    """
    fa = funnel(
        events.filter(F.col(variant_col) == group_a), steps,
        user_col=user_col, ts_col=ts_col, type_col=type_col, window=window,
    ).select("step_idx", "step", F.col("n_users").alias("n_a"))
    fb = funnel(
        events.filter(F.col(variant_col) == group_b), steps,
        user_col=user_col, ts_col=ts_col, type_col=type_col, window=window,
    ).select("step_idx", F.col("n_users").alias("n_b"))
    j = fa.join(fb, "step_idx")
    base = j.filter(F.col("step_idx") == 0).select(
        F.col("n_a").alias("__d_a"), F.col("n_b").alias("__d_b")
    )
    j = j.join(F.broadcast(base))
    # try_divide: a variant with zero step-0 users must yield NULL
    # rate/z (the documented degenerate-cohort readout), not an ANSI
    # DIVIDE_BY_ZERO — the 1/__d guards sat INSIDE the se expression
    # and crashed before the when() could mask them
    pa = F.try_divide(F.col("n_a"), F.col("__d_a"))
    pb = F.try_divide(F.col("n_b"), F.col("__d_b"))
    pool = F.try_divide(
        F.col("n_a") + F.col("n_b"), F.col("__d_a") + F.col("__d_b")
    )
    se = F.sqrt(
        pool
        * (1 - pool)
        * (
            F.try_divide(F.lit(1), F.col("__d_a"))
            + F.try_divide(F.lit(1), F.col("__d_b"))
        )
    )
    return j.select(
        "step_idx",
        "step",
        "n_a",
        "n_b",
        F.round(pa, round_decimals).alias("rate_a"),
        F.round(pb, round_decimals).alias("rate_b"),
        F.round(
            F.when((F.col("step_idx") > 0) & (se > 0), (pa - pb) / se),
            round_decimals,
        ).alias("z"),
    ).orderBy("step_idx")


def cohort_ltv(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    value_filter=None,
    round_decimals: int = 6,
) -> DataFrame:
    """Cohort LTV triangle: cumulative value PER COHORT USER by weekly
    age — the revenue companion to :func:`cohort_retention` ("how much
    has the March cohort earned per head by week 6"), the payback-curve
    readout growth teams monitor per acquisition cohort.

    Cohort = ISO week of the user's first event; age = whole weeks from
    the cohort week; ``value_filter`` (a boolean Column) restricts
    which rows carry value (e.g. purchases only) while every user still
    anchors a cohort. Cumulative sums run in a window PARTITIONED by
    cohort (bounded by the calendar); value mass is decimal-summed so
    the cumulative doubles replay across engines.

    Output: ``cohort_week, week_offset, cohort_users, week_value,
    cum_value, ltv_per_user``.
    """
    from pyspark.sql import Window as W

    events = events.filter(F.col(user_col).isNotNull())
    first = events.groupBy(user_col).agg(
        F.date_trunc("week", F.min(ts_col)).cast("date").alias(
            "cohort_week"
        )
    )
    sizes = first.groupBy("cohort_week").agg(
        F.count(F.lit(1)).cast("long").alias("cohort_users")
    )
    val = F.col(value_col).cast("decimal(28,8)")
    if value_filter is not None:
        val = F.when(value_filter, val).otherwise(F.lit(0).cast(
            "decimal(28,8)"))
    weekly = (
        events.join(first, user_col)
        .select(
            "cohort_week",
            (
                F.datediff(
                    F.date_trunc("week", F.col(ts_col)).cast("date"),
                    F.col("cohort_week"),
                )
                / 7
            ).cast("int").alias("week_offset"),
            val.alias("__v"),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.sum("__v").alias("__wv"))
    )
    w = (
        W.partitionBy("cohort_week")
        .orderBy("week_offset")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    return (
        weekly.withColumn("__cum", F.sum("__wv").over(w))
        .join(F.broadcast(sizes), "cohort_week")
        .select(
            "cohort_week",
            "week_offset",
            "cohort_users",
            # round the exact DECIMAL, then cast (money midpoints
            # flip engines when rounded as doubles — the ABC lesson)
            F.round(F.col("__wv"), 2).cast("double").alias("week_value"),
            F.round(F.col("__cum"), 2).cast("double").alias("cum_value"),
            F.round(
                F.col("__cum").cast("double") / F.col("cohort_users"),
                round_decimals,
            ).alias("ltv_per_user"),
        )
        .orderBy("cohort_week", "week_offset")
    )
