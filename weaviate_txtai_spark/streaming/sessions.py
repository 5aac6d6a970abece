"""Custom stateful streaming operator: session windows over the event
stream via ``applyInPandasWithState`` (SURVEY §7 M4 — no counterpart in
the reference; this is the canonical "operator Spark lacks → stateful
pandas" extension pattern from the north star).

Semantics: a session is a maximal run of a user's events with gaps
< ``gap_seconds``. Sessions are emitted when CLOSED — either a later
event arrives beyond the gap, or the event-time watermark passes the
session's last event + gap (state timeout). Open sessions survive in the
state store across micro-batches.

Scale: state is partitioned by user_id (the natural shuffle key); each
group's state is O(1) (one open session), so the state store stays tiny
no matter how long the stream runs — the watermark bounds retention.
"""

from __future__ import annotations

from typing import Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
    TimestampType,
)

SESSION_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", LongType()),
    ]
)

# state: (session_start_us, last_ts_us, n_events)
STATE_SCHEMA = StructType(
    [
        StructField("session_start_us", LongType()),
        StructField("last_ts_us", LongType()),
        StructField("n_events", LongType()),
    ]
)


def _sessionize_group(
    key: tuple,
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
    gap_seconds: int,
) -> Iterator[pd.DataFrame]:
    import datetime as dt

    user_id = key[0]
    gap_us = gap_seconds * 1_000_000
    closed: list[tuple[int, int, int, int]] = []

    if state.hasTimedOut:
        if state.exists:
            start_us, last_us, n = state.get
            closed.append((user_id, start_us, last_us, n))
            state.remove()
    else:
        # Interval-merge formulation: the open session from state is just
        # another run; fold the sorted (start, last, n) items, merging
        # whenever the next run starts within gap of the current run's
        # end. This handles out-of-order events ACROSS micro-batches the
        # naive "t - last <= gap" walk got wrong: a late event now
        # extends session_start backward, merges late events among
        # themselves, and never folds an event older than start - gap
        # into a newer session (batch-spec semantics).
        events = pd.concat(list(pdfs))
        items = [
            (t, t, 1)
            for t in (events["ts"].astype("int64") // 1000).sort_values()
        ]  # ns -> us
        if state.exists:
            s0, l0, n0 = state.get
            items.append((int(s0), int(l0), int(n0)))
            items.sort(key=lambda it: it[0])
        cur = None
        for it in items:
            if cur is None:
                cur = list(it)
            elif it[0] <= cur[1] + gap_us:
                cur[1] = max(cur[1], it[1])
                cur[2] += it[2]
            else:
                closed.append((user_id, cur[0], cur[1], cur[2]))
                cur = list(it)
        if cur is not None:
            start_us, last_us, n = cur
            state.update((int(start_us), int(last_us), int(n)))
            # flush via timeout once the watermark passes last event + gap
            state.setTimeoutTimestamp(last_us // 1000 + gap_seconds * 1000)

    if closed:
        yield pd.DataFrame(
            {
                "user_id": [c[0] for c in closed],
                "session_start": [
                    dt.datetime.utcfromtimestamp(c[1] / 1e6) for c in closed
                ],
                "session_end": [
                    dt.datetime.utcfromtimestamp(c[2] / 1e6) for c in closed
                ],
                "n_events": [c[3] for c in closed],
            }
        )


def sessionize_stream(
    events: DataFrame, *, gap_seconds: int = 1800, watermark: str = "1 hour"
) -> DataFrame:
    """Streaming session windows: one row per CLOSED session."""

    def fn(key, pdfs, state):
        return _sessionize_group(key, pdfs, state, gap_seconds)

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=SESSION_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def sessionize_batch(
    events: DataFrame, *, gap_seconds: int = 1800
) -> DataFrame:
    """Batch specification of the same session semantics (lag-gap +
    running-sum), for streaming-vs-batch equivalence tests."""
    from pyspark.sql import Window

    wo = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # microsecond precision: the streaming path compares in micros, and
    # whole-second truncation disagrees with it (and with the gate SQL's
    # INTERVAL comparison) on sub-second gaps
    gap = F.unix_micros(F.col("ts")) - F.lag(F.unix_micros(F.col("ts"))).over(wo)
    new_session = F.when(
        gap.isNull() | (gap > int(gap_seconds) * 1_000_000), 1
    ).otherwise(0)
    wrun = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        events.withColumn("__new", new_session)
        .withColumn("__sid", F.sum("__new").over(wrun))
        .groupBy("user_id", "__sid")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .drop("__sid")
    )
