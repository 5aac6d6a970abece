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
group holds its OPEN runs only — sessions not yet sealed by the
watermark — so per-user state is bounded by watermark_delay / gap runs
(typically one or two) and the store stays tiny no matter how long the
stream runs.
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

# state: parallel arrays of OPEN session runs (start_us, last_us, n) —
# multiple runs, not one: a late-event cluster spanning micro-batches
# must accumulate in state until the watermark seals it, or it would be
# emitted as split/overlapping fragments
from pyspark.sql.types import ArrayType

STATE_SCHEMA = StructType(
    [
        StructField("starts_us", ArrayType(LongType())),
        StructField("lasts_us", ArrayType(LongType())),
        StructField("ns", ArrayType(LongType())),
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

    # Interval-merge over ALL open runs: state runs + this batch's events
    # fold into maximal runs (sorted by start, merge when the next run
    # starts within gap of the current end). A run is emitted ONLY when
    # the event-time watermark passes its end + gap — never eagerly on a
    # later event's arrival — so out-of-order events across micro-batches
    # keep accumulating in state instead of emitting split/overlapping
    # fragments (batch-spec semantics). Events BELOW the watermark may be
    # dropped by the engine before reaching this function (standard
    # stateful-operator late-data semantics); everything at-or-above it
    # is merged exactly.
    runs: list[list[int]] = []
    if state.exists:
        starts, lasts, ns = state.get
        runs = [[int(s), int(l), int(c)] for s, l, c in zip(starts, lasts, ns)]
    if not state.hasTimedOut:
        events = pd.concat(list(pdfs))
        if len(events):
            runs.extend(
                [int(t), int(t), 1]
                for t in (events["ts"].astype("int64") // 1000)  # ns -> us
            )
    runs.sort(key=lambda r: r[0])
    merged: list[list[int]] = []
    for r in runs:
        if merged and r[0] <= merged[-1][1] + gap_us:
            merged[-1][1] = max(merged[-1][1], r[1])
            merged[-1][2] += r[2]
        else:
            merged.append(list(r))
    wm_us = state.getCurrentWatermarkMs() * 1000
    open_runs = []
    for r in merged:
        if r[1] + gap_us < wm_us:  # watermark sealed this run
            closed.append((user_id, r[0], r[1], r[2]))
        else:
            open_runs.append(r)
    if open_runs:
        state.update(
            (
                [r[0] for r in open_runs],
                [r[1] for r in open_runs],
                [r[2] for r in open_runs],
            )
        )
        # wake when the watermark can seal the earliest open run
        earliest_end_ms = min(r[1] for r in open_runs) // 1000
        state.setTimeoutTimestamp(earliest_end_ms + gap_seconds * 1000 + 1)
    elif state.exists:
        state.remove()

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
        # NULL users would share ONE state key and sessionize unrelated
        # events together
        events.filter(F.col("user_id").isNotNull())
        .withWatermark("ts", watermark)
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

    # mirror the streaming path's r11 NULL-key exclusion: a grouped
    # NULL user would splice every unkeyed event into one session chain
    events = events.filter(F.col("user_id").isNotNull())
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
