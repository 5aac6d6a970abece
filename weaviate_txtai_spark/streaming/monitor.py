"""Streaming per-key EWMA + CUSUM monitor — the batch
``operators/changepoint.py`` pair as a custom stateful operator
(``applyInPandasWithState``), for live corpus telemetry: per-source
ingest volume, per-type error rates, alarmed the moment the level
shifts instead of at the nightly batch.

Semantics: per key, events are processed in EVENT-TIME order through

    ewma_t  = x_t                      (first event)
            | α·x_t + (1−α)·ewma_{t−1}
    S⁺_t = max(0, S⁺_{t−1} + (x_t − target − drift))
    S⁻_t = max(0, S⁻_{t−1} − (x_t − target + drift))
    alarm = S⁺_t > h or S⁻_t > h

identical to ``ewma()`` + ``cusum()`` run over the same rows in batch
(pinned by test). Both recursions are order-sensitive, so out-of-order
arrival cannot be folded on sight: rows BUFFER in state until the
watermark passes them, then seal in ts order through the carried
(ewma, S⁺, S⁻) — the same watermark-sealed discipline as
``streaming/sessions.py``. State per key = carried stats + the
un-sealed buffer (bounded by the watermark horizon × event rate).
"""

from __future__ import annotations

import datetime as dt
from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

OUT_SCHEMA = StructType(
    [
        StructField("key", StringType()),
        StructField("ts", TimestampType()),
        StructField("x", DoubleType()),
        StructField("ewma", DoubleType()),
        StructField("s_pos", DoubleType()),
        StructField("s_neg", DoubleType()),
        StructField("alarm", BooleanType()),
    ]
)

# carried stats + pending (not-yet-sealed) buffer
STATE_SCHEMA = StructType(
    [
        StructField("started", BooleanType()),
        StructField("ewma", DoubleType()),
        StructField("s_pos", DoubleType()),
        StructField("s_neg", DoubleType()),
        StructField("pend_ts", ArrayType(LongType())),   # epoch micros
        StructField("pend_x", ArrayType(DoubleType())),
    ]
)


def _monitor_group(
    key: Tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
    alpha: float,
    target: float,
    drift: float,
    threshold: float,
):
    if state.exists:
        started, ew, sp, sn, pts, pxs = state.get
        pending = list(zip(pts, pxs))
    else:
        started, ew, sp, sn = False, 0.0, 0.0, 0.0
        pending = []
    if not state.hasTimedOut:
        for pdf in pdfs:
            if len(pdf):
                micros = pdf["ts"].astype("int64") // 1000  # ns -> us
                pending.extend(zip(micros.tolist(), pdf["x"].tolist()))
    pending.sort()
    wm_us = state.getCurrentWatermarkMs() * 1000
    sealed = [p for p in pending if p[0] < wm_us]
    pending = [p for p in pending if p[0] >= wm_us]

    rows = []
    for ts_us, x in sealed:
        ew = x if not started else alpha * x + (1 - alpha) * ew
        started = True
        sp = max(0.0, sp + (x - target - drift))
        sn = max(0.0, sn - (x - target + drift))
        rows.append((ts_us, x, ew, sp, sn, sp > threshold or sn > threshold))

    if pending or started:
        state.update(
            (
                started,
                ew,
                sp,
                sn,
                [p[0] for p in pending],
                [p[1] for p in pending],
            )
        )
        if pending:
            # wake when the watermark can seal the earliest pending row
            state.setTimeoutTimestamp(min(p[0] for p in pending) // 1000 + 1)
    elif state.exists:
        state.remove()

    if rows:
        yield pd.DataFrame(
            {
                "key": [key[0]] * len(rows),
                "ts": [dt.datetime.utcfromtimestamp(r[0] / 1e6) for r in rows],
                "x": [r[1] for r in rows],
                "ewma": [round(r[2], 6) for r in rows],
                "s_pos": [round(r[3], 6) for r in rows],
                "s_neg": [round(r[4], 6) for r in rows],
                "alarm": [r[5] for r in rows],
            }
        )


def monitor_stream(
    events: DataFrame,
    *,
    alpha: float,
    target: float,
    drift: float = 0.0,
    threshold: float = float("inf"),
    key_col: str = "key",
    ts_col: str = "ts",
    value_col: str = "x",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming monitor: one output row per SEALED event with its
    ewma / S⁺ / S⁻ / alarm. Rows newer than the watermark stay
    buffered in state until order is safe."""

    def fn(key, pdfs, state):
        return _monitor_group(
            key, pdfs, state, alpha, target, drift, threshold
        )

    # NULL keys would share ONE monitor state, splicing unrelated
    # series into a single EWMA/CUSUM trajectory
    ev = events.filter(F.col(key_col).isNotNull()).select(
        F.col(key_col).alias("key"),
        F.col(ts_col).alias("ts"),
        F.col(value_col).cast("double").alias("x"),
    )
    return (
        ev.withWatermark("ts", watermark)
        .groupBy("key")
        .applyInPandasWithState(
            fn,
            outputStructType=OUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
