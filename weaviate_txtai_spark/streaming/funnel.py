"""Third custom stateful streaming operator: watermark-sealed
per-anchor funnel levels (``applyInPandasWithState``), the streaming
twin of the batch anchored-window funnel.

Semantics: for every step-0 event (the ANCHOR) the user's funnel level
is the longest in-order chain step0 < t1 ≤ … inside
``(anchor, anchor + window]``. An anchor's level is FINAL once the
event-time watermark passes ``anchor + window`` — no future event can
land inside its window anymore — and that is exactly when it is
emitted (never eagerly, so out-of-order arrivals keep accumulating in
state first; the streaming_monitor discipline).

Level equivalence: the greedy chain (min step-1 time, then min step-2
after it, …) reaches level L iff ANY chain does — a later chain's
step-k time is ≥ the greedy one's, so greedy never forecloses a
deeper step. The batch oracle's chain-EXISTS enumeration is therefore
replayed exactly.

State per user: the DISTINCT buffered (step_idx, ts) events still
inside the watermark horizon — an event at t can only serve anchors in
``[t − window, t]`` and unsealed anchors satisfy
``anchor + window ≥ wm``, so events with ``t + window < wm`` are
dropped every call; state is bounded by the user's event rate ×
(watermark delay + window), never the stream length.
"""

from __future__ import annotations

from typing import Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

FUNNEL_OUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("anchor_us", LongType()),
        StructField("level", IntegerType()),
    ]
)

FUNNEL_STATE_SCHEMA = StructType(
    [
        StructField("steps", ArrayType(IntegerType())),
        StructField("ts_us", ArrayType(LongType())),
    ]
)


def _funnel_group(
    key: tuple,
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
    n_steps: int,
    window_us: int,
) -> Iterator[pd.DataFrame]:
    user_id = key[0]
    events: set[tuple[int, int]] = set()
    if state.exists:
        steps, ts = state.get
        events = set(zip((int(s) for s in steps), (int(t) for t in ts)))
    if not state.hasTimedOut:
        batch = pd.concat(list(pdfs))
        if len(batch):
            events |= set(
                zip(
                    (int(s) for s in batch["step_idx"]),
                    (int(t) for t in batch["us"]),
                )
            )
    wm_us = state.getCurrentWatermarkMs() * 1000

    by_step: list[list[int]] = [[] for _ in range(n_steps)]
    for s, t in events:
        by_step[s].append(t)
    for lst in by_step:
        lst.sort()

    out_rows = []
    import bisect

    kept_anchors = []
    for a in by_step[0]:
        if a + window_us < wm_us:  # sealed: emit the greedy level
            level, lo, hi = 1, a, a + window_us
            for s in range(1, n_steps):
                # first step-s event strictly after `lo`, within window
                i = bisect.bisect_right(by_step[s], lo)
                if i < len(by_step[s]) and by_step[s][i] <= hi:
                    lo = by_step[s][i]
                    level += 1
                else:
                    break
            out_rows.append((user_id, a, level))
        else:
            kept_anchors.append(a)

    # keep only events that can still serve an unsealed/future anchor
    kept = [(s, t) for s, t in events if t + window_us >= wm_us]
    # sealed anchors leave; unsealed step-0 events stay (they're in kept
    # already by the same horizon condition — a sealed anchor has
    # a + window < wm so it was dropped)
    if kept:
        state.update(
            (
                [s for s, _ in kept],
                [t for _, t in kept],
            )
        )
        # ALWAYS register an event-time timeout while state is kept.
        # Without one, a group whose kept events hold no unsealed anchor
        # (e.g. a user with only step>0 events) would never be re-invoked
        # and its state would live for the stream's lifetime — the sweep
        # below guarantees every kept event is revisited once it can no
        # longer serve any anchor (ADVICE r8, state-eviction gap).
        if kept_anchors:
            seal_ms = (min(kept_anchors) + window_us) // 1000 + 1
        else:
            seal_ms = (max(t for _, t in kept) + window_us) // 1000 + 1
        state.setTimeoutTimestamp(seal_ms)
    elif state.exists:
        state.remove()

    if out_rows:
        yield pd.DataFrame(
            out_rows, columns=["user_id", "anchor_us", "level"]
        )


def funnel_stream(
    events: DataFrame,
    steps: "list[str]",
    *,
    window_seconds: int = 86400,
    watermark: str = "1 hour",
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming per-anchor funnel levels: one output row per SEALED
    step-0 event — ``user_id, anchor_us, level``."""
    if len(steps) < 2:
        raise ValueError("need at least 2 funnel steps")
    mapping = F.create_map(
        *[x for i, s in enumerate(steps) for x in (F.lit(s), F.lit(i))]
    )
    typed = (
        events.withWatermark(ts_col, watermark)
        .select(
            F.col(user_col).alias("user_id"),
            mapping[F.col(type_col)].alias("step_idx"),
            F.unix_micros(F.col(ts_col)).alias("us"),
            F.col(ts_col),
        )
        .filter(
            # NULL users would share one funnel state (cross-user
            # conversions); NULL step_idx = event type outside the funnel
            F.col("step_idx").isNotNull()
            & F.col("user_id").isNotNull()
        )
    )
    window_us = int(window_seconds) * 1_000_000
    n_steps = len(steps)

    def fn(key, pdfs, state):
        return _funnel_group(key, pdfs, state, n_steps, window_us)

    return typed.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=FUNNEL_OUT_SCHEMA,
        stateStructType=FUNNEL_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
