"""Conversion attribution over an event stream: credit each conversion's
value to the touch event(s) that preceded it.

The last analytics gap in the funnel/retention/cohort family
(operators/funnel.py): once a user converts, WHICH earlier interaction
gets the credit? Three standard models:

- ``last``: 100% to the most recent qualifying touch within the
  lookback window (the as-of join shape);
- ``first``: 100% to the EARLIEST touch within the window;
- ``linear``: split evenly across every touch in the window.

Scale notes
-----------
One user-keyed shuffle. Touches and conversions co-group by user
(map-side filtered to the two event-type sets before the exchange);
per user, the per-conversion credit assignment is pure array work over
that user's own touches — the same bounded per-key state contract as
``funnel``. No window over the full stream, no range cross-join. The
output is the credited (touch_type, conversions, value) table — one
tiny aggregate.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def attribution(
    events: DataFrame,
    *,
    touch_types: Sequence[str],
    conversion_type: str,
    model: str = "last",
    lookback: "int | None" = None,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    value_col: str = "value",
    round_decimals: int = 6,
) -> DataFrame:
    """Credited value per touch type. Output: one row per touch type
    that earned credit — ``touch_type, conversions, credited_value``
    (conversions is fractional under ``linear``: a conversion with 4
    preceding touches contributes 0.25 to each type it touched).
    Conversions with NO qualifying preceding touch are credited to the
    literal type ``'(none)'``. ``lookback`` (seconds) bounds how far
    back a touch may be; touches must be STRICTLY before the
    conversion."""
    if model not in ("last", "first", "linear"):
        raise ValueError(f"unknown attribution model {model!r}")
    tt = [t for t in touch_types if t != conversion_type]
    if len(tt) != len(touch_types):
        raise ValueError("conversion_type cannot be a touch type")
    if lookback is not None and lookback <= 0:
        raise ValueError(f"lookback must be positive seconds, got {lookback!r}")
    ev = events.select(user_col, type_col, ts_col, value_col).filter(
        F.col(type_col).isin(list(touch_types) + [conversion_type])
    )
    per_user = ev.groupBy(user_col).agg(
        F.sort_array(
            F.collect_list(
                F.when(
                    F.col(type_col) != conversion_type,
                    F.struct(F.col(ts_col).alias("ts"), F.col(type_col).alias("tp")),
                )
            )
        ).alias("touches"),
        F.collect_list(
            F.when(
                F.col(type_col) == conversion_type,
                F.struct(F.col(ts_col).alias("ts"), F.col(value_col).alias("v")),
            )
        ).alias("convs"),
    )

    def _window_touches(conv_ts):
        pred = lambda t: t["ts"] < conv_ts  # noqa: E731
        if lookback is not None:
            lo = conv_ts.cast("double") - F.lit(float(lookback))
            return F.filter(
                F.col("touches"),
                lambda t: (t["ts"] < conv_ts) & (t["ts"].cast("double") >= lo),
            )
        return F.filter(F.col("touches"), pred)

    def _credits(conv):
        wt = _window_touches(conv["ts"])
        n = F.size(wt)
        # try_element_at: an empty window must yield NULL (→ '(none)'),
        # not an ANSI out-of-bounds error
        if model == "last":
            pick = F.try_element_at(wt, F.lit(-1))["tp"]
        elif model == "first":
            pick = F.try_element_at(wt, F.lit(1))["tp"]
        else:  # linear: one credit row per distinct... per touch
            return F.when(
                n == 0,
                F.array(
                    F.struct(
                        F.lit("(none)").alias("tp"),
                        F.lit(1.0).alias("w"),
                        conv["v"].alias("v"),
                    )
                ),
            ).otherwise(
                F.transform(
                    wt,
                    lambda t: F.struct(
                        t["tp"].alias("tp"),
                        (F.lit(1.0) / n).alias("w"),
                        conv["v"].alias("v"),
                    ),
                )
            )
        return F.array(
            F.struct(
                F.coalesce(pick, F.lit("(none)")).alias("tp"),
                F.lit(1.0).alias("w"),
                conv["v"].alias("v"),
            )
        )

    credits = per_user.select(
        F.explode(
            F.flatten(F.transform(F.col("convs"), _credits))
        ).alias("c")
    )
    return (
        credits.groupBy(F.col("c.tp").alias("touch_type"))
        .agg(
            F.round(F.sum("c.w"), round_decimals).alias("conversions"),
            F.round(F.sum(F.col("c.w") * F.col("c.v")), round_decimals).alias(
                "credited_value"
            ),
        )
    )
