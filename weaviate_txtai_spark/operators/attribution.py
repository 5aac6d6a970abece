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
        # a NULL user would LUMP every unkeyed row into one pseudo-user
        # whose unrelated touches credit each other's conversions
        & F.col(user_col).isNotNull()
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


def shapley_attribution(
    events: DataFrame,
    *,
    channels: Sequence[str],
    conversion_type: str,
    user_col: str = "user_id",
    type_col: str = "event_type",
    round_decimals: int = 6,
) -> DataFrame:
    """Data-driven Shapley channel attribution (the simplified-game
    formulation of Dalessandro et al. 2012 / Shapley 1953): the
    coalition value v(S) is the observed conversion RATE of users whose
    exposure set is exactly S, and each channel's credit is

        φ_i = Σ_{S ∌ i} |S|!·(k−|S|−1)!/k! · (v(S∪{i}) − v(S))

    — the marketing-standard alternative to positional rules (last /
    first / linear above), immune to path-position gaming. Unobserved
    exposure sets carry v = 0 (the standard simplified choice; they
    contribute no lift evidence).

    Exposure sets are bitmasks over the ``channels`` list (k ≤ 20
    enforced; the subset domain is 2^k rows — attribution channel
    counts are single digits in practice). All coalition values are
    exact conversion-count ratios; the factorial weights are rational
    literals — deterministic across engines with output-only rounding.

    Output: one row per channel — ``channel, shapley, exposed_users``
    (users whose exposure set contains the channel).

    Scale: ONE groupBy(user) to form exposure sets, one groupBy(mask);
    everything after runs on the 2^k subset domain.
    """
    import math as _math

    k = len(channels)
    if k < 1:
        raise ValueError("shapley_attribution: need at least 1 channel")
    if k > 20:
        raise ValueError("shapley_attribution: too many channels (2^k)")
    if conversion_type in channels:
        raise ValueError("conversion_type cannot be a channel")
    spark = events.sparkSession
    # per-user exposure bitmask + converted flag
    bit = None
    for i, ch in enumerate(channels):
        term = F.max(
            F.when(F.col(type_col) == ch, F.lit(1 << i)).otherwise(0)
        )
        bit = term if bit is None else bit + term
    # NULL users excluded: one pseudo-user would otherwise merge every
    # unkeyed event into a single exposure set (and conversion flag)
    users = events.filter(F.col(user_col).isNotNull()).groupBy(user_col).agg(
        bit.cast("long").alias("mask"),
        F.max(
            F.when(F.col(type_col) == conversion_type, 1).otherwise(0)
        ).alias("conv"),
    )
    rates = users.groupBy("mask").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("conv").cast("double").alias("c"),
    )
    masks = spark.range(0, 1 << k).select(F.col("id").alias("mask"))
    v = masks.join(rates, "mask", "left").select(
        "mask",
        F.coalesce(F.col("c") / F.col("n"), F.lit(0.0)).alias("v"),
    )
    # popcount as explicit bit sums (identical integer arithmetic in
    # any SQL engine; no bit_count dialect dependence)
    pop = sum(
        F.shiftright(F.col("mask"), i).bitwiseAND(F.lit(1))
        for i in range(k)
    )
    v = v.select("mask", "v", pop.alias("s"))
    # weights w(s) = s!(k-1-s)!/k! as a literal CASE over s = 0..k-1
    expr = None
    for s in range(k):
        wt = (
            _math.factorial(s) * _math.factorial(k - 1 - s)
            / _math.factorial(k)
        )
        cond = (F.col("s") == s, F.lit(wt))
        expr = F.when(*cond) if expr is None else expr.when(*cond)
    chan = spark.createDataFrame(
        [(i, ch, 1 << i) for i, ch in enumerate(channels)],
        ["i", "channel", "bitval"],
    )
    base = v.join(F.broadcast(chan)).filter(
        F.col("mask").bitwiseAND(F.col("bitval")) == 0
    )
    with_union = base.join(
        v.select(
            F.col("mask").alias("mask2"), F.col("v").alias("v2")
        ),
        F.col("mask2") == F.col("mask") + F.col("bitval"),
    )
    phi = (
        with_union.select(
            "channel", "i",
            (expr * (F.col("v2") - F.col("v"))).alias("__t"),
        )
        .groupBy("channel", "i")
        .agg(F.round(F.sum("__t"), round_decimals).alias("shapley"))
    )
    exposed = (
        users.join(F.broadcast(chan))
        .filter(F.col("mask").bitwiseAND(F.col("bitval")) != 0)
        .groupBy("channel")
        .agg(F.count(F.lit(1)).cast("long").alias("exposed_users"))
    )
    return (
        phi.join(exposed, "channel", "left")
        .select(
            "channel",
            "shapley",
            F.coalesce("exposed_users", F.lit(0)).alias("exposed_users"),
        )
    )
