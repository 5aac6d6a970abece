"""Sequential pattern mining: frequent ordered event-type pairs within
a time window (the 2-sequence core of PrefixSpan/GSP — Agrawal &
Srikant 1996, public knowledge — which is what production "what follows
what" analyses actually ship; longer patterns compose by re-running
over matched prefixes).

Unlike ``itemsets.basket_rules`` (UNORDERED co-occurrence inside a
basket), a sequential pattern requires a→b in TIME ORDER within
``window_seconds`` — "view then purchase within an hour", "error then
retry within a minute".

Scale notes: the only pairing is a per-user self-join bounded by the
time window — both sides hash-partition on user_id, so the join is
co-located, and the per-user fan-out is (events in window)², the same
bound every sessionized funnel pays. Support counts DISTINCT users per
pattern: the distinct is applied per (user, a, b) BEFORE the global
aggregate, so the pattern table the final groupBy sees is at most
|users|·|type pairs|. A ``max_user_events`` cap (documented, loud — not
silent) bounds the quadratic blowup of bot-grade users, the
``max_basket_size`` discipline from basket_rules.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sequence_pairs(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    window_seconds: int = 3600,
    min_support: int = 2,
    max_user_events: int | None = None,
    round_decimals: int = 6,
) -> DataFrame:
    """Frequent ordered pairs: ``a, b, support, support_a, confidence,
    lift`` where support = #users with ≥1 occurrence of type a followed
    (strictly later, ≤ window_seconds) by type b; confidence =
    support / support_a; lift = confidence / (support_b / n_users) —
    the sequential analogue of association-rule confidence/lift, with
    user-level support so hyperactive users can't dominate.

    Self-pairs (a == b) are kept: "retry then retry" is a real pattern.
    """
    e = events.select(
        F.col(user_col).alias("u"),
        F.col(type_col).alias("t"),
        F.unix_micros(F.col(ts_col)).alias("us"),
    ).filter(
        # NULL users form no pairs (NULL ≠ NULL in the self-join) but
        # WOULD still inflate n_users and the per-type supports,
        # silently deflating every lift
        F.col("t").isNotNull()
        & F.col("us").isNotNull()
        & F.col("u").isNotNull()
    )
    if max_user_events is not None:
        counts = e.groupBy("u").agg(F.count(F.lit(1)).alias("__n"))
        dropped = counts.filter(F.col("__n") > max_user_events)
        e = e.join(dropped.select("u"), "u", "left_anti")
    # distinct (user, type, ts µs) — duplicate identical events would
    # only re-derive the same (u, a, b) pattern rows the later distinct
    # removes, but pruning them first shrinks the self-join input.
    # Persisted: the frame feeds FIVE branches (both self-join sides,
    # the user-count scalar, the type-support table twice), and without
    # the persist each re-planned the source scan + distinct shuffle
    # (the basket_rules shared-frame rationale; r13 opt)
    from weaviate_txtai_spark.cache import scoped_persist

    e = scoped_persist(e.distinct())

    w_us = int(window_seconds) * 1_000_000
    a = e.select(F.col("u"), F.col("t").alias("a"), F.col("us").alias("ta"))
    b = e.select(F.col("u"), F.col("t").alias("b"), F.col("us").alias("tb"))
    pats = (
        a.join(b, "u")
        .filter(
            (F.col("tb") > F.col("ta"))
            & (F.col("tb") - F.col("ta") <= F.lit(w_us))
        )
        .select("u", "a", "b")
        .distinct()
    )
    # scalar user count stays in-plan (1-row broadcast, never collected)
    n_users = e.select("u").distinct().agg(
        F.count(F.lit(1)).cast("double").alias("__nu")
    )
    # type-domain sized; referenced by BOTH broadcast attaches below —
    # persisted so the (user, type) distinct over e runs once, not twice.
    # EAGER: the one count barrier fills BOTH caches sequentially before
    # any consumer fans out (computing it scans every partition of `e`,
    # so `e` materializes inside the same job) — on the lazy shape the
    # self-join sides, the user-count scalar and the two broadcast
    # builds raced the unfilled caches as concurrent AQE stages
    # (4.3 s@32c vs 1.2 s@8c, driver r13; r14 opt)
    type_support = scoped_persist(
        e.select("u", "t").distinct().groupBy("t").agg(
            F.count(F.lit(1)).alias("__su")
        ),
        eager=True,
    )
    sup = pats.groupBy("a", "b").agg(F.count(F.lit(1)).alias("support"))
    return (
        sup.join(
            F.broadcast(
                type_support.select(
                    F.col("t").alias("a"), F.col("__su").alias("support_a")
                )
            ),
            "a",
        )
        .join(
            F.broadcast(
                type_support.select(
                    F.col("t").alias("b"), F.col("__su").alias("support_b")
                )
            ),
            "b",
        )
        .join(F.broadcast(n_users))
        .filter(F.col("support") >= int(min_support))
        .select(
            "a",
            "b",
            F.col("support").cast("long").alias("support"),
            F.col("support_a").cast("long").alias("support_a"),
            F.round(
                F.col("support") / F.col("support_a"), round_decimals
            ).alias("confidence"),
            F.round(
                (F.col("support") / F.col("support_a"))
                / (F.col("support_b") / F.col("__nu")),
                round_decimals,
            ).alias("lift"),
        )
    )


def sequence_triples(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    window_seconds: int = 3600,
    min_support: int = 2,
    max_user_events: int | None = None,
) -> DataFrame:
    """Frequent ordered TRIPLES a→b→c — one GSP/PrefixSpan level past
    :func:`sequence_pairs`: a user supports (a, b, c) iff some
    occurrence chain tₐ < t_b < t_c exists with both hops inside
    ``window_seconds``. Existence is checked over ALL chains (two
    self-joins composed on the SHARED middle event), not greedily —
    greedy earliest-match is complete only without the window bound.

    Scale shape: the hop frame is the same user-co-located windowed
    self-join sequence_pairs runs; the second hop joins hop⋈hop on
    (user, middle event) — still co-located on user, per-user fan-out
    (events-in-window)³ worst case, bounded by the same documented
    ``max_user_events`` cap. Support is distinct-users per pattern
    (per-user dedup BEFORE the global aggregate).

    Output: ``a, b, c, support`` (patterns with support ≥
    ``min_support``)."""
    e = events.select(
        F.col(user_col).alias("u"),
        F.col(type_col).alias("t"),
        F.unix_micros(F.col(ts_col)).alias("us"),
    ).filter(
        # NULL users form no pairs (NULL ≠ NULL in the self-join) but
        # WOULD still inflate n_users and the per-type supports,
        # silently deflating every lift
        F.col("t").isNotNull()
        & F.col("us").isNotNull()
        & F.col("u").isNotNull()
    )
    if max_user_events is not None:
        counts = e.groupBy("u").agg(F.count(F.lit(1)).alias("__n"))
        dropped = counts.filter(F.col("__n") > max_user_events)
        e = e.join(dropped.select("u"), "u", "left_anti")
    e = e.distinct()
    w_us = int(window_seconds) * 1_000_000
    from weaviate_txtai_spark.cache import scoped_persist

    # eager: both sides of the second-hop self-join fan out over this
    # frame as concurrent stages of one action (r14 opt). StorageLevel
    # (r14 audit): the hop table is windowed-pair-sized (bounded by the
    # documented max_user_events cap, quadratic per user within the
    # window, NOT corpus-quadratic); MEMORY_AND_DISK_DESER deliberately
    # — spill degrades to a disk round-trip, recompute would re-run the
    # windowed self-join per consumer.
    from pyspark import StorageLevel

    hops = scoped_persist(
        e.select(F.col("u"), F.col("t").alias("x"), F.col("us").alias("tx"))
        .join(
            e.select(
                F.col("u"), F.col("t").alias("y"), F.col("us").alias("ty")
            ),
            "u",
        )
        .filter(
            (F.col("ty") > F.col("tx"))
            & (F.col("ty") - F.col("tx") <= F.lit(w_us))
        ),
        StorageLevel.MEMORY_AND_DISK_DESER,
        eager=True,
    )
    pats = (
        hops.select("u", F.col("x").alias("a"), F.col("y").alias("b"),
                    F.col("ty").alias("tmid"))
        .join(
            hops.select(
                F.col("u"), F.col("x").alias("b2"),
                F.col("tx").alias("tmid"), F.col("y").alias("c"),
            ),
            ["u", "tmid"],
        )
        .filter(F.col("b") == F.col("b2"))
        .select("u", "a", "b", "c")
        .distinct()
    )
    return (
        pats.groupBy("a", "b", "c")
        .agg(F.count(F.lit(1)).cast("long").alias("support"))
        .filter(F.col("support") >= int(min_support))
    )
