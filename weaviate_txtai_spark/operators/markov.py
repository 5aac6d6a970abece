"""Markov-chain stationary distribution (fixed-point power iteration).

Given observed transition counts, iterate π' = πP with the
maximum-likelihood row-stochastic P̂ (p_uv = n_uv / Σ_w n_uw) — the
long-run state occupancy behind session-journey analysis ("where do
users end up"), synthetic-session generators, and Markov attribution.

ORACLE-GRADE arithmetic (the pagerank_exact discipline): masses are
scaled LONGS and each step floors,

    contrib(v) = Σ_u (π_u · n_uv) div tot_u
    π'_v      = contrib(v) + dm div N      [dm = mass on dangling states]

so the T-step trajectory replays bit-identically in an unrolled-CTE
SQL oracle. Dangling states (observed only as targets) redistribute
uniformly, keeping total mass ≈ scale (floor leakage of a few
units/iteration, identical on both engines).

int64 safety: π_u ≤ scale and the multiplier is a COUNT, so the
products stay below scale · max_count — with the default scale 1e9
counts up to ~9e9 are safe under ANSI.

Scale shape per iteration: transitions ⋈ masses (src) + one
groupBy(dst) partial agg + a 1-row dangling broadcast — the pagerank
shape; the count table persists once; states are the (tiny) label
domain in the intended uses, but nothing here assumes it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from weaviate_txtai_spark.cache import scoped_persist


def markov_stationary_exact(
    transitions: DataFrame,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    count_col: str = "n",
    n_iter: int = 8,
    scale: int = 10**9,
    round_decimals: int = 6,
) -> DataFrame:
    """Fixed-point stationary distribution from a transition-count
    frame (one row per (src, dst) with a positive long count).

    Output: ``state, pi`` — the mass after ``n_iter`` power steps,
    rescaled to sum ≈ 1 and rounded. Uniform start.
    """
    if n_iter < 1:
        raise ValueError("markov_stationary_exact: n_iter must be >= 1")
    if scale < 10**6:
        raise ValueError("markov_stationary_exact: scale must be >= 1e6")
    t = scoped_persist(
        transitions.select(
            F.col(src_col).alias("src"),
            F.col(dst_col).alias("dst"),
            F.col(count_col).cast("long").alias("cnt"),
        ).filter(
            # NULL endpoints would mint a phantom NULL state: it joins
            # nothing (NULL ≠ NULL), so it becomes a dangling state
            # silently absorbing a uniform mass share every iteration
            (F.col("cnt") > 0)
            & F.col("src").isNotNull()
            & F.col("dst").isNotNull()
        )
    )
    tot = scoped_persist(
        t.groupBy("src").agg(F.sum("cnt").alias("tot"))
    )
    states = scoped_persist(
        t.select(F.col("src").alias("id"))
        .union(t.select(F.col("dst").alias("id")))
        .distinct()
    )
    n_states = states.count()
    if n_states == 0:
        raise ValueError("markov_stationary_exact: no transitions")
    p = states.select("id", F.lit(scale // n_states).alias("m"))
    for it in range(n_iter):
        if it:
            p = p.localCheckpoint(eager=False)
        dangling = (
            p.join(tot, p.id == tot.src, "left_anti")
            .agg(F.coalesce(F.sum("m"), F.lit(0)).cast("long").alias("dm"))
        )
        contrib = (
            t.join(p.withColumnRenamed("id", "src"), "src")
            .join(tot, "src")
            .groupBy("dst")
            .agg(F.sum(F.expr("(m * cnt) div tot")).alias("mass"))
        )
        p = (
            states.join(contrib, states.id == contrib.dst, "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "id",
                (
                    F.coalesce(F.col("mass"), F.lit(0))
                    + F.expr(f"dm div {n_states}L")
                ).cast("long").alias("m"),
            )
        )
    total_mass = p.agg(F.sum("m").cast("double").alias("__t"))
    return (
        p.join(F.broadcast(total_mass))
        .select(
            F.col("id").alias("state"),
            F.round(F.col("m") / F.col("__t"), round_decimals).alias("pi"),
        )
    )


def markov_entropy_rate(
    transitions: DataFrame,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    count_col: str = "n",
    n_iter: int = 8,
    scale: int = 10**9,
    round_decimals: int = 6,
) -> DataFrame:
    """Entropy rate of the observed chain, H = −Σ_u π_u Σ_v p̂_uv ln p̂_uv
    (nats/step) — how predictable the next event is given the current
    one; the sequence-compressibility number behind session-journey
    complexity scoring and synthetic-log fidelity checks.

    π comes from :func:`markov_stationary_exact` (already rounded, so
    the float products start from identical doubles on both engines);
    p̂_uv are exact integer ratios. One extra join + aggregate on top of
    the stationary solve.

    Output (1 row): ``n_states, n_transitions, entropy_rate``.
    """
    pi = markov_stationary_exact(
        transitions,
        src_col=src_col,
        dst_col=dst_col,
        count_col=count_col,
        n_iter=n_iter,
        scale=scale,
        round_decimals=round_decimals,
    )
    t = transitions.select(
        F.col(src_col).alias("src"),
        F.col(dst_col).alias("dst"),
        F.col(count_col).cast("long").alias("cnt"),
    ).filter(
        # mirror the stationary solve's NULL-endpoint exclusion: a NULL
        # dst would otherwise count toward a real src's p̂ row (and its
        # entropy) for a transition π never saw — the two branches must
        # describe the same chain
        (F.col("cnt") > 0)
        & F.col("src").isNotNull()
        & F.col("dst").isNotNull()
    )
    tot = t.groupBy("src").agg(F.sum("cnt").alias("tot"))
    per_state = (
        t.join(tot, "src")
        .select(
            "src",
            (
                -(F.col("cnt") / F.col("tot"))
                * F.log(F.col("cnt") / F.col("tot"))
            ).alias("__h"),
        )
        .groupBy("src")
        .agg(F.sum("__h").alias("__hs"), F.count(F.lit(1)).alias("__k"))
    )
    return (
        pi.join(per_state, pi.state == per_state.src, "left")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_states"),
            F.coalesce(F.sum("__k"), F.lit(0))
            .cast("long").alias("n_transitions"),
            F.round(
                F.coalesce(
                    F.sum(F.col("pi") * F.col("__hs")), F.lit(0.0)
                ),
                round_decimals,
            ).alias("entropy_rate"),
        )
    )
