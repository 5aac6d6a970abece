"""Rank-based statistics: distributed average-rank assignment and
Spearman rank correlation.

``lineitem_correlations`` (plans/relational.py) profiles Pearson
correlation / covariance; Pearson is blind to monotone-but-nonlinear
association and is wrecked by heavy-tailed outliers — both endemic in
pipeline telemetry (doc lengths, quality scores, token counts). The
robust companion is Spearman's ρ: Pearson on the columns' fractional
(tie-averaged) ranks.

Scale notes
-----------
The textbook formulation ranks with ``rank() OVER (ORDER BY v)`` — a
global-order window, i.e. every row through ONE task (the same
scale-killer ids.py documents for dense-id assignment, and exactly what
the DuckDB oracle twin does, correctly, at oracle scale). The
scale-safe identity used here: the average rank of value v is

    avg_rank(v) = (# rows with value < v) + (cnt(v) + 1) / 2

which needs per-ROW nothing — only a prefix sum over the per-VALUE
count table. The plan, per column:

1. ``groupBy(value).count()`` — one map-side-combined shuffle; the
   prefix-sum input shrinks from N rows to the distinct-value count.
2. exclusive prefix sum over the value-ordered count table via the
   ids.py two-pass scheme: ``repartitionByRange`` by value,
   ``sortWithinPartitions``, per-partition subtotals (≤ one row per
   partition to the driver), broadcast the cumulative offsets back.
   No unpartitioned window anywhere.
3. one value-keyed join maps each row to its avg rank; hot values are
   fine — the rank table has one row per value, so skew meets a
   broadcast-able side.

Determinism caveat (same as ids.py): the two-pass prefix sum evaluates
its input twice, so the source frame must be deterministic (file scans
and deterministic transforms are; fresh ``rand()`` is not — persist
first).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# monotonically_increasing_id packs the partition id above bit 33
_LOCAL_MASK = (1 << 33) - 1


def _prefix_sums(
    vc: DataFrame,
    value_col: str,
    count_col: str,
    *,
    by: str | None = None,
    pre_materialize: bool = False,
) -> DataFrame:
    """Exclusive prefix sum of ``count_col`` over ``vc`` ordered by
    ``value_col``, without a global window. Adds ``__before``.

    ``by``: optional grouping column — the prefix sum restarts per
    ``by`` value, so N independent rankings (e.g. one per unpivoted
    source column) share ONE range shuffle instead of N. The subtotal
    collect grows to ≤ n_part·|by-domain| rows — still driver-bounded
    for the column-unpivot use (|by| = a handful of column names).

    ``pre_materialize``: checkpoint ``vc`` BEFORE the range shuffle.
    ``repartitionByRange`` runs a boundary-SAMPLING pass over its
    input, so an expensive ``vc`` subtree (a wide explode + aggregate)
    is otherwise computed twice — once for sampling, once for the real
    shuffle. The checkpoint is domain-sized (distinct values, not
    rows); callers with a trivially-cheap ``vc`` keep the default."""
    keys = [by] if by else []
    n_part = max(2, min(32, vc.sparkSession.sparkContext.defaultParallelism))
    if pre_materialize:
        vc = vc.localCheckpoint(eager=True)
    ordered = (
        vc.repartitionByRange(
            n_part, *[F.col(k) for k in keys], F.col(value_col)
        )
        .sortWithinPartitions(*keys, value_col)
        .withColumn("__mii", F.monotonically_increasing_id())
        .withColumn("__pid", F.shiftright("__mii", 33).cast("long"))
        # the subtotal collect below and the returned frame BOTH read
        # this plan; repartitionByRange picks its boundaries by
        # sampling, so a re-evaluation could re-draw them and the
        # collected offsets would describe the wrong partitioning —
        # pin ONE materialization (table is distinct-values sized)
        .localCheckpoint(eager=True)
    )
    # per-partition subtotal + intra-partition running sum stay narrow;
    # only the ≤n_part·|by| subtotal rows are collected to build offsets
    part_tot = (
        ordered.groupBy("__pid", *keys)
        .agg(F.sum(count_col).alias("__tot"))
        .orderBy(*keys, "__pid")
        .collect()
    )
    offsets, accs = [], {}
    for r in part_tot:
        k = tuple(r[key] for key in keys)
        acc = accs.get(k, 0)
        offsets.append((r["__pid"], *k, acc))
        accs[k] = acc + r["__tot"]
    spark = vc.sparkSession
    off = (
        spark.createDataFrame(offsets, ["__pid", *keys, "__off"])
        if offsets
        else None
    )
    if off is None:
        return vc.withColumn("__before", F.lit(0).cast("long"))
    from pyspark.sql.window import Window

    # running sum WITHIN each range partition (and by-group): a
    # partitioned window, safe
    w = (
        Window.partitionBy("__pid", *keys)
        .orderBy(value_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        ordered.join(F.broadcast(off), ["__pid", *keys])
        .withColumn(
            "__before",
            (
                F.col("__off")
                + F.coalesce(F.sum(count_col).over(w), F.lit(0))
            ).cast("long"),
        )
        .drop("__mii", "__pid", "__off")
    )


def avg_ranks(
    df: DataFrame, value_col: str, *, out_col: str = "avg_rank"
) -> DataFrame:
    """``df`` with fractional (tie-averaged, 1-based) ranks of
    ``value_col`` appended as ``out_col``. Null values are excluded
    from ranking and dropped."""
    rows = df.filter(F.col(value_col).isNotNull())
    vc = rows.groupBy(value_col).agg(F.count(F.lit(1)).alias("__cnt"))
    ranked = _prefix_sums(vc, value_col, "__cnt").select(
        value_col,
        (
            F.col("__before") + (F.col("__cnt") + F.lit(1)) / F.lit(2.0)
        ).alias(out_col),
    )
    return rows.join(ranked, value_col)


def spearman(
    df: DataFrame,
    pairs: Sequence[tuple[str, str]],
    *,
    dropna: str = "pairwise",
    round_decimals: int = 6,
) -> DataFrame:
    """Spearman rank correlation for each (x, y) column pair: one row
    per pair — ``col_x, col_y, spearman``.

    ``dropna='pairwise'`` (default, the standard convention): each
    pair ranks over ITS null-complete subset — one ranking job per
    (pair, column). ``dropna='listwise'``: rows with a null in ANY
    involved column drop once, and each unique column is ranked ONCE
    over the shared population and reused across its pairs — on
    null-free data (enforced fact tables) the results are identical.
    When every ranked column shares one dtype (the usual fact-table
    case) the columns are additionally UNPIVOTED to (col, value) rows
    and all of them rank in a SINGLE ``_prefix_sums`` pass keyed by
    column name — ONE ranking job total instead of one per column (the
    gate's 3-pair profile: 6 → 4 → 1); mixed-dtype column sets fall
    back to one pass per column (stacking would cast, and a lossy cast
    can merge distinct values into one tie)."""
    if not pairs:
        raise ValueError("no column pairs")
    if dropna not in ("pairwise", "listwise"):
        raise ValueError(f"unknown dropna mode {dropna!r}")
    outs = []
    if dropna == "listwise":
        cols = sorted({c for p in pairs for c in p})
        cond = F.lit(True)
        for c in cols:
            cond = cond & F.col(c).isNotNull()
        sub = df.filter(cond).select(*cols)
        # each column's (value → rank) map builds from the BASE frame
        # (chaining avg_ranks would make map N's count aggregate
        # re-evaluate N−1 prior joins — measured 10.8 s vs 4 s at
        # sf0.1); the maps then join onto sub once each
        ranked = sub
        dtypes = dict(df.dtypes)
        if len({dtypes[c] for c in cols}) == 1:
            # same-dtype stack: one count shuffle + one range pass ranks
            # every column; the per-column maps below are filters over
            # the one checkpointed domain table, not new jobs
            stacked = sub.select(
                F.explode(
                    F.array(
                        *[
                            F.struct(
                                F.lit(c).alias("__col"),
                                F.col(c).alias("__val"),
                            )
                            for c in cols
                        ]
                    )
                ).alias("s")
            ).select("s.__col", "s.__val")
            vc = stacked.groupBy("__col", "__val").agg(
                F.count(F.lit(1)).alias("__cnt")
            )
            dom = _prefix_sums(
                vc, "__val", "__cnt", by="__col", pre_materialize=True
            ).select(
                "__col",
                "__val",
                (
                    F.col("__before") + (F.col("__cnt") + F.lit(1)) / F.lit(2.0)
                ).alias("__r"),
            )
            for c in cols:
                m = dom.filter(F.col("__col") == c).select(
                    F.col("__val").alias(c), F.col("__r").alias(f"__r_{c}")
                )
                ranked = ranked.join(m, c)
        else:
            for c in cols:
                vc = sub.groupBy(c).agg(F.count(F.lit(1)).alias("__cnt"))
                m = _prefix_sums(vc, c, "__cnt").select(
                    c,
                    (
                        F.col("__before")
                        + (F.col("__cnt") + F.lit(1)) / F.lit(2.0)
                    ).alias(f"__r_{c}"),
                )
                ranked = ranked.join(m, c)
        # ALL pair correlations in ONE aggregation job over the joined
        # frame (corr is algebraic — every pair's moments accumulate in
        # the same map-side pass), then the 1-row result inlines to one
        # row per pair. One consumer ⇒ no persist needed; the previous
        # per-pair agg loop paid a persist materialization plus
        # |pairs|−1 extra scans of it.
        one = ranked.agg(
            *[
                F.round(F.corr(f"__r_{x}", f"__r_{y}"), round_decimals).alias(
                    f"__c{i}"
                )
                for i, (x, y) in enumerate(pairs)
            ]
        )
        return one.select(
            F.inline(
                F.array(
                    *[
                        F.struct(
                            F.lit(x).alias("col_x"),
                            F.lit(y).alias("col_y"),
                            F.col(f"__c{i}").alias("spearman"),
                        )
                        for i, (x, y) in enumerate(pairs)
                    ]
                )
            )
        )
    else:
        for x, y in pairs:
            sub = df.filter(
                F.col(x).isNotNull() & F.col(y).isNotNull()
            ).select(x, y)
            rx = avg_ranks(sub, x, out_col="__rx")
            rxy = avg_ranks(rx, y, out_col="__ry")
            outs.append(
                rxy.agg(
                    F.lit(x).alias("col_x"),
                    F.lit(y).alias("col_y"),
                    F.round(F.corr("__rx", "__ry"), round_decimals).alias(
                        "spearman"
                    ),
                )
            )
    res = outs[0]
    for o in outs[1:]:
        res = res.unionAll(o)
    return res


def group_percentile_rank(
    df: DataFrame,
    value_col: str,
    *,
    group_col: str,
    out_col: str = "pct_rank",
    round_decimals: int = 6,
) -> DataFrame:
    """Within-group percentile rank (``cume_dist`` semantics: fraction
    of the group's rows with value ≤ this row's value) — the quantile
    normalization that makes per-source quality thresholds comparable
    ("keep each source's top 30%" instead of one global cutoff that a
    verbose source dominates).

    Scale: NO per-row window. One (group, value) count aggregate, an
    inclusive prefix sum over each group's VALUE DOMAIN (window
    partitioned by group over count rows), and one value-keyed join
    back — the same shape as ``inequality.gini``. Ties share the
    inclusive rank, exactly like ``cume_dist``. Nulls are dropped.
    """
    from pyspark.sql.window import Window

    base = df.filter(F.col(value_col).isNotNull())
    counts = base.groupBy(group_col, value_col).agg(
        F.count(F.lit(1)).alias("__c")
    )
    w = (
        Window.partitionBy(group_col)
        .orderBy(value_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    totals = counts.groupBy(group_col).agg(F.sum("__c").alias("__n"))
    ranked = (
        counts.withColumn("__le", F.sum("__c").over(w))
        .join(totals, group_col)
        .select(
            group_col,
            value_col,
            F.round(F.col("__le") / F.col("__n"), round_decimals).alias(
                out_col
            ),
        )
    )
    return base.join(ranked, [group_col, value_col])


def quantile_normalize(
    df: DataFrame,
    value_col: str,
    *,
    group_col: str,
    out_col: str = "qnorm",
    round_decimals: int = 6,
) -> DataFrame:
    """Quantile normalization: replace each value with the POOLED
    empirical quantile at its within-group fractional rank, so every
    group's distribution becomes (a resampling of) the pooled one —
    the batch-effect remover that makes per-source quality/length
    features comparable when sources have systematically different
    scales (microarray lineage, Bolstad 2003).

    Mapping: within group g, a value with tie-averaged rank r̄ out of
    n_g maps to fraction f = (r̄ − 1)/(n_g − 1) (singleton groups map
    to f = 0.5), and the output is the pooled DISCRETE quantile: the
    smallest pooled value whose inclusive cumulative fraction ≥ f.

    Scale: everything runs on VALUE-DOMAIN tables. Per-group ranks
    come from (group, value) counts + a group-partitioned prefix sum;
    the pooled CDF is a window over pooled DISTINCT values (the
    ks_drift grid discipline); the fraction→quantile lookup is a
    forward as-of over the UNION of the two domain tables (one
    domain-sized unpartitioned window, bounded by distinct values,
    never rows); rows join the mapping back by (group, value).
    """
    from pyspark.sql.window import Window

    base = df.filter(F.col(value_col).isNotNull())
    counts = base.groupBy(group_col, value_col).agg(
        F.count(F.lit(1)).alias("__c")
    )
    wg = (
        Window.partitionBy(group_col)
        .orderBy(value_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    totals = counts.groupBy(group_col).agg(F.sum("__c").alias("__n"))
    gv = (
        counts.withColumn(
            "__r", F.coalesce(F.sum("__c").over(wg), F.lit(0)) + (F.col("__c") + 1) / 2.0
        )
        .join(totals, group_col)
        .select(
            group_col,
            value_col,
            F.coalesce(
                F.try_divide(F.col("__r") - 1, F.col("__n") - 1), F.lit(0.5)
            ).alias("__f"),
        )
    )
    pooled = base.groupBy(value_col).agg(F.count(F.lit(1)).alias("__pc"))
    n_pool = pooled.agg(F.sum("__pc").alias("__np"))
    wp = Window.orderBy(value_col).rowsBetween(
        Window.unboundedPreceding, 0
    )
    pooled_cdf = (
        pooled.withColumn("__le", F.sum("__pc").over(wp))
        .join(F.broadcast(n_pool))
        .select(
            F.col(value_col).cast("double").alias("__pv"),
            (F.col("__le") / F.col("__np")).alias("__frac"),
        )
    )
    # forward as-of on the union: at each query fraction, the first
    # pooled value at-or-after it. Query rows sort BEFORE pooled rows
    # at equal fraction so an exact hit maps to itself.
    q_rows = gv.select(
        F.col("__f").alias("__frac"),
        F.lit(0).alias("__tag"),
        F.lit(None).cast("double").alias("__pv"),
        group_col,
        value_col,
    )
    p_rows = pooled_cdf.select(
        "__frac",
        F.lit(1).alias("__tag"),
        "__pv",
        F.lit(None).alias(group_col),
        F.lit(None).cast(dict(df.dtypes)[value_col]).alias(value_col),
    )
    w_fwd = Window.orderBy("__frac", "__tag").rowsBetween(
        Window.currentRow, Window.unboundedFollowing
    )
    mapping = (
        q_rows.unionByName(p_rows)
        .withColumn(
            "__q", F.first("__pv", ignorenulls=True).over(w_fwd)
        )
        .filter(F.col("__tag") == 0)
        .select(
            group_col,
            value_col,
            F.round("__q", round_decimals).alias(out_col),
        )
    )
    return base.join(mapping, [group_col, value_col])


def group_percentiles(
    df: DataFrame,
    value_col: str,
    percentiles: Sequence[float],
    *,
    group_col: str,
    round_decimals: int = 6,
) -> DataFrame:
    """EXACT interpolated percentiles per group WITHOUT buffering
    (``F.percentile`` materializes every value of a group in one
    aggregation buffer — the hidden OOM when a group holds billions of
    rows; ``approx_percentile`` trades exactness away). This is the
    third tier: exact values from the (group, value) COUNT table.

    Method: value v covers sorted positions [before, before+cnt−1]
    (exclusive prefix sums over each group's value domain); percentile
    p needs positions ⌊h⌋ and ⌈h⌉ with h = (n−1)·p, each resolved by a
    backward as-of against the 'before' offsets (union + one
    group-partitioned window over domain+query rows), then linear
    interpolation — identical to quantile_cont / percentile().

    Output: one row per (group, percentile): ``group, p, value``.
    """
    from pyspark.sql.window import Window

    ps = sorted(set(float(p) for p in percentiles))
    if not ps or any(not (0 <= p <= 1) for p in ps):
        raise ValueError(f"percentiles must be in [0,1]: {percentiles}")
    base = df.filter(F.col(value_col).isNotNull())
    counts = base.groupBy(group_col, value_col).agg(
        F.count(F.lit(1)).alias("__c")
    )
    wg = (
        Window.partitionBy(group_col)
        .orderBy(value_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    dom = counts.withColumn(
        "__before", F.coalesce(F.sum("__c").over(wg), F.lit(0))
    )
    totals = counts.groupBy(group_col).agg(F.sum("__c").alias("__n"))
    # query rows: for each (group, p) the two integer positions + frac
    pdf = totals.select(
        group_col,
        "__n",
        F.explode(F.array(*[F.lit(p) for p in ps])).alias("p"),
    ).select(
        group_col,
        "p",
        ((F.col("__n") - 1) * F.col("p")).alias("__h"),
    )
    q = pdf.select(
        group_col,
        "p",
        "__h",
        F.explode(
            F.array_distinct(
                F.array(F.floor("__h").cast("long"), F.ceil("__h").cast("long"))
            )
        ).alias("__pos"),
    )
    # backward as-of: the domain row covering __pos is the one with the
    # greatest __before ≤ __pos (ranges partition the position space)
    d_rows = dom.select(
        group_col,
        F.col("__before").cast("long").alias("__pos"),
        F.lit(0).alias("__tag"),
        F.col(value_col).cast("double").alias("__v"),
        F.lit(None).cast("double").alias("p"),
        F.lit(None).cast("double").alias("__h"),
    )
    q_rows = q.select(
        group_col,
        "__pos",
        F.lit(1).alias("__tag"),
        F.lit(None).cast("double").alias("__v"),
        "p",
        "__h",
    )
    w_back = (
        Window.partitionBy(group_col)
        .orderBy("__pos", "__tag")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    resolved = (
        d_rows.unionByName(q_rows)
        .withColumn("__val", F.last("__v", ignorenulls=True).over(w_back))
        .filter(F.col("__tag") == 1)
        .select(group_col, "p", "__h", "__pos", "__val")
    )
    # one row per (group,p) when h is integral, two otherwise — fold
    # the pair back with interpolation
    agg = resolved.groupBy(group_col, "p").agg(
        F.max("__h").alias("__h"),
        F.min_by("__val", "__pos").alias("__lo"),
        F.max_by("__val", "__pos").alias("__hi"),
    )
    frac = F.col("__h") - F.floor("__h")
    return agg.select(
        group_col,
        "p",
        F.round(
            F.col("__lo") + frac * (F.col("__hi") - F.col("__lo")),
            round_decimals,
        ).alias("value"),
    )


def weighted_percentiles(
    df: DataFrame,
    value_col: str,
    weight_col: str,
    percentiles: Sequence[float],
    *,
    group_col: str,
    round_decimals: int = 6,
) -> DataFrame:
    """WEIGHTED discrete percentiles per group: the smallest value
    whose cumulative WEIGHT reaches p·W — "the NLL cutoff that keeps
    the best 60% of TOKENS (not documents)", the knob a token-budgeted
    quality filter actually needs (doc-level percentiles over-weight
    short docs).

    Same count-table discipline as ``group_percentiles``: one
    (group, value) weight-sum aggregate, a group-partitioned inclusive
    prefix sum over each group's value domain, and one threshold pick
    per (group, p) — no per-row buffering, no sort of the data. Rows
    with null/non-positive weight are dropped.

    Output: one row per (group, p): ``group, p, value``.
    """
    from pyspark.sql.window import Window

    ps = sorted(set(float(p) for p in percentiles))
    if not ps or any(not (0 < p <= 1) for p in ps):
        raise ValueError(
            f"percentiles must be in (0,1] for the discrete rule: {percentiles}"
        )
    base = df.filter(
        F.col(value_col).isNotNull()
        & F.col(weight_col).isNotNull()
        & (F.col(weight_col).cast("double") > 0)
    )
    wsum = base.groupBy(group_col, value_col).agg(
        F.sum(F.col(weight_col).cast("double")).alias("__w")
    )
    wg = (
        Window.partitionBy(group_col)
        .orderBy(value_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    totals = wsum.groupBy(group_col).agg(F.sum("__w").alias("__tw"))
    cum = wsum.withColumn("__cw", F.sum("__w").over(wg))
    qs = totals.select(
        group_col,
        "__tw",
        F.explode(F.array(*[F.lit(p) for p in ps])).alias("p"),
    )
    # smallest value with cum weight >= p*W: per (group,p), min value
    # among qualifying domain rows — a join on the value-domain table
    hit = (
        qs.join(cum, group_col)
        .filter(F.col("__cw") >= F.col("p") * F.col("__tw"))
        .groupBy(group_col, "p")
        .agg(F.min(value_col).alias("value"))
    )
    return hit.select(
        group_col,
        "p",
        F.round(F.col("value").cast("double"), round_decimals).alias("value"),
    )
