"""One-pass table profiling: the data-quality report every pipeline
runs before trusting an input (row/null/distinct counts, ranges, means
per column).

Scale shape: ONE aggregate job for the whole report — every statistic
for every column lives in a single ``agg`` (partial-aggregatable, one
shuffle of a single combined row per partition). Exact distincts use
Spark's multi-count-distinct EXPAND plan (one pass, rows × profiled
columns — exact but the expensive mode); ``approx=True`` switches to
HLL++ (``approx_count_distinct``) which keeps the pass cheap at any
cardinality — the same exact/approx pairing as
``events_distinct_users`` / ``approx_distinct_users``.

The report itself is ≤ #columns rows, so it is assembled driver-side
from the one collected aggregate row — bounded like every other
driver-side artifact in this repo (centroids, quotas, offsets).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    ByteType,
    DecimalType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    MapType,
    ShortType,
    StructType,
)

_NUMERIC = (
    ByteType, ShortType, IntegerType, LongType, FloatType, DoubleType,
    DecimalType,
)


def profile_table(
    df: DataFrame,
    columns: list[str] | None = None,
    *,
    approx: bool = False,
    rsd: float = 0.05,
) -> DataFrame:
    """Per-column profile: ``column, dtype, n_rows, n_nulls, n_distinct,
    min_str, max_str, min_num, max_num, mean``.

    ``min_str``/``max_str`` are engine-formatted strings (any orderable
    type); ``min_num``/``max_num``/``mean`` are doubles, NULL for
    non-numeric columns — gates compare the numeric forms (string
    formatting of doubles is not a cross-engine contract). Unorderable
    columns (maps) report rows/nulls only, with NULL distinct/range —
    they must not abort the profile of every other column.
    """
    cols = columns or [f.name for f in df.schema.fields]
    types = {f.name: f.dataType for f in df.schema.fields}
    missing = [c for c in cols if c not in types]
    if missing:
        raise ValueError(f"profile_table: unknown columns {missing}")
    # A map ANYWHERE in the type tree (map, array<map>, struct with a
    # map field) makes the column unorderable and not
    # count-distinct-able in Spark: one such column would abort the
    # WHOLE aggregate — profile it with rows/nulls only instead of
    # poisoning the report for every column
    def _has_map(dt) -> bool:
        if isinstance(dt, MapType):
            return True
        if isinstance(dt, ArrayType):
            return _has_map(dt.elementType)
        if isinstance(dt, StructType):
            return any(_has_map(f.dataType) for f in dt.fields)
        return False

    orderable = {c: not _has_map(types[c]) for c in cols}
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs.append(
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"__nn_{c}")
        )
        if orderable[c]:
            distinct = (
                F.approx_count_distinct(c, rsd) if approx else F.countDistinct(c)
            )
            aggs += [
                distinct.alias(f"__nd_{c}"),
                F.min(c).cast("string").alias(f"__mins_{c}"),
                F.max(c).cast("string").alias(f"__maxs_{c}"),
            ]
        if isinstance(types[c], _NUMERIC):
            aggs += [
                F.min(F.col(c).cast("double")).alias(f"__minn_{c}"),
                F.max(F.col(c).cast("double")).alias(f"__maxn_{c}"),
                F.avg(F.col(c).cast("double")).alias(f"__mean_{c}"),
            ]
    row = df.agg(*aggs).collect()[0]
    out = []
    for c in cols:
        numeric = isinstance(types[c], _NUMERIC)
        out.append(
            (
                c,
                types[c].simpleString(),
                int(row["__n"]),
                int(row[f"__nn_{c}"]),
                int(row[f"__nd_{c}"]) if orderable[c] else None,
                row[f"__mins_{c}"] if orderable[c] else None,
                row[f"__maxs_{c}"] if orderable[c] else None,
                float(row[f"__minn_{c}"]) if numeric and row[f"__minn_{c}"] is not None else None,
                float(row[f"__maxn_{c}"]) if numeric and row[f"__maxn_{c}"] is not None else None,
                float(row[f"__mean_{c}"]) if numeric and row[f"__mean_{c}"] is not None else None,
            )
        )
    return df.sparkSession.createDataFrame(
        out,
        "column string, dtype string, n_rows long, n_nulls long, "
        "n_distinct long, min_str string, max_str string, "
        "min_num double, max_num double, mean double",
    )


def benford(
    df: DataFrame,
    value_col: str,
    *,
    round_decimals: int = 6,
) -> DataFrame:
    """Benford's-law conformance of ``value_col``'s first significant
    digits — the classic fabricated-/truncated-data smell test for a
    column that spans several orders of magnitude (amounts, counts,
    file sizes).

    One row per digit 1..9: ``digit, n, observed, expected,
    chi2_term`` where expected = log10(1 + 1/d) and chi2_term =
    n_total·(observed − expected)²/expected (summing the column gives
    the χ² statistic, 8 df). Non-positive and null values are dropped
    (they have no first significant digit).

    Scale: first-digit extraction is pure codegen arithmetic
    (d = ⌊x / 10^⌊log10 x⌋⌋ — no string formatting), then ONE
    9-group aggregate; the total joins back as a broadcast of one row.
    """
    x = F.col(value_col).cast("double")
    base = df.filter(x.isNotNull() & (x > 0)).select(
        F.floor(x / F.pow(F.lit(10.0), F.floor(F.log10(x))))
        .cast("int")
        .alias("digit")
    )
    counts = base.groupBy("digit").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    total = counts.agg(F.sum("n").cast("double").alias("__tot"))
    obs = F.col("n") / F.col("__tot")
    exp = F.log10(1 + 1 / F.col("digit").cast("double"))
    return (
        counts.join(F.broadcast(total))
        .select(
            "digit",
            "n",
            F.round(obs, round_decimals).alias("observed"),
            F.round(exp, round_decimals).alias("expected"),
            F.round(
                F.col("__tot") * (obs - exp) * (obs - exp) / exp,
                round_decimals,
            ).alias("chi2_term"),
        )
    )


def robust_zscores(
    df: DataFrame,
    value_col: str,
    *,
    group_col: str,
    threshold: "float | None" = None,
    round_decimals: int = 6,
    exact_int: bool = False,
) -> DataFrame:
    """Median/MAD robust z-scores per group — the outlier detector that
    heavy tails cannot recruit: rz = 0.6745·(x − median)/MAD (0.6745
    makes rz ≈ a classic z under normality; Iglewicz–Hoaglin). The
    mean/σ gate (`events_outliers`) masks outliers that inflate σ
    themselves; median and MAD have a 50% breakdown point.

    Two exact interpolated-percentile aggregates (group median, then
    the median absolute deviation) and two group-keyed joins — no
    window, no sort of the full data. rz is NULL when MAD = 0 (half
    the group identical). ``threshold`` filters to |rz| > threshold;
    None returns every scored row.

    ``exact_int``: for INTEGER values the interpolated median/MAD live
    on the half grid, so rz = 6745·(2x−2med) / (10⁴·2mad) is an exact
    rational and its true value can land EXACTLY on a 1e-6 midpoint —
    where engines rounding a last-ulp-different double (or the same
    double under different tie conventions) disagree. The exact path
    computes round-half-away-from-zero in pure integer arithmetic
    ((|num|·2 + den) div (2·den), sign reapplied), replayable
    bit-identically in any engine; rz is then num/10^round_decimals as
    one double division of exact integers. Headroom bound: |num| =
    6745·10⁶·|2x−2med| must fit int64, i.e. |x − median| ≤ ~6.8e8 per
    group — beyond that Spark's ANSI mode raises (and DuckDB errors on
    the BIGINT oracle side); pre-scale wider-range columns before the
    exact path.
    """
    base = df.filter(F.col(value_col).isNotNull())
    v = F.col(value_col).cast("double")
    med = base.groupBy(group_col).agg(
        F.percentile(v, F.lit(0.5)).alias("__med")
    )
    with_med = base.join(med, group_col)
    mad = with_med.groupBy(group_col).agg(
        F.percentile(
            F.abs(v - F.col("__med")), F.lit(0.5)
        ).alias("__mad")
    )
    if exact_int:
        pow10 = 10 ** int(round_decimals)
        out = (
            with_med.join(mad, group_col)
            .withColumn(
                "__num",
                F.lit(6745)
                * (
                    F.col(value_col).cast("long") * 2
                    - (F.col("__med") * 2).cast("long")
                )
                * F.lit(pow10),
            )
            .withColumn(
                "__den", F.lit(10**4) * (F.col("__mad") * 2).cast("long")
            )
            .withColumn(
                "rz",
                F.expr(
                    "CASE WHEN __den = 0 THEN NULL ELSE "
                    "(CASE WHEN __num < 0 THEN -1L ELSE 1L END) * "
                    "((abs(__num) * 2 + __den) div (2 * __den)) END"
                ).cast("double")
                / F.lit(float(pow10)),
            )
            .drop("__med", "__mad", "__num", "__den")
        )
    else:
        rz = F.round(
            F.lit(0.6745)
            * F.try_divide(v - F.col("__med"), F.col("__mad")),
            round_decimals,
        )
        out = with_med.join(mad, group_col).withColumn("rz", rz).drop(
            "__med", "__mad"
        )
    if threshold is not None:
        out = out.filter(F.abs(F.col("rz")) > threshold)
    return out


def trimmed_means(
    df: DataFrame,
    value_col: str,
    *,
    group_col: str,
    lower: float = 0.05,
    upper: float = 0.95,
    round_decimals: int = 6,
) -> DataFrame:
    """Per-group trimmed and winsorized means — the robust location
    estimates between `events_outliers`' mean (breakdown 0) and
    `robust_zscores`' median (efficiency loss under normality):

    - ``trimmed_mean``: mean of values strictly inside the
      [lower, upper] interpolated-percentile band (band ends included);
    - ``winsor_mean``: mean after CLAMPING values to the band.

    One exact percentile aggregate for the band, one broadcast-size
    join back, one aggregate — no sort of the data, no window.
    Output: group, n, trimmed_mean, winsor_mean.
    """
    if not (0 <= lower < upper <= 1):
        raise ValueError("need 0 <= lower < upper <= 1")
    base = df.filter(F.col(value_col).isNotNull())
    v = F.col(value_col).cast("double")
    band = base.groupBy(group_col).agg(
        F.percentile(v, F.lit(lower)).alias("__lo"),
        F.percentile(v, F.lit(upper)).alias("__hi"),
    )
    j = base.join(band, group_col)
    clamped = F.least(F.greatest(v, F.col("__lo")), F.col("__hi"))
    return j.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.round(
            F.avg(F.when((v >= F.col("__lo")) & (v <= F.col("__hi")), v)),
            round_decimals,
        ).alias("trimmed_mean"),
        F.round(F.avg(clamped), round_decimals).alias("winsor_mean"),
    )


def k_anonymity_report(
    df: DataFrame,
    quasi_cols: "list[str]",
    *,
    k: int = 5,
    round_decimals: int = 6,
) -> DataFrame:
    """Re-identification risk report over quasi-identifier columns: a
    row is k-anonymous when ≥ k rows share its full quasi-identifier
    combination. One row out: ``k, n_rows, n_groups, risky_groups,
    risky_rows, risky_frac`` (groups/rows below k). The release gate a
    governed corpus export runs before shipping — one groupBy over the
    quasi columns + a 1-row aggregate; nothing collected."""
    if not quasi_cols:
        raise ValueError("no quasi-identifier columns")
    g = df.groupBy(*quasi_cols).agg(F.count(F.lit(1)).alias("__c"))
    return g.agg(
        F.lit(k).cast("int").alias("k"),
        F.sum("__c").cast("long").alias("n_rows"),
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.count(F.when(F.col("__c") < k, 1)).cast("long").alias(
            "risky_groups"
        ),
        F.coalesce(
            F.sum(F.when(F.col("__c") < k, F.col("__c"))), F.lit(0)
        ).cast("long").alias("risky_rows"),
        F.round(
            F.coalesce(
                F.sum(F.when(F.col("__c") < k, F.col("__c"))), F.lit(0)
            )
            / F.sum("__c"),
            round_decimals,
        ).alias("risky_frac"),
    )


def zipf_fit(
    counts: DataFrame,
    term_col: str,
    count_col: str,
    *,
    top_n: int = 1000,
    round_decimals: int = 6,
) -> DataFrame:
    """Zipf's-law fit over a term-frequency table: OLS of log(freq) on
    log(rank) for the ``top_n`` most frequent terms — the corpus-health
    gauge (natural text sits near slope −1; a badly deduped or
    boilerplate-heavy crawl bends the curve) and the exponent behind
    unigram-table sizing decisions.

    Plan: TakeOrderedAndProject to the top_n (count DESC, term ASC —
    deterministic ties), then ranks via one row_number over the
    ALREADY-BOUNDED top_n rows (the post-limit bounded-window
    discipline, see pq.py), then a closed-form OLS aggregate.

    Output (1 row): ``n_terms, slope, intercept, r2``."""
    from pyspark.sql import Window

    if top_n < 3:
        raise ValueError("top_n must be >= 3")
    top = (
        counts.filter(F.col(count_col).isNotNull() & (F.col(count_col) > 0))
        .orderBy(F.desc(count_col), F.asc(term_col))
        .limit(top_n)
    )
    w = Window.orderBy(F.desc(count_col), F.asc(term_col))
    pts = top.withColumn("__r", F.row_number().over(w)).select(
        F.log(F.col("__r").cast("double")).alias("__x"),
        F.log(F.col(count_col).cast("double")).alias("__y"),
    )
    agg = pts.agg(
        F.count(F.lit(1)).alias("__n"),
        F.avg("__x").alias("__mx"),
        F.avg("__y").alias("__my"),
        F.covar_pop("__x", "__y").alias("__cxy"),
        F.var_pop("__x").alias("__vx"),
        F.var_pop("__y").alias("__vy"),
    )
    slope = F.try_divide(F.col("__cxy"), F.col("__vx"))
    r2 = F.try_divide(
        F.col("__cxy") * F.col("__cxy"), F.col("__vx") * F.col("__vy")
    )
    return agg.select(
        F.col("__n").cast("long").alias("n_terms"),
        F.round(slope, round_decimals).alias("slope"),
        F.round(
            F.col("__my") - slope * F.col("__mx"), round_decimals
        ).alias("intercept"),
        F.round(r2, round_decimals).alias("r2"),
    )


def l_diversity_report(
    df: DataFrame,
    quasi_cols: "list[str]",
    sensitive_col: str,
    *,
    l: int = 2,
    round_decimals: int = 6,
) -> DataFrame:
    """ℓ-diversity companion to ``k_anonymity_report`` (Machanavajjhala
    2007, public knowledge): k-anonymity alone fails when an entire
    quasi-group shares ONE sensitive value (the homogeneity attack — an
    attacker who locates the group learns the secret without
    re-identifying anyone). A group is ℓ-diverse when its rows span ≥ ℓ
    DISTINCT sensitive values.

    One (quasi, sensitive) count aggregate folded to per-group distinct
    counts, then a 1-row report: ``l, n_rows, n_groups, weak_groups,
    weak_rows, weak_frac`` (groups/rows below ℓ)."""
    if not quasi_cols:
        raise ValueError("no quasi-identifier columns")
    if l < 1:
        raise ValueError("l must be >= 1")
    gs = df.groupBy(*quasi_cols, sensitive_col).agg(
        F.count(F.lit(1)).alias("__c")
    )
    g = gs.groupBy(*quasi_cols).agg(
        F.sum("__c").alias("__n"), F.count(F.lit(1)).alias("__d")
    )
    return g.agg(
        F.lit(l).cast("int").alias("l"),
        F.sum("__n").cast("long").alias("n_rows"),
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.count(F.when(F.col("__d") < l, 1)).cast("long").alias(
            "weak_groups"
        ),
        F.coalesce(
            F.sum(F.when(F.col("__d") < l, F.col("__n"))), F.lit(0)
        ).cast("long").alias("weak_rows"),
        F.round(
            F.coalesce(
                F.sum(F.when(F.col("__d") < l, F.col("__n"))), F.lit(0)
            )
            / F.sum("__n"),
            round_decimals,
        ).alias("weak_frac"),
    )


def burstiness(
    events: DataFrame,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    order_cols: "tuple[str, ...]" = ("event_id",),
    min_gaps: int = 2,
    round_decimals: int = 6,
) -> DataFrame:
    """Per-key burstiness of the inter-event time distribution
    (Goh & Barabási 2008): B = (σ−μ)/(σ+μ) over consecutive gaps —
    −1 = perfectly periodic, 0 = Poisson, →1 = bursty. The behavioral
    fingerprint that separates bots/schedulers (periodic) from humans
    (bursty) in event-log triage.

    Gaps are integer epoch-microseconds (timestamp arithmetic differs
    in precision across engines); ties at identical timestamps break on
    ``order_cols``. Keys with fewer than ``min_gaps`` gaps (need ≥2 for
    a sample σ) are dropped.

    Output: ``key_col, n_gaps, mean_gap_us (whole µs), b`` — b NULL for σ+μ = 0
    (all gaps zero). Moments are order-independent (exact long Σgap,
    decimal-summed Σgap²), so the result replays across engines.

    Scale: one lag window PARTITIONED by the key + one groupBy(key);
    nothing global.
    """
    from pyspark.sql import Window as W

    w = W.partitionBy(key_col).orderBy(ts_col, *order_cols)
    gaps = (
        events.filter(F.col(ts_col).isNotNull())
        .select(
            key_col,
            (
                F.unix_micros(F.col(ts_col))
                - F.lag(F.unix_micros(F.col(ts_col))).over(w)
            ).alias("__gap"),
        )
        .filter(F.col("__gap").isNotNull())
    )
    # order-independent moments: Σgap is an exact LONG, Σgap² an exact
    # DECIMAL sum of per-row-rounded double squares (the
    # nation_trade_volume discipline) — a float avg/stddev over
    # µs-magnitude gaps reorders across engines past the 6-dp grid
    agg = gaps.groupBy(key_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_gaps"),
        F.sum("__gap").cast("long").alias("__sg"),
        F.sum(
            (F.col("__gap").cast("double") * F.col("__gap").cast("double"))
            .cast("decimal(38,6)")
        ).cast("double").alias("__sq"),
    ).filter(F.col("n_gaps") >= min_gaps)
    n = F.col("n_gaps").cast("double")
    sg = F.col("__sg").cast("double")  # < 2^53; long*long would overflow
    mu = sg / n
    var = (F.col("__sq") - sg * sg / n) / (n - 1)
    sd = F.sqrt(F.greatest(var, F.lit(0.0)))
    return agg.select(
        key_col,
        "n_gaps",
        # whole µs (floor): a double at 1e10 magnitude cannot carry
        # decimal places, and round()'s nearest-double differs across
        # engines in the last ulp there — the integer is exact
        F.expr("__sg div n_gaps").alias("mean_gap_us"),
        F.round(
            F.try_divide(sd - mu, sd + mu), round_decimals
        ).alias("b"),
    )


def heaps_fit(
    doc_tokens: DataFrame,
    doc_col: str,
    token_col: str,
    *,
    step: int,
    round_decimals: int = 6,
) -> DataFrame:
    """Heaps'-law fit of vocabulary growth (Heaps 1978): V(N) ≈ K·N^β —
    the vocab-vs-corpus-size exponent behind tokenizer-vocab and
    dedup-budget sizing (natural text: β ≈ 0.4–0.6; β near 1 means the
    stream keeps minting new types — OCR noise or ids; β near 0 means a
    saturated/templated corpus). The companion to ``zipf_fit`` (the two
    exponents are duals).

    Checkpoints are STEP-buckets of the doc-id order: bucket b holds
    docs with ⌊doc/step⌋ = b; after bucket b the corpus has
    N_b = Σ tokens and V_b = Σ first-occurrences in buckets ≤ b. OLS of
    ln V on ln N over the checkpoints.

    Scale shape: token totals and first-occurrence counts reduce to ONE
    bucket-domain table each (groupBy(token) → min(doc) for first
    occurrences — the corpus-sized reduction; everything after is
    bucket-domain), prefixes come from a buckets² self-join (checkpoint
    count is user-bounded, never row-bounded), and the OLS is one
    moment aggregate over ≤ #buckets points.

    Output (1 row): ``n_checkpoints, total_tokens, vocab, heaps_beta,
    heaps_k, r2``.
    """
    if step < 1:
        raise ValueError("heaps_fit: step must be >= 1")
    # integer div, not (x / step).cast(long): the double-precision path
    # misbuckets ids above 2^53, and div's truncate-toward-zero matches
    # DuckDB's // on negative ids exactly
    base = doc_tokens.select(
        F.expr(f"CAST({doc_col} AS LONG) div {int(step)}L").alias("__b"),
        F.col(doc_col).cast("long").alias("__doc"),
        F.col(token_col).alias("__tok"),
    ).filter(F.col("__tok").isNotNull())
    tok_per_bucket = base.groupBy("__b").agg(
        F.count(F.lit(1)).cast("long").alias("__nt")
    )
    first_occ = base.groupBy("__tok").agg(F.min("__doc").alias("__fd"))
    new_per_bucket = first_occ.groupBy(
        F.expr(f"__fd div {int(step)}L").alias("__b")
    ).agg(F.count(F.lit(1)).cast("long").alias("__nv"))
    # persisted: the bucket-domain table (≤ max_doc/step rows) feeds
    # BOTH sides of the prefix self-join below — without the persist
    # each side re-ran the corpus-sized token / first-occurrence
    # reductions (r13 opt; release via ``cache_scope``)
    from weaviate_txtai_spark.cache import scoped_persist

    # EAGER: both self-join sides fan out as concurrent stages of one
    # action and raced the unfilled cache on the lazy shape — each racer
    # a full corpus reduction (1.0 s@32c vs 0.7 s@8c, driver r13;
    # r14 opt)
    per_bucket = scoped_persist(
        tok_per_bucket.join(new_per_bucket, "__b", "left").select(
            "__b", "__nt", F.coalesce("__nv", F.lit(0)).alias("__nv")
        ),
        eager=True,
    )
    a, b = per_bucket.alias("a"), per_bucket.alias("b")
    ckpt = (
        a.join(b, F.col("b.__b") <= F.col("a.__b"))
        .groupBy(F.col("a.__b").alias("__b"))
        .agg(
            F.sum("b.__nt").cast("long").alias("__N"),
            F.sum("b.__nv").cast("long").alias("__V"),
        )
        .filter((F.col("__N") > 0) & (F.col("__V") > 0))
    )
    pts = ckpt.coalesce(1).select(
        F.log(F.col("__N").cast("double")).alias("__x"),
        F.log(F.col("__V").cast("double")).alias("__y"),
        "__N", "__V", "__b",
    )
    agg = pts.agg(
        F.count(F.lit(1)).cast("long").alias("n_checkpoints"),
        F.max("__N").alias("total_tokens"),
        F.max("__V").alias("vocab"),
        F.avg("__x").alias("__mx"),
        F.avg("__y").alias("__my"),
        F.covar_pop("__x", "__y").alias("__cxy"),
        F.var_pop("__x").alias("__vx"),
        F.var_pop("__y").alias("__vy"),
    )
    slope = F.try_divide(F.col("__cxy"), F.col("__vx"))
    r2 = F.try_divide(
        F.col("__cxy") * F.col("__cxy"), F.col("__vx") * F.col("__vy")
    )
    return agg.select(
        "n_checkpoints",
        "total_tokens",
        "vocab",
        F.round(slope, round_decimals).alias("heaps_beta"),
        F.round(
            F.exp(F.col("__my") - slope * F.col("__mx")), round_decimals
        ).alias("heaps_k"),
        F.round(r2, round_decimals).alias("r2"),
    )
