"""Deterministic dataset splitting / sampling for training pipelines.

``randomSplit``/``sample`` are partitioning-dependent (reshuffling the
input changes which rows land where), which is unacceptable for a
reproducible 100 TB pipeline: the split must be a pure function of the
row's identity. The standard fix is multiplicative (Knuth/Fibonacci)
hashing of a stable id into [0, 1) — identical results on any engine,
any partitioning, any day, and fully expressible in ANSI SQL for the
DuckDB oracle (unlike xxhash64/rand, whose implementations differ
between engines).

Not cryptographic — fine for splits, wrong for adversarial sampling.
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F

# Knuth's multiplicative hash constant: floor(2^32 / phi), coprime to 2^32.
_KNUTH = 2654435761
_MOD = 4294967296  # 2^32


def _c(x) -> Column:
    return F.col(x) if isinstance(x, str) else x


def split_fraction(id_col) -> Column:
    """Deterministic uniform-ish fraction in [0, 1) from an integer id.

    Computed as a split modular multiply (hi·2^16 and lo halves, each
    product reduced mod 2^32 before recombining) so it never leaves
    int64 for ANY long id — dense ids past 3.4e9 rows or hash-shaped
    ids near 2^63 would otherwise kill the job with ANSI
    ARITHMETIC_OVERFLOW (on by default in Spark 4). Value-identical to
    the naive ``pmod(id * K, 2^32)`` wherever that didn't overflow, so
    existing assignments and oracles are unchanged.
    """
    return knuth_term(id_col) / F.lit(float(_MOD))


def knuth_term(id_col) -> Column:
    """The integer multiplicative-hash term ``(id · K) mod 2^32`` via
    the same overflow-safe split multiply as :func:`split_fraction`
    (never leaves int64 for ANY long id — the naive product dies under
    ANSI at id ≥ ~3.47e9). Exposed for call sites that consume the
    integer (parity bits, bucketing) rather than the fraction."""
    folded = F.pmod(_c(id_col), F.lit(_MOD))
    hi = F.floor(folded / F.lit(65536))
    lo = folded - hi * F.lit(65536)
    return F.pmod(
        F.pmod(hi * F.lit(_KNUTH), F.lit(_MOD)) * F.lit(65536)
        + lo * F.lit(_KNUTH),
        F.lit(_MOD),
    )


def assign_split(
    id_col,
    *,
    train: float = 0.8,
    valid: float = 0.1,
) -> Column:
    """'train' / 'valid' / 'test' label from the deterministic fraction.

    Fractions are [0,train) / [train,train+valid) / rest — every row gets
    exactly one label, and re-running on re-partitioned (or re-ingested,
    same-id) data reproduces the same assignment.
    """
    f = split_fraction(id_col)
    return (
        F.when(f < train, F.lit("train"))
        .when(f < train + valid, F.lit("valid"))
        .otherwise(F.lit("test"))
    )


def quantile_buckets(
    df,
    value_col: str,
    *,
    n_buckets: int = 10,
    accuracy: int = 10000,
    bucket_col: str = "bucket",
):
    """Equi-depth bucketing without a global sort (the scale path for
    ntile): boundaries from the Greenwald-Khanna sketch (one mergeable
    partial-agg pass), then a broadcast of n-1 doubles and a codegen'd
    count-of-boundaries-below per row — map-only assignment. Bucket ids
    are 1..n_buckets; sizes deviate from n/n_buckets only by the sketch
    error. Used by the approx_value_deciles gate query; tested there
    and in tests/test_sketches.py."""
    probs = [i / n_buckets for i in range(1, n_buckets)]
    bounds = df.agg(
        F.percentile_approx(value_col, probs, accuracy).alias("__bounds")
    )
    bucket = F.lit(1) + F.aggregate(
        F.filter("__bounds", lambda b: b < F.col(value_col)),
        F.lit(0),
        lambda acc, _: acc + 1,
    )
    return (
        df.crossJoin(F.broadcast(bounds))
        .withColumn(bucket_col, bucket.cast("int"))
        .drop("__bounds")
    )


class ExactNtileScaleWarning(UserWarning):
    """Emitted when exact_ntile runs over more rows than its threshold —
    the global-order window is a single-partition sort."""


def exact_ntile(
    df,
    n_buckets: int,
    *order_cols,
    bucket_col: str = "bucket",
    warn_rows: int | None = 10_000_000,
):
    """Exact equi-depth bucketing (``ntile``) over a GLOBAL order.

    A global-order window has no partition key: every row funnels
    through ONE sort task, the single window shape that does not scale
    by partitioning (VERDICT r2 item 6). This helper is the documented
    front door for that plan — it probes the input with a bounded
    ``limit(warn_rows + 1)`` scan (never a full count) and emits
    ``ExactNtileScaleWarning`` above the threshold, pointing to
    ``quantile_buckets`` (sketch boundaries + broadcast assignment, the
    same histogram without the global sort; bucket sizes off by only
    the sketch error). Pass ``warn_rows=None`` to opt out of the probe
    when the caller knows the input is small.

    ``order_cols`` must end in a unique key (an id): ``ntile`` under
    order ties assigns buckets by physical row order, which Spark does
    not define across partitionings (r13 window-order census).
    """
    import warnings

    from pyspark.sql import Window

    # probe on a 1-column projection: GlobalLimit funnels up to
    # warn_rows+1 rows per input partition into one task, so strip the
    # payload columns before they ride that shuffle
    probe = df.select(F.lit(1).alias("__one")) if warn_rows is not None else None
    if warn_rows is not None and probe.limit(int(warn_rows) + 1).count() > warn_rows:
        warnings.warn(
            f"exact_ntile over more than {warn_rows:,} rows plans as a "
            "single-partition global sort; use quantile_buckets "
            "(approx_value_deciles' path) for the same equi-depth "
            "histogram without the scale cliff",
            ExactNtileScaleWarning,
            stacklevel=2,
        )
    w = Window.orderBy(*order_cols)
    return df.withColumn(bucket_col, F.ntile(int(n_buckets)).over(w))


def mixture_quotas(
    counts: dict[str, int], weights: dict[str, float]
) -> dict[str, int]:
    """Largest exact-count mixture achievable from the available strata.

    Given per-stratum row counts and target proportions, the binding
    stratum is the one that runs out first: λ = min_s(n_s / w_s), and
    each stratum contributes floor(λ·w_s) rows (≤ n_s by construction).
    Flooring can leave the realized mix a row short of the exact ratio —
    the standard largest-feasible-mixture rule (how data-mixture specs
    like "50% web / 30% books / 20% code" are materialized when one
    source is the bottleneck). Pure driver-side arithmetic on ≤|strata|
    numbers.
    """
    if not weights:
        raise ValueError("mixture_quotas: empty weights")
    bad = {s: w for s, w in weights.items() if w <= 0}
    if bad:
        raise ValueError(f"mixture_quotas: non-positive weights: {bad}")
    missing = sorted(set(weights) - set(counts))
    if missing:
        raise ValueError(f"mixture_quotas: strata absent from data: {missing}")
    lam = min(counts[s] / w for s, w in weights.items())
    return {s: int(math.floor(lam * w)) for s, w in weights.items()}


def mixture_sample(
    df,
    weights: dict[str, float],
    *,
    strata_col: str = "source",
    id_col: str = "doc_id",
    exact: bool = True,
):
    """Deterministic data-mixture sampling: draw rows so the kept set
    follows the target per-stratum proportions, reproducibly.

    Selection within a stratum is by ascending deterministic fraction
    (``split_fraction``) with the id as tie-break — a pure function of
    row identity, so re-partitioning, re-ingesting, or re-running yields
    the SAME sample, and the sample NESTS: raising a stratum's quota
    keeps every previously chosen row (the fraction order is a fixed
    permutation per stratum). Strata not in ``weights`` are excluded.

    exact=True: quota per stratum via :func:`mixture_quotas` (one
    ≤|strata|-row count collect), then a rank-within-stratum window —
    exact counts, but each stratum sorts within its window partition;
    fine while every stratum fits a task's spill budget.
    exact=False: the scale path — keep rows with fraction < quota/n,
    a MAP-ONLY filter with binomial (not exact) per-stratum counts;
    the same trade ``quantile_buckets`` makes vs ``exact_ntile``.

    Rows with a NULL id have no identity to hash — their fraction is
    NULL, which would sort FIRST in the selection order and win every
    draw — so they are excluded (same contract as weighted_sample_k's
    zero-weight filter). Driver-side state is ≤|strata| numbers either
    way — never row data.
    """
    from pyspark.sql import Window

    in_scope = df.filter(
        _c(strata_col).isin(list(weights)) & _c(id_col).isNotNull()
    )
    counts = {
        r[0]: r[1]
        for r in in_scope.groupBy(strata_col)
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    # strata with zero rows surface as absent keys -> mixture_quotas
    # raises its explicit absent-stratum error
    quotas = mixture_quotas({s: n for s, n in counts.items()}, weights)
    # quota/rate attach via a broadcast join, not a |strata|-deep
    # when-chain: past ~100 strata the chain blows the 64 KB codegen
    # method limit and silently drops the whole stage to interpreted
    # mode (the operators/sharding.py argmax lesson)
    spark = df.sparkSession
    stype = df.schema[strata_col].dataType
    if exact:
        qdf = F.broadcast(
            spark.createDataFrame(
                [(s, q) for s, q in quotas.items()],
                _quota_schema(strata_col, stype, "__quota"),
            )
        )
        w = Window.partitionBy(_c(strata_col)).orderBy(
            split_fraction(id_col).asc(), _c(id_col).asc()
        )
        return (
            in_scope.withColumn("__rk", F.row_number().over(w))
            .join(qdf, strata_col)
            .filter(F.col("__rk") <= F.col("__quota"))
            # restore the input column order: the USING join moves the
            # strata column to position 0, silently breaking positional
            # consumers of the previous (pre-join) implementation
            .select(*df.columns)
        )
    # counts[s] > 0 here: a zero-count stratum never reaches quotas
    rdf = F.broadcast(
        spark.createDataFrame(
            [(s, q / counts[s]) for s, q in quotas.items()],
            _rate_schema(strata_col, stype, "__rate"),
        )
    )
    return (
        in_scope.join(rdf, strata_col)
        .filter(split_fraction(id_col) < F.col("__rate"))
        # restore the input column order (see the exact path above)
        .select(*df.columns)
    )


def _quota_schema(strata_col: str, stype, quota_col: str):
    """Quota-table schema with the stratum column at its INPUT dtype —
    a hardcoded string field would make the join silently cast (or
    crash createDataFrame) for integer strata."""
    from pyspark.sql.types import LongType, StructField, StructType

    return StructType(
        [StructField(strata_col, stype), StructField(quota_col, LongType())]
    )


def _rate_schema(strata_col: str, stype, rate_col: str):
    from pyspark.sql.types import DoubleType, StructField, StructType

    return StructType(
        [StructField(strata_col, stype), StructField(rate_col, DoubleType())]
    )


def sample_fraction_open(id_col) -> Column:
    """Deterministic fraction strictly inside (0, 1): (h + 0.5) / 2^32
    over the multiplicative hash — ``split_fraction`` can return exactly
    0.0, which breaks log/pow-based sampling keys (ln 0, 0^x)."""
    return (
        split_fraction(id_col) * F.lit(float(_MOD)) + F.lit(0.5)
    ) / F.lit(float(_MOD) + 1.0)


def uniform_sample_k(df, k: int, *, id_col: str = "doc_id"):
    """EXACTLY k rows, uniform over the table, deterministic, no global
    sort: order by the hash fraction and take k — Spark plans
    ``orderBy().limit(k)`` as TakeOrderedAndProject (per-partition
    heaps + one k-row merge on the driver-side reduce), so the cost is
    one scan regardless of table size. Unlike ``sample(fraction)`` the
    count is exact; unlike a window rank there is no shuffle. The draw
    NESTS: k' > k extends the same sample (fixed hash permutation).

    Rows with a NULL id are excluded: their hash fraction is NULL,
    which sorts FIRST under asc and would deterministically win every
    draw — a row with no identity cannot be sampled by identity."""
    return (
        df.filter(_c(id_col).isNotNull())
        .orderBy(split_fraction(id_col).asc(), _c(id_col).asc())
        .limit(int(k))
    )


def weighted_sample_k(
    df,
    k: int,
    weight_col,
    *,
    id_col: str = "doc_id",
):
    """At most k rows sampled WITHOUT replacement with probability
    proportional to ``weight_col`` — Efraimidis–Spirakis A-ES in LOG
    form: key = ln(u)/w for a uniform u (same ordering as the textbook
    u^(1/w) since ln is monotone; the log form keeps keys spread at any
    weight magnitude, where rounding or float saturation of u^(1/w)
    collapses all heavy-weight rows to 1.0 and the draw goes
    weight-blind). The k largest keys (closest to 0) are the sample —
    still one TakeOrderedAndProject, no global sort.

    Rows with zero/negative/NULL/NaN weight — or a NULL id — have
    inclusion probability 0 and are FILTERED, not padded in: if fewer
    than k rows carry positive weight the result has fewer than k rows
    (padding with impossible rows would violate ∝-weight semantics
    silently). The NaN exclusion is load-bearing: Spark orders NaN
    ABOVE every real number, so `NaN > 0` passes the filter and the
    NaN key would sort first under desc, making any NaN-weight row win
    the sample unconditionally.

    Keys are compared unrounded with the id as tie-break — the same
    contract as the kNN score ordering (libm ``log`` may differ in the
    last ulp across engines, which flips a pair only when two keys are
    within one ulp — a near-tie where both choices are valid draws; a
    decimal rounding grid is NOT used because it provably collapses
    keys for very large or very small weights).
    """
    w = _c(weight_col).cast("double")
    u = sample_fraction_open(id_col)
    key = F.log(u) / w
    return (
        df.filter((w > 0) & ~F.isnan(w) & _c(id_col).isNotNull())
        .withColumn("__aes_key", key)
        .orderBy(F.desc("__aes_key"), _c(id_col).asc())
        .limit(int(k))
        .drop("__aes_key")
    )


def temperature_quotas(
    counts: dict, total: int, alpha: float
) -> dict:
    """Per-stratum quotas ∝ size^alpha (the Gopher/LLaMA temperature
    mixing rule: alpha=1 is proportional, alpha=0 uniform, 0<alpha<1
    upweights small sources), allocated by largest remainder so they
    sum to EXACTLY ``total``.

    Every step after the pow is integer arithmetic — weights are
    pow(n, alpha) scaled to 1e6 and rounded HALF-UP (matching Spark's
    and DuckDB's round(); Python's builtin round is banker's and WOULD
    diverge on exact .5) — so the allocation is bit-identical across
    engines: a float weight SUM would differ in the last ulp with
    summation order and flip a floor at the boundary (NOTES defect
    class b).
    """
    if total < 0:
        raise ValueError("temperature_quotas: total must be >= 0")
    w = {
        s: int(math.floor((n ** alpha) * 1e6 + 0.5))
        for s, n in counts.items()
    }
    W = sum(w.values())
    if W == 0:
        raise ValueError("temperature_quotas: empty strata")
    q = {s: (total * wi) // W for s, wi in w.items()}
    rem = {s: (total * wi) % W for s, wi in w.items()}
    deficit = total - sum(q.values())
    for s in sorted(counts, key=lambda s: (-rem[s], s))[:deficit]:
        q[s] += 1
    over = {s for s in q if q[s] > counts[s]}
    if over:
        raise ValueError(
            f"temperature_quotas: quota exceeds stratum size for "
            f"{sorted(over)} — lower total or raise alpha"
        )
    return q


def temperature_sample(
    df,
    total: int,
    alpha: float,
    *,
    strata_col: str = "source",
    id_col: str = "doc_id",
):
    """Draw EXACTLY ``total`` rows with per-stratum counts ∝ size^alpha
    (temperature mixing). Quotas via :func:`temperature_quotas` (one
    ≤|strata|-row collect, integer-exact); selection within a stratum by
    the multiplicative-hash order (same fixed permutation as
    ``mixture_sample``), so the draw is reproducible on any partitioning
    and NESTS as ``total`` grows.

    Rows with a NULL stratum or NULL id are excluded BEFORE quota
    allocation: a NULL stratum would be granted quota that the inner
    quota join then silently drops (output < total with no error), and
    a NULL id's NULL hash fraction would sort first and win its
    stratum's draw."""
    from pyspark.sql import Window

    base = df.filter(
        _c(strata_col).isNotNull() & _c(id_col).isNotNull()
    )
    counts = {
        r[0]: r[1]
        for r in base.groupBy(strata_col)
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    quotas = temperature_quotas(counts, total, alpha)
    spark = df.sparkSession
    qdf = F.broadcast(
        spark.createDataFrame(
            [(s, q) for s, q in quotas.items()],
            _quota_schema(
                strata_col, df.schema[strata_col].dataType, "__quota"
            ),
        )
    )
    # split_fraction, not a naive id*K multiply: ANSI overflow guard
    frac = split_fraction(id_col)
    w = Window.partitionBy(strata_col).orderBy(frac.asc(), _c(id_col).asc())
    return (
        base.withColumn("__rk", F.row_number().over(w))
        .join(qdf, strata_col)
        .filter(F.col("__rk") <= F.col("__quota"))
        .drop("__rk", "__quota")
    )
