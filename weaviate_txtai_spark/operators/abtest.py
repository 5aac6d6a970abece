"""A/B experiment readouts: two-proportion z-test and Welch's t-test.

Training-data work is full of paired-cohort questions — does the new
dedup config change downstream clickthrough, does a quality-filter
variant shift per-user engagement — and the readout is always the same
two statistics: a z-test on conversion rates and a Welch t-test on
per-user means. Both are pure aggregates, so the distributed form is
one map-side-combined pass; the statistics are emitted as test
statistics (z / t and Welch's degrees of freedom), not p-values — Spark
has no erf/Student-t CDF built-in, and thresholding |z| is what a
pipeline gate does anyway.

Scale notes: ONE groupBy over the unit key (user) to form per-unit
outcomes, then a 2-row aggregate per variant and a broadcast-width
final combine. Nothing is ever collected; both tests are a single job
each. Formulas: pooled two-proportion z (Fleiss); Welch t with
Welch–Satterthwaite df, sample (n−1) variances.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def two_proportion_ztest(
    df: DataFrame,
    group_col: str,
    success_col: str,
    *,
    group_a,
    group_b,
    round_decimals: int = 6,
) -> DataFrame:
    """Pooled two-proportion z-test between ``group_a`` and ``group_b``.

    ``df`` holds one row per experimental unit with a boolean/0-1
    ``success_col``. Output (1 row): ``n_a, n_b, successes_a,
    successes_b, rate_a, rate_b, abs_lift, z`` — z is
    (rate_a − rate_b) / sqrt(p̂(1−p̂)(1/n_a + 1/n_b)) with p̂ the pooled
    rate; NULL when either arm is empty or p̂ is 0 or 1 (no variance).
    """
    g = F.col(group_col)
    s = F.col(success_col).cast("double")
    agg = df.filter(g.isin([group_a, group_b])).agg(
        F.count(F.when(g == group_a, 1)).cast("long").alias("n_a"),
        F.count(F.when(g == group_b, 1)).cast("long").alias("n_b"),
        F.coalesce(F.sum(F.when(g == group_a, s)), F.lit(0.0))
        .cast("long")
        .alias("successes_a"),
        F.coalesce(F.sum(F.when(g == group_b, s)), F.lit(0.0))
        .cast("long")
        .alias("successes_b"),
    )
    # try_divide everywhere an arm count divides: an empty arm must
    # produce the documented NULLs, not an ANSI DIVIDE_BY_ZERO job kill
    pa = F.try_divide(F.col("successes_a"), F.col("n_a"))
    pb = F.try_divide(F.col("successes_b"), F.col("n_b"))
    pool = F.try_divide(
        F.col("successes_a") + F.col("successes_b"),
        F.col("n_a") + F.col("n_b"),
    )
    se = F.sqrt(
        pool
        * (1 - pool)
        * (
            F.try_divide(F.lit(1), F.col("n_a"))
            + F.try_divide(F.lit(1), F.col("n_b"))
        )
    )
    return agg.select(
        "n_a",
        "n_b",
        "successes_a",
        "successes_b",
        F.round(pa, round_decimals).alias("rate_a"),
        F.round(pb, round_decimals).alias("rate_b"),
        F.round(pa - pb, round_decimals).alias("abs_lift"),
        F.round(
            F.when(se > 0, (pa - pb) / se), round_decimals
        ).alias("z"),
    )


def welch_ttest(
    df: DataFrame,
    group_col: str,
    value_col: str,
    *,
    group_a,
    group_b,
    round_decimals: int = 6,
) -> DataFrame:
    """Welch's unequal-variance t-test on ``value_col`` means.

    Output (1 row): ``n_a, n_b, mean_a, mean_b, t, welch_df`` — t is
    (mean_a − mean_b)/sqrt(s²_a/n_a + s²_b/n_b) with sample variances,
    and welch_df the Welch–Satterthwaite degrees of freedom. NULL t/df
    when either arm has <2 units or both variances are 0.
    """
    g = F.col(group_col)
    v = F.col(value_col).cast("double")
    agg = df.filter(g.isin([group_a, group_b])).agg(
        F.count(F.when(g == group_a, 1)).cast("long").alias("n_a"),
        F.count(F.when(g == group_b, 1)).cast("long").alias("n_b"),
        F.avg(F.when(g == group_a, v)).alias("__ma"),
        F.avg(F.when(g == group_b, v)).alias("__mb"),
        F.var_samp(F.when(g == group_a, v)).alias("__va"),
        F.var_samp(F.when(g == group_b, v)).alias("__vb"),
    )
    qa = F.col("__va") / F.col("n_a")
    qb = F.col("__vb") / F.col("n_b")
    t = (F.col("__ma") - F.col("__mb")) / F.sqrt(qa + qb)
    dof = (qa + qb) * (qa + qb) / (
        qa * qa / (F.col("n_a") - 1) + qb * qb / (F.col("n_b") - 1)
    )
    ok = (F.col("n_a") >= 2) & (F.col("n_b") >= 2) & ((qa + qb) > 0)
    return agg.select(
        "n_a",
        "n_b",
        F.round("__ma", round_decimals).alias("mean_a"),
        F.round("__mb", round_decimals).alias("mean_b"),
        F.round(F.when(ok, t), round_decimals).alias("t"),
        F.round(F.when(ok, dof), round_decimals).alias("welch_df"),
    )


def mann_whitney_u(
    df: DataFrame,
    group_col: str,
    value_col: str,
    *,
    group_a,
    group_b,
    round_decimals: int = 6,
) -> DataFrame:
    """Mann–Whitney U (Wilcoxon rank-sum) test: the nonparametric
    companion to :func:`welch_ttest` — rank-based, so heavy tails and
    outliers (doc lengths, session values) cannot dominate the way they
    dominate a mean.

    Output (1 row): ``n_a, n_b, u_a, u_b, z`` where
    U_a = R_a − n_a(n_a+1)/2 (R_a = group-A's pooled tie-averaged rank
    sum), U_b = n_a·n_b − U_a, and z is the normal approximation with
    the tie correction:
    σ² = n_a·n_b/12 · [(n+1) − Σ(t³−t)/(n(n−1))] over tie-group sizes
    t. NULL z when either arm is empty or every value is tied (σ = 0).

    Scale: ranks come from ``rankstats.avg_ranks`` (value-grouped
    prefix sum, no global-order window); the tie term Σ(t³−t) is one
    aggregate over the per-value count table. Nothing is collected but
    the ≤P prefix-sum subtotals.
    """
    from weaviate_txtai_spark.operators.rankstats import avg_ranks

    g = F.col(group_col)
    sub = df.filter(
        g.isin([group_a, group_b]) & F.col(value_col).isNotNull()
    ).select(group_col, value_col)
    ranked = avg_ranks(sub, value_col, out_col="__r")
    # tie-correction term from the per-value counts
    ties = (
        sub.groupBy(value_col)
        .agg(F.count(F.lit(1)).cast("double").alias("__t"))
        .agg(
            F.sum(
                F.col("__t") * F.col("__t") * F.col("__t") - F.col("__t")
            ).alias("__tie")
        )
    )
    agg = ranked.agg(
        F.count(F.when(g == group_a, 1)).cast("long").alias("n_a"),
        F.count(F.when(g == group_b, 1)).cast("long").alias("n_b"),
        F.coalesce(F.sum(F.when(g == group_a, F.col("__r"))), F.lit(0.0)).alias(
            "__ra"
        ),
    ).join(F.broadcast(ties))
    na, nb = F.col("n_a"), F.col("n_b")
    n = na + nb
    ua = F.col("__ra") - na * (na + 1) / 2
    ub = na * nb - ua
    mu = na * nb / 2
    # try_divide: n <= 1 makes n(n-1) zero; the null propagates into
    # `ok` and the z output instead of an ANSI divide-by-zero error
    var = (
        na * nb / 12.0
        * ((n + 1) - F.try_divide(F.col("__tie"), n * (n - 1)))
    )
    ok = (na > 0) & (nb > 0) & (var > 0)
    return agg.select(
        "n_a",
        "n_b",
        F.round(ua, round_decimals).alias("u_a"),
        F.round(ub, round_decimals).alias("u_b"),
        F.round(F.when(ok, (ua - mu) / F.sqrt(var)), round_decimals).alias(
            "z"
        ),
    )


def normal_two_sided_p(z):
    """Two-sided p-value under the standard normal, as a PURE codegen
    expression: Φ via the Zelen–Severo polynomial (Abramowitz–Stegun
    26.2.17, |ε| < 7.5e-8) — Spark has no erf/CDF builtin, and a UDF
    would leave codegen. The approximation is DETERMINISTIC arithmetic,
    so an oracle replays it bit-for-bit; do not quote it past ~7
    decimals as the true p."""
    z = z if not isinstance(z, str) else F.col(z)
    az = F.abs(z)
    t = 1.0 / (1.0 + 0.2316419 * az)
    poly = t * (
        0.319381530
        + t * (
            -0.356563782
            + t * (1.781477937 + t * (-1.821255978 + t * 1.330274429))
        )
    )
    pdf = F.exp(-az * az / 2.0) / 2.5066282746310002  # sqrt(2π)
    return 2.0 * pdf * poly


def cuped_adjust(
    df: DataFrame,
    value_col: str,
    covariate_col: str,
    *,
    out_col: str = "adjusted",
) -> DataFrame:
    """CUPED variance reduction (Deng et al., WSDM 2013 — the industry
    standard for faster experiments): adjust each unit's metric by its
    PRE-EXPERIMENT covariate, y′ = y − θ·(x − x̄) with
    θ = cov(x, y)/var(x). Same mean (unbiased for the treatment
    effect), variance shrunk by the covariate's explanatory share
    (1 − ρ²), so the same experiment reaches significance sooner.

    θ/x̄ come from ONE 1-row aggregate broadcast back — the whole
    adjustment is a map-side projection after it. θ is computed on the
    pooled data (the standard practice; a per-variant θ would bias the
    difference). Rows with a NULL covariate pass through unadjusted
    (x − x̄ treated as 0 — the no-information default)."""
    x = F.col(covariate_col).cast("double")
    y = F.col(value_col).cast("double")
    stats = df.agg(
        F.covar_samp(x, y).alias("__cov"),
        F.var_samp(x).alias("__var"),
        F.avg(x).alias("__mx"),
    ).select(
        F.try_divide(F.col("__cov"), F.col("__var")).alias("__theta"),
        "__mx",
    )
    return (
        df.join(F.broadcast(stats))
        .withColumn(
            out_col,
            y
            - F.coalesce(F.col("__theta"), F.lit(0.0))
            * F.coalesce(x - F.col("__mx"), F.lit(0.0)),
        )
        .drop("__theta", "__mx")
    )


def bh_adjust(
    df: DataFrame,
    p_col: str,
    *,
    id_cols: "list[str] | None" = None,
    round_decimals: int = 6,
) -> DataFrame:
    """Benjamini–Hochberg FDR adjustment (1995, public knowledge) over a
    battery of test p-values — the correction a metrics platform applies
    when one experiment readout fires hundreds of hypothesis tests and
    "significant at 0.05" would be guaranteed noise.

    q_i = min_{j ≥ i} ( p_(j) · n / j ), capped at 1 — computed as a
    running minimum from the LARGEST p down.

    Scale: the battery is test-domain-sized (one row per hypothesis —
    hundreds, not billions), so the single unpartitioned rank window is
    bounded by construction, the same justification as the drift grids.
    Ties in p get identical q (rank() would double-count; row_number
    per sorted order + the suffix-min makes tied p share the min —
    asserted in tests). NULL p-values are dropped.

    Output: the input's ``id_cols`` + ``p, q`` ordered by p."""
    ids = list(id_cols) if id_cols else []
    base = df.filter(F.col(p_col).isNotNull()).select(
        *ids, F.col(p_col).cast("double").alias("p")
    )
    n = base.agg(F.count(F.lit(1)).alias("__n"))
    w_rank = Window.orderBy(F.asc("p"), *[F.asc(c) for c in ids])
    w_suffix = Window.orderBy(F.asc("p"), *[F.asc(c) for c in ids]).rowsBetween(
        0, Window.unboundedFollowing
    )
    return (
        base.join(F.broadcast(n))
        .withColumn("__i", F.row_number().over(w_rank))
        .withColumn("__raw", F.col("p") * F.col("__n") / F.col("__i"))
        .withColumn(
            "q",
            F.round(
                F.least(F.min("__raw").over(w_suffix), F.lit(1.0)),
                round_decimals,
            ),
        )
        .select(*ids, F.round("p", round_decimals).alias("p"), "q")
    )


def cliffs_delta(
    df: DataFrame,
    group_col: str,
    value_col: str,
    *,
    group_a,
    group_b,
    round_decimals: int = 6,
    max_values: int = 100_000,
) -> DataFrame:
    """Cliff's delta (1993, public knowledge): P(a > b) − P(a < b) over
    all cross-group pairs — the ordinal, outlier-proof effect size that
    belongs next to the Mann-Whitney U test (same dominance structure;
    δ = 2U/(n_a·n_b) − 1).

    Scale: NEVER the quadratic pair set. Both groups reduce to VALUE
    DOMAIN count tables; a merged domain with group-partitioned prefix
    sums gives, for every a-value, how many b-rows are strictly below /
    tied — one shuffle over distinct values.

    Output (1 row): ``n_a, n_b, delta`` (NULL when either group is
    empty)."""
    g = F.col(group_col)
    base = df.filter(
        g.isin([group_a, group_b]) & F.col(value_col).isNotNull()
    ).select(
        F.when(g == group_a, F.lit("a")).otherwise(F.lit("b")).alias("__g"),
        F.col(value_col).cast("double").alias("__v"),
    )
    vc = base.groupBy("__g", "__v").agg(F.count(F.lit(1)).alias("__c"))
    # the prefix windows below run UNPARTITIONED over the merged value
    # domain — bounded only while the domain is (the kendall_tau_b
    # cardinality-guard lesson): a continuous metric with row-sized
    # distinct values would funnel the corpus into one task
    n_domain = vc.select("__v").distinct().count()
    if n_domain > max_values:
        raise ValueError(
            f"cliffs_delta: {n_domain} distinct values > max_values="
            f"{max_values} — the domain prefix would be single-task "
            f"row-scale; quantize/bucket the value column first"
        )
    # per value: counts on each side, then b-side exclusive prefix over
    # the merged value domain = #b strictly below that value
    wide = vc.groupBy("__v").agg(
        F.coalesce(
            F.sum(F.when(F.col("__g") == "a", F.col("__c"))), F.lit(0)
        ).alias("__ca"),
        F.coalesce(
            F.sum(F.when(F.col("__g") == "b", F.col("__c"))), F.lit(0)
        ).alias("__cb"),
    )
    w_below = Window.orderBy("__v").rowsBetween(
        Window.unboundedPreceding, -1
    )
    w_above = Window.orderBy("__v").rowsBetween(1, Window.unboundedFollowing)
    dom = (
        wide.withColumn(
            "__b_below", F.coalesce(F.sum("__cb").over(w_below), F.lit(0))
        )
        .withColumn(
            "__b_above", F.coalesce(F.sum("__cb").over(w_above), F.lit(0))
        )
    )
    return dom.agg(
        F.sum("__ca").cast("long").alias("n_a"),
        F.sum("__cb").cast("long").alias("n_b"),
        F.round(
            F.try_divide(
                F.sum(F.col("__ca") * (F.col("__b_below") - F.col("__b_above"))),
                F.sum("__ca") * F.sum("__cb"),
            ),
            round_decimals,
        ).alias("delta"),
    )


def diff_in_diff(
    df: DataFrame,
    group_col: str,
    period_col: str,
    value_col: str,
    *,
    treat_value,
    post_value,
    round_decimals: int = 6,
) -> DataFrame:
    """Difference-in-differences readout (Card & Krueger lineage,
    public knowledge): the treatment effect when randomization wasn't
    available but a parallel-trends control is —

        DiD = (ȳ_treat,post − ȳ_treat,pre) − (ȳ_ctrl,post − ȳ_ctrl,pre)

    with the standard independent-cells SE = √(Σ s²_c/n_c) over the
    four cells (sample variances). The readout a rollout review uses
    when a config change shipped to one cohort on a known date.

    One map-side-combined pass over the rows; four cells + a 1-row
    combine. Output: ``n_tpre, n_tpost, n_cpre, n_cpost, did, se`` —
    NULL se when any cell has < 2 rows."""
    is_t = F.col(group_col) == F.lit(treat_value)
    is_post = F.col(period_col) == F.lit(post_value)
    y = F.col(value_col).cast("double")

    def cell(t: bool, p: bool, what):
        c = (is_t if t else ~is_t) & (is_post if p else ~is_post)
        return what(F.when(c, y))

    agg = df.filter(F.col(value_col).isNotNull()).agg(
        *[
            a.alias(n)
            for n, a in [
                ("n_tpre", cell(True, False, F.count)),
                ("n_tpost", cell(True, True, F.count)),
                ("n_cpre", cell(False, False, F.count)),
                ("n_cpost", cell(False, True, F.count)),
                ("m_tpre", cell(True, False, F.avg)),
                ("m_tpost", cell(True, True, F.avg)),
                ("m_cpre", cell(False, False, F.avg)),
                ("m_cpost", cell(False, True, F.avg)),
                ("v_tpre", cell(True, False, F.var_samp)),
                ("v_tpost", cell(True, True, F.var_samp)),
                ("v_cpre", cell(False, False, F.var_samp)),
                ("v_cpost", cell(False, True, F.var_samp)),
            ]
        ]
    )
    did = (F.col("m_tpost") - F.col("m_tpre")) - (
        F.col("m_cpost") - F.col("m_cpre")
    )
    se = F.sqrt(
        F.col("v_tpre") / F.col("n_tpre")
        + F.col("v_tpost") / F.col("n_tpost")
        + F.col("v_cpre") / F.col("n_cpre")
        + F.col("v_cpost") / F.col("n_cpost")
    )
    return agg.select(
        F.col("n_tpre").cast("long").alias("n_tpre"),
        F.col("n_tpost").cast("long").alias("n_tpost"),
        F.col("n_cpre").cast("long").alias("n_cpre"),
        F.col("n_cpost").cast("long").alias("n_cpost"),
        F.round(did, round_decimals).alias("did"),
        F.round(se, round_decimals).alias("se"),
    )


def stratified_ate(
    df: DataFrame,
    treat_col: str,
    outcome_col: str,
    stratum_col: str,
    *,
    round_decimals: int = 6,
) -> DataFrame:
    """Stratified (post-stratification) average treatment effect — the
    closed-form causal estimator between the raw difference-in-means
    and a fitted propensity model (Imbens & Rubin, public knowledge):
    within each stratum the arms are compared directly, and strata
    combine weighted by their population share,

        ATE = Σ_s (n_s / n) · (ȳ₁ₛ − ȳ₀ₛ)
        SE² = Σ_s (n_s / n)² · (v₁ₛ/n₁ₛ + v₀ₛ/n₀ₛ)

    Strata with fewer than 2 units in either arm are EXCLUDED (no
    within-arm variance is estimable); n re-normalizes over the kept
    strata, so the estimand is the ATE on the covered population — the
    standard positivity trim, deterministic here.

    One groupBy(stratum, treat) partial-agg shuffle (map-side combined)
    + a strata-domain pivot and 1-row reduction — nothing row-scale
    past the first aggregate. Output: one row per kept stratum
    (``stratum, n1, n0, diff, weight``, SE NULL) plus the pooled row
    (``stratum = -1``) carrying the ATE as ``diff``, weight 1, and the
    pooled ``se``. ``stratum_col`` must be integral (the output casts
    it to long to share a column with the -1 pooled sentinel): a
    string stratum would silently cast to NULL on every row, so
    non-numeric dtypes raise here — hash/encode string strata first.
    """
    dtypes = dict(df.dtypes)
    sdt = dtypes.get(stratum_col, "")
    if sdt not in ("tinyint", "smallint", "int", "bigint"):
        raise ValueError(
            f"stratified_ate: stratum_col {stratum_col!r} has dtype "
            f"{sdt!r}; an integral stratum is required (the long cast "
            f"in the output would NULL every non-numeric label)"
        )
    # NULL strata/arms excluded: a grouped NULL stratum would form a
    # pseudo-stratum of unkeyed units, and a NULL (uncastable) treat
    # flag would form a third arm that silently breaks the two-arm pivot
    cell = df.filter(
        F.col(stratum_col).isNotNull()
        & F.col(treat_col).cast("boolean").isNotNull()
    ).groupBy(
        F.col(stratum_col).alias("stratum"),
        F.col(treat_col).cast("boolean").alias("__t"),
    ).agg(
        F.count(F.lit(1)).alias("m"),
        F.sum(F.col(outcome_col).cast("double")).alias("s"),
        F.var_samp(F.col(outcome_col).cast("double")).alias("v"),
    )
    wide = (
        cell.groupBy("stratum")
        .agg(
            F.sum(F.when(F.col("__t"), F.col("m"))).alias("n1"),
            F.sum(F.when(~F.col("__t"), F.col("m"))).alias("n0"),
            F.sum(F.when(F.col("__t"), F.col("s"))).alias("s1"),
            F.sum(F.when(~F.col("__t"), F.col("s"))).alias("s0"),
            F.sum(F.when(F.col("__t"), F.col("v"))).alias("v1"),
            F.sum(F.when(~F.col("__t"), F.col("v"))).alias("v0"),
        )
        .filter((F.col("n1") >= 2) & (F.col("n0") >= 2))
    )
    # persisted: kept feeds three branches (tot, per, pooled) and Spark
    # shares no common subplans — unpersisted, the corpus groupBy ran
    # once per branch (strata-domain rows, trivial to cache)
    from weaviate_txtai_spark.cache import scoped_persist

    kept = scoped_persist(wide.select(
        "stratum",
        "n1",
        "n0",
        (F.col("n1") + F.col("n0")).alias("ns"),
        (F.col("s1") / F.col("n1") - F.col("s0") / F.col("n0")).alias(
            "__d"
        ),
        (F.col("v1") / F.col("n1") + F.col("v0") / F.col("n0")).alias(
            "__vw"
        ),
    ), eager=True)  # r14: fill before the consumer fan-out
    tot = kept.agg(F.sum("ns").alias("__n"))
    per = kept.join(F.broadcast(tot)).select(
        F.col("stratum").cast("long").alias("stratum"),
        F.col("n1").cast("long").alias("n1"),
        F.col("n0").cast("long").alias("n0"),
        F.round("__d", round_decimals).alias("diff"),
        F.round(F.col("ns") / F.col("__n"), round_decimals).alias(
            "weight"
        ),
        F.lit(None).cast("double").alias("se"),
    )
    pooled = (
        kept.join(F.broadcast(tot))
        .agg(
            F.lit(-1).cast("long").alias("stratum"),
            F.sum("n1").cast("long").alias("n1"),
            F.sum("n0").cast("long").alias("n0"),
            F.round(
                F.sum(F.col("ns") / F.col("__n") * F.col("__d")),
                round_decimals,
            ).alias("diff"),
            F.round(F.lit(1.0), round_decimals).alias("weight"),
            F.round(
                F.sqrt(
                    F.sum(
                        F.pow(F.col("ns") / F.col("__n"), 2)
                        * F.col("__vw")
                    )
                ),
                round_decimals,
            ).alias("se"),
        )
    )
    return per.unionByName(pooled)


def chisq_gof(
    df: DataFrame,
    group_col: str,
    expected: "dict[object, float]",
    *,
    round_decimals: int = 6,
) -> DataFrame:
    """Chi-square goodness-of-fit of observed group counts against the
    ``expected`` fraction map — the sample-ratio-mismatch (SRM) guard
    every experiment readout should run FIRST: a significant χ² here
    means the assignment itself is broken and downstream effect
    estimates are untrustworthy.

    χ² = Σ_g (O_g − N·e_g)²/(N·e_g) over the expected groups (rows in
    groups outside ``expected`` are ignored — they are a different bug;
    expected-but-unobserved groups contribute with O = 0). The p-value
    uses the Wilson–Hilferty cube-root normal approximation on the
    ROUNDED statistic (|ε| ~ 1e-3 at k−1 ≥ 2 — an SRM alarm fires at
    p < 0.001, far coarser), composed with the Zelen–Severo Φ
    polynomial — all pure deterministic arithmetic, so an SQL oracle
    replays it exactly.

    Output (1 row): ``n, k, chi2, p_value``; p NULL when N = 0.

    Scale: one groupBy(group) count of the corpus, then k-row math
    against a broadcast literal frame.
    """
    if len(expected) < 2:
        raise ValueError("chisq_gof: need at least 2 expected groups")
    fr = sum(expected.values())
    if abs(fr - 1.0) > 1e-9 or min(expected.values()) <= 0:
        raise ValueError(
            "chisq_gof: expected fractions must be positive and sum to 1"
        )
    spark = df.sparkSession
    exp_df = spark.createDataFrame(
        [(g, float(e)) for g, e in expected.items()], ["__g", "__e"]
    )
    counts = (
        df.select(F.col(group_col).alias("__g"))
        .join(F.broadcast(exp_df), "__g")  # ignore non-expected groups
        .groupBy("__g")
        .agg(F.count(F.lit(1)).cast("long").alias("__o"))
    )
    cells = exp_df.join(counts, "__g", "left").select(
        "__g", "__e", F.coalesce("__o", F.lit(0)).alias("__o")
    )
    tot = cells.agg(F.sum("__o").cast("double").alias("__n"))
    agg = (
        cells.join(F.broadcast(tot))
        .select(
            "__n",
            F.when(
                F.col("__n") > 0,
                (F.col("__o") - F.col("__n") * F.col("__e"))
                * (F.col("__o") - F.col("__n") * F.col("__e"))
                / (F.col("__n") * F.col("__e")),
            ).alias("__t"),
        )
        .groupBy("__n")
        .agg(
            F.count(F.lit(1)).cast("long").alias("k"),
            F.round(F.sum("__t"), round_decimals).alias("chi2"),
        )
    )
    kdf = (F.col("k") - 1).cast("double")  # degrees of freedom
    # Wilson–Hilferty: (χ²/ν)^⅓ ~ N(1 − 2/(9ν), 2/(9ν))
    z = (
        F.pow(F.col("chi2") / kdf, F.lit(1.0 / 3.0))
        - (F.lit(1.0) - F.lit(2.0) / (F.lit(9.0) * kdf))
    ) / F.sqrt(F.lit(2.0) / (F.lit(9.0) * kdf))
    # upper-tail normal p from the two-sided helper: 1 − Φ(z)
    p_upper = F.when(
        z >= 0, normal_two_sided_p(z) / 2
    ).otherwise(F.lit(1.0) - normal_two_sided_p(z) / 2)
    return agg.select(
        F.col("__n").cast("long").alias("n"),
        "k",
        "chi2",
        F.round(
            F.when(F.col("chi2").isNotNull(), p_upper), round_decimals
        ).alias("p_value"),
    )


def cmh_test(
    df: DataFrame,
    stratum_col: str,
    treat_col: str,
    outcome_col: str,
    *,
    round_decimals: int = 6,
) -> DataFrame:
    """Cochran–Mantel–Haenszel test: does a binary treatment associate
    with a binary outcome CONSISTENTLY across strata? The
    confounder-adjusted 2×2 test (the binary-outcome companion to
    ``stratified_ate``), guarding against Simpson-style reversals that
    a pooled 2×2 hides.

    Per stratum s with table (a=T1O1, n1=T1, m1=O1, N):
    E_s = n1·m1/N, V_s = n1·n0·m1·m0/(N²(N−1)); the statistic is
    CMH = (Σa − ΣE)²/ΣV ~ χ²(1), two-sided p via the Zelen–Severo Φ on
    √CMH of the ROUNDED statistic. Strata with N < 2 or a degenerate
    margin (V = 0) contribute nothing, per the standard treatment.
    Treatment/outcome are truthy casts (int 0/1).

    Output (1 row): ``k_strata, n, cmh, p_value`` (NULL statistic when
    every stratum is degenerate).

    Scale: one (stratum) groupBy over the corpus, then stratum-domain
    math and a 1-row reduce — no pair expansion.
    """
    t = F.col(treat_col).cast("int")
    y = F.col(outcome_col).cast("int")
    cells = (
        df.filter(
            F.col(stratum_col).isNotNull()
            & t.isin(0, 1) & y.isin(0, 1)
        )
        .groupBy(F.col(stratum_col).alias("__s"))
        .agg(
            F.count(F.lit(1)).cast("double").alias("N"),
            F.sum(t).cast("double").alias("n1"),
            F.sum(y).cast("double").alias("m1"),
            F.sum(t * y).cast("double").alias("a"),
        )
    )
    n0 = F.col("N") - F.col("n1")
    m0 = F.col("N") - F.col("m1")
    usable = (
        (F.col("N") >= 2)
        & (F.col("n1") > 0) & (n0 > 0)
        & (F.col("m1") > 0) & (m0 > 0)
    )
    per = cells.select(
        "N",
        F.when(usable, F.col("a")).alias("__a"),
        F.when(
            usable, F.col("n1") * F.col("m1") / F.col("N")
        ).alias("__e"),
        F.when(
            usable,
            F.col("n1") * n0 * F.col("m1") * m0
            / (F.col("N") * F.col("N") * (F.col("N") - 1)),
        ).alias("__v"),
    )
    agg = per.agg(
        F.count(F.lit(1)).cast("long").alias("k_strata"),
        F.sum("N").cast("long").alias("n"),
        F.sum("__a").alias("__sa"),
        F.sum("__e").alias("__se"),
        F.sum("__v").alias("__sv"),
    )
    dev = F.col("__sa") - F.col("__se")
    cmh = F.round(
        F.when(F.col("__sv") > 0, dev * dev / F.col("__sv")),
        round_decimals,
    )
    stat = agg.select("k_strata", "n", cmh.alias("cmh"))
    return stat.select(
        "k_strata",
        "n",
        "cmh",
        F.round(
            F.when(
                F.col("cmh").isNotNull(),
                normal_two_sided_p(F.sqrt(F.col("cmh"))),
            ),
            round_decimals,
        ).alias("p_value"),
    )


def simpson_check(
    df: DataFrame,
    stratum_col: str,
    treat_col: str,
    outcome_col: str,
    *,
    round_decimals: int = 6,
) -> DataFrame:
    """Simpson's-paradox detector for a binary treatment/outcome: does
    the POOLED rate difference disagree in sign with the per-stratum
    differences? The pre-flight check that decides whether a pooled
    readout is even admissible before CMH/stratified estimates run.

    Output (1 row): ``k_strata, k_usable, pooled_diff, n_agree,
    n_reverse, n_zero, reversed`` — ``reversed`` true when the pooled
    sign is non-zero and a strict MAJORITY of usable strata (both arms
    present) carry the opposite sign. Rate differences are exact count
    ratios; sign logic is integer — deterministic everywhere.

    Scale: one (stratum) groupBy + a 1-row reduce.
    """
    t = F.col(treat_col).cast("int")
    y = F.col(outcome_col).cast("int")
    cells = (
        df.filter(
            F.col(stratum_col).isNotNull() & t.isin(0, 1) & y.isin(0, 1)
        )
        .groupBy(F.col(stratum_col).alias("__s"))
        .agg(
            F.sum(t).cast("double").alias("n1"),
            F.sum(1 - t).cast("double").alias("n0"),
            F.sum(t * y).cast("double").alias("c1"),
            F.sum((1 - t) * y).cast("double").alias("c0"),
        )
    )
    usable = (F.col("n1") > 0) & (F.col("n0") > 0)
    # try_divide: ANSI evaluates both branches of a when(), so the
    # bare ratio would DIVIDE_BY_ZERO on single-arm strata
    diff = F.try_divide(F.col("c1"), F.col("n1")) - F.try_divide(
        F.col("c0"), F.col("n0")
    )
    sgn = F.when(diff > 0, 1).when(diff < 0, -1).otherwise(0)
    agg = cells.agg(
        F.count(F.lit(1)).cast("long").alias("k_strata"),
        F.sum(F.when(usable, 1).otherwise(0)).cast("long").alias(
            "k_usable"
        ),
        F.sum("n1").alias("__n1"),
        F.sum("n0").alias("__n0"),
        F.sum("c1").alias("__c1"),
        F.sum("c0").alias("__c0"),
        F.sum(F.when(usable & (sgn > 0), 1).otherwise(0))
        .cast("long").alias("__pos"),
        F.sum(F.when(usable & (sgn < 0), 1).otherwise(0))
        .cast("long").alias("__neg"),
        F.sum(F.when(usable & (sgn == 0), 1).otherwise(0))
        .cast("long").alias("n_zero"),
    )
    pooled = F.try_divide(F.col("__c1"), F.col("__n1")) - F.try_divide(
        F.col("__c0"), F.col("__n0")
    )
    psgn = F.when(pooled > 0, 1).when(pooled < 0, -1).otherwise(0)
    n_agree = F.when(psgn > 0, F.col("__pos")).when(
        psgn < 0, F.col("__neg")
    ).otherwise(F.lit(0))
    n_reverse = F.when(psgn > 0, F.col("__neg")).when(
        psgn < 0, F.col("__pos")
    ).otherwise(F.lit(0))
    return agg.select(
        "k_strata",
        "k_usable",
        F.round(pooled, round_decimals).alias("pooled_diff"),
        n_agree.cast("long").alias("n_agree"),
        n_reverse.cast("long").alias("n_reverse"),
        "n_zero",
        (
            (psgn != 0)
            & (n_reverse * 2 > F.col("k_usable"))
        ).alias("reversed"),
    )


def odds_ratio(
    df: DataFrame,
    treat_col: str,
    outcome_col: str,
    *,
    z: float = 1.959963985,
    round_decimals: int = 6,
) -> DataFrame:
    """Pooled 2×2 odds ratio with the Woolf log-CI and the
    Haldane–Anscombe +½ correction applied only when a cell is zero —
    the effect-size readout that pairs with the CMH/Simpson gates
    (those test; this sizes).

        OR = (a·d)/(b·c),  CI = exp(ln OR ± z·√(1/a+1/b+1/c+1/d))

    Cells are exact counts; the correction rule is integer, so both
    engines apply it identically; ln/exp on identical doubles with
    output rounding (the repo's float discipline).

    Output (1 row): ``a, b, c, d, corrected, or_, or_lo, or_hi`` —
    NULL interval when any corrected cell is still 0 (an empty margin).

    Scale: ONE 1-row aggregate.
    """
    t = F.col(treat_col).cast("int")
    y = F.col(outcome_col).cast("int")
    agg = df.filter(t.isin(0, 1) & y.isin(0, 1)).agg(
        F.sum(t * y).cast("long").alias("a"),
        F.sum(t * (1 - y)).cast("long").alias("b"),
        F.sum((1 - t) * y).cast("long").alias("c"),
        F.sum((1 - t) * (1 - y)).cast("long").alias("d"),
    )
    any_zero = (
        (F.col("a") == 0) | (F.col("b") == 0)
        | (F.col("c") == 0) | (F.col("d") == 0)
    )
    def cell(name):
        return F.col(name).cast("double") + F.when(
            any_zero, F.lit(0.5)
        ).otherwise(F.lit(0.0))
    aa, bb, cc, dd = cell("a"), cell("b"), cell("c"), cell("d")
    # empty-MARGIN guard on the RAW counts: after the +0.5 correction
    # every cell is positive, so a corrected-cell check could never
    # fire — a table with no treated rows (a+b=0), no control rows,
    # no positives, or no negatives has no estimable OR and must emit
    # the documented NULL interval rather than a spurious finite one
    ok = (
        (F.col("a") + F.col("b") > 0)
        & (F.col("c") + F.col("d") > 0)
        & (F.col("a") + F.col("c") > 0)
        & (F.col("b") + F.col("d") > 0)
    )
    lor = F.log(aa * dd / (bb * cc))
    se = F.sqrt(1 / aa + 1 / bb + 1 / cc + 1 / dd)
    return agg.select(
        "a", "b", "c", "d",
        any_zero.alias("corrected"),
        F.round(F.when(ok, F.exp(lor)), round_decimals).alias("or_"),
        F.round(
            F.when(ok, F.exp(lor - F.lit(float(z)) * se)),
            round_decimals,
        ).alias("or_lo"),
        F.round(
            F.when(ok, F.exp(lor + F.lit(float(z)) * se)),
            round_decimals,
        ).alias("or_hi"),
    )


def sprt_constants(
    p0: float,
    p1: float,
    *,
    alpha: float = 0.05,
    beta: float = 0.05,
    scale: int = 10**9,
) -> "dict[str, int]":
    """Scaled-integer constants for the Bernoulli SPRT (Wald 1945):
    per-success / per-failure log-likelihood-ratio increments and the
    two decision boundaries, each ``round(ln(·)·scale)`` — computed
    ONCE driver-side so the walk itself is pure integer arithmetic
    (k·c1 + (n−k)·c0 vs a/b), replayable bit-identically in SQL with
    the same literals."""
    if not (0 < p0 < p1 < 1):
        raise ValueError("sprt: need 0 < p0 < p1 < 1")
    if not (0 < alpha < 1 and 0 < beta < 1):
        raise ValueError("sprt: alpha/beta must be in (0,1)")
    sc = int(scale)
    return {
        "c1": round(math.log(p1 / p0) * sc),
        "c0": round(math.log((1 - p1) / (1 - p0)) * sc),
        "a": round(math.log((1 - beta) / alpha) * sc),
        "b": round(math.log(beta / (1 - alpha)) * sc),
        "scale": sc,
    }


def sprt_bernoulli(
    periods: DataFrame,
    period_col: str,
    trials_col: str,
    successes_col: str,
    *,
    p0: float,
    p1: float,
    alpha: float = 0.05,
    beta: float = 0.05,
    scale: int = 10**9,
    max_periods: int = 100_000,
) -> DataFrame:
    """Wald's sequential probability ratio test for a Bernoulli rate,
    evaluated at period checkpoints (the always-valid alternative to a
    fixed-horizon z-test: stop the experiment the moment the evidence
    crosses a boundary, with α/β guaranteed regardless of WHEN you
    look). H0: p = p0 vs H1: p = p1; boundaries A = ln((1−β)/α),
    B = ln(β/(1−α)).

    The cumulative LLR after k successes in n trials is
    k·ln(p1/p0) + (n−k)·ln((1−p1)/(1−p0)) — LINEAR in (k, n), so with
    the constants pre-scaled to integers (``sprt_constants``) the whole
    walk and both crossing tests are exact integer comparisons: no
    float accumulates, and the decision replays bit-identically as a
    windowed SQL cumulative over the same literals.

    Scale: callers aggregate raw events to (period, trials, successes)
    first — the corpus-sized reduction; the scan for the FIRST crossing
    folds driver-side over ≤ ``max_periods`` rows (the domain-sized-
    iteration discipline: kaplan_meier, fs_em_fit).

    Output (1 row): ``decision`` ('accept_h1' | 'accept_h0' |
    'continue'), ``stop_period`` (period value at the crossing; the
    last period when continuing), ``n_periods_used, k_success,
    n_trials, llr_scaled, a_scaled, b_scaled``.
    """
    c = sprt_constants(p0, p1, alpha=alpha, beta=beta, scale=scale)
    rows = (
        periods.filter(
            F.col(trials_col).isNotNull() & (F.col(trials_col) > 0)
        )
        .select(
            F.col(period_col).cast("long").alias("t"),
            F.col(trials_col).cast("long").alias("n"),
            F.col(successes_col).cast("long").alias("s"),
        )
        .orderBy("t")
        # cap guard BEFORE the collect: an oversized period domain (a
        # mis-called raw-event input) pulls at most cap+1 rows
        .limit(max_periods + 1)
        .collect()
    )
    if len(rows) > max_periods:
        raise ValueError(
            f"sprt_bernoulli: period domain exceeds cap {max_periods}"
        )
    if not rows:
        raise ValueError("sprt_bernoulli: no periods")
    k = n = used = 0
    llr = 0
    decision, stop_t = "continue", int(rows[-1]["t"])
    for r in rows:
        k += int(r["s"])
        n += int(r["n"])
        used += 1
        llr = k * c["c1"] + (n - k) * c["c0"]
        if llr >= c["a"]:
            decision, stop_t = "accept_h1", int(r["t"])
            break
        if llr <= c["b"]:
            decision, stop_t = "accept_h0", int(r["t"])
            break
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    schema = StructType(
        [
            StructField("decision", StringType(), False),
            StructField("stop_period", LongType(), False),
            StructField("n_periods_used", LongType(), False),
            StructField("k_success", LongType(), False),
            StructField("n_trials", LongType(), False),
            StructField("llr_scaled", LongType(), False),
            StructField("a_scaled", LongType(), False),
            StructField("b_scaled", LongType(), False),
        ]
    )
    return periods.sparkSession.createDataFrame(
        [(decision, stop_t, used, k, n, llr, c["a"], c["b"])], schema
    )


def permutation_test_rates(
    df: DataFrame,
    unit_col: str,
    treat_col: str,
    outcome_col: str,
    *,
    n_perms: int = 64,
    round_decimals: int = 6,
) -> DataFrame:
    """Permutation (randomization) test for a rate difference — the
    assumption-free companion to the two-proportion z-test: re-assign
    units to arms ``n_perms`` times, recompute the rate difference,
    and report the fraction of permutations at least as extreme as the
    observed split (with the standard +1 add-one so p is never 0).

    Determinism: "random" permutations are the Knuth multiplicative
    hash of (unit + seed) mod 2 — the repo's established replayable
    randomness (dp_noisy_counts, split_fraction) — and the extremity
    comparison |Δ_s| ≥ |Δ_obs| is CROSS-MULTIPLIED exact-integer
    (|a_s|·b_obs ≥ |a_obs|·b_s with a = s1·n0 − s0·n1, b = n1·n0), so
    no float ever decides a permutation. p itself is an exact rational
    rounded once.

    Scale: ONE pass forms per-unit outcomes, a seed-explode (units ×
    n_perms, map-side) feeds one groupBy(seed) — n_perms+1 result rows
    total; the final compare is a broadcast of the 1-row observed
    stats. Output (1 row): ``n1, n0, obs_diff, n_perms, n_extreme,
    p_value``.
    """
    if n_perms < 1:
        raise ValueError("permutation_test_rates: n_perms must be >= 1")
    units = (
        df.filter(
            F.col(unit_col).isNotNull()
            & F.col(treat_col).cast("int").isin(0, 1)
        )
        .groupBy(F.col(unit_col).alias("__u"))
        .agg(
            F.max(F.col(treat_col).cast("int")).alias("__t"),
            F.max(F.col(outcome_col).cast("int")).alias("__y"),
        )
    )
    from weaviate_txtai_spark.cache import scoped_persist

    units = scoped_persist(units, eager=True)  # r14: fill before fan-out
    obs = units.agg(
        F.sum("__t").cast("long").alias("n1"),
        F.sum(1 - F.col("__t")).cast("long").alias("n0"),
        F.sum(F.col("__t") * F.col("__y")).cast("long").alias("s1"),
        F.sum((1 - F.col("__t")) * F.col("__y")).cast("long").alias("s0"),
    )
    perms = units.select(
        "__u",
        "__y",
        F.explode(
            F.sequence(F.lit(1), F.lit(int(n_perms)))
        ).alias("__seed"),
    ).select(
        "__seed",
        "__y",
        # Knuth multiplicative hash, ANSI-safe: pmod keeps the
        # multiplicand in [0, 2^31) — NON-NEGATIVE even for negative
        # unit ids (plain % keeps the dividend's sign, which would make
        # __pt = -1 and corrupt pn0/pn1) — so the product < 2^63.
        # The label is the TOP bit of the 32-bit product — the LOW bit
        # of x·odd is just x's parity, which would make every "random"
        # permutation the observed split or its complement
        F.expr(
            "CAST((pmod(__u + __seed, 2147483648L) * 2654435761L"
            " % 4294967296L) div 2147483648L AS INT)"
        ).alias("__pt"),
    )
    per_seed = perms.groupBy("__seed").agg(
        F.sum("__pt").cast("long").alias("pn1"),
        F.sum(1 - F.col("__pt")).cast("long").alias("pn0"),
        F.sum(F.col("__pt") * F.col("__y")).cast("long").alias("ps1"),
        F.sum((1 - F.col("__pt")) * F.col("__y")).cast("long").alias("ps0"),
    )
    a_obs = F.col("s1") * F.col("n0") - F.col("s0") * F.col("n1")
    b_obs = F.col("n1") * F.col("n0")
    a_p = F.col("ps1") * F.col("pn0") - F.col("ps0") * F.col("pn1")
    b_p = F.col("pn1") * F.col("pn0")
    # degenerate permutations (an empty arm) count as extreme —
    # |Δ| is undefined there and the conservative call keeps p valid
    extreme = F.when(b_p == 0, F.lit(1)).otherwise(
        F.when(
            F.abs(a_p.cast("decimal(38,0)")) * b_obs.cast("decimal(38,0)")
            >= F.abs(a_obs.cast("decimal(38,0)"))
            * b_p.cast("decimal(38,0)"),
            1,
        ).otherwise(0)
    )
    counted = per_seed.join(F.broadcast(obs)).agg(
        F.sum(extreme).cast("long").alias("n_extreme")
    )
    return (
        obs.join(F.broadcast(counted))
        .select(
            "n1",
            "n0",
            F.round(
                F.try_divide(F.col("s1"), F.col("n1"))
                - F.try_divide(F.col("s0"), F.col("n0")),
                round_decimals,
            ).alias("obs_diff"),
            F.lit(int(n_perms)).cast("long").alias("n_perms"),
            "n_extreme",
            F.round(
                (F.col("n_extreme") + 1)
                / F.lit(float(n_perms + 1)),
                round_decimals,
            ).alias("p_value"),
        )
    )
