"""Retrieval-quality metrics: recall@k, precision@k, MRR@k, AP@k, nDCG@k.

The evaluation half of the retrieval stack: every ANN tier in this repo
(IVF / PQ / OPQ / binary-sign) trades recall for throughput, and the
tuners (``operators.ivfpq.tune_shortlist`` / ``tune_search_params``)
need recall measured DISTRIBUTED — collecting per-query result sets to
the driver stops scaling at exactly the query volumes where tuning
matters. This module computes the standard ranking metrics as pure
DataFrame aggregations so a 10M-query evaluation sweep runs as two
shuffles, not a driver loop.

Scale shape: one equi-join of the system ranking against the truth set
on (query, doc) — both sides shuffle-partitioned by the compound key —
then one hash-aggregate per query. The only window is per-query over
≤k ranked rows (bounded by construction). No collect, no crossJoin;
truth-side per-query aggregates (|relevant|, ideal DCG) are computed
with the same groupBy and joined back broadcast-eligible (Q rows).

Reference parity note: the reference scores results with weaviate's
certainty and leaves quality evaluation to the caller
(/root/reference/weaviate_txtai/ann/weaviate.py:154-170 returns raw
(id, score) pairs); this module is north-star surface, not a port.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def ranking_metrics(
    results: DataFrame,
    truth: DataFrame,
    k: int,
    *,
    query_col: str = "query_id",
    doc_col: str = "doc_id",
    rank_col: str = "rank",
    rel_col: str | None = None,
    decimals: int = 6,
) -> DataFrame:
    """Per-query ranking metrics of ``results`` against ``truth``.

    ``results``: (query, doc, rank) — the system ranking, rank 1-based;
    rows with rank > k are ignored. ``truth``: (query, doc[, rel]) —
    the relevant set; ``rel_col`` names a positive graded-relevance
    column (binary 1.0 when omitted).

    Output, one row per query appearing in ``results``:

    - ``recall_at_k``    |top-k ∩ relevant| / |relevant|
    - ``precision_at_k`` |top-k ∩ relevant| / k
    - ``mrr_at_k``       1 / rank of the first relevant hit (0 if none)
    - ``ap_at_k``        Σ_hits precision@hit-rank / min(|relevant|, k)
    - ``ndcg_at_k``      DCG@k / ideal-DCG@k with gain rel, discount
      log2(rank+1) (the standard Järvelin–Kekäläinen form)

    Queries with an empty relevant set score 0 on every metric (the
    division guards coalesce, they don't drop rows). All metrics are
    rounded to ``decimals`` for stable cross-engine comparison.
    """
    rel = (
        F.col(rel_col).cast("double")
        if rel_col is not None
        else F.lit(1.0)
    )
    # NULL query/doc ids excluded on both sides: a NULL query would
    # lump unkeyed result rows into one pseudo-query whose zero scores
    # deflate every macro average downstream
    t = truth.filter(
        F.col(query_col).isNotNull() & F.col(doc_col).isNotNull()
    ).select(
        F.col(query_col).alias("__q"),
        F.col(doc_col).alias("__d"),
        rel.alias("__rel"),
    )

    # per-query truth aggregates: |relevant| and ideal DCG@k (gains
    # sorted descending — a window over the truth rows of ONE query,
    # bounded by that query's relevant-set size)
    wt = Window.partitionBy("__q").orderBy(F.desc("__rel"), F.asc("__d"))
    tagg = (
        t.withColumn("__i", F.row_number().over(wt))
        .groupBy("__q")
        .agg(
            F.count(F.lit(1)).alias("__n_rel"),
            F.sum(
                F.when(
                    F.col("__i") <= k,
                    F.col("__rel") / F.log2(F.col("__i") + F.lit(1.0)),
                ).otherwise(F.lit(0.0))
            ).alias("__idcg"),
        )
    )

    sys = results.select(
        F.col(query_col).alias("__q"),
        F.col(doc_col).alias("__d"),
        F.col(rank_col).cast("long").alias("__r"),
    ).filter(
        (F.col("__r") <= k)
        & F.col("__q").isNotNull()
        & F.col("__d").isNotNull()
    )

    hits = sys.join(t, ["__q", "__d"], "left").select(
        "__q",
        "__r",
        F.coalesce("__rel", F.lit(0.0)).alias("__rel"),
    )
    # cumulative hit count in rank order → precision@rank at each hit
    wr = Window.partitionBy("__q").orderBy("__r")
    hits = hits.withColumn(
        "__cumhits",
        F.sum(F.when(F.col("__rel") > 0, 1).otherwise(0)).over(wr),
    )

    per_q = hits.groupBy("__q").agg(
        F.sum(F.when(F.col("__rel") > 0, 1).otherwise(0)).alias("__nhit"),
        F.max(
            F.when(F.col("__rel") > 0, 1.0 / F.col("__r"))
        ).alias("__rr"),
        F.sum(
            F.when(
                F.col("__rel") > 0,
                F.col("__cumhits") / F.col("__r"),
            ).otherwise(F.lit(0.0))
        ).alias("__psum"),
        F.sum(F.col("__rel") / F.log2(F.col("__r") + F.lit(1.0))).alias(
            "__dcg"
        ),
    )

    out = per_q.join(tagg, "__q", "left").select(
        F.col("__q").alias(query_col),
        F.round(
            F.coalesce(F.col("__nhit") / F.col("__n_rel"), F.lit(0.0)),
            decimals,
        ).alias("recall_at_k"),
        F.round(F.col("__nhit") / F.lit(float(k)), decimals).alias(
            "precision_at_k"
        ),
        F.round(F.coalesce("__rr", F.lit(0.0)), decimals).alias("mrr_at_k"),
        F.round(
            F.coalesce(
                F.col("__psum") / F.least(F.col("__n_rel"), F.lit(k)),
                F.lit(0.0),
            ),
            decimals,
        ).alias("ap_at_k"),
        F.round(
            F.when(F.col("__idcg") > 0, F.col("__dcg") / F.col("__idcg"))
            .otherwise(F.lit(0.0)),
            decimals,
        ).alias("ndcg_at_k"),
    )
    return out


def macro_metrics(per_query: DataFrame, decimals: int = 6) -> DataFrame:
    """Macro-average of ``ranking_metrics`` output: one row, the mean of
    each metric over queries (the headline number a tuning sweep
    reports). Single hash-aggregate."""
    cols = [
        "recall_at_k",
        "precision_at_k",
        "mrr_at_k",
        "ap_at_k",
        "ndcg_at_k",
    ]
    return per_query.agg(
        *[F.round(F.avg(c), decimals).alias(f"macro_{c}") for c in cols],
        F.count(F.lit(1)).alias("n_queries"),
    )


def cohens_kappa(
    df: DataFrame,
    rater_a_col: str,
    rater_b_col: str,
    *,
    round_decimals: int = 6,
) -> DataFrame:
    """Cohen's kappa (1960, public knowledge): chance-corrected
    agreement between two raters over the same items — the first
    number an LLM-judge pipeline reports (judge vs human, judge vs
    judge) since raw agreement is inflated by class imbalance.

    κ = (p_o − p_e) / (1 − p_e) with p_o the observed agreement and
    p_e = Σ_k P_a(k)·P_b(k) the chance agreement from the marginals.

    One (a, b) joint-count shuffle; marginals and the expectation fold
    from the joint table (label-domain-sized). Rows with a NULL label
    on either side are dropped. Output (1 row): ``n, p_o, p_e, kappa``
    — kappa NULL when p_e = 1 (both raters constant: agreement is
    trivially perfect and κ undefined)."""
    base = df.filter(
        F.col(rater_a_col).isNotNull() & F.col(rater_b_col).isNotNull()
    ).select(
        F.col(rater_a_col).alias("__a"), F.col(rater_b_col).alias("__b")
    )
    joint = base.groupBy("__a", "__b").agg(F.count(F.lit(1)).alias("__c"))
    ma = joint.groupBy("__a").agg(F.sum("__c").alias("__ca"))
    mb = joint.groupBy("__b").agg(F.sum("__c").alias("__cb"))
    tot = joint.agg(F.sum("__c").alias("__n"))
    po = joint.filter(F.col("__a") == F.col("__b")).agg(
        F.coalesce(F.sum("__c"), F.lit(0)).alias("__agree")
    )
    pe = (
        ma.join(mb, ma.__a == mb.__b)
        .join(F.broadcast(tot))
        .agg(
            F.sum(
                (F.col("__ca") / F.col("__n"))
                * (F.col("__cb") / F.col("__n"))
            ).alias("__pe")
        )
    )
    return (
        tot.join(F.broadcast(po))
        .join(F.broadcast(pe))
        .select(
            F.col("__n").cast("long").alias("n"),
            F.round(F.col("__agree") / F.col("__n"), round_decimals).alias(
                "p_o"
            ),
            F.round("__pe", round_decimals).alias("p_e"),
            F.round(
                F.try_divide(
                    F.col("__agree") / F.col("__n") - F.col("__pe"),
                    F.lit(1.0) - F.col("__pe"),
                ),
                round_decimals,
            ).alias("kappa"),
        )
    )


def roc_auc(
    df: DataFrame,
    *,
    label_col: str,
    score_col: str,
    round_decimals: int = 6,
) -> DataFrame:
    """ROC AUC of ``score_col`` as a ranker for the boolean/0-1
    ``label_col`` — the classifier-quality readout pipelines attach to
    every learned quality filter before trusting its threshold.

    Computed via the rank-sum identity AUC = U⁺/(n⁺·n⁻) with
    U⁺ = R⁺ − n⁺(n⁺+1)/2 over tie-averaged pooled ranks — exactly the
    Mann-Whitney statistic, so ties contribute ½ as the ROC trapezoid
    requires. NULL rows (either column) are excluded; one-class inputs
    yield NULL auc.

    Scale: ranks come from ``rankstats.avg_ranks`` (value-domain prefix
    sums, no global-order window); everything after is one aggregate.
    """
    from weaviate_txtai_spark.operators.rankstats import avg_ranks

    pos = F.col(label_col).cast("int") == 1
    sub = df.filter(
        F.col(label_col).isNotNull() & F.col(score_col).isNotNull()
    ).select(label_col, score_col)
    ranked = avg_ranks(sub, score_col, out_col="__r")
    agg = ranked.agg(
        F.count(F.when(pos, 1)).cast("long").alias("n_pos"),
        F.count(F.when(~pos, 1)).cast("long").alias("n_neg"),
        F.coalesce(F.sum(F.when(pos, F.col("__r"))), F.lit(0.0)).alias(
            "__rp"
        ),
    )
    np_, nn = F.col("n_pos"), F.col("n_neg")
    u = F.col("__rp") - np_ * (np_ + 1) / 2
    return agg.select(
        "n_pos",
        "n_neg",
        F.round(F.try_divide(u, (np_ * nn).cast("double")), round_decimals)
        .alias("auc"),
    )


def pass_at_k(
    df: DataFrame,
    task_col: str,
    success_col: str,
    *,
    ks: "tuple[int, ...]" = (1, 5, 10),
    round_decimals: int = 6,
) -> DataFrame:
    """Unbiased pass@k (Chen et al. 2021, the HumanEval estimator):
    per task with n attempts and c successes,

        pass@k = 1 − C(n−c, k)/C(n, k) = 1 − Π_{i<k} (n−c−i)/(n−i)

    averaged over tasks — the standard "would k samples have solved it"
    readout for eval harnesses scoring repeated generations. Tasks with
    n < k clamp k to n (with every attempt failing, C(n−c,k)/C(n,k)=1
    still holds; the clamp just drops the empty factors), so small-n
    tasks contribute their exact all-attempt estimate instead of being
    dropped.

    The product is evaluated factor-by-factor in DOUBLE (factors
    unrolled per literal k in a FIXED order, each factor an exact
    integer; numerator floors at 0 when c successes force a hit within
    any k draws): the running product rounds identically on any IEEE
    engine evaluating the same expression order, with no int64
    overflow ceiling for heavy-attempt tasks.

    Output: one row per k — ``k, n_tasks, pass_at_k``.

    Scale: one groupBy(task) + a |ks|-literal map + one 1-row mean.
    """
    if not ks or min(ks) < 1:
        raise ValueError("pass_at_k: ks must be positive")
    # NULL task ids excluded: one pseudo-task would otherwise pool every
    # unkeyed attempt and skew the across-task mean
    df = df.filter(F.col(task_col).isNotNull())
    per = df.groupBy(F.col(task_col).alias("__t")).agg(
        F.count(F.lit(1)).cast("long").alias("__n"),
        F.sum(F.col(success_col).cast("int")).cast("long").alias("__c"),
    )
    n, c = F.col("__n"), F.col("__c")
    outs = []
    for k in ks:
        num = F.lit(1.0)
        den = F.lit(1.0)
        for i in range(int(k)):
            in_range = F.lit(i) < F.least(F.lit(int(k)), n)
            num = num * F.when(
                in_range,
                F.greatest(n - c - F.lit(i), F.lit(0)).cast("double"),
            ).otherwise(F.lit(1.0))
            den = den * F.when(
                in_range, (n - F.lit(i)).cast("double")
            ).otherwise(F.lit(1.0))
        p = F.lit(1.0) - num / den
        outs.append(
            per.agg(
                F.lit(int(k)).cast("int").alias("k"),
                F.count(F.lit(1)).cast("long").alias("n_tasks"),
                F.round(F.avg(p), round_decimals).alias("pass_at_k"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


def wilson_interval(
    df: DataFrame,
    key_col: str,
    success_col: str,
    *,
    z: float = 1.959963985,
    round_decimals: int = 6,
) -> DataFrame:
    """Per-key Wilson score interval for a binomial rate (Wilson 1927)
    — "how not to sort by average rating": rank by the LOWER bound so
    a 1-of-1 success cannot outrank a 95-of-100.

        center = (p̂ + z²/2n) / (1 + z²/n)
        half   = z·√(p̂(1−p̂)/n + z²/4n²) / (1 + z²/n)

    Closed-form deterministic arithmetic on exact count ratios; the
    default z is the two-sided 95% literal.

    Output: ``key_col, n, c, rate, wilson_lb, wilson_ub``.

    Scale: one groupBy(key); everything else is a map.
    """
    # NULL keys excluded: a grouped NULL would emit a pseudo-key row
    # pooling every unkeyed trial's successes
    per = df.filter(F.col(key_col).isNotNull()).groupBy(
        F.col(key_col).alias("__k")
    ).agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(F.col(success_col).cast("int")).cast("double").alias("c"),
    )
    n, c = F.col("n"), F.col("c")
    p = c / n
    z2 = float(z) * float(z)
    denom = 1 + F.lit(z2) / n
    center = (p + F.lit(z2) / (2 * n)) / denom
    half = (
        F.lit(float(z))
        * F.sqrt(p * (1 - p) / n + F.lit(z2) / (4 * n * n))
        / denom
    )
    return per.select(
        F.col("__k").alias(key_col),
        n.cast("long").alias("n"),
        c.cast("long").alias("c"),
        F.round(p, round_decimals).alias("rate"),
        F.round(F.greatest(center - half, F.lit(0.0)), round_decimals)
        .alias("wilson_lb"),
        F.round(F.least(center + half, F.lit(1.0)), round_decimals)
        .alias("wilson_ub"),
    )
