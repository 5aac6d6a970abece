"""Measured scaling evidence: run the heavy operators at 1x and 2x the
sf0.1 corpus and report the runtime ratio.

The 100 TB claims in SCALING.md are plan arguments; this tool is the
empirical check that doubling the data does not quadruple the time. The
2x corpus is the sf0.1 table unioned with an id-shifted, CONTENT-PERTURBED
copy: every text token prefixed with 'x' (mere reordering is invisible to
bag-of-tokens simhash), every embedding given alternate sign flips (same
norm; reversal stayed correlated on the structured testdata vectors). The
perturbation keeps the size/length distribution but makes each clone NOT
a near-dup of its original (a byte-identical copy made every doc an exact
duplicate, inflating pair counts ~24x and making the 2x run structurally
denser than a real doubled corpus — ADVICE r2). Planted dup clusters are
cloned intact (both members get the same transform), so exact-threshold
pair counts (jaccard, minhash) grow ~2x. Caveat on the fuzzy ops, visible
in the committed output: simhash clone pairs can land past the hamming
cutoff (the prefix shifts every token hash, so rows_2x under-doubles) and
alternate sign-flip clones of unbalanced-energy vectors stay correlated
with their originals (embedding-LSH rows_2x over-doubles). The RUNTIME
ratio is still the signal — candidate generation is driven by bucket
structure, not by how many verified pairs survive — but rows_2x for those
two cases is not a "~2x pairs" check.

A separate Zipf-skew block measures the documented hot-shingle failure
mode: a corpus where every doc shares one boilerplate sentence (df = N
shingles). ``max_doc_freq`` must (a) keep the 1x->2x ratio ~linear and
(b) beat the uncapped run at the same N — the measured effect is
recorded in the output under ``skew``.

Usage: python tools/scale_check.py  -> one JSON line + SCALE_CHECK.json
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def merge_write(path: str, result: dict) -> dict:
    """Read-merge-write SCALE_CHECK.json: top-level sections this run
    did NOT re-measure (e.g. ``tail_4x`` from tools/tail4x.py) are
    preserved — the r9 full re-measure silently clobbered tail_4x
    while SCALING.md still cited it (VERDICT r9 task 3). Returns the
    merged dict; asserts no previous section is lost."""
    previous = {}
    if os.path.exists(path):
        with open(path) as f:
            previous = json.load(f)
    merged = dict(previous)
    merged.update(result)
    with open(path, "w") as f:
        f.write(json.dumps(merged) + "\n")
    # verify against the FILE, not the in-memory dict (dict.update can
    # never drop keys, so an in-memory check would be vacuous): re-read
    # what was actually written and assert every prior section survived
    with open(path) as f:
        written = json.load(f)
    lost = set(previous) - set(written)
    assert not lost, f"scale_check dropped sections on disk: {lost}"
    return merged


def q_heaps(d):
    """Heaps-law fit query body — module-level so tools/tail4x.py reuses
    the IDENTICAL construction (1x/2x here, 4x there must stay
    structurally comparable)."""
    from pyspark.sql import functions as F

    from weaviate_txtai_spark.functions.text import tokens as toks
    from weaviate_txtai_spark.operators.profile import heaps_fit

    dt = d.select("doc_id", F.explode(toks("text")).alias("term"))
    return heaps_fit(dt, "doc_id", "term", step=25)


def q_linkage_em(cust):
    """EM-linkage query body (perturbed b-side) — module-level for the
    same tail4x reuse reason as q_heaps."""
    from pyspark.sql import functions as F

    from weaviate_txtai_spark.operators.recordlinkage import (
        fs_em_fit, fs_em_weights, fs_pattern_counts_blocked,
        fs_topk_blocked,
    )

    a = cust.select(
        F.col("c_custkey").alias("ak"),
        F.col("c_nationkey").alias("an"),
        F.col("c_mktsegment").alias("aseg"),
        F.floor(F.col("c_acctbal") / 1000).alias("abucket"),
        F.substring("c_name", 10, 9).alias("aname"),
    )
    b = cust.select(
        F.col("c_custkey").alias("bk"),
        F.col("c_nationkey").alias("bn"),
        F.when(F.col("c_custkey") % 5 == 0, F.lit("PERTURBED"))
        .otherwise(F.col("c_mktsegment")).alias("bseg"),
        F.when(F.col("c_custkey") % 3 == 0,
               F.floor(F.col("c_acctbal") / 1000) + 1)
        .otherwise(F.floor(F.col("c_acctbal") / 1000)).alias("bbucket"),
        F.when(F.col("c_custkey") % 11 == 0, F.lit("XXXXXXXXX"))
        .otherwise(F.substring("c_name", 10, 9)).alias("bname"),
    )
    fields = {"eq_seg": ("aseg", "bseg"),
              "eq_bucket": ("abucket", "bbucket"),
              "eq_name": ("aname", "bname")}
    counts = fs_pattern_counts_blocked(
        a, b, a_block="an", b_block="bn", fields=fields
    )
    w = fs_em_weights(fs_em_fit(counts, 3, n_iter=8), list(fields))
    return fs_topk_blocked(
        a, b, w, 40, a_key="ak", b_key="bk",
        a_block="an", b_block="bn", fields=fields,
    )


def main() -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("scale-check")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from weaviate_txtai_spark.operators.dedup import (
        embedding_dup_pairs_lsh,
        jaccard_pairs,
        minhash_lsh_pairs,
        simhash_pairs,
    )
    from weaviate_txtai_spark.operators.simjoin import topk_join_ivf
    from weaviate_txtai_spark.sources.tables import load_table

    docs1 = load_table(spark, SF_DIR, "documents")
    n_docs = docs1.count()
    # perturbed clone: every token prefixed with 'x' — changes every
    # token HASH (simhash is bag-of-tokens, so mere reordering would be
    # invisible to it) and every shingle, while keeping token counts and
    # lengths essentially unchanged
    docs2 = docs1.unionByName(
        docs1.withColumn("doc_id", F.col("doc_id") + F.lit(1_000_000))
        .withColumn(
            "text",
            F.concat_ws(
                " ",
                F.transform(
                    F.split(F.col("text"), " "),
                    lambda t: F.concat(F.lit("x"), t),
                ),
            ),
        )
    )
    emb1 = load_table(spark, SF_DIR, "embeddings")
    # alternate sign flip: same norm, near-orthogonal direction for any
    # vector with balanced even/odd energy (reversal stayed correlated
    # on the structured testdata vectors), so the clone is not an
    # embedding near-dup
    emb2 = emb1.unionByName(
        emb1.withColumn("vec_id", F.col("vec_id") + F.lit(1_000_000))
        .withColumn(
            "embedding",
            F.transform(
                "embedding",
                lambda x, i: F.when(i % 2 == 0, x).otherwise(-x),
            ).cast("array<float>"),
        )
    )

    def q_jaccard(d):
        return jaccard_pairs(d, threshold=0.8)

    def q_minhash(d):
        return minhash_lsh_pairs(d, threshold=0.8)

    def q_simhash(d):
        return simhash_pairs(d, max_hamming=3)

    def q_simjoin(nlist):
        # nlist scales with the corpus (constant cell size): IVF probe
        # cost is Q x nprobe x cell_size, so fixed nlist at 2x data
        # doubles BOTH the query count and every cell - the operational
        # rule is nlist ∝ corpus (SCALING.md)
        def inner(e):
            left = e.select(
                F.col("vec_id").alias("query_id"),
                F.col("embedding").alias("query_vector"),
            )
            return topk_join_ivf(
                left, e, 3, right_id="vec_id", right_vec="embedding",
                nlist=nlist, nprobe=4,
            )

        return inner

    def q_semantic(k):
        # k ∝ corpus (the SemDeDup operational rule): cluster size stays
        # constant, so the per-cluster all-pairs join stage is linear in
        # the corpus. The assignment stage is then N·k FLOPs (4x at 2x
        # data + 2x k) — negligible at this size and GEMM-vectorized at
        # scale; SCALING.md carries the k ≈ √N balance point where the
        # whole operator is N^1.5.
        def inner(e):
            from weaviate_txtai_spark.operators.kmeans import (
                semantic_dedup_pairs,
            )

            return semantic_dedup_pairs(
                e, k=k, iters=2, threshold=0.45, strategy="gemm"
            )

        return inner

    def q_unigram(d):
        from weaviate_txtai_spark.operators.lm import nll_quality_filter

        return nll_quality_filter(d)

    def q_centrality(e):
        # kNN build (GEMM similarity join) + 3 fixed-point power
        # iterations — both linear in edges (E = 3N)
        from weaviate_txtai_spark.operators.graph import knn_graph, pagerank_exact

        return pagerank_exact(knn_graph(e, 3), iters=3)

    def q_simjoin_pq(nlist):
        # same nlist ∝ corpus rule as q_simjoin; production parameters
        # (nprobe < nlist, 10x shortlist) — the DataFrame-query PQ tier
        # (VERDICT r4 item 3 done-gate: measured 2x case)
        def inner(e):
            from weaviate_txtai_spark.operators.simjoin import (
                topk_join_ivfpq,
            )

            left = e.select(
                F.col("vec_id").alias("query_id"),
                F.col("embedding").alias("query_vector"),
            )
            return topk_join_ivfpq(
                left, e, 3, right_id="vec_id", right_vec="embedding",
                nlist=nlist, nprobe=4, m=8, k_pq=16, pq_iters=1,
                shortlist=10,
            )

        return inner

    def q_threshold_bucketed(e):
        # forced bucketed path with AUTO-SIZED planes/tables (VERDICT r4
        # item 4 done-gate): planes grow with the corpus (bounded bucket
        # population), tables follow the 0.99-recall model — the only
        # heavy path that previously had no measured 1x/2x ratio
        from weaviate_txtai_spark.operators.simjoin import threshold_join

        left = e.select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_vector"),
        )
        return threshold_join(
            left, e, 0.9, right_id="vec_id", right_vec="embedding",
            strategy="bucketed",
        )

    def q_prefix_jaccard(d):
        # r7 PPJoin twin: prefix index only — candidate volume should
        # track the all-items join's on this (hot-key-free) corpus
        from weaviate_txtai_spark.operators.setjoin import (
            jaccard_prefix_pairs,
        )

        return jaccard_prefix_pairs(d, threshold=0.8)

    def q_maxsim(e):
        # r7 late interaction: fixed 4-token query batch, doc tokens
        # double → one GEMM per doc group, expected linear
        from weaviate_txtai_spark.operators.lateinteraction import (
            maxsim_topk,
        )

        qt = e.filter(F.col("vec_id").isin(0, 7, 13, 42)).select(
            F.when(F.col("vec_id").isin(0, 7), F.lit(0))
            .otherwise(F.lit(1)).cast("long").alias("query_id"),
            F.col("embedding").alias("vector"),
        )
        dt = e.select(
            (F.col("vec_id") % 1000).alias("doc_id"),
            F.col("embedding").alias("vector"),
        )
        return maxsim_topk(qt, dt, 5)

    def q_ks_drift(d):
        # r7 drift monitor: corpus count is the only corpus-sized stage;
        # the grid work is (sources × distinct lengths), data-size-free
        from weaviate_txtai_spark.operators.drift import ks_drift

        return ks_drift(d, group_col="source", value_col="n_chars")

    # r7 batch 2: event/fact-table operators. Clones shift the entity
    # keys (+1M) so the doubled corpus has 2x independent users/orders,
    # not denser ones — per-key state stays constant, the honest 2x.
    ev1 = load_table(spark, SF_DIR, "events")
    ev2 = ev1.unionByName(
        ev1.withColumn("user_id", F.col("user_id") + F.lit(1_000_000))
        .withColumn("event_id", F.col("event_id") + F.lit(100_000_000))
    )
    li1 = load_table(spark, SF_DIR, "lineitem")
    li2 = li1.unionByName(
        li1.withColumn("l_orderkey", F.col("l_orderkey") + F.lit(100_000_000))
    )
    cp1 = (
        load_table(spark, SF_DIR, "orders")
        .join(li1, F.col("o_orderkey") == F.col("l_orderkey"))
        .select(F.col("o_custkey").alias("cust"), F.col("l_partkey").alias("part"))
    )
    # clone shifts BOTH sides: 2x customers over 2x parts — item
    # degrees constant, wedge fan-out per item constant, pairs ~2x
    cp2 = cp1.unionByName(
        cp1.withColumn("cust", F.col("cust") + F.lit(1_000_000))
        .withColumn("part", F.col("part") + F.lit(1_000_000))
    )

    def q_funnel_windowed(e):
        # per-user arrays: users double, per-user state constant ->
        # linear; the anchored max-over-anchors is per-row expression
        # work, no extra shuffle
        from weaviate_txtai_spark.operators.funnel import funnel

        return funnel(
            e.filter(F.col("event_id") % 3 == 0),
            ["signup", "view", "click"],
            window=86400,
        )

    def q_spearman(li):
        # value-grouped prefix sum: the clone repeats the same values,
        # so the distinct-value table is SIZE-CONSTANT at 2x — only the
        # (value groupBy + rank join) corpus stages double
        from weaviate_txtai_spark.operators.rankstats import spearman

        return spearman(
            li,
            [("l_quantity", "l_extendedprice"), ("l_discount", "l_tax")],
        )

    def q_basket_rules(li):
        # baskets double, per-basket pair fan-out constant -> pair
        # table ~2x through one map-side-combined aggregate
        from weaviate_txtai_spark.operators.itemsets import association_rules

        return association_rules(
            li, "l_orderkey", "l_partkey", min_pair_count=3
        )

    def q_affinity(cp):
        # degree-capped wedge join: per-item fan-out bounded by
        # C(cap,2); doubled independent entities -> ~2x wedges
        from weaviate_txtai_spark.operators.linkpred import link_scores

        return link_scores(cp, "cust", "part", max_item_degree=20, min_common=2)

    def q_phrase(d):
        # postings filter keeps only the phrase's terms; the clone's
        # tokens are 'x'-prefixed so its postings are filtered out at
        # the scan — the 2x cost is the doubled split+filter scan, the
        # shuffle stays 1x (documented: cost ∝ phrase-term frequency)
        from weaviate_txtai_spark.operators.phrase import phrase_match

        return phrase_match(d, "a a")

    def q_jsd(d):
        from weaviate_txtai_spark.functions.text import tokens
        from weaviate_txtai_spark.operators.drift import jsd_drift

        tok = d.select("source", F.explode(tokens("text")).alias("tok"))
        return jsd_drift(tok, group_col="source", token_col="tok")

    # r7 batch 3: string join, attribution, percentile rank, k-core,
    # persisted text index
    sup1 = load_table(spark, SF_DIR, "supplier")
    # clone names differ in ≥2 chars from every original (one char
    # would sit at edit distance 1 and create cross-half matches)
    sup2 = sup1.unionByName(
        sup1.withColumn("s_suppkey", F.col("s_suppkey") + F.lit(1_000_000))
        .withColumn(
            "s_name",
            F.concat(F.lit("XY"), F.substring("s_name", 3, 100)),
        )
    )
    ord1 = load_table(spark, SF_DIR, "orders")
    ord2 = ord1.unionByName(
        ord1.withColumn("o_custkey", F.col("o_custkey") + F.lit(1_000_000))
        .withColumn("o_orderkey", F.col("o_orderkey") + F.lit(100_000_000))
    )

    def q_editjoin(s):
        from weaviate_txtai_spark.operators.stringjoin import (
            edit_distance_join,
        )

        return edit_distance_join(s, "s_suppkey", "s_name", k=1)

    def q_attribution(e):
        from weaviate_txtai_spark.operators.attribution import attribution

        return attribution(
            e, touch_types=["view", "click"], conversion_type="purchase"
        )

    def q_pctrank(d):
        from weaviate_txtai_spark.operators.rankstats import (
            group_percentile_rank,
        )

        return group_percentile_rank(
            d.select("doc_id", "source", "n_chars"),
            "n_chars",
            group_col="source",
        )

    def q_kcore(o):
        # per-customer order cliques; 2x = 2x independent customers ->
        # edges double, peel depth constant (clique-ish)
        from weaviate_txtai_spark.operators.graph import k_core

        a = o.select("o_custkey", F.col("o_orderkey").alias("k1"))
        b = o.select("o_custkey", F.col("o_orderkey").alias("k2"))
        edges = (
            a.join(b, "o_custkey")
            .filter(F.col("k1") < F.col("k2"))
            .select(F.col("k1").alias("src"), F.col("k2").alias("dst"))
        )
        return k_core(edges, 15)

    def q_text_index(d):
        # build + query end-to-end (the ivfpq_knn pattern): build is one
        # corpus pass + bucket-partitioned write; the query side is
        # corpus-size-independent, so the ratio tracks the build
        import tempfile

        from weaviate_txtai_spark.operators.textindex import (
            bm25_from_index,
            build_text_index,
        )

        path = tempfile.mkdtemp(prefix="scale_textindex_")
        build_text_index(d, path)
        return bm25_from_index(spark, path, ["spark", "vector", "join"])

    def q_survival(e):
        # subjects (users) double independently; curve rows bounded by
        # the duration DOMAIN — value-domain windows, not subjects
        from weaviate_txtai_spark.operators.survival import kaplan_meier

        mx = e.agg(F.max("ts").alias("m"))
        s = (
            e.filter(F.col("event_type") == "signup")
            .groupBy("user_id").agg(F.min("ts").alias("t0"))
        )
        p = (
            e.filter(F.col("event_type") == "purchase")
            .join(s, "user_id").filter(F.col("ts") > F.col("t0"))
            .groupBy("user_id").agg(F.min("ts").alias("t1"))
        )
        subj = (
            s.join(p, "user_id", "left").join(F.broadcast(mx))
            .select(
                F.when(F.col("user_id") % 2 == 0, "A").otherwise("B")
                .alias("variant"),
                F.floor(
                    (F.unix_micros(F.coalesce("t1", "m"))
                     - F.unix_micros("t0")) / F.lit(86400e6)
                ).cast("int").alias("t"),
                F.when(F.col("t1").isNotNull(), 1).otherwise(0).alias("e"),
            )
        )
        return kaplan_meier(subj, "t", "e", group_col="variant")

    def q_dependence(e):
        # joint-count shuffle doubles; the stats run on the |X|x|Y|
        # joint table, size-constant at 2x
        from weaviate_txtai_spark.operators.infotheory import (
            categorical_dependence,
        )

        return categorical_dependence(
            e.select("event_type", F.hour("ts").alias("hr")),
            "event_type", "hr",
        )

    def q_qnorm(d):
        from weaviate_txtai_spark.operators.rankstats import (
            quantile_normalize,
        )

        return quantile_normalize(
            d.select("doc_id", "source", "n_chars"),
            "n_chars", group_col="source",
        )

    def q_multiphrase(d):
        from weaviate_txtai_spark.operators.phrase import multi_phrase_match

        return multi_phrase_match(d, ["a a", "table value", "spark a a"])

    def q_counted_pctl(o):
        from weaviate_txtai_spark.operators.rankstats import (
            group_percentiles,
        )

        return group_percentiles(
            o, "o_totalprice", [0.5, 0.9, 0.99],
            group_col="o_orderpriority",
        )

    # r8: co-visitation, sequence mining, HITS, CC (shipped path AND
    # forced-distributed stars), Holt fold
    def q_also_bought(li):
        from weaviate_txtai_spark.operators.itemsets import also_bought_topk

        return also_bought_topk(
            li, "l_orderkey", "l_partkey", 3, min_pair_count=2
        )

    def q_seq_pairs(e):
        from weaviate_txtai_spark.operators.seqmine import sequence_pairs

        return sequence_pairs(e, window_seconds=1800, min_support=2)

    def q_hits(cp):
        # the shipped gate path (fixed-point + local finish); both sizes
        # sit under the threshold, so this measures init + the
        # single-task integer kernel
        from weaviate_txtai_spark.operators.graph import hits_exact

        return hits_exact(
            cp.select(
                F.col("cust").alias("src"),
                (F.col("part") + F.lit(50_000_000)).alias("dst"),
            ),
            n_iter=4,
        )

    def q_hits_stars(cp):
        # forced all-distributed half-steps (the >threshold regime)
        from weaviate_txtai_spark.operators.graph import hits_exact

        return hits_exact(
            cp.select(
                F.col("cust").alias("src"),
                (F.col("part") + F.lit(50_000_000)).alias("dst"),
            ),
            n_iter=4,
            local_finish_edges=0,
        )

    def q_interval_overlap(e):
        from weaviate_txtai_spark.operators.asof import interval_overlap_join

        left = e.groupBy("user_id", F.to_date("ts").alias("__d")).agg(
            F.min("ts").alias("start"), F.max("ts").alias("end")
        ).drop("__d")
        right = e.filter(F.col("event_type") == "purchase").groupBy(
            F.to_date("ts").alias("day")
        ).agg(
            F.min("ts").alias("istart"), F.max("ts").alias("iend")
        ).drop("day")
        return interval_overlap_join(
            left, right, bucket_seconds=21600,
            right_start="istart", right_end="iend",
        )

    def q_bootstrap(li):
        from weaviate_txtai_spark.operators.bootstrap import (
            poisson_bootstrap_mean_ci,
        )

        return poisson_bootstrap_mean_ci(
            li.select(
                (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias(
                    "rid"
                ),
                "l_extendedprice",
            ),
            "l_extendedprice",
            id_col="rid",
            n_replicates=50,
        )

    def _chain_edges(o):
        from pyspark.sql import Window as W

        w = W.partitionBy("o_custkey").orderBy("o_orderkey")
        return o.select(
            F.col("o_orderkey").alias("src"),
            F.coalesce(
                F.lead("o_orderkey").over(w), F.col("o_orderkey")
            ).alias("dst"),
        )

    def q_cc_default(o):
        # the SHIPPED path: below the local-finish threshold at both
        # sizes — measures init shuffles + the single-task numpy kernel
        from weaviate_txtai_spark.operators.graph import connected_components

        return connected_components(_chain_edges(o))

    def q_cc_stars(o):
        # forced all-distributed star rounds (the >2M-edge regime's
        # per-round machinery, measured on the small corpus)
        from weaviate_txtai_spark.operators.graph import connected_components

        return connected_components(_chain_edges(o), local_finish_edges=0)

    def q_holt(e):
        from weaviate_txtai_spark.operators.changepoint import (
            holt_linear_exact,
        )
        from weaviate_txtai_spark.operators.seasonal import daily_counts

        grid = daily_counts(e).select(
            "grp", "day", F.col("n").cast("double").alias("v")
        )
        return holt_linear_exact(grid, "grp", "day", "v")

    def q_nb(d):
        # train-side counts + sparse (test-term x class) scoring join
        from weaviate_txtai_spark.operators.nbayes import nb_classify

        return nb_classify(
            d.filter(F.col("doc_id") % 5 != 0),
            d.filter(F.col("doc_id") % 5 == 0),
            label_col="lang",
        )

    def q_textrank(d):
        # adjacent-pair explode (corpus-sized) + vocab-sized pagerank
        from weaviate_txtai_spark.operators.textrank import textrank_terms

        return textrank_terms(d, top_k=20, iters=3)

    def q_setcover(d):
        # 8 greedy steps x (anti-join + agg + 1-row pick)
        from weaviate_txtai_spark.operators.setcover import greedy_set_cover

        return greedy_set_cover(d, 8, ngram=2)

    # BFS needs the GRAPH to double, not edge multiplicity: clone with
    # shifted part AND supplier keys (a disconnected second component)
    li2_bfs = li1.unionByName(
        li1.withColumn("l_partkey", F.col("l_partkey") + F.lit(10_000_000))
        .withColumn("l_suppkey", F.col("l_suppkey") + F.lit(10_000_000))
    )

    def q_bfs(l):
        from weaviate_txtai_spark.operators.graph import bfs_hops

        pairs = l.select(
            F.concat(F.lit("p:"), F.col("l_partkey")).alias("p"),
            F.concat(F.lit("s:"), F.col("l_suppkey")).alias("s"),
        ).distinct()
        edges = pairs.select(
            F.col("p").alias("src"), F.col("s").alias("dst")
        ).unionByName(
            pairs.select(F.col("s").alias("src"), F.col("p").alias("dst"))
        )
        seeds = (
            l.filter(F.col("l_partkey") % 97 == 0)
            .select(F.concat(F.lit("p:"), F.col("l_partkey")).alias("node"))
            .distinct()
        )
        return bfs_hops(edges, seeds, max_hops=3)

    # r10 additions: value-domain tau, hierarchical skyline, bucket-
    # prefix Heaps fit, marginal-count EM linkage (customer clone is a
    # DISJOINT component: keys AND blocking nation shifted)
    cust1 = load_table(spark, SF_DIR, "customer")
    cust2 = cust1.unionByName(
        cust1.withColumn("c_custkey", F.col("c_custkey") + F.lit(10_000_000))
        .withColumn("c_nationkey", F.col("c_nationkey") + F.lit(25))
    )

    def q_kendall(l):
        from weaviate_txtai_spark.operators.rankstats import kendall_tau_b

        return kendall_tau_b(l, "l_quantity", "l_discount")

    def q_skyline(l):
        from weaviate_txtai_spark.operators.skyline import skyline_2d

        per_part = l.groupBy(F.col("l_partkey").alias("pk")).agg(
            (F.sum(F.col("l_extendedprice").cast("decimal(18,2)")) * 100)
            .cast("long").alias("rc"),
            F.sum("l_quantity").cast("long").alias("q"),
        )
        return skyline_2d(per_part, "pk", "rc", "q")

    # q_heaps / q_linkage_em are module-level (shared with tools/tail4x.py)

    def q_clf(d):
        from weaviate_txtai_spark.cache import scoped_persist
        from weaviate_txtai_spark.functions.text import tokens as toks
        from weaviate_txtai_spark.operators.classifier import (
            fit_hard_sigmoid_gd,
            normalized_features,
            score_hard_sigmoid,
        )

        tok = d.select("doc_id", F.explode(toks("text")).alias("term"))
        tf = tok.groupBy("doc_id").agg(
            F.count(F.lit(1)).cast("long").alias("nt"),
            F.countDistinct("term").cast("long").alias("nd"),
            F.sum(F.length("term")).cast("long").alias("tl"),
        )
        f0 = d.join(tf, "doc_id", "left").select(
            "doc_id",
            F.when(
                F.col("source").isin("src0", "src1", "src2", "src3", "src4"),
                1,
            ).otherwise(0).cast("int").alias("y"),
            F.coalesce("nt", F.lit(0)).cast("long").alias("nt"),
            F.coalesce("nd", F.lit(0)).cast("long").alias("nd"),
            F.coalesce("n_chars", F.lit(0)).cast("long").alias("nc"),
            F.coalesce("tl", F.lit(0)).cast("long").alias("tl"),
        )
        xcols = ["x1", "x2", "x3", "x4"]
        feats = scoped_persist(
            normalized_features(f0, ["nt", "nd", "nc", "tl"], out_cols=xcols)
        )
        w = fit_hard_sigmoid_gd(feats, xcols, "y", n_iter=8)
        return feats.select(
            "doc_id", score_hard_sigmoid(xcols, w).alias("p")
        )

    cases = [
        ("dedup_ngram_jaccard", q_jaccard, q_jaccard, docs1, docs2),
        ("dedup_prefix_jaccard", q_prefix_jaccard, q_prefix_jaccard,
         docs1, docs2),
        ("maxsim_topk", q_maxsim, q_maxsim, emb1, emb2),
        ("source_drift_ks", q_ks_drift, q_ks_drift, docs1, docs2),
        ("dedup_minhash", q_minhash, q_minhash, docs1, docs2),
        ("dedup_simhash", q_simhash, q_simhash, docs1, docs2),
        ("dedup_embedding_lsh", embedding_dup_pairs_lsh,
         embedding_dup_pairs_lsh, emb1, emb2),
        ("sim_join_ivf", q_simjoin(16), q_simjoin(32), emb1, emb2),
        ("sim_join_ivfpq", q_simjoin_pq(16), q_simjoin_pq(32), emb1, emb2),
        ("threshold_join_bucketed", q_threshold_bucketed,
         q_threshold_bucketed, emb1, emb2),
        ("semantic_dedup", q_semantic(8), q_semantic(16), emb1, emb2),
        ("docs_unigram_nll", q_unigram, q_unigram, docs1, docs2),
        ("doc_centrality", q_centrality, q_centrality, emb1, emb2),
        ("events_funnel_windowed", q_funnel_windowed, q_funnel_windowed,
         ev1, ev2),
        ("lineitem_spearman", q_spearman, q_spearman, li1, li2),
        ("basket_rules", q_basket_rules, q_basket_rules, li1, li2),
        ("customer_affinity", q_affinity, q_affinity, cp1, cp2),
        ("phrase_match", q_phrase, q_phrase, docs1, docs2),
        ("source_drift_jsd", q_jsd, q_jsd, docs1, docs2),
        ("supplier_name_matches", q_editjoin, q_editjoin, sup1, sup2),
        ("purchase_attribution", q_attribution, q_attribution, ev1, ev2),
        ("docs_length_pctrank", q_pctrank, q_pctrank, docs1, docs2),
        ("order_clique_kcore", q_kcore, q_kcore, ord1, ord2),
        ("bm25_index_build_query", q_text_index, q_text_index, docs1, docs2),
        ("signup_to_purchase_survival", q_survival, q_survival, ev1, ev2),
        ("events_type_hour_dependence", q_dependence, q_dependence, ev1, ev2),
        ("docs_length_qnorm", q_qnorm, q_qnorm, docs1, docs2),
        ("multi_phrase_match", q_multiphrase, q_multiphrase, docs1, docs2),
        ("price_percentiles_counted", q_counted_pctl, q_counted_pctl,
         ord1, ord2),
        ("part_also_bought", q_also_bought, q_also_bought, li1, li2),
        ("events_sequence_pairs", q_seq_pairs, q_seq_pairs, ev1, ev2),
        ("customer_supplier_hits", q_hits, q_hits, cp1, cp2),
        ("customer_supplier_hits_stars", q_hits_stars, q_hits_stars,
         cp1, cp2),
        ("session_incident_overlap", q_interval_overlap,
         q_interval_overlap, ev1, ev2),
        ("lineitem_bootstrap_ci", q_bootstrap, q_bootstrap, li1, li2),
        ("order_chain_components", q_cc_default, q_cc_default, ord1, ord2),
        ("order_chain_components_stars", q_cc_stars, q_cc_stars,
         ord1, ord2),
        ("events_holt_forecast", q_holt, q_holt, ev1, ev2),
        ("docs_nb_langid", q_nb, q_nb, docs1, docs2),
        ("docs_textrank_terms", q_textrank, q_textrank, docs1, docs2),
        ("coverage_set_cover", q_setcover, q_setcover, docs1, docs2),
        ("part_supplier_bfs", q_bfs, q_bfs, li1, li2_bfs),
        ("lineitem_kendall_tau", q_kendall, q_kendall, li1, li2),
        ("part_pareto_frontier", q_skyline, q_skyline, li1, li2),
        ("docs_heaps_law", q_heaps, q_heaps, docs1, docs2),
        ("customer_linkage_em", q_linkage_em, q_linkage_em, cust1, cust2),
        ("docs_quality_classifier", q_clf, q_clf, docs1, docs2),
    ]

    def run_once(fn, data) -> tuple[float, int]:
        spark.catalog.clearCache()
        t0 = time.time()
        n = fn(data).count()
        return time.time() - t0, n

    def run(fn, data) -> tuple[float, int]:
        # min of 2: this box shares cores with noisy neighbors; a single
        # sample has shown 5x spikes that invert the 1x/2x ratio
        a = run_once(fn, data)
        b = run_once(fn, data)
        return min(a[0], b[0]), a[1]

    out = {}
    for name, fn1, fn2, d1, d2 in cases:
        run_once(fn1, d1)  # warm (JIT, file listing)
        t1, n1 = run(fn1, d1)
        t2, n2 = run(fn2, d2)
        out[name] = {
            "t_1x": round(t1, 3),
            "t_2x": round(t2, 3),
            "ratio": round(t2 / t1, 2) if t1 > 0 else None,
            "rows_1x": n1,
            "rows_2x": n2,
        }

    # ---- Zipf-skew block: the hot-shingle failure mode, measured -------
    # Every doc shares one 12-token boilerplate sentence (each of its
    # shingles has df = N → O(N²) candidate pairs uncapped) plus a
    # unique 20-token tail. max_doc_freq drops exactly the hot shingles.
    def skew_corpus(n: int):
        boiler = F.lit(
            "terms of service apply to all content on this page as follows"
        )
        tail = F.concat_ws(
            " ",
            F.transform(
                F.sequence(F.lit(1), F.lit(20)),
                lambda j: F.concat(
                    F.lit("t"), (F.col("id") * 20 + j).cast("string")
                ),
            ),
        )
        return spark.range(n).select(
            F.col("id").alias("doc_id"),
            F.concat_ws(" ", boiler, tail).alias("text"),
        )

    # sized so the uncapped hot-shingle join REALLY hurts: each of the
    # ~10 boilerplate shingles yields N²/2 candidate pairs (at N=6000
    # that's ~180M pair rows into the aggregate); the capped run drops
    # those keys before the join and stays corpus-linear
    N_SKEW = 6000
    capped = lambda d: jaccard_pairs(d, threshold=0.8, max_doc_freq=50)
    uncapped = lambda d: jaccard_pairs(d, threshold=0.8)
    run_once(capped, skew_corpus(N_SKEW))  # warm
    tc1, _ = run(capped, skew_corpus(N_SKEW))
    tc2, _ = run(capped, skew_corpus(2 * N_SKEW))
    tu1, _ = run(uncapped, skew_corpus(N_SKEW))
    skew = {
        "n_docs_1x": N_SKEW,
        "capped_t_1x": round(tc1, 3),
        "capped_t_2x": round(tc2, 3),
        "capped_ratio": round(tc2 / tc1, 2) if tc1 > 0 else None,
        "uncapped_t_1x": round(tu1, 3),
        "cap_speedup_1x": round(tu1 / tc1, 2) if tc1 > 0 else None,
    }

    # ---- pack_sequences shard block: single-source serialization ------
    # One giant source: the default plan funnels every row through ONE
    # window task; shards=N splits it into N parallel sub-streams
    # (VERDICT r2 item 2). Measured here so the fix has numbers.
    from weaviate_txtai_spark.operators.chunking import pack_sequences

    def single_source(n: int):
        return spark.range(n).select(
            F.col("id").alias("doc_id"),
            F.lit("the_one_source").alias("source"),
            F.concat_ws(
                " ",
                F.transform(
                    F.sequence(F.lit(1), F.lit(30)),
                    lambda j: F.concat(F.lit("w"), j.cast("string")),
                ),
            ).alias("text"),
        )

    N_PACK = 3_000_000

    # materialize the corpus to parquet first: a real corpus is a scan,
    # not a codegen generator whose recompute cost pollutes the ratio
    import tempfile

    import shutil

    pack_dir = tempfile.mkdtemp(prefix="scale_pack_")
    try:
        single_source(N_PACK).write.mode("overwrite").parquet(pack_dir)
        pack_src = spark.read.parquet(pack_dir)

        # force real execution: a bare count() lets Catalyst prune the
        # unused window, and count() over a global aggregate constant-folds
        # to 1 — both "measured" a 3M-row global sort in 0.13 s that never
        # ran. collect()ing the aggregate values runs the actual plan.
        def run_pack_once(sh) -> float:
            spark.catalog.clearCache()
            p = (
                pack_sequences(pack_src, budget=512, shards=sh)
                if sh
                else pack_sequences(pack_src, budget=512)
            )
            t0 = time.time()
            p.agg(F.sum("pack_id"), F.max("pack_id")).collect()
            return time.time() - t0

        run_pack_once(None)  # warm
        tp_serial = min(run_pack_once(None), run_pack_once(None))
        tp_shard = min(run_pack_once(int(CPUS)), run_pack_once(int(CPUS)))
        pack = {
            "n_docs": N_PACK,
            "t_unsalted": round(tp_serial, 3),
            "t_sharded": round(tp_shard, 3),
            "speedup": round(tp_serial / tp_shard, 2) if tp_shard > 0 else None,
        }

        # ---- IVF recall block: the curve that justifies nprobe --------
        # Measured {nprobe: recall@10} at 1x (nlist=16) and at the 2x
        # corpus under the nlist ∝ corpus rule (nlist=32): the rule's
        # promise is that recall AT A FIXED nprobe/nlist FRACTION stays
        # stable as the corpus doubles. The testdata embeddings are
        # near-isotropic (worst case for IVF — see SCALING.md), so the
        # absolute numbers measure the harness floor, not production
        # recall.
        from weaviate_txtai_spark.operators.ann import IVFIndex, tune_nprobe

        def recall_curve(e, nlist):
            qdf = (
                e.filter(F.pmod(F.xxhash64("vec_id"), F.lit(20)) == 0)
                .limit(150)
                .select(
                    F.col("vec_id").alias("query_id"),
                    F.col("embedding").alias("query_vector"),
                )
            )
            idx = IVFIndex.build(e, nlist=nlist)
            _, curve = tune_nprobe(idx, qdf, 10, recall_target=1.1)
            return {str(k): round(v, 4) for k, v in sorted(curve.items())}

        ivf_recall = {
            "curve_1x_nlist16": recall_curve(emb1, 16),
            "curve_2x_nlist32": recall_curve(emb2, 32),
        }

        # ---- IVF-PQ block: build + batch-search under nlist ∝ corpus --
        from weaviate_txtai_spark.operators.ivfpq import IVFPQIndex

        def ivfpq_times(e, nlist):
            qs = [
                (r["vec_id"], list(r["embedding"]))
                for r in e.filter(
                    F.pmod(F.xxhash64("vec_id"), F.lit(20)) == 0
                ).limit(150).collect()
            ]
            spark.catalog.clearCache()
            t0 = time.time()
            idx = IVFPQIndex.build(e, nlist=nlist, m=8, k_pq=16, pq_iters=2)
            idx.codes.count()
            tb = time.time() - t0
            t0 = time.time()
            n = idx.search(qs, 10, nprobe=4, shortlist=5).count()
            return tb, time.time() - t0, n

        b1, s1, n1 = ivfpq_times(emb1, 16)
        b2, s2, n2 = ivfpq_times(emb2, 32)
        ivfpq = {
            "t_build_1x": round(b1, 3), "t_search_1x": round(s1, 3),
            "t_build_2x": round(b2, 3), "t_search_2x": round(s2, 3),
            "build_ratio": round(b2 / b1, 2) if b1 > 0 else None,
            "search_ratio": round(s2 / s1, 2) if s1 > 0 else None,
            "rows_1x": n1, "rows_2x": n2,
        }

        result = {
            "metric": "scale_ratio_2x",
            "sf": SF_DIR,
            "n_docs_1x": n_docs,
            "cases": out,
            "skew": skew,
            "pack": pack,
            "ivf_recall": ivf_recall,
            "ivfpq": ivfpq,
        }
        print(json.dumps(result))
        merge_write(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "SCALE_CHECK.json"), result)
    finally:
        shutil.rmtree(pack_dir, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
