"""Plan-shape regression tests: the scale properties SURVEY §4 promises
(pushdown, pruning, broadcast, TakeOrderedAndProject, codegen) asserted
on the actual physical plans."""

import re

from pyspark.sql import functions as F

from weaviate_txtai_spark.plans import queries as Q
from weaviate_txtai_spark.plans.explain import (
    codegen_stage_count,
    has_pushed_filter,
    is_take_ordered,
    physical_plan,
    scan_read_schema,
    uses_broadcast_join,
)
from weaviate_txtai_spark.sources.tables import load_table


def test_metadata_filter_pushed_to_parquet(spark, sf_dir):
    # similar_sql: n_chars >= 100 must reach the documents scan
    df = Q.similar_sql_q(spark, sf_dir)
    assert has_pushed_filter(df, "GreaterThanOrEqual(n_chars,100")


def test_shipdate_filter_pushed(spark, sf_dir):
    df = Q.pricing_summary_q(spark, sf_dir)
    assert has_pushed_filter(df, "l_shipdate")


def test_column_pruning_on_knn(spark, sf_dir):
    # knn reads only vec_id + embedding, never label
    df = Q.knn_topk_q(spark, sf_dir)
    schema = scan_read_schema(df, "embeddings")
    assert schema and "label" not in schema
    assert "vec_id" in schema and "embedding" in schema


def test_pricing_summary_reads_needed_columns_only(spark, sf_dir):
    df = Q.pricing_summary_q(spark, sf_dir)
    schema = scan_read_schema(df, "lineitem")
    assert schema and "l_orderkey" not in schema and "l_partkey" not in schema


def test_single_query_topk_is_take_ordered(spark, sf_dir):
    assert is_take_ordered(Q.knn_topk_q(spark, sf_dir))


def test_dim_joins_are_broadcast(spark, sf_dir):
    df = Q.revenue_by_nation_q(spark, sf_dir)
    assert uses_broadcast_join(df)
    # the big fact-fact join must NOT broadcast lineitem
    plan = physical_plan(df)
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan or plan.count("BroadcastHashJoin") >= 2


def test_relational_plans_are_codegen(spark, sf_dir):
    assert codegen_stage_count(Q.pricing_summary_q(spark, sf_dir)) >= 1
    assert codegen_stage_count(Q.events_hourly_q(spark, sf_dir)) >= 1


def test_knn_broadcasts_query_side(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    from weaviate_txtai_spark.operators.topk import knn_topk

    qdf = emb.limit(3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vector")
    )
    df = knn_topk(emb, qdf, 5, vector_col="embedding", id_col="vec_id")
    assert uses_broadcast_join(df)  # index side is never shuffled pre-window


def test_late_shipment_exists_is_semi_join(spark, sf_dir):
    # the correlated EXISTS must plan as a semi join, never a full join
    # followed by distinct
    plan = physical_plan(Q.late_shipment_priority_q(spark, sf_dir))
    assert "LeftSemi" in plan
    assert "Distinct" not in plan


def test_disjunctive_brand_filter_pushed_and_broadcast(spark, sf_dir):
    df = Q.disjunctive_selection_q(spark, sf_dir)
    # the common-factor brand IN-list reaches the part parquet scan
    assert has_pushed_filter(df, "p_brand")
    assert uses_broadcast_join(df)


def test_doc_chunks_is_map_only(spark, sf_dir):
    # explode+substring chunking must not shuffle at all
    plan = physical_plan(Q.doc_chunks_q(spark, sf_dir))
    assert "Exchange" not in plan


def test_rolling_avg_single_shuffle_on_user(spark, sf_dir):
    plan = physical_plan(Q.events_rolling_avg_q(spark, sf_dir))
    assert plan.count("Exchange hashpartitioning") == 1
    assert "user_id" in plan.split("Exchange hashpartitioning", 1)[1][:200]


def test_partitioned_layout_prunes_directories(spark, sf_dir, tmp_path):
    """write_partitioned: a lang= equality predicate must become a
    PartitionFilter on the scan (directory pruning), not a data filter."""
    from weaviate_txtai_spark.sources.tables import load_table, write_partitioned

    docs = load_table(spark, sf_dir, "documents")
    path = str(tmp_path / "docs_by_lang")
    write_partitioned(docs, path, partition_cols=["lang"], sort_cols=["doc_id"])

    scan = spark.read.parquet(path).filter(F.col("lang") == "en").select("doc_id")
    plan = physical_plan(scan)
    assert "PartitionFilters" in plan
    pf_line = [l for l in plan.splitlines() if "PartitionFilters" in l][0]
    assert "lang" in pf_line.split("PartitionFilters", 1)[1]
    # and the pruned read returns exactly the en docs
    n_en = docs.filter(F.col("lang") == "en").count()
    assert scan.count() == n_en


def test_bm25_has_no_corpus_vocabulary_shuffle(spark, sf_dir):
    """BM25's shuffles aggregate query-term hits and the final per-doc
    sum — never a full doc-term tf table. Bound the exchange count so a
    regression back to the corpus-granularity plan fails."""
    plan = physical_plan(Q.bm25_topk_q(spark, sf_dir))
    # dedupe by PARTITIONING-KEY signature, not plan_id: the qtf table
    # is persisted EAGERLY (r14), so its already-executed fill exchange
    # is reprinted with a fresh plan_id under each InMemoryTableScan
    # reference — one physical shuffle, several printed ids
    shuffle_keys = set()
    for line in plan.splitlines():
        m = re.search(r"- Exchange hashpartitioning\(([^)]*)\)", line)
        if m:
            shuffle_keys.add(
                tuple(re.findall(r"(\w+)#\d+", m.group(1)))
            )
    # exactly: qtf groupBy (query-term hits), dfreq groupBy (tiny), and
    # the final per-doc sum — a fourth distinct hash-shuffle key would
    # mean the corpus-wide doc-term tf aggregate came back
    assert len(shuffle_keys) <= 3, plan
    assert "TakeOrderedAndProject" in plan


def test_pq_encode_is_map_only(spark, sf_dir):
    """PQ encoding must add no exchange: per-subspace argmin over
    codebook literals is pure projection over the scan."""
    from weaviate_txtai_spark.operators.pq import pq_encode, train_pq

    emb = load_table(spark, sf_dir, "embeddings")
    model = train_pq(emb, m=4, k=4, iters=0)
    plan = physical_plan(
        pq_encode(emb, model, dist_round_decimals=6, packed=True)
    )
    assert "Exchange" not in plan


def test_adc_topk_is_take_ordered(spark, sf_dir):
    """ADC search must compile to TakeOrderedAndProject — never a global
    sort of the scored corpus."""
    from weaviate_txtai_spark.operators.pq import (
        adc_topk, pq_encode, train_pq,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    model = train_pq(emb, m=4, k=4, iters=0)
    coded = pq_encode(emb, model, dist_round_decimals=6, packed=False)
    q = list(emb.select("embedding").head()[0])
    plan = physical_plan(adc_topk(coded, model, q, 10))
    assert "TakeOrderedAndProject" in plan


def test_threshold_join_bucketed_has_no_broadcast_nested_loop(spark, sf_dir):
    """The large-left threshold join must not plan a broadcast NL join
    (the r3 scale-killer): the bucketed path is mapInPandas bucketize +
    one grouped shuffle."""
    from weaviate_txtai_spark.operators.simjoin import threshold_join

    emb = load_table(spark, sf_dir, "embeddings")
    left = emb.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vector"),
    )
    plan = physical_plan(
        threshold_join(
            left, emb, 0.9, strategy="bucketed", num_planes=8,
            num_tables=4, right_id="vec_id", right_vec="embedding",
        )
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_ivfpq_codes_scan_never_reads_vectors(spark, sf_dir, tmp_path):
    """On a SAVED index, the ADC-only search plan must scan only the
    codes parquet (id/cell/pq_code) — the float vector file is never
    touched, the whole point of the coded table. (The in-memory build
    keeps the encode lineage inside its cache plan, so the assertion
    runs against the persisted form — the shape production uses.)"""
    from weaviate_txtai_spark.operators.ivfpq import IVFPQIndex

    emb = load_table(spark, sf_dir, "embeddings")
    idx = IVFPQIndex.build(emb, nlist=4, m=4, k_pq=8, pq_iters=1)
    path = str(tmp_path / "ivfpq")
    idx.save(path)
    loaded = IVFPQIndex.load(spark, path)
    q = [(0, list(emb.select("embedding").head()[0]))]
    plan = physical_plan(loaded.search(q, 5, nprobe=2, shortlist=None))
    assert "pq_code" in plan
    assert "embedding" not in plan
    assert f"{tmp_path}/ivfpq/vectors" not in plan


def test_dynamic_partition_pruning_on_partitioned_fact(spark, sf_dir, tmp_path):
    """A date-partitioned fact joined to a filtered dim must plan
    dynamic partition pruning: the fact scan's partition filter is fed
    from the dim side at RUNTIME, so only matching date directories are
    read — the mechanism that makes dim-filtered fact joins viable at
    100 TB. Requires the join key to BE the partition column."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "d", F.to_date("ts")
    )
    fact_dir = str(tmp_path / "events_by_day")
    ev.write.partitionBy("d").parquet(fact_dir)
    fact = spark.read.parquet(fact_dir)
    # the dim must be a FILTERED scan (DPP inserts the pruning subquery
    # only when the dim side carries a selective predicate; a bare
    # limit/local relation does not qualify)
    dim_dir = str(tmp_path / "day_dim")
    (
        ev.select("d").distinct()
        .withColumn("tag", F.when(F.dayofmonth("d") <= 3, "picked")
                    .otherwise("other"))
        .write.parquet(dim_dir)
    )
    dim = spark.read.parquet(dim_dir).filter(F.col("tag") == "picked")
    joined = fact.join(dim, "d").groupBy("tag").count()
    plan = physical_plan(joined)
    assert "dynamicpruning" in plan.lower(), plan[:2000]


def test_hamming_topk_is_take_ordered(spark, sf_dir):
    """Binary-tier search must compile to TakeOrderedAndProject — the
    per-partition top-n merge, never a global sort of scored codes."""
    from weaviate_txtai_spark.functions.vector import sign_pack
    from weaviate_txtai_spark.operators.topk import hamming_topk

    emb = load_table(spark, sf_dir, "embeddings")
    codes = emb.select(
        "vec_id", sign_pack(F.col("embedding")).alias("sign_code")
    )
    qcode = [int(w) for w in codes.head()["sign_code"]]
    plan = physical_plan(hamming_topk(codes, qcode, 10))
    assert "TakeOrderedAndProject" in plan


def test_resample_scans_events_once(spark, sf_dir):
    """The grid derivation and the gap join both consume the bucket
    aggregate; the persisted aggregate keeps the RAW event scan single
    (unpersisted, the plan read the parquet twice)."""
    from weaviate_txtai_spark.cache import cache_scope
    from weaviate_txtai_spark.operators.resample import resample_ffill

    ev = load_table(spark, sf_dir, "events")
    with cache_scope():
        out = resample_ffill(
            ev, keys=["event_type"], ts_col="ts", value_col="value",
            unit="hour",
        )
        plan = physical_plan(out)
        # both consumers must read the CACHED aggregate (the printer
        # repeats the InMemoryRelation's child subtree, so counting raw
        # FileScan lines overstates the executed scans)
        assert plan.count("InMemoryTableScan") == 2
        assert "CartesianProduct" not in plan


def test_table_diff_is_single_equi_join(spark, sf_dir):
    """The diff is ONE full-outer equi-join — no nested-loop, no second
    pass, no window."""
    from weaviate_txtai_spark.operators.diff import table_diff

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    d = table_diff(
        orders, orders.withColumn("o_totalprice", F.col("o_totalprice") + 1),
        key_cols=["o_orderkey"],
    )
    plan = physical_plan(d)
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert plan.count("SortMergeJoin") + plan.count("ShuffledHashJoin") == 1
    assert "Window" not in plan


# ---------------------------------------------------------------- round 7


def test_prefix_jaccard_no_cartesian(spark, sf_dir):
    """The PPJoin candidate stage is an equi-join on the prefix item —
    a cartesian product would mean the prefix filter fell out of the
    plan."""
    from weaviate_txtai_spark.operators.setjoin import jaccard_prefix_pairs

    df = jaccard_prefix_pairs(
        load_table(spark, sf_dir, "documents"), threshold=0.8
    )
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_triangle_count_no_cartesian_and_pruned_scan(spark, sf_dir):
    """Wedge + closing joins are equi-joins; the orders scan feeding the
    clique edges reads only custkey + orderkey."""
    df = Q.order_clique_triangles_q(spark, sf_dir)
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan
    schema = scan_read_schema(df, "orders")
    assert schema and "o_totalprice" not in schema


def test_maxsim_single_doc_shuffle(spark, sf_dir):
    """MaxSim shuffles doc tokens ONCE (the groupBy doc_id feeding
    applyInPandas); the query tokens ride in the closure, so no join
    operator of any kind appears."""
    df = Q.maxsim_topk_q(spark, sf_dir)
    plan = physical_plan(df)
    for op in ("Join", "CartesianProduct"):
        assert op not in plan, op
    assert "FlatMapGroupsInPandas" in plan or "FlatMapGroupsIn" in plan


def test_ks_drift_no_corpus_sized_cross(spark, sf_dir):
    """The only crossJoin in ks_drift is the bounded (groups × value
    grid) broadcast — assert it IS a broadcast nested loop (tiny), and
    that the documents scan is pruned to the two used columns."""
    df = Q.source_drift_ks_q(spark, sf_dir)
    plan = physical_plan(df)
    schema = scan_read_schema(df, "documents")
    assert schema and "text" not in schema
    assert "CartesianProduct" not in plan


def test_retrieval_eval_truth_join_shuffles_on_compound_key(spark, sf_dir):
    """ranking_metrics joins system × truth as an equi-join (hash or
    sort-merge), never a nested loop."""
    df = Q.retrieval_eval_q(spark, sf_dir)
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan


def test_kendall_no_cartesian_and_pruned_scan(spark, sf_dir):
    """τ-b: the cell-pair join must be a real join on the x-inequality
    over the tiny cell table — never a row-level cross — and the
    lineitem scan must read only the two correlated columns."""
    df = Q.lineitem_kendall_tau_q(spark, sf_dir)
    schema = scan_read_schema(df, "lineitem")
    assert schema and "l_extendedprice" not in schema
    assert "l_quantity" in schema and "l_discount" in schema


def test_pareto_frontier_no_quadratic_anti_join(spark, sf_dir):
    """skyline_2d: no broadcast nested loop over the parts domain —
    the plan is groupBys + equi/inequality joins on bucket-sized
    sides; the lineitem scan is pruned to the three needed columns."""
    df = Q.part_pareto_frontier_q(spark, sf_dir)
    schema = scan_read_schema(df, "lineitem")
    assert schema and "l_orderkey" not in schema
    plan = physical_plan(df)
    # the quadratic NOT EXISTS shape would appear as a nested-loop
    # anti join; the hierarchical path has none
    assert "ExistenceJoin" not in plan
    assert not re.search(r"BroadcastNestedLoopJoin.*LeftAnti", plan)


def test_heaps_single_corpus_reduction(spark, sf_dir):
    """heaps_fit: the documents scan reads only doc_id + text, and the
    checkpoint prefix runs on bucket-domain rows (no row-level window
    — asserted globally by the window-discipline walk; here: scan
    pruning + at least one codegen stage)."""
    df = Q.docs_heaps_law_q(spark, sf_dir)
    schema = scan_read_schema(df, "documents")
    assert schema and "source" not in schema and "lang" not in schema
    assert codegen_stage_count(df) >= 1


def test_quality_classifier_scoring_is_map_only(spark, sf_dir):
    """docs_quality_classifier: after training (driver-side weights),
    scoring must be a projection over the PERSISTED feature table —
    no join above the cache boundary, weights inlined as literals;
    the only exchange above it is the deterministic output sort. The
    documents scan below the cache reads only the needed columns."""
    df = Q.docs_quality_classifier_q(spark, sf_dir)
    plan = physical_plan(df)
    assert "InMemoryTableScan" in plan
    above_cache = plan.split("InMemoryTableScan")[0]
    assert "Join" not in above_cache
    # feature build below the cache prunes the documents scan
    schema = scan_read_schema(df, "documents")
    assert schema and "lang" not in schema
