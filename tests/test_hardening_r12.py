"""r12 NULL-key audit regressions (VERDICT r11 task 3): every keyed
operator found unguarded in the enumeration audit gets an off-fixture
NULL-key case proving unkeyed rows no longer lump, leak, or restore."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    ArrayType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)


def _df(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


VEC = ArrayType(DoubleType())


def test_knn_topk_excludes_null_query_ids(spark):
    from weaviate_txtai_spark.operators.topk import knn_topk

    idx = _df(
        spark,
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])],
        StructType([StructField("docid", LongType()), StructField("vector", VEC)]),
    )
    q = _df(
        spark,
        [(10, [1.0, 0.0]), (None, [1.0, 0.0]), (None, [0.0, 1.0])],
        StructType(
            [StructField("query_id", LongType()), StructField("query_vector", VEC)]
        ),
    )
    res = knn_topk(idx, q, 1).collect()
    # the two NULL queries would have lumped into ONE ranked list
    assert [r["query_id"] for r in res] == [10]


def test_knn_topk_gemm_rejects_none_query_ids(spark):
    from weaviate_txtai_spark.operators.topk import knn_topk_gemm

    idx = _df(
        spark,
        [(1, [1.0, 0.0])],
        StructType([StructField("docid", LongType()), StructField("vector", VEC)]),
    )
    with pytest.raises(ValueError, match="must not be None"):
        knn_topk_gemm(idx, [(None, [1.0, 0.0])], 1, query_id_type=LongType())


def test_mmr_select_excludes_null_keys(spark):
    from weaviate_txtai_spark.operators.mmr import mmr_select

    schema = StructType(
        [
            StructField("query_id", LongType()),
            StructField("doc_id", LongType()),
            StructField("score", DoubleType()),
            StructField("vector", VEC),
        ]
    )
    cand = _df(
        spark,
        [
            (1, 100, 0.9, [1.0, 0.0]),
            (1, 101, 0.8, [0.0, 1.0]),
            (None, 200, 0.99, [1.0, 0.0]),  # unkeyed query
            (1, None, 0.95, [1.0, 0.0]),  # unkeyed candidate
        ],
        schema,
    )
    res = mmr_select(cand, 5).collect()
    assert {(r["query_id"], r["doc_id"]) for r in res} == {(1, 100), (1, 101)}


def test_maxsim_excludes_null_ids(spark):
    from weaviate_txtai_spark.operators.lateinteraction import maxsim_scores

    tok = StructType(
        [StructField("query_id", LongType()), StructField("vector", VEC)]
    )
    dok = StructType(
        [StructField("doc_id", LongType()), StructField("vector", VEC)]
    )
    q = _df(spark, [(1, [1.0, 0.0]), (None, [0.0, 1.0])], tok)
    d = _df(spark, [(7, [1.0, 0.0]), (None, [1.0, 0.0])], dok)
    res = maxsim_scores(q, d).collect()
    assert [(r["query_id"], r["doc_id"]) for r in res] == [(1, 7)]


def test_pagerank_excludes_null_endpoints(spark):
    from weaviate_txtai_spark.operators.graph import pagerank

    e = _df(
        spark,
        [(1, 2), (2, 1), (None, 1), (2, None)],
        StructType([StructField("src", LongType()), StructField("dst", LongType())]),
    )
    res = pagerank(e, iters=2).collect()
    assert {r["id"] for r in res} == {1, 2}  # no NULL pseudo-node


def test_bfs_hops_excludes_null_nodes(spark):
    from weaviate_txtai_spark.operators.graph import bfs_hops

    e = _df(
        spark,
        [(1, 2), (2, None), (None, 3)],
        StructType([StructField("src", LongType()), StructField("dst", LongType())]),
    )
    seeds = _df(
        spark, [(1,), (None,)], StructType([StructField("node", LongType())])
    )
    res = bfs_hops(e, seeds, max_hops=3).collect()
    assert {r["node"] for r in res} == {1, 2}  # NULL never surfaces


def test_ppr_null_seed_does_not_dilute(spark):
    from weaviate_txtai_spark.operators.graph import (
        personalized_pagerank_exact,
    )

    e = _df(
        spark,
        [(1, 2), (2, 1)],
        StructType([StructField("src", LongType()), StructField("dst", LongType())]),
    )
    s1 = _df(spark, [(1,)], StructType([StructField("id", LongType())]))
    s2 = _df(
        spark, [(1,), (None,)], StructType([StructField("id", LongType())])
    )
    a = {r["id"]: r["rank_fp"] for r in personalized_pagerank_exact(e, s1).collect()}
    b = {r["id"]: r["rank_fp"] for r in personalized_pagerank_exact(e, s2).collect()}
    assert a == b  # the NULL seed neither counts nor receives teleport


EVENT_SCHEMA = StructType(
    [
        StructField("event_type", StringType()),
        StructField("ts", TimestampType()),
    ]
)


def test_seasonal_grid_excludes_null_groups(spark):
    import datetime as dt

    from weaviate_txtai_spark.operators.seasonal import daily_counts

    rows = [
        ("click", dt.datetime(2025, 1, 6)),
        (None, dt.datetime(2025, 1, 6)),
        (None, dt.datetime(2025, 1, 7)),
    ]
    res = daily_counts(_df(spark, rows, EVENT_SCHEMA)).collect()
    assert [r["grp"] for r in res] == ["click"]


def test_stratified_ate_excludes_null_stratum_and_arm(spark):
    from weaviate_txtai_spark.operators.abtest import stratified_ate

    schema = StructType(
        [
            StructField("t", LongType()),
            StructField("y", DoubleType()),
            StructField("s", LongType()),
        ]
    )
    base = [
        (1, 2.0, 0), (1, 3.0, 0), (0, 1.0, 0), (0, 2.0, 0),
        (1, 5.0, 1), (1, 4.0, 1), (0, 3.0, 1), (0, 2.0, 1),
    ]
    noise = [(1, 99.0, None), (None, 99.0, 0)]
    a = stratified_ate(_df(spark, base, schema), "t", "y", "s").collect()
    b = stratified_ate(_df(spark, base + noise, schema), "t", "y", "s").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_shapley_excludes_null_users(spark):
    from weaviate_txtai_spark.operators.attribution import shapley_attribution

    schema = StructType(
        [StructField("user_id", LongType()), StructField("event_type", StringType())]
    )
    base = [
        (1, "ad"), (1, "buy"),
        (2, "email"), (2, "ad"),
        (3, "email"),
    ]
    noise = [(None, "ad"), (None, "email"), (None, "buy")]
    kw = dict(channels=["ad", "email"], conversion_type="buy")
    a = shapley_attribution(_df(spark, base, schema), **kw).collect()
    b = shapley_attribution(_df(spark, base + noise, schema), **kw).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_entropy_rate_consistent_with_stationary_on_null_dst(spark):
    from weaviate_txtai_spark.operators.markov import markov_entropy_rate

    schema = StructType(
        [
            StructField("src", StringType()),
            StructField("dst", StringType()),
            StructField("n", LongType()),
        ]
    )
    base = [("a", "b", 3), ("b", "a", 3)]
    noise = [("a", None, 5), (None, "b", 5)]
    a = markov_entropy_rate(_df(spark, base, schema)).collect()
    b = markov_entropy_rate(_df(spark, base + noise, schema)).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_pass_at_k_and_wilson_exclude_null_keys(spark):
    from weaviate_txtai_spark.operators.evalmetrics import (
        pass_at_k,
        wilson_interval,
    )

    schema = StructType(
        [StructField("task", LongType()), StructField("ok", LongType())]
    )
    base = [(1, 1), (1, 0), (2, 0), (2, 0)]
    noise = [(None, 1), (None, 1)]
    a = pass_at_k(_df(spark, base, schema), "task", "ok", ks=(1, 2)).collect()
    b = pass_at_k(
        _df(spark, base + noise, schema), "task", "ok", ks=(1, 2)
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    w = wilson_interval(_df(spark, base + noise, schema), "task", "ok").collect()
    assert {r["task"] for r in w} == {1, 2}


def test_abc_classes_excludes_null_keys(spark):
    from weaviate_txtai_spark.operators.inequality import abc_classes

    schema = StructType(
        [StructField("k", StringType()), StructField("v", DoubleType())]
    )
    rows = [("a", 80.0), ("b", 15.0), ("c", 5.0), (None, 1000.0)]
    res = abc_classes(_df(spark, rows, schema), "k", "v").collect()
    got = {r["k"]: r["abc_class"] for r in res}
    # the NULL pseudo-key (1000.0) would have claimed class A and pushed
    # every real key into C
    assert got == {"a": "A", "b": "B", "c": "C"}


def test_phrase_match_excludes_null_doc_ids(spark):
    from weaviate_txtai_spark.operators.phrase import phrase_match

    schema = StructType(
        [StructField("doc_id", LongType()), StructField("text", StringType())]
    )
    docs = _df(spark, [(1, "x y z"), (None, "x y z")], schema)
    res = phrase_match(docs, "x").collect()  # k=1: no self-join to drop NULLs
    assert [r["doc_id"] for r in res] == [1]


def test_resample_ffill_excludes_null_keys(spark):
    import datetime as dt

    from weaviate_txtai_spark.operators.resample import resample_ffill

    schema = StructType(
        [
            StructField("k", StringType()),
            StructField("ts", TimestampType()),
            StructField("value", DoubleType()),
        ]
    )
    rows = [
        ("a", dt.datetime(2025, 1, 1, 0), 1.0),
        ("a", dt.datetime(2025, 1, 1, 2), 3.0),
        (None, dt.datetime(2025, 1, 1, 1), 9.0),
        ("a", None, 9.0),
    ]
    res = resample_ffill(_df(spark, rows, schema), keys=["k"]).collect()
    assert {r["k"] for r in res} == {"a"}
    assert len(res) == 3  # 0h,1h,2h grid — no phantom NULL bucket


def test_log_state_as_of_excludes_null_keys(spark):
    from weaviate_txtai_spark.operators.scd import log_state_as_of

    schema = StructType(
        [
            StructField("id", LongType()),
            StructField("val", StringType()),
            StructField("version", LongType()),
            StructField("op", StringType()),
        ]
    )
    log = _df(
        spark,
        [(1, "x", 1, "upsert"), (None, "ghost", 2, "upsert")],
        schema,
    )
    res = log_state_as_of(log, key_cols=["id"]).collect()
    assert [r["id"] for r in res] == [1]


def test_prefix_filtered_pairs_excludes_null_sets(spark):
    from weaviate_txtai_spark.operators.setjoin import prefix_filtered_pairs

    schema = StructType(
        [StructField("__id", LongType()), StructField("__item", StringType())]
    )
    rows = [
        (1, "a"), (1, "b"),
        (2, "a"), (2, "b"),
        (None, "a"), (None, "b"),  # pseudo-set would match both
        (1, None),
    ]
    res = prefix_filtered_pairs(_df(spark, rows, schema), 0.9).collect()
    assert [(r["d1"], r["d2"]) for r in res] == [(1, 2)]


def test_dbscan_does_not_restore_null_ids_as_noise(spark):
    from weaviate_txtai_spark.operators.dbscan import dbscan

    ids = _df(
        spark, [(1,), (2,), (None,)], StructType([StructField("id", LongType())])
    )
    pairs = _df(
        spark,
        [(1, 2)],
        StructType([StructField("i", LongType()), StructField("j", LongType())]),
    )
    res = dbscan(ids, pairs, min_neighbors=1).collect()
    assert {r["id"] for r in res} == {1, 2}


def test_dsir_weights_excludes_null_doc_ids(spark):
    from weaviate_txtai_spark.operators.importance import dsir_weights

    schema = StructType(
        [StructField("doc_id", LongType()), StructField("text", StringType())]
    )
    docs = _df(
        spark,
        [(1, "good text"), (2, "other text"), (None, "ghost text")],
        schema,
    )
    res = dsir_weights(docs, F.col("doc_id") == 1).collect()
    assert {r["doc_id"] for r in res} == {1, 2}


def test_sessionize_batch_excludes_null_users(spark):
    import datetime as dt

    schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("event_id", LongType()),
            StructField("ts", TimestampType()),
        ]
    )
    from weaviate_txtai_spark.streaming.sessions import sessionize_batch

    rows = [
        (1, 1, dt.datetime(2025, 1, 1, 0, 0, 0)),
        (None, 2, dt.datetime(2025, 1, 1, 0, 0, 1)),
        (None, 3, dt.datetime(2025, 1, 1, 9, 0, 0)),
    ]
    res = sessionize_batch(_df(spark, rows, schema)).collect()
    assert {r["user_id"] for r in res} == {1}


def test_upsert_df_rejects_null_docids(spark, tmp_path):
    from weaviate_txtai_spark.index import VectorIndex

    idx = VectorIndex(spark, str(tmp_path))
    idx.create()
    idx.append([[1.0, 0.0], [0.0, 1.0]])
    changes = _df(
        spark,
        [(5, [1.0, 1.0]), (None, [9.0, 9.0])],
        StructType(
            [StructField("docid", LongType()), StructField("vector", VEC)]
        ),
    )
    with pytest.raises(ValueError, match="NULL 'docid'"):
        idx.upsert_df(changes)


def test_embedding_lsh_excludes_null_ids(spark):
    from weaviate_txtai_spark.operators.dedup import embedding_dup_pairs_lsh

    schema = StructType(
        [StructField("vec_id", LongType()), StructField("embedding", VEC)]
    )
    emb = _df(
        spark,
        [
            (1, [1.0, 0.0, 0.0]),
            (2, [1.0, 0.0, 0.0]),
            (None, [1.0, 0.0, 0.0]),  # would pair with both as NULL d1/d2
        ],
        schema,
    )
    res = embedding_dup_pairs_lsh(emb, threshold=0.9).collect()
    assert [(r["d1"], r["d2"]) for r in res] == [(1, 2)]


def test_hourly_aggregate_excludes_null_keys(spark):
    import datetime as dt

    from weaviate_txtai_spark.streaming.events import hourly_aggregate

    schema = StructType(
        [
            StructField("event_type", StringType()),
            StructField("ts", TimestampType()),
            StructField("value", DoubleType()),
        ]
    )
    rows = [
        ("click", dt.datetime(2025, 1, 1, 10, 5), 1.0),
        (None, dt.datetime(2025, 1, 1, 10, 6), 2.0),
        ("click", None, 3.0),
    ]
    # withWatermark is a no-op on a batch frame, so the plan runs as-is
    res = hourly_aggregate(_df(spark, rows, schema)).collect()
    assert len(res) == 1
    assert res[0]["event_type"] == "click" and res[0]["n_events"] == 1


def test_dedup_survivors_exclude_null_ids(spark):
    from weaviate_txtai_spark.operators.dedup import (
        dedup_survivors,
        dedup_survivors_by,
    )

    docs = _df(
        spark,
        [(1, "x"), (2, "x"), (None, "ghost")],
        StructType(
            [StructField("doc_id", LongType()), StructField("text", StringType())]
        ),
    )
    pairs = spark.createDataFrame([(1, 2, 1.0)], "d1 long, d2 long, jaccard double")
    surv = dedup_survivors(docs, pairs).collect()
    assert {r["doc_id"] for r in surv} == {1}
    docs_q = docs.withColumn("q", F.col("doc_id").cast("double"))
    surv2 = dedup_survivors_by(docs_q, pairs, quality_col="q").collect()
    assert {r["doc_id"] for r in surv2} == {2}  # higher quality wins


def test_semantic_survivors_exclude_null_ids(spark):
    from weaviate_txtai_spark.operators.kmeans import semantic_dedup_survivors

    df = _df(
        spark,
        [(1, [1.0]), (2, [1.0]), (None, [9.0])],
        StructType(
            [StructField("vec_id", LongType()), StructField("embedding", VEC)]
        ),
    )
    pairs = spark.createDataFrame([(1, 2)], "d1 long, d2 long")
    surv = semantic_dedup_survivors(df, pairs).collect()
    assert {r["vec_id"] for r in surv} == {1}
