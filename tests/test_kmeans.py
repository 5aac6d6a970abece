"""Deterministic Lloyd's k-means + SemDeDup semantic dedup.

Pins: expr/gemm assignment parity, lowest-cid tie-break, empty-cluster
centroid retention, inertia monotonicity, partitioning-invariance, and
the semantic-dedup pair/survivor contracts (chain case: neighbor-based,
not connected-component)."""

import pytest

from pyspark.sql import functions as F

from weaviate_txtai_spark.operators.kmeans import (
    KMeansModel,
    assign_clusters,
    inertia,
    lloyd,
    semantic_dedup_pairs,
    semantic_dedup_survivors,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_assign_expr_ties_to_lowest_cid(spark):
    df = _df(spark, [(0, [0.0, 0.0])])
    cents = [(1, [1.0, 0.0]), (0, [0.0, 1.0])]  # equidistant
    row = assign_clusters(df, cents, strategy="expr").collect()[0]
    assert row["cluster"] == 0


def test_assign_gemm_matches_expr(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(80)
    cents = [
        (i, [float(v) for v in r["embedding"]])
        for i, r in enumerate(emb.orderBy("vec_id").limit(3).collect())
    ]
    for rd in (None, 6):
        e = assign_clusters(
            emb, cents, strategy="expr", dist_round_decimals=rd
        ).select("vec_id", "cluster")
        g = assign_clusters(
            emb, cents, strategy="gemm", dist_round_decimals=rd
        ).select("vec_id", "cluster")
        assert sorted(e.collect()) == sorted(g.collect())


def test_assign_validates_inputs(spark):
    df = _df(spark, [(0, [0.0, 0.0])])
    with pytest.raises(ValueError, match="empty centroid"):
        assign_clusters(df, [])
    with pytest.raises(ValueError, match="dims differ"):
        assign_clusters(df, [(0, [1.0]), (1, [1.0, 2.0])])
    with pytest.raises(ValueError, match="unknown strategy"):
        assign_clusters(df, [(0, [1.0, 0.0])], strategy="nope")


def test_lloyd_converges_and_inertia_monotone(spark):
    # two tight blobs; k=2 must separate them and inertia must not rise
    rows = [(i, [0.0 + i * 0.01, 0.0]) for i in range(10)] + [
        (100 + i, [5.0 + i * 0.01, 5.0]) for i in range(10)
    ]
    df = _df(spark, rows)
    prev = None
    for it in (1, 2, 4):
        m = lloyd(df, k=2, iters=it)
        j = inertia(m.assigned, m.centroids)
        if prev is not None:
            assert j <= prev + 1e-9
        prev = j
        assert sorted(m.sizes.values()) == [10, 10]
    # blob separation: every row of the second blob in one cluster
    m = lloyd(df, k=2, iters=4)
    got = {
        r["vec_id"]: r["cluster"] for r in m.assigned.select("vec_id", "cluster").collect()
    }
    assert len({got[i] for i in range(10)}) == 1
    assert len({got[100 + i] for i in range(10)}) == 1
    assert got[0] != got[100]


def test_lloyd_partitioning_invariant(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    a = lloyd(emb, k=3, iters=2, quantize_decimals=6, dist_round_decimals=6)
    b = lloyd(
        emb.repartition(7), k=3, iters=2, quantize_decimals=6, dist_round_decimals=6
    )
    assert a.centroids == b.centroids
    assert sorted(a.assigned.select("vec_id", "cluster").collect()) == sorted(
        b.assigned.select("vec_id", "cluster").collect()
    )


def test_lloyd_empty_cluster_keeps_centroid(spark):
    # far-away seed never wins a point: its centroid must survive verbatim
    df = _df(spark, [(0, [0.0, 0.0]), (1, [0.1, 0.0]), (2, [0.2, 0.0])])
    far = (99, [1000.0, 1000.0])
    m = lloyd(df, init_centroids=[(0, [0.0, 0.0]), far], iters=3)
    cents = dict(m.centroids)
    assert cents[99] == [1000.0, 1000.0]
    assert m.sizes.get(99, 0) == 0


def test_lloyd_seed_validation(spark):
    df = _df(spark, [(0, [0.0, 0.0]), (1, [1.0, 1.0])])
    with pytest.raises(ValueError, match="not found"):
        lloyd(df, seed_ids=[0, 7], iters=1)
    with pytest.raises(ValueError, match="only 2 rows"):
        lloyd(df, k=3, iters=1)
    with pytest.raises(ValueError, match="pass k"):
        lloyd(df, iters=1)


def test_lloyd_model_assign_roundtrip(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    m = lloyd(emb, k=2, iters=1)
    assert isinstance(m, KMeansModel)
    re = m.assign(emb).select("vec_id", "cluster")
    assert sorted(re.collect()) == sorted(
        m.assigned.select("vec_id", "cluster").collect()
    )


def test_semantic_dedup_chain_is_neighbor_based(spark):
    # a–b similar, b–c similar, a–c NOT: b and c both have a lower-id
    # neighbor, so only a survives (one-shot rule, no fixpoint — c is
    # dropped even though its only neighbor b was itself dropped)
    # (unit vectors 10° apart: cos 10° ≈ 0.985 ≥ 0.97 > cos 20° ≈ 0.940)
    import math

    a, b, c = (
        [math.cos(math.radians(d)), math.sin(math.radians(d))] for d in (0, 10, 20)
    )
    df = _df(spark, [(1, a), (2, b), (3, c)])
    pairs = semantic_dedup_pairs(
        df, k=1, iters=1, threshold=0.97, seed_ids=[1]
    )
    got = sorted((r["d1"], r["d2"]) for r in pairs.collect())
    assert got == [(1, 2), (2, 3)]
    surv = semantic_dedup_survivors(df, pairs)
    assert sorted(r["vec_id"] for r in surv.collect()) == [1]
    # fixpoint semantics via CC composition: also keeps only the min id
    from weaviate_txtai_spark.operators.dedup import dedup_survivors

    cc = dedup_survivors(df.withColumnRenamed("vec_id", "doc_id"),
                         pairs.select("d1", "d2"))
    assert sorted(r["doc_id"] for r in cc.collect()) == [1]


def test_semantic_dedup_only_pairs_within_cluster(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    pairs = semantic_dedup_pairs(
        emb, k=4, iters=1, threshold=0.45, quantize_decimals=6,
        dist_round_decimals=6,
    )
    m = lloyd(emb, k=4, iters=1, quantize_decimals=6, dist_round_decimals=6)
    cl = {r["vec_id"]: r["cluster"] for r in m.assigned.select("vec_id", "cluster").collect()}
    rows = pairs.collect()
    assert all(cl[r["d1"]] == cl[r["d2"]] == r["cluster"] for r in rows)
    assert all(r["d1"] < r["d2"] for r in rows)
    # subset of the global (cluster-free) pair set at the same threshold
    from weaviate_txtai_spark.operators.dedup import embedding_dup_pairs

    global_pairs = {
        (r["d1"], r["d2"]) for r in embedding_dup_pairs(emb, threshold=0.45).collect()
    }
    assert {(r["d1"], r["d2"]) for r in rows} <= global_pairs


def test_assign_rejects_null_and_wrong_dim(spark):
    # both strategies must fail loudly, not silently bucket to cluster 0
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import PythonException

    bad = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, None), (3, [1.0])],
        "vec_id long, embedding array<double>",
    )
    cents = [(0, [0.0, 0.0]), (1, [1.0, 1.0])]
    with pytest.raises(Exception, match="NULL or non-2-dim"):
        assign_clusters(bad, cents, strategy="expr").collect()
    with pytest.raises(Exception, match="NULL or non-2-dim"):
        assign_clusters(bad, cents, strategy="gemm").collect()


def test_inertia_rejects_foreign_assignment(spark):
    df = _df(spark, [(0, [0.0, 0.0]), (1, [5.0, 5.0])])
    m = lloyd(df, k=2, iters=1)
    with pytest.raises(ValueError, match="different models"):
        inertia(m.assigned, m.centroids[:1])


def test_semantic_dedup_clusters_on_reduced_verifies_on_full(spark, sf_dir):
    """The full SemDeDup recipe: cluster cheap PCA projections, judge
    similarity on the full embeddings. True near-dup pairs co-locate in
    the reduced clustering, so the pair set must match the full-space
    clustering's pair set on this corpus (same k, same threshold)."""
    from weaviate_txtai_spark.operators.pca import pca_fit, pca_transform

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    model = pca_fit(emb, 8)
    red = pca_transform(emb, model, output_col="pca")
    full = {
        (r["d1"], r["d2"], r["cosine"])
        for r in semantic_dedup_pairs(emb, k=4, iters=1, threshold=0.45).collect()
    }
    via_reduced = {
        (r["d1"], r["d2"], r["cosine"])
        for r in semantic_dedup_pairs(
            red, k=4, iters=1, threshold=0.45, cluster_vector_col="pca"
        ).collect()
    }
    # cosine values are judged on FULL embeddings in both runs; the
    # reduced clustering may split differently, but every pair found is
    # a genuine full-space near-dup
    exact_pairs = {(d1, d2) for d1, d2, _ in full}
    from weaviate_txtai_spark.operators.dedup import embedding_dup_pairs

    global_pairs = {
        (r["d1"], r["d2"]) for r in embedding_dup_pairs(emb, threshold=0.45).collect()
    }
    assert {(d1, d2) for d1, d2, _ in via_reduced} <= global_pairs
    # and it finds at least as many true pairs as the full-space
    # clustering at this tiny k (near-identical vectors co-locate)
    assert len(via_reduced) >= len(full) - 1


def test_cluster_top_terms_counts_and_ties(spark):
    from weaviate_txtai_spark.operators.kmeans import cluster_top_terms

    assigned = spark.createDataFrame(
        [(1, 0), (2, 0), (3, 1)], "vec_id long, cluster int"
    )
    docs = spark.createDataFrame(
        [(1, "x x y"), (2, "y z"), (3, "q q"), (4, "unassigned ignored")],
        "doc_id long, text string",
    )
    rows = cluster_top_terms(assigned, docs, n_terms=2).collect()
    got = {(r["cluster"], r["rank"]): (r["term"], r["n_occ"]) for r in rows}
    # cluster 0: x:2 y:2 z:1 -> tie x/y breaks lexicographically
    assert got[(0, 1)] == ("x", 2) and got[(0, 2)] == ("y", 2)
    assert got[(1, 1)] == ("q", 2)
    # docs with no assignment never contribute
    assert all(r["term"] != "unassigned" for r in rows)


def test_semantic_dedup_pair_strategy_parity(spark, sf_dir):
    """The gemm per-cluster kernel (default) must emit exactly the expr
    equi-join path's pairs — same rounded cosines, same tie behavior
    (both threshold the 6-dp-rounded value)."""
    from weaviate_txtai_spark.operators.kmeans import semantic_dedup_pairs
    from weaviate_txtai_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    kw = dict(k=4, iters=1, threshold=0.45, quantize_decimals=6,
              dist_round_decimals=6)
    a = sorted(
        (r["d1"], r["d2"], r["cluster"], r["cosine"])
        for r in semantic_dedup_pairs(emb, pair_strategy="expr", **kw).collect()
    )
    b = sorted(
        (r["d1"], r["d2"], r["cluster"], r["cosine"])
        for r in semantic_dedup_pairs(emb, pair_strategy="gemm", **kw).collect()
    )
    assert a == b and len(a) > 0
