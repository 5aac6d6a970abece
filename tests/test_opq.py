"""OPQ: rotation orthogonality, error monotonicity vs plain PQ,
iters=0 exactness twin, rotated-search invariants."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from weaviate_txtai_spark.operators.opq import (
    opq_encode,
    opq_topk,
    reconstruction_error,
    train_opq,
)
from weaviate_txtai_spark.operators.pq import pq_encode, train_pq
from weaviate_txtai_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings")


@pytest.fixture(scope="module")
def anisotropic(spark, emb):
    """OPQ only beats PQ when dimensions are unevenly scaled /
    correlated — the isotropic testdata is its worst case, so stretch
    a few dimensions deterministically."""
    scale = F.array(
        *[F.lit(10.0 if i % 8 < 2 else 1.0) for i in range(64)]
    )
    return emb.select(
        "vec_id",
        F.zip_with(
            F.col("embedding").cast("array<double>"),
            scale,
            lambda x, s: x * s,
        ).alias("embedding"),
    )


def test_rotation_is_orthogonal(anisotropic):
    model = train_opq(anisotropic, m=8, k=8, opq_iters=2, pq_iters=1)
    R = np.asarray(model.rotation)
    assert np.allclose(R @ R.T, np.eye(64), atol=1e-8)
    assert np.allclose(R.T @ R, np.eye(64), atol=1e-8)


def test_opq_lowers_error_on_anisotropic_data(anisotropic):
    plain = train_opq(anisotropic, m=8, k=8, opq_iters=0, pq_iters=1)
    opq = train_opq(anisotropic, m=8, k=8, opq_iters=3, pq_iters=1)
    e0 = reconstruction_error(anisotropic, plain)
    e1 = reconstruction_error(anisotropic, opq)
    assert e1 < e0  # the rotation must actually help where it should


def test_iters0_is_plain_pq(emb):
    """Exactness twin: opq_iters=0 keeps R = I and the codes equal a
    plain train_pq/pq_encode run parameter-for-parameter."""
    opq = train_opq(emb, m=4, k=8, opq_iters=0, pq_iters=1,
                    dist_round_decimals=6)
    assert np.allclose(np.asarray(opq.rotation), np.eye(64))
    pq = train_pq(emb, m=4, k=8, iters=1, dist_round_decimals=6,
                  quantize_decimals=None)
    a = {
        r["vec_id"]: list(r["pq_code"])
        for r in opq_encode(emb, opq, dist_round_decimals=6)
        .select("vec_id", "pq_code").collect()
    }
    b = {
        r["vec_id"]: list(r["pq_code"])
        for r in pq_encode(emb, pq, packed=False, dist_round_decimals=6)
        .select("vec_id", "pq_code").collect()
    }
    assert a == b


def test_opq_topk_self_match(anisotropic):
    model = train_opq(anisotropic, m=8, k=8, opq_iters=2, pq_iters=1)
    codes = opq_encode(anisotropic, model).select("vec_id", "pq_code")
    q = list(
        anisotropic.filter(F.col("vec_id") == 3).head()["embedding"]
    )
    top = opq_topk(codes, model, q, 5).collect()
    assert any(r["vec_id"] == 3 for r in top)  # self in ADC top-5
    assert [r["rank"] for r in top] == [1, 2, 3, 4, 5]


# ------------------------------------------------------------- IVF-OPQ
def test_ivfopq_iters0_equals_plain_ivfpq(spark, emb):
    """opq_iters=0 keeps R = I, so the composed index must return
    EXACTLY what a plain IVFPQIndex returns, row for row."""
    from weaviate_txtai_spark.operators.ivfpq import IVFPQIndex
    from weaviate_txtai_spark.operators.opq import IVFOPQIndex

    kw = dict(nlist=4, m=4, k_pq=8, pq_iters=1, dist_round_decimals=6)
    a = IVFOPQIndex.build(emb, opq_iters=0, **kw)
    b = IVFPQIndex.build(emb, **kw)
    qs = [
        (r["vec_id"], list(r["embedding"]))
        for r in emb.filter(F.col("vec_id") < 2).collect()
    ]
    ra = sorted(map(tuple, a.search(qs, 5, nprobe=4, shortlist=100).collect()))
    rb = sorted(map(tuple, b.search(qs, 5, nprobe=4, shortlist=100).collect()))
    assert ra == rb


def test_ivfopq_search_df_exactness_and_roundtrip(spark, emb, tmp_path):
    """DataFrame-query path in exactness mode == brute-force top-3 per
    query; save/load round-trips the rotation (searches agree)."""
    from weaviate_txtai_spark.operators.opq import IVFOPQIndex
    from weaviate_txtai_spark.operators.topk import knn_topk_gemm

    n_corpus = emb.count()
    idx = IVFOPQIndex.build(
        emb, nlist=4, m=4, k_pq=8, opq_iters=1, pq_iters=1,
        dist_round_decimals=6,
    )
    qdf = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vector"),
    )
    got = idx.search_df(
        qdf, 3, nprobe=4, shortlist=-(-n_corpus // 3)
    ).select("query_id", "vec_id", "rank")
    got_rows = sorted(map(tuple, got.collect()))

    # brute-force truth on the ORIGINAL floats (rotation-independent)
    qs = [
        (r["query_id"], list(r["query_vector"])) for r in qdf.collect()
    ]
    truth = (
        knn_topk_gemm(
            emb, qs, 3, metric="l2", vector_col="embedding", id_col="vec_id"
        )
        .select("query_id", "vec_id", "rank")
    )
    assert got_rows == sorted(map(tuple, truth.collect()))

    path = str(tmp_path / "ivfopq")
    idx.save(path)
    loaded = IVFOPQIndex.load(spark, path)
    again = loaded.search_df(
        qdf, 3, nprobe=4, shortlist=-(-n_corpus // 3)
    ).select("query_id", "vec_id", "rank")
    assert sorted(map(tuple, again.collect())) == got_rows
