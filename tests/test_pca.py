"""Distributed PCA: covariance parity with numpy, component invariants
(orthonormality, descending variance, sign convention), map-only
projection plan, partitioning-invariance, validation errors."""

import numpy as np
import pytest

from weaviate_txtai_spark.operators.pca import PCAModel, pca_fit, pca_transform


def _emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def test_pca_matches_numpy(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    mat = np.asarray(
        [list(r["embedding"]) for r in emb.orderBy("vec_id").collect()],
        dtype=np.float64,
    )
    model = pca_fit(emb, 4)
    mu = mat.mean(axis=0)
    cov = (mat.T @ mat) / len(mat) - np.outer(mu, mu)
    evals = np.sort(np.linalg.eigvalsh(cov))[::-1]
    assert np.allclose(model.mean, mu, atol=1e-9)
    assert np.allclose(model.explained_variance, evals[:4], atol=1e-9)
    # components span the same subspace as numpy's top-4 eigenvectors
    _, evecs = np.linalg.eigh(cov)
    top = evecs[:, np.argsort(np.linalg.eigvalsh(cov))[::-1][:4]]
    W = np.asarray(model.components)
    # projection matrices equal iff same subspace
    assert np.allclose(W.T @ W, top @ top.T, atol=1e-8)


def test_pca_component_invariants(spark, sf_dir):
    model = pca_fit(_emb(spark, sf_dir), 6)
    W = np.asarray(model.components)
    assert np.allclose(W @ W.T, np.eye(6), atol=1e-9)  # orthonormal
    ev = model.explained_variance
    assert all(ev[i] >= ev[i + 1] - 1e-12 for i in range(len(ev) - 1))
    # sign convention: the largest-|loading| entry of each row is positive
    for row in W:
        assert row[int(np.argmax(np.abs(row)))] > 0


def test_pca_partitioning_invariant(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    a = pca_fit(emb, 3)
    b = pca_fit(emb.repartition(7), 3)
    assert np.allclose(a.mean, b.mean, atol=1e-9)
    assert np.allclose(a.components, b.components, atol=1e-7)


def test_pca_transform_map_only_and_variance(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    model = pca_fit(emb, 3)
    out = pca_transform(emb, model)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # projection is map-only
    rows = np.asarray([list(r["pca"]) for r in out.collect()])
    assert rows.shape[1] == 3
    # per-axis variance of the projection == explained_variance
    assert np.allclose(rows.var(axis=0), model.explained_variance, atol=1e-8)
    # reconstruction error shrinks as k grows
    mat = np.asarray([list(r["embedding"]) for r in emb.collect()], dtype=np.float64)

    def recon_err(k):
        m = pca_fit(emb, k)
        W = np.asarray(m.components)
        c = mat - np.asarray(m.mean)
        return float(((c - (c @ W.T) @ W) ** 2).sum())

    e2, e8 = recon_err(2), recon_err(8)
    assert e8 < e2


def test_pca_validation(spark):
    df = spark.createDataFrame([(1, [1.0, 2.0])], "id long, embedding array<double>")
    with pytest.raises(ValueError, match="need"):
        pca_fit(df, 1)
    with pytest.raises(ValueError, match="outside"):
        pca_fit(
            spark.createDataFrame(
                [(1, [1.0, 2.0]), (2, [2.0, 1.0])], "id long, embedding array<double>"
            ),
            5,
        )
    empty = spark.createDataFrame([], "id long, embedding array<double>")
    with pytest.raises(ValueError, match="empty"):
        pca_fit(empty, 1)
