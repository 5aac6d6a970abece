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


def test_tdiv_and_rha_cross_engine_semantics():
    """The integer primitives must match Spark div / DuckDB // (truncate
    toward zero) and Spark/DuckDB round (half away from zero) — Python's
    native // floors and round() is half-even, both wrong here."""
    from weaviate_txtai_spark.operators.pca import _rha, _tdiv

    assert _tdiv(-7, 2) == -3 and _tdiv(7, 2) == 3
    assert _tdiv(-8, 2) == -4
    assert _rha(2.5) == 3 and _rha(-2.5) == -3
    assert _rha(2.4) == 2 and _rha(-2.4) == -2


def test_pca_power_exact_partitioning_invariant(spark, sf_dir):
    """The fixed-point trajectory is pure-integer after the quantization
    boundary, so any repartitioning yields the IDENTICAL model and
    projections (the oracle-grade guarantee the float path lacks)."""
    from weaviate_txtai_spark.operators.pca import (
        pca_power_fit_exact,
        pca_power_project_exact,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    m1 = pca_power_fit_exact(emb, 3, n_iter=6)
    m2 = pca_power_fit_exact(emb.repartition(13), 3, n_iter=6)
    assert m1.components_fp == m2.components_fp
    assert m1.dens == m2.dens and m1.mu_fp == m2.mu_fp
    p1 = sorted(map(tuple, pca_power_project_exact(emb, m1).collect()))
    p2 = sorted(
        map(tuple, pca_power_project_exact(emb.repartition(7), m1).collect())
    )
    assert p1 == p2


def test_pca_power_exact_sign_pin_and_projection_scale(spark, sf_dir):
    """Each component's largest-|entry| coordinate is positive, and the
    projections match a pure-python replay of the integer pipeline."""
    from weaviate_txtai_spark.operators.pca import (
        _rha,
        pca_power_fit_exact,
        pca_power_project_exact,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    model = pca_power_fit_exact(emb, 2, n_iter=4)
    import math

    for u in model.components_fp:
        piv = max(range(len(u)), key=lambda i: (abs(u[i]), -i))
        assert u[piv] > 0
    rows = emb.select("vec_id", "embedding").limit(5).collect()
    got = {
        r["vec_id"]: (r["p1"], r["p2"])
        for r in pca_power_project_exact(
            emb.join(
                spark.createDataFrame(
                    [(r["vec_id"],) for r in rows], "vec_id long"
                ),
                "vec_id",
            ),
            model,
        ).collect()
    }
    for r in rows:
        xfp = [_rha(float(v) * 1e6) for v in r["embedding"]]
        cx = [a - b for a, b in zip(xfp, model.mu_fp)]
        for ci, (u, den) in enumerate(
            zip(model.components_fp, model.dens)
        ):
            pfp = sum(a * b for a, b in zip(cx, u))
            want = round(pfp / (1e6 * math.sqrt(den)), 6)
            assert got[r["vec_id"]][ci] == want


def test_pca_power_exact_validation(spark):
    from weaviate_txtai_spark.operators.pca import pca_power_fit_exact

    df = spark.createDataFrame([([1.0, 2.0],)], "embedding array<double>")
    with pytest.raises(ValueError, match="n_iter"):
        pca_power_fit_exact(df, 1, n_iter=0)
    with pytest.raises(ValueError, match="k="):
        pca_power_fit_exact(df, 5)
    with pytest.raises(ValueError, match="rows"):
        pca_power_fit_exact(df, 1)
