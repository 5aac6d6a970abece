"""Distributed PCA over an embedding column.

Why an engine needs it: dimension reduction is the standard pre-step for
cheap clustering (SemDeDup clusters reduced vectors), OPQ-style ANN
compression, and embedding whitening. The distributed part is ONLY the
covariance accumulation — eigendecomposition of a dim×dim matrix is
driver-side numpy by design (dim ≤ a few thousand; the matrix is tiny
next to the data).

Covariance at scale — the treeAggregate pattern, DataFrame-native:
each Arrow batch computes its LOCAL Gram matrix XᵀX (one BLAS call),
its column sum, and its count, emitting ONE flattened row per batch.
Those partials posexplode to (pos, val) and one partial-agg shuffle of
partitions × dim² tiny rows sums them; the driver assembles
cov = E[xxᵀ] − μμᵀ from dim² + dim + 1 doubles. The corpus is read
once, nothing corpus-sized shuffles, and the plan is identical at any
N — the same shape as the k-means update (operators/kmeans.py).

Determinism: the covariance sums differ in the last float bits across
partitionings (addition order), so eigenvectors wobble at ~1e-12. The
sign convention (largest-|loading| component positive) pins the sign;
gates round covariance entries to 6 dp, and PCA outputs are checked by
invariants (orthonormality, variance ordering, reconstruction) rather
than value hashes — eigendecomposition is not SQL-expressible, the same
honest rows-only treatment as the sketch operators.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator, Optional

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StructField,
    StructType,
)


def _moments(df: DataFrame, vector_col: str, dim: int):
    """One pass: returns (n, sum_vec (dim,), gram (dim, dim)) as numpy.
    Each Arrow batch emits one partial row; partials sum via a single
    partial-agg shuffle of bounded size."""
    import numpy as np

    out_schema = StructType(
        [
            StructField("n", LongType()),
            StructField("s", ArrayType(DoubleType())),
            StructField("g", ArrayType(DoubleType())),  # row-major dim*dim
        ]
    )

    def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            mat = np.asarray(list(pdf[vector_col]), dtype=np.float64)
            if mat.ndim != 2 or mat.shape[1] != dim:
                raise ValueError(
                    f"pca: expected {dim}-dim vectors, got shape {mat.shape}"
                )
            yield pd.DataFrame(
                {
                    "n": [mat.shape[0]],
                    "s": [mat.sum(axis=0).tolist()],
                    "g": [(mat.T @ mat).ravel().tolist()],
                }
            )

    part = df.select(F.col(vector_col)).mapInPandas(partials, schema=out_schema)
    # flatten to (pos, val) and sum — partitions × (dim² + dim) tiny rows
    summed = (
        part.select(
            "n", F.posexplode(F.concat(F.col("s"), F.col("g"))).alias("pos", "val")
        )
        .groupBy("pos")
        .agg(F.sum("val").alias("v"), F.sum("n").alias("cnt"))
        .collect()
    )
    if not summed:
        raise ValueError("pca: empty input")
    # every partial emits every pos, so each pos's cnt sums the same
    # per-partial n values — any single pos carries the true row count
    by_pos = {r["pos"]: r["v"] for r in summed}
    n = next(r["cnt"] for r in summed if r["pos"] == 0)
    s = np.array([by_pos[i] for i in range(dim)])
    g = np.array([by_pos[dim + i] for i in range(dim * dim)]).reshape(dim, dim)
    return int(n), s, g


@dataclass
class PCAModel:
    mean: list[float]
    components: list[list[float]]  # k rows × dim, orthonormal
    explained_variance: list[float]  # descending

    @property
    def k(self) -> int:
        return len(self.components)


def pca_fit(
    df: DataFrame, k: int, *, vector_col: str = "embedding"
) -> PCAModel:
    """Fit top-k principal components. One distributed pass (see module
    docstring) + a driver-side ``eigh`` on the dim×dim covariance.

    Sign convention: each component's largest-|loading| entry is made
    positive (ties: the earliest position wins), so the model is
    reproducible across runs/partitionings up to float noise."""
    import numpy as np

    first = df.select(vector_col).first()
    if first is None or first[0] is None:
        raise ValueError("pca_fit: empty input or NULL vector")
    dim = len(first[0])
    if not (1 <= k <= dim):
        raise ValueError(f"pca_fit: k={k} outside [1, dim={dim}]")
    n, s, g = _moments(df, vector_col, dim)
    if n < 2:
        raise ValueError(f"pca_fit: need ≥2 rows, got {n}")
    mu = s / n
    cov = g / n - np.outer(mu, mu)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][:k]
    comps, var = [], []
    for idx in order:
        v = evecs[:, idx]
        pivot = int(np.argmax(np.abs(v)))
        if v[pivot] < 0:
            v = -v
        comps.append([float(x) for x in v])
        var.append(float(max(evals[idx], 0.0)))
    return PCAModel(mean=[float(x) for x in mu], components=comps,
                    explained_variance=var)


def pca_transform(
    df: DataFrame,
    model: PCAModel,
    *,
    vector_col: str = "embedding",
    output_col: str = "pca",
    round_decimals: Optional[int] = None,
) -> DataFrame:
    """Map-only projection: (x − μ) · Wᵀ as k in-order dot-product folds
    over component literals — zero exchanges, same plan shape as the
    k-means assignment (plan-asserted in tests/test_pca.py)."""
    vec = F.col(vector_col).cast("array<double>")
    mu = F.array(*[F.lit(v) for v in model.mean])
    centered = F.zip_with(vec, mu, lambda a, b: a - b)
    outs = []
    for comp in model.components:
        w = F.array(*[F.lit(v) for v in comp])
        d = F.aggregate(
            F.zip_with(centered, w, lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        outs.append(F.round(d, round_decimals) if round_decimals is not None else d)
    return df.withColumn(output_col, F.array(*outs))
