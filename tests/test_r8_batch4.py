"""Round-8 batch 4: Poisson bootstrap CI, Zipf fit, negative-sampling
weights."""

import math

import pytest

from pyspark.sql import functions as F


def test_bootstrap_ci_brackets_mean_and_shrinks(spark):
    from weaviate_txtai_spark.operators.bootstrap import (
        poisson_bootstrap_mean_ci,
    )

    import random

    rng = random.Random(3)
    rows = [(i, rng.gauss(100.0, 10.0)) for i in range(2000)]
    df = spark.createDataFrame(rows, "id long, x double")
    r = poisson_bootstrap_mean_ci(
        df, "x", id_col="id", n_replicates=60
    ).collect()[0]
    assert r["n"] == 2000 and r["n_replicates"] == 60
    assert r["lo"] < r["mean"] < r["hi"]
    # CI half-width should be in the vicinity of 1.96*sigma/sqrt(n) ~ 0.44
    half = (r["hi"] - r["lo"]) / 2
    assert 0.1 < half < 1.5, half


def test_bootstrap_deterministic_across_partitionings(spark):
    from weaviate_txtai_spark.operators.bootstrap import (
        poisson_bootstrap_mean_ci,
    )

    rows = [(i, float(i % 37)) for i in range(500)]
    df = spark.createDataFrame(rows, "id long, x double")
    a = poisson_bootstrap_mean_ci(df, "x", id_col="id").collect()[0]
    b = poisson_bootstrap_mean_ci(
        df.repartition(9), "x", id_col="id"
    ).collect()[0]
    assert tuple(a) == tuple(b)
    with pytest.raises(ValueError, match="n_replicates"):
        poisson_bootstrap_mean_ci(df, "x", id_col="id", n_replicates=1)
    with pytest.raises(ValueError, match="alpha"):
        poisson_bootstrap_mean_ci(df, "x", id_col="id", alpha=1.5)


def test_poisson1_thresholds_are_cdf(spark):
    from weaviate_txtai_spark.operators.bootstrap import _POIS1_CDF

    acc, fact = 0.0, 1.0
    for k, thr in enumerate(_POIS1_CDF):
        if k:
            fact *= k
        acc += math.exp(-1.0) / fact
        assert math.isclose(thr, acc, rel_tol=1e-12)


def test_zipf_fit_exact_powerlaw(spark):
    from weaviate_txtai_spark.operators.profile import zipf_fit

    # counts = round(1e6 * r^-1.2): log-log is a straight line slope -1.2
    rows = [(f"t{r:04d}", int(1e6 * r ** -1.2)) for r in range(1, 101)]
    df = spark.createDataFrame(rows, "term string, cnt long")
    r = zipf_fit(df, "term", "cnt", top_n=100).collect()[0]
    assert r["n_terms"] == 100
    assert abs(r["slope"] - (-1.2)) < 0.01
    assert r["r2"] > 0.999
    with pytest.raises(ValueError, match="top_n"):
        zipf_fit(df, "term", "cnt", top_n=2)


def test_negative_sampling_tempering(spark):
    from weaviate_txtai_spark.operators.lm import negative_sampling_weights

    df = spark.createDataFrame(
        [("hot", 10000), ("mid", 100), ("rare", 1), ("zero", 0)],
        "term string, cnt long",
    )
    out = {r["term"]: r["weight"] for r in
           negative_sampling_weights(df, "term", "cnt").collect()}
    assert "zero" not in out  # non-positive counts dropped
    assert abs(sum(out.values()) - 1.0) < 1e-6
    # tempering: hot/rare weight ratio = (10000/1)^0.75 = 10^3, far
    # below the raw 10^4 frequency ratio
    assert math.isclose(out["hot"] / out["rare"], 10000 ** 0.75, rel_tol=1e-3)
