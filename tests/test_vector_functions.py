"""Unit tests for vector column exprs, mirroring the reference's only pure
unit test (normalize_cosine_distance, tests/ann/test_weaviate.py:249-251)
plus hand-computable cosine fixtures (SURVEY §5: assert ranks/values on
hand-built unit vectors, never golden floats from models)."""

import math

import pytest

from weaviate_txtai_spark.functions import (
    cosine_dist,
    cosine_sim,
    dot,
    l2_dist,
    l2_norm,
    normalize_cosine_distance,
    normalize_vec,
)


@pytest.fixture(scope="module")
def vec_df(spark):
    return spark.createDataFrame(
        [
            (1, [1.0, 0.0, 0.0], [0.0, 1.0, 0.0]),   # orthogonal
            (2, [1.0, 0.0, 0.0], [1.0, 0.0, 0.0]),   # identical
            (3, [1.0, 0.0, 0.0], [-1.0, 0.0, 0.0]),  # opposite
            (4, [1.0, 2.0, 2.0], [2.0, 4.0, 4.0]),   # parallel, scaled
            (5, [3.0, 4.0, 0.0], [4.0, 3.0, 0.0]),
        ],
        ["id", "a", "b"],
    )


def collect_map(df, col):
    return {r["id"]: r["v"] for r in df.select("id", col.alias("v")).collect()}


def test_dot(vec_df):
    m = collect_map(vec_df, dot("a", "b"))
    assert m[1] == 0.0 and m[2] == 1.0 and m[3] == -1.0 and m[4] == 18.0 and m[5] == 24.0


def test_l2_norm(vec_df):
    m = collect_map(vec_df, l2_norm("a"))
    assert m[1] == 1.0 and m[4] == 3.0 and m[5] == 5.0


def test_l2_dist(vec_df):
    m = collect_map(vec_df, l2_dist("a", "b"))
    assert m[2] == 0.0
    assert math.isclose(m[1], math.sqrt(2))
    assert m[3] == 2.0


def test_cosine_sim(vec_df):
    m = collect_map(vec_df, cosine_sim("a", "b"))
    assert m[1] == 0.0 and m[2] == 1.0 and m[3] == -1.0
    assert math.isclose(m[4], 1.0)
    assert math.isclose(m[5], 24.0 / 25.0)


def test_cosine_dist_and_normalize(vec_df):
    m = collect_map(vec_df, cosine_dist("a", "b"))
    assert math.isclose(m[1], 1.0) and math.isclose(m[3], 2.0)
    # normalize_cosine_distance(d) == 1 - d  (reference weaviate.py:17-20)
    df = vec_df.withColumn("d", cosine_dist("a", "b"))
    m2 = collect_map(df, normalize_cosine_distance("d"))
    m3 = collect_map(vec_df, cosine_sim("a", "b"))
    for k in m2:
        assert math.isclose(m2[k], m3[k], abs_tol=1e-12)


def test_normalize_vec(vec_df):
    m = collect_map(vec_df.withColumn("n", normalize_vec("a")), l2_norm("n"))
    for v in m.values():
        assert math.isclose(v, 1.0)


def test_int8_quantize_roundtrip(spark):
    from weaviate_txtai_spark.functions.vector import int8_quantize, int8_scale

    df = spark.createDataFrame(
        [(0, [1.0, -0.5, 0.25, 0.0]), (1, [0.0, 0.0, 0.0, 0.0])],
        "id long, v array<double>",
    )
    rows = {
        r["id"]: (list(r["q"]), r["s"])
        for r in df.select(
            "id", int8_quantize("v").alias("q"), int8_scale("v").alias("s")
        ).collect()
    }
    q0, s0 = rows[0]
    assert q0 == [127, -64, 32, 0]  # round(127*x/max|x|)
    assert abs(s0 - 1.0 / 127.0) < 1e-12
    # reconstruction error bounded by scale/2 per component
    recon = [x * s0 for x in q0]
    for orig, rec in zip([1.0, -0.5, 0.25, 0.0], recon):
        assert abs(orig - rec) <= s0 / 2 + 1e-12
    assert rows[1] == ([0, 0, 0, 0], 0.0)  # zero vector stays zero


def test_cosine_sim_zero_vector_scores_zero(spark):
    """ANSI mode: a zero vector (empty-doc encoder output) must score 0,
    not DIVIDE_BY_ZERO-crash the whole search job (review finding r3)."""
    from weaviate_txtai_spark.functions.vector import cosine_sim, normalize_vec

    df = spark.createDataFrame(
        [([0.0, 0.0], [1.0, 0.0]), ([1.0, 0.0], [1.0, 0.0])],
        "a array<double>, b array<double>",
    )
    rows = df.select(
        cosine_sim("a", "b").alias("c"), normalize_vec("a").alias("n")
    ).collect()
    assert rows[0]["c"] == 0.0 and rows[0]["n"] == [0.0, 0.0]
    assert abs(rows[1]["c"] - 1.0) < 1e-12


def test_split_fraction_wide_ids_no_overflow(spark):
    """Hash-shaped ids near 2^63 must not ARITHMETIC_OVERFLOW, and small
    ids keep their original assignment (review finding r3)."""
    from weaviate_txtai_spark.functions.sampling import split_fraction

    K, M = 2654435761, 1 << 32
    ids = [0, 1, 12345, 3_000_000_000, (1 << 62) + 987654321, (1 << 63) - 1]
    df = spark.createDataFrame([(i,) for i in ids], "id long")
    got = {
        r["id"]: r["f"]
        for r in df.select("id", split_fraction("id").alias("f")).collect()
    }
    for i in ids:
        assert abs(got[i] - ((i * K) % M) / M) < 1e-12
