"""salted_join: result-equivalence with plain join + salt spreading."""

import pytest
from pyspark.sql import functions as F

from weaviate_txtai_spark.operators.skew import salted_join


@pytest.fixture()
def skewed(spark):
    # 90% of rows share one hot key — the shape salting exists for
    rows = [(0 if i % 10 != 9 else i, f"v{i}") for i in range(1000)]
    return spark.createDataFrame(rows, "k long, payload string")


@pytest.fixture()
def dim(spark):
    return spark.createDataFrame(
        [(i, f"d{i}") for i in range(0, 1000, 3)], "k long, attr string"
    )


def test_inner_matches_plain_join(skewed, dim):
    plain = skewed.join(dim, "k").select("k", "payload", "attr")
    salted = salted_join(skewed, dim, "k", salt_factor=8).select(
        "k", "payload", "attr"
    )
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, salted.collect())
    )


def test_left_matches_plain_join(skewed, dim):
    plain = skewed.join(dim, "k", "left").select("k", "payload", "attr")
    salted = salted_join(skewed, dim, "k", how="left", salt_factor=8).select(
        "k", "payload", "attr"
    )
    assert sorted(
        map(tuple, plain.fillna("").collect())
    ) == sorted(map(tuple, salted.fillna("").collect()))


def test_salt_spreads_hot_key(spark, skewed, dim):
    # the hot key's rows must land in >1 salt bucket (seeded for determinism)
    left = skewed.withColumn("s", (F.rand(7) * 8).cast("int"))
    n_buckets = (
        left.filter(F.col("k") == 0).select("s").distinct().count()
    )
    assert n_buckets > 1


def test_rejects_unsupported_how(skewed, dim):
    with pytest.raises(ValueError):
        salted_join(skewed, dim, "k", how="full")


def test_salted_join_with_map_column(spark):
    """MapType columns are unhashable for xxhash64; the salt must skip
    them instead of failing analysis (review finding r4)."""
    from weaviate_txtai_spark.operators.skew import salted_join

    left = spark.createDataFrame(
        [(1, {"a": "x"}, 10.0), (1, {"b": "y"}, 20.0), (2, {"c": "z"}, 5.0)],
        "k long, props map<string,string>, v double",
    )
    right = spark.createDataFrame([(1, "one"), (2, "two")], "k long, name string")
    rows = salted_join(left, right, "k", salt_factor=4, seed=1).collect()
    assert len(rows) == 3  # same as a plain join
    assert {r["name"] for r in rows} == {"one", "two"}
