"""Round-8 batch 7: interval-overlap join, ratio/cluster bootstrap."""

import datetime as dt

import pytest

from pyspark.sql import functions as F


def _iv(spark, rows, s="start", e="end"):
    base = dt.datetime(2024, 1, 1)
    data = [
        (i, base + dt.timedelta(minutes=a), base + dt.timedelta(minutes=b))
        for i, (a, b) in enumerate(rows)
    ]
    return spark.createDataFrame(data, f"id long, {s} timestamp, {e} timestamp")


def test_interval_overlap_matches_quadratic(spark):
    from weaviate_txtai_spark.operators.asof import interval_overlap_join

    import random

    rng = random.Random(9)
    li = [(a, a + rng.randrange(1, 120)) for a in
          (rng.randrange(0, 2000) for _ in range(60))]
    ri = [(a, a + rng.randrange(1, 120)) for a in
          (rng.randrange(0, 2000) for _ in range(40))]
    left = _iv(spark, li)
    right = _iv(spark, ri, s="rstart", e="rend").withColumnRenamed(
        "id", "rid"
    )
    got = interval_overlap_join(
        left, right, bucket_seconds=600,
        right_start="rstart", right_end="rend",
    ).select("id", "rid").collect()
    got_pairs = sorted((r["id"], r["rid"]) for r in got)
    want = sorted(
        (i, j)
        for i, (a, b) in enumerate(li)
        for j, (c, d) in enumerate(ri)
        if a <= d and c <= b
    )
    assert got_pairs == want
    # no duplicate pairs despite multi-bucket overlaps
    assert len(got_pairs) == len(set(got_pairs))


def test_interval_overlap_keys_and_guard(spark):
    from weaviate_txtai_spark.operators.asof import interval_overlap_join

    base = dt.datetime(2024, 1, 1)
    left = spark.createDataFrame(
        [("k1", base, base + dt.timedelta(hours=1))],
        "grp string, start timestamp, end timestamp",
    )
    right = spark.createDataFrame(
        [("k2", base, base + dt.timedelta(hours=1), 7)],
        "grp string, rstart timestamp, rend timestamp, payload int",
    )
    out = interval_overlap_join(
        left, right, bucket_seconds=600, on=["grp"],
        right_start="rstart", right_end="rend",
    ).collect()
    assert out == []  # key mismatch blocks the overlapping pair
    wide = spark.createDataFrame(
        [("k1", base, base + dt.timedelta(days=400))],
        "grp string, start timestamp, end timestamp",
    )
    with pytest.raises(Exception, match="widen bucket_seconds"):
        interval_overlap_join(
            wide, right, bucket_seconds=60, on=["grp"],
            right_start="rstart", right_end="rend",
            max_buckets_per_interval=100,
        ).collect()


def test_ratio_bootstrap_brackets_and_cluster_semantics(spark):
    from weaviate_txtai_spark.operators.bootstrap import (
        poisson_bootstrap_ratio_ci,
    )

    # 200 users x 5 rows; user's rows share the draw (cluster resample)
    rows = [
        (u, 1.0 if (u * 5 + i) % 4 == 0 else 0.0, 1.0)
        for u in range(200)
        for i in range(5)
    ]
    df = spark.createDataFrame(rows, "uid long, n double, d double")
    r = poisson_bootstrap_ratio_ci(
        df, "n", "d", id_col="uid", n_replicates=40
    ).collect()[0]
    assert r["n"] == 1000
    assert r["lo"] <= r["ratio"] <= r["hi"]
    assert 0.15 < r["ratio"] < 0.35
    # determinism across partitionings
    r2 = poisson_bootstrap_ratio_ci(
        df.repartition(7), "n", "d", id_col="uid", n_replicates=40
    ).collect()[0]
    assert tuple(r) == tuple(r2)


def test_mean_bootstrap_cluster_weights_shared_within_unit(spark):
    """Rows with the SAME id share a replicate draw — the cluster
    property the docstring promises: a unit duplicated k times moves
    in lockstep, so the CI must be wider than an iid resample of the
    same values with unique ids."""
    from weaviate_txtai_spark.operators.bootstrap import (
        poisson_bootstrap_mean_ci,
    )

    import random

    rng = random.Random(11)
    vals = [rng.gauss(0, 1) for _ in range(100)]
    clustered = [(u, vals[u]) for u in range(100) for _ in range(10)]
    iid = [(i, vals[i % 100]) for i in range(1000)]
    cdf = spark.createDataFrame(clustered, "id long, x double")
    idf = spark.createDataFrame(iid, "id long, x double")
    rc = poisson_bootstrap_mean_ci(cdf, "x", id_col="id").collect()[0]
    ri = poisson_bootstrap_mean_ci(idf, "x", id_col="id").collect()[0]
    assert (rc["hi"] - rc["lo"]) > (ri["hi"] - ri["lo"])
