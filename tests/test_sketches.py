"""Error-bound contracts for the sketch aggregates.

The sketch queries (approx_distinct_users, approx_price_quantiles) are
rows-only in the driver gate because HLL++/GK internals are
engine-specific; these tests pin their accuracy against the exact
queries instead, which is the actual contract a pipeline relies on.
"""

from weaviate_txtai_spark.plans import queries as q


def _by_key(rows, key, val):
    return {r[key]: r[val] for r in rows}


def test_hll_distinct_within_relative_error(spark, sf_dir):
    exact = _by_key(
        q.events_distinct_users_q(spark, sf_dir).collect(), "event_type", "n_users"
    )
    approx = _by_key(
        q.approx_distinct_users_q(spark, sf_dir).collect(),
        "event_type",
        "n_users_approx",
    )
    assert set(exact) == set(approx)
    for et, n in exact.items():
        # rsd=0.02 → 3-sigma ≈ 6%; generous but a real bound.
        assert abs(approx[et] - n) <= max(1, 0.06 * n), (et, approx[et], n)


def test_approx_quantiles_rank_accuracy(spark, sf_dir):
    """GK with accuracy=10000 on ~6k rows must land within a tight rank
    band of the exact quantile: check the approximate value's true rank."""
    li = q.load_table(spark, sf_dir, "lineitem")
    prices = sorted(r[0] for r in li.select("l_extendedprice").collect())
    n = len(prices)
    got = q.approx_price_quantiles_q(spark, sf_dir).collect()
    assert [r["q_idx"] for r in got] == [0, 1, 2, 3]
    for q_idx, target in zip(range(4), [0.25, 0.5, 0.75, 0.95]):
        v = got[q_idx]["price_approx"]
        rank = sum(1 for p in prices if p <= v) / n
        assert abs(rank - target) <= 0.01, (target, rank, v)


def test_sketches_are_rows_only_in_registry():
    oracles = q.oracle_sql()
    assert "approx_distinct_users" not in oracles
    assert "approx_price_quantiles" not in oracles
    assert "events_distinct_users" in oracles


def test_approx_deciles_equidepth_within_tolerance(spark, sf_dir):
    """Sketch-boundary histogram: 10 contiguous buckets, sizes within a
    few % of n/10, all rows accounted for — the scale path asserted
    against what exact ntile guarantees by construction."""
    rows = q.approx_value_deciles_q(spark, sf_dir).collect()
    assert [r["decile"] for r in rows] == list(range(1, 11))
    n = sum(r["n_cust"] for r in rows)
    target = n / 10
    for r in rows:
        assert abs(r["n_cust"] - target) <= max(2, 0.05 * target), (
            r["decile"],
            r["n_cust"],
            target,
        )
    # buckets are ordered and non-overlapping in value space
    for a, b in zip(rows, rows[1:]):
        assert a["max_bal"] <= b["min_bal"]


def test_quantile_buckets_general(spark, sf_dir):
    """The reusable bucketing works for any column/bucket count and
    stays map-only after the sketch (no hash shuffle for assignment)."""
    from weaviate_txtai_spark.functions.sampling import quantile_buckets
    from weaviate_txtai_spark.plans.explain import physical_plan

    li = q.load_table(spark, sf_dir, "lineitem").select("l_extendedprice")
    b = quantile_buckets(li, "l_extendedprice", n_buckets=4)
    from pyspark.sql import functions as F

    counts = {
        r["bucket"]: r["n"]
        for r in b.groupBy("bucket").agg(F.count("*").alias("n")).collect()
    }
    assert set(counts) == {1, 2, 3, 4}
    n = sum(counts.values())
    for c in counts.values():
        assert abs(c - n / 4) <= 0.05 * n
    # assignment itself adds no hash shuffle: only the sketch's
    # single-partition agg exchange appears
    plan = physical_plan(b)
    assert "hashpartitioning" not in plan


def test_exact_ntile_guardrail(spark):
    """exact_ntile warns above its row threshold (the single-partition
    global sort cliff) and stays silent below it; bucketing itself is
    plain ntile either way (VERDICT r2 item 6)."""
    import warnings

    from pyspark.sql import functions as F

    from weaviate_txtai_spark.functions.sampling import (
        ExactNtileScaleWarning,
        exact_ntile,
    )

    df = spark.range(100).select(F.col("id").cast("double").alias("v"), "id")
    with warnings.catch_warnings():
        warnings.simplefilter("error", ExactNtileScaleWarning)
        small = exact_ntile(df, 4, F.asc("v"), bucket_col="q")  # no warning
        counts = {r["q"]: r["n"] for r in small.groupBy("q").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert counts == {1: 25, 2: 25, 3: 25, 4: 25}
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        exact_ntile(df, 4, F.asc("v"), warn_rows=50)
    assert any(issubclass(w.category, ExactNtileScaleWarning) for w in caught)
    # opt-out skips the probe entirely
    with warnings.catch_warnings():
        warnings.simplefilter("error", ExactNtileScaleWarning)
        exact_ntile(df, 4, F.asc("v"), warn_rows=None)
