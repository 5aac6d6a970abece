"""Hostile-input hardening for functions/sampling.py (VERDICT r10 task
3). Findings fixed this round, each probed below:

1. NaN weight rows WON every weighted_sample_k draw (Spark orders NaN
   above all reals, so `NaN > 0` passed the filter and the NaN key
   sorted first under desc).
2. NULL-id rows were deterministically picked FIRST by every
   hash-ordered sampler (NULL fraction sorts first under asc).
3. temperature_sample allocated quota to a NULL stratum then silently
   dropped it at the inner quota join (output < total), or crashed with
   a bare TypeError inside the largest-remainder tie sort.
4. temperature_sample's quota table hardcoded a string stratum column —
   integer strata crashed createDataFrame.
5. mixture_sample attached quotas via a |strata|-deep when-chain — the
   silent-codegen-64KB-fallback shape (operators/sharding.py lesson) —
   now a broadcast join.
"""

import pytest

from pyspark.sql import functions as F


def test_nan_weight_cannot_win_weighted_sample(spark):
    from weaviate_txtai_spark.functions.sampling import weighted_sample_k

    df = spark.createDataFrame(
        [(1, 1.0), (2, 2.0), (3, float("nan")), (4, 3.0)],
        "doc_id long, w double",
    )
    ids = {r.doc_id for r in weighted_sample_k(df, 3, "w").collect()}
    assert 3 not in ids
    assert ids == {1, 2, 4}


def test_null_id_excluded_from_uniform_sample(spark):
    from weaviate_txtai_spark.functions.sampling import uniform_sample_k

    df = spark.createDataFrame(
        [(None,), (1,), (2,), (3,), (4,), (5,)], "doc_id long"
    )
    ids = [r.doc_id for r in uniform_sample_k(df, 3).collect()]
    assert None not in ids and len(ids) == 3


def test_null_id_excluded_from_weighted_sample(spark):
    from weaviate_txtai_spark.functions.sampling import weighted_sample_k

    df = spark.createDataFrame(
        [(None, 100.0), (1, 1.0), (2, 1.0)], "doc_id long, w double"
    )
    ids = {r.doc_id for r in weighted_sample_k(df, 2, "w").collect()}
    assert ids == {1, 2}


def test_temperature_sample_null_stratum_excluded_total_exact(spark):
    from weaviate_txtai_spark.functions.sampling import temperature_sample

    df = spark.createDataFrame(
        [(i, "a") for i in range(10)]
        + [(100 + i, None) for i in range(10)],
        "doc_id long, source string",
    )
    out = temperature_sample(df, 8, 1.0)
    rows = out.collect()
    assert len(rows) == 8  # EXACTLY total — no silent quota leak
    assert all(r.source == "a" for r in rows)


def test_temperature_sample_null_id_excluded(spark):
    from weaviate_txtai_spark.functions.sampling import temperature_sample

    df = spark.createDataFrame(
        [(None, "a")] + [(i, "a") for i in range(6)],
        "doc_id long, source string",
    )
    rows = temperature_sample(df, 3, 1.0).collect()
    assert len(rows) == 3 and all(r.doc_id is not None for r in rows)


def test_temperature_sample_integer_strata(spark):
    from weaviate_txtai_spark.functions.sampling import temperature_sample

    df = spark.createDataFrame(
        [(i, 7) for i in range(8)] + [(100 + i, 9) for i in range(8)],
        "doc_id long, source int",
    )
    rows = temperature_sample(df, 6, 1.0).collect()
    assert len(rows) == 6
    assert {r.source for r in rows} <= {7, 9}


def test_mixture_sample_null_id_excluded_and_exact(spark):
    from weaviate_txtai_spark.functions.sampling import mixture_sample

    df = spark.createDataFrame(
        [(None, "a")]
        + [(i, "a") for i in range(8)]
        + [(100 + i, "b") for i in range(8)],
        "doc_id long, source string",
    )
    out = mixture_sample(df, {"a": 0.5, "b": 0.5}).collect()
    assert all(r.doc_id is not None for r in out)
    by = {}
    for r in out:
        by[r.source] = by.get(r.source, 0) + 1
    assert by == {"a": 8, "b": 8}


def test_mixture_sample_many_strata_broadcast_join(spark):
    """120 strata — the old when-chain shape risked the silent 64 KB
    codegen fallback; the broadcast join stays flat. Exact counts per
    stratum still hold."""
    from weaviate_txtai_spark.functions.sampling import mixture_sample

    rows = [
        (s * 1000 + i, f"s{s:03d}") for s in range(120) for i in range(4)
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    weights = {f"s{s:03d}": 1.0 for s in range(120)}
    out = mixture_sample(df, weights)
    assert out.count() == 480  # every stratum taken whole (binding λ=4)
    inexact = mixture_sample(df, weights, exact=False)
    assert 0 < inexact.count() <= 480


def test_samplers_still_nest_after_null_filter(spark):
    """The NULL-exclusion must not change which non-NULL rows win: k'>k
    extends the same draw."""
    from weaviate_txtai_spark.functions.sampling import uniform_sample_k

    df = spark.createDataFrame([(i,) for i in range(50)], "doc_id long")
    k3 = [r.doc_id for r in uniform_sample_k(df, 3).collect()]
    k6 = [r.doc_id for r in uniform_sample_k(df, 6).collect()]
    assert k6[:3] == k3
