"""Table profiling: one-pass stats, NULL handling, approx mode bound,
unknown-column validation."""

import pytest

from pyspark.sql import functions as F

from weaviate_txtai_spark.operators.profile import profile_table


def test_profile_basics_and_nulls(spark):
    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", None), (3, None, 2.5), (3, "b", 2.5)],
        "k long, s string, v double",
    )
    prof = {r["column"]: r for r in profile_table(df).collect()}
    assert set(prof) == {"k", "s", "v"}
    k = prof["k"]
    assert (k["n_rows"], k["n_nulls"], k["n_distinct"]) == (4, 0, 3)
    assert (k["min_num"], k["max_num"], k["mean"]) == (1.0, 3.0, 2.25)
    s = prof["s"]
    assert (s["n_nulls"], s["n_distinct"]) == (1, 2)
    assert s["min_num"] is None and s["mean"] is None
    assert (s["min_str"], s["max_str"]) == ("a", "b")
    v = prof["v"]
    assert (v["n_nulls"], v["n_distinct"]) == (1, 2)
    assert v["mean"] == pytest.approx((1.5 + 2.5 + 2.5) / 3)


def test_profile_single_job_one_pass(spark, sf_dir):
    # pin the scale contract, not just the row count: profiling more
    # columns must NOT launch more jobs (AQE splits one query into a
    # few stage-jobs, so the invariant is job count INDEPENDENT of
    # column count — a per-column/per-stat split would scale with it)
    sc = spark.sparkContext
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")

    def jobs_for(cols, tag):
        sc.setJobGroup(tag, "profile test")
        try:
            prof = profile_table(li, cols)
        finally:
            sc.setJobGroup("", "")
        return prof, len(sc.statusTracker().getJobIdsForGroup(tag))

    p1, j1 = jobs_for(["l_quantity"], "profile-1col")
    p3, j3 = jobs_for(
        ["l_quantity", "l_orderkey", "l_extendedprice"], "profile-3col"
    )
    assert j3 == j1, f"jobs grew with columns: {j1} -> {j3}"
    assert p1.count() == 1 and p3.count() == 3


def test_profile_map_column_does_not_poison(spark):
    df = spark.createDataFrame(
        [(1, {"a": "b"}), (2, None)], "k long, m map<string,string>"
    )
    prof = {r["column"]: r for r in profile_table(df).collect()}
    # the unorderable column reports rows/nulls only...
    m = prof["m"]
    assert (m["n_rows"], m["n_nulls"]) == (2, 1)
    assert m["n_distinct"] is None and m["min_str"] is None
    # ...and the orderable column's stats are unharmed
    k = prof["k"]
    assert (k["n_distinct"], k["min_num"], k["max_num"]) == (2, 1.0, 2.0)


def test_profile_approx_mode_close(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    exact = {r["column"]: r["n_distinct"]
             for r in profile_table(li, ["l_orderkey"]).collect()}
    approx = {r["column"]: r["n_distinct"]
              for r in profile_table(li, ["l_orderkey"], approx=True).collect()}
    e, a = exact["l_orderkey"], approx["l_orderkey"]
    assert abs(a - e) / e < 0.15  # HLL++ at rsd=0.05, generous margin


def test_profile_validates_columns(spark):
    df = spark.createDataFrame([(1,)], "k long")
    with pytest.raises(ValueError, match="unknown columns"):
        profile_table(df, ["nope"])


def test_profile_nested_map_does_not_poison(spark):
    df = spark.createDataFrame(
        [(1, [{"a": "b"}])], "k long, am array<map<string,string>>"
    )
    prof = {r["column"]: r for r in profile_table(df).collect()}
    assert prof["am"]["n_distinct"] is None
    assert prof["k"]["n_distinct"] == 1
