"""Round-8 batch 3: referential integrity, BH FDR, Cliff's delta,
daily gap fill."""

import datetime as dt

import pytest

from pyspark.sql import functions as F


def test_referential_integrity_counts(spark):
    from weaviate_txtai_spark.operators.fd import referential_integrity

    child = spark.createDataFrame(
        [(1,), (1,), (2,), (9,), (9,), (9,), (None,)], "fk long"
    )
    parent = spark.createDataFrame([(1,), (2,), (3,)], "pk long")
    r = referential_integrity(
        child, parent, child_keys="fk", parent_keys="pk"
    ).collect()[0]
    assert r["n_child"] == 7 and r["n_null_fk"] == 1
    assert r["n_orphan_rows"] == 3 and r["n_orphan_keys"] == 1
    assert r["orphan_fraction"] == 0.5
    with pytest.raises(ValueError, match="align"):
        referential_integrity(
            child, parent, child_keys=["fk"], parent_keys=["pk", "pk2"]
        )


def test_referential_integrity_clean(spark):
    from weaviate_txtai_spark.operators.fd import referential_integrity

    child = spark.createDataFrame([(1,), (2,)], "fk long")
    parent = spark.createDataFrame([(1,), (2,)], "pk long")
    r = referential_integrity(
        child, parent, child_keys="fk", parent_keys="pk"
    ).collect()[0]
    assert r["n_orphan_rows"] == 0 and r["orphan_fraction"] == 0.0


def test_bh_adjust_textbook(spark):
    from weaviate_txtai_spark.operators.abtest import bh_adjust

    # classic worked example: ps sorted .01 .02 .03 .04 .05, n=5
    # raw = .05 .05 .05 .05 .05 -> all q = .05
    df = spark.createDataFrame(
        [(f"t{i}", 0.01 * i) for i in range(1, 6)], "test_id string, p double"
    )
    out = bh_adjust(df, "p", id_cols=["test_id"]).collect()
    assert all(r["q"] == 0.05 for r in out)


def test_bh_monotone_and_capped(spark):
    from weaviate_txtai_spark.operators.abtest import bh_adjust

    df = spark.createDataFrame(
        [("a", 0.001), ("b", 0.9), ("c", 0.04), ("d", 0.04)],
        "test_id string, p double",
    )
    out = sorted(bh_adjust(df, "p", id_cols=["test_id"]).collect(),
                 key=lambda r: (r["p"], r["test_id"]))
    qs = [r["q"] for r in out]
    assert qs == sorted(qs)  # q is non-decreasing in p
    assert qs[-1] <= 1.0
    # tied ps share a q
    tied = [r["q"] for r in out if r["p"] == 0.04]
    assert tied[0] == tied[1]


def test_cliffs_delta_matches_quadratic(spark):
    from weaviate_txtai_spark.operators.abtest import cliffs_delta

    import random

    rng = random.Random(5)
    a = [round(rng.uniform(0, 10), 1) for _ in range(40)]
    b = [round(rng.uniform(2, 12), 1) for _ in range(30)]
    rows = [("a", v) for v in a] + [("b", v) for v in b]
    df = spark.createDataFrame(rows, "g string, v double")
    r = cliffs_delta(df, "g", "v", group_a="a", group_b="b").collect()[0]
    ref = sum(
        (1 if x > y else -1 if x < y else 0) for x in a for y in b
    ) / (len(a) * len(b))
    assert r["n_a"] == 40 and r["n_b"] == 30
    assert r["delta"] == round(ref, 6)


def test_cliffs_delta_extremes_and_empty(spark):
    from weaviate_txtai_spark.operators.abtest import cliffs_delta

    df = spark.createDataFrame(
        [("a", 10.0), ("a", 11.0), ("b", 1.0)], "g string, v double"
    )
    assert cliffs_delta(df, "g", "v", group_a="a", group_b="b").collect()[0][
        "delta"
    ] == 1.0
    empty_b = df.filter(F.col("g") == "a")
    r = cliffs_delta(empty_b, "g", "v", group_a="a", group_b="b").collect()[0]
    assert r["n_b"] == 0 and r["delta"] is None


def _ev(spark, spec):
    rows = [
        (g, dt.datetime.combine(d, dt.time(3)) + dt.timedelta(minutes=i))
        for g, d, n in spec
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "event_type string, ts timestamp")


def test_gapfill_zero_and_ffill(spark):
    from weaviate_txtai_spark.operators.seasonal import fill_daily_gaps

    d = dt.date(2024, 3, 1)
    ev = _ev(spark, [("a", d, 2), ("a", d + dt.timedelta(days=3), 5)])
    zero = {str(r["day"]): (r["n"], r["observed"])
            for r in fill_daily_gaps(ev, fill="zero").collect()}
    assert len(zero) == 4  # full span materialized
    assert zero["2024-03-02"] == (0, False)
    assert zero["2024-03-04"] == (5, True)
    ff = {str(r["day"]): r["n"]
          for r in fill_daily_gaps(ev, fill="ffill").collect()}
    assert ff["2024-03-02"] == 2 and ff["2024-03-03"] == 2
    with pytest.raises(ValueError, match="fill"):
        fill_daily_gaps(ev, fill="interp")
