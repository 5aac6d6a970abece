"""Time-grid resample/gap-fill and snapshot diff."""

import datetime

import pytest
from pyspark.sql import functions as F

from weaviate_txtai_spark.operators.diff import table_diff
from weaviate_txtai_spark.operators.resample import resample_ffill


def _ts(h, m=0):
    return datetime.datetime(2024, 1, 1, h, m)


@pytest.fixture()
def events(spark):
    rows = [
        ("a", _ts(0, 10), 10.0),
        ("a", _ts(0, 50), 20.0),   # hour 0 avg 15
        ("a", _ts(3, 5), 30.0),    # hours 1-2 are gaps
        ("b", _ts(5, 0), 1.0),     # single-bucket key
    ]
    return spark.createDataFrame(rows, "k string, ts timestamp, value double")


def test_resample_dense_grid_and_ffill(events):
    out = {
        (r["k"], r["bucket_ts"].hour): r
        for r in resample_ffill(
            events, keys=["k"], ts_col="ts", value_col="value", unit="hour"
        ).collect()
    }
    # key a spans ITS OWN hours 0..3 — dense, including the gap hours
    assert sorted(h for k, h in out if k == "a") == [0, 1, 2, 3]
    assert out[("a", 0)]["n_events"] == 2
    assert out[("a", 0)]["avg_value"] == 15.0
    assert not out[("a", 0)]["is_gap"]
    for h in (1, 2):
        r = out[("a", h)]
        assert r["is_gap"] and r["n_events"] == 0
        assert r["avg_value"] is None
        assert r["filled_value"] == 15.0   # carried from hour 0
    assert out[("a", 3)]["filled_value"] == 30.0
    # key b is never padded to a's span
    assert sorted(h for k, h in out if k == "b") == [5]


def test_resample_unit_guard(events):
    with pytest.raises(ValueError, match="unit"):
        resample_ffill(events, keys=["k"], unit="fortnight")


def test_table_diff_change_taxonomy(spark):
    old = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0), (3, "c", None), (4, "d", 4.0)],
        "id long, s string, v double",
    )
    new = spark.createDataFrame(
        [(1, "a", 1.0),          # unchanged -> not emitted
         (2, "B", 2.5),          # changed: s and v
         (3, "c", 3.0),          # changed: NULL -> value counts
         (5, "e", 5.0)],         # added
        "id long, s string, v double",
    )
    out = {r["id"]: r for r in table_diff(old, new, key_cols=["id"]).collect()}
    assert set(out) == {2, 3, 4, 5}   # row 1 unchanged, absent
    assert out[2]["change"] == "changed"
    assert list(out[2]["changed_cols"]) == ["s", "v"]
    assert out[3]["change"] == "changed"
    assert list(out[3]["changed_cols"]) == ["v"]
    assert out[4]["change"] == "removed" and list(out[4]["changed_cols"]) == []
    assert out[5]["change"] == "added" and list(out[5]["changed_cols"]) == []


def test_table_diff_compare_cols_guard(spark):
    old = spark.createDataFrame([(1, "a")], "id long, s string")
    new = spark.createDataFrame([(1, "a")], "id long, s string")
    with pytest.raises(ValueError, match="missing"):
        table_diff(old, new, key_cols=["id"], compare_cols=["nope"])


def test_table_diff_feeds_scd2_shape(spark):
    """The produced delta drives the SCD2 merge: changed+added rows are
    exactly the upsert batch, removed rows the delete set."""
    old = spark.createDataFrame(
        [(1, "x"), (2, "y"), (3, "z")], "id long, s string"
    )
    new = spark.createDataFrame(
        [(1, "x"), (2, "Y"), (4, "w")], "id long, s string"
    )
    d = table_diff(old, new, key_cols=["id"])
    upserts = {r["id"] for r in d.filter(
        F.col("change").isin("added", "changed")).collect()}
    deletes = {r["id"] for r in d.filter(F.col("change") == "removed").collect()}
    assert upserts == {2, 4}
    assert deletes == {3}
