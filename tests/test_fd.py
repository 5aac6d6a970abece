"""Functional-dependency discovery: g3 closed forms, exact FDs,
composite determinants, key profiling."""

import pytest

from weaviate_txtai_spark.operators.fd import fd_error, fd_profile, key_uniqueness


def test_exact_fd_has_zero_error(spark):
    rows = [(1, "x"), (1, "x"), (2, "y"), (3, "y")]
    df = spark.createDataFrame(rows, "a long, b string")
    r = fd_error(df, "a", "b").collect()[0]
    assert r["g3_error"] == 0.0 and r["n_violating_groups"] == 0
    assert r["n_rows"] == 4 and r["n_groups"] == 3


def test_g3_closed_form(spark):
    # group 1: b in {x, x, y} -> keep 2 of 3; group 2: {z} -> keep 1
    rows = [(1, "x"), (1, "x"), (1, "y"), (2, "z")]
    df = spark.createDataFrame(rows, "a long, b string")
    r = fd_error(df, "a", "b").collect()[0]
    assert r["g3_error"] == 0.25 and r["n_violating_groups"] == 1


def test_composite_determinant_and_profile(spark):
    rows = [(1, 1, "x"), (1, 2, "y"), (1, 1, "x"), (2, 1, "y")]
    df = spark.createDataFrame(rows, "a long, b long, c string")
    out = {
        r["determinant"]: r["g3_error"]
        for r in fd_profile(df, [(["a", "b"], "c"), ("a", "c")]).collect()
    }
    assert out["a+b"] == 0.0  # (a,b) determines c exactly here
    assert out["a"] == 0.25  # a=1 has {x,x,y}
    with pytest.raises(ValueError, match="candidates"):
        fd_profile(df, [])


def test_nulls_group_together(spark):
    rows = [(None, "x"), (None, "x"), (1, "y")]
    df = spark.createDataFrame(rows, "a string, b string")
    r = fd_error(df, "a", "b").collect()[0]
    assert r["g3_error"] == 0.0 and r["n_groups"] == 2


def test_key_uniqueness(spark):
    rows = [(1, 1), (1, 1), (1, 2), (2, 1)]
    df = spark.createDataFrame(rows, "a long, b long")
    r = key_uniqueness(df, ["a", "b"]).collect()[0]
    assert r["key"] == "a+b" and r["n_keys"] == 3
    assert r["n_dup_rows"] == 1 and r["dup_fraction"] == 0.25
