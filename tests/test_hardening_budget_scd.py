"""Hostile-input hardening for operators/budget.py and operators/scd.py
(VERDICT r10 task 3). Findings fixed this round:

- waterfill_allocation silently produced a corrupt allocation (Σ alloc
  ≠ min(budget, Σ amount)) on NULL/negative/NaN inventories — now an
  in-plan raise_error, no extra action.
- scd2_apply silently inserted a PARALLEL open version when a change
  row carried a NULL key (the equi-join never matches NULL) — now the
  existing one-action dup check also rejects NULL keys.
- log_state_as_of silently treated a NULL op as a DELETE
  (`NULL != 'delete'` is NULL → filtered) — now NULL/unknown ops raise
  from the same bounded action as the duplicate-version check.
"""

import pytest

from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException


def _waterfill(spark, rows, budget):
    from weaviate_txtai_spark.operators.budget import waterfill_allocation

    df = spark.createDataFrame(rows, "source string, tokens double")
    return waterfill_allocation(df, budget)


def test_waterfill_negative_inventory_raises(spark):
    from py4j.protocol import Py4JJavaError

    with pytest.raises(Exception, match="non-negative"):
        _waterfill(
            spark, [("a", 100.0), ("b", -5.0)], 50.0
        ).collect()


def test_waterfill_null_inventory_raises(spark):
    df = spark.createDataFrame(
        [("a", 100.0), ("b", None)], "source string, tokens double"
    )
    from weaviate_txtai_spark.operators.budget import waterfill_allocation

    with pytest.raises(Exception, match="non-negative"):
        waterfill_allocation(df, 50.0).collect()


def test_waterfill_nan_inventory_raises(spark):
    with pytest.raises(Exception, match="non-negative"):
        _waterfill(
            spark, [("a", 100.0), ("b", float("nan"))], 50.0
        ).collect()


def test_waterfill_clean_path_unchanged(spark):
    out = {
        r.source: r.alloc
        for r in _waterfill(
            spark, [("a", 10.0), ("b", 100.0), ("c", 100.0)], 60.0
        ).collect()
    }
    # a taken whole; b and c capped at θ=(60-10)/2=25
    assert out == {"a": 10.0, "b": 25.0, "c": 25.0}


def _scd_frames(spark):
    hist = spark.createDataFrame(
        [(1, "x", "2024-01-01", None)],
        "k long, v string, valid_from string, valid_to string",
    )
    return hist


def test_scd2_null_key_change_raises(spark):
    from weaviate_txtai_spark.operators.scd import scd2_apply

    hist = _scd_frames(spark)
    changes = spark.createDataFrame(
        [(None, "y", "2024-02-01")], "k long, v string, effective_date string"
    )
    with pytest.raises(ValueError, match="duplicate or NULL"):
        scd2_apply(
            hist, changes, key_cols=["k"], compare_cols=["v"]
        )


def test_scd2_clean_change_still_applies(spark):
    from weaviate_txtai_spark.operators.scd import scd2_apply

    hist = _scd_frames(spark)
    changes = spark.createDataFrame(
        [(1, "y", "2024-02-01")], "k long, v string, effective_date string"
    )
    out = scd2_apply(
        hist, changes, key_cols=["k"], compare_cols=["v"]
    ).collect()
    assert len(out) == 2
    open_rows = [r for r in out if r.valid_to is None]
    assert len(open_rows) == 1 and open_rows[0].v == "y"


def _log(spark, rows):
    return spark.createDataFrame(
        rows, "k long, v string, version long, op string"
    )


def test_log_state_null_op_raises_not_deletes(spark):
    from weaviate_txtai_spark.operators.scd import log_state_as_of

    log = _log(spark, [(1, "x", 1, "upsert"), (1, "y", 2, None)])
    with pytest.raises(ValueError, match="op outside"):
        log_state_as_of(log, key_cols=["k"]).collect()


def test_log_state_unknown_op_raises(spark):
    from weaviate_txtai_spark.operators.scd import log_state_as_of

    log = _log(spark, [(1, "x", 1, "merge")])
    with pytest.raises(ValueError, match="op outside"):
        log_state_as_of(log, key_cols=["k"]).collect()


def test_log_state_clean_path_unchanged(spark):
    from weaviate_txtai_spark.operators.scd import log_state_as_of

    log = _log(
        spark,
        [
            (1, "x", 1, "upsert"),
            (1, "y", 2, "upsert"),
            (2, "z", 1, "upsert"),
            (2, None, 2, "delete"),
        ],
    )
    out = {r.k: r.v for r in log_state_as_of(log, key_cols=["k"]).collect()}
    assert out == {1: "y"}
    as_of_1 = {
        r.k: r.v
        for r in log_state_as_of(log, key_cols=["k"], as_of=1).collect()
    }
    assert as_of_1 == {1: "x", 2: "z"}


def test_log_state_duplicate_version_still_raises(spark):
    from weaviate_txtai_spark.operators.scd import log_state_as_of

    log = _log(spark, [(1, "x", 1, "upsert"), (1, "y", 1, "upsert")])
    with pytest.raises(ValueError, match="duplicate version"):
        log_state_as_of(log, key_cols=["k"]).collect()
