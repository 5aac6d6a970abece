"""SCD2 merge: close/append/insert/pass-through semantics."""

import datetime

import pytest
from pyspark.sql import functions as F

from weaviate_txtai_spark.operators.scd import scd2_apply

D = datetime.date


def _hist(spark, rows):
    return spark.createDataFrame(
        rows, "k long, seg string, note string, valid_from date, valid_to date"
    )


def _ch(spark, rows):
    return spark.createDataFrame(rows, "k long, seg string, effective_date date")


def test_scd2_close_append_insert_passthrough(spark):
    hist = _hist(spark, [
        (1, "A", "n1", D(1995, 1, 1), None),        # will change
        (2, "B", "n2", D(1995, 1, 1), None),        # same value -> untouched
        (3, "C", "n3", D(1995, 1, 1), D(1999, 1, 1)),  # closed: pass through
        (3, "D", "n3", D(1999, 1, 1), None),        # open, no change row
    ])
    ch = _ch(spark, [
        (1, "Z", D(2000, 1, 1)),
        (2, "B", D(2000, 1, 1)),
        (9, "NEW", D(2000, 1, 1)),                  # insert
    ])
    out = scd2_apply(
        hist, ch, key_cols=["k"], compare_cols=["seg"]
    )
    got = sorted(
        (r["k"], r["seg"], r["note"], r["valid_from"], r["valid_to"])
        for r in out.collect()
    )
    assert got == [
        (1, "A", "n1", D(1995, 1, 1), D(2000, 1, 1)),   # closed
        (1, "Z", "n1", D(2000, 1, 1), None),            # new version
        (2, "B", "n2", D(1995, 1, 1), None),            # untouched
        (3, "C", "n3", D(1995, 1, 1), D(1999, 1, 1)),   # closed history
        (3, "D", "n3", D(1999, 1, 1), None),            # open, no change
        (9, "NEW", None, D(2000, 1, 1), None),          # insert
    ]


def test_scd2_null_to_value_counts_as_change(spark):
    hist = _hist(spark, [(1, None, "n", D(1995, 1, 1), None)])
    ch = _ch(spark, [(1, "X", D(2000, 1, 1))])
    out = scd2_apply(hist, ch, key_cols=["k"], compare_cols=["seg"])
    assert out.count() == 2  # closed + new (eqNullSafe, not '=')


def test_scd2_duplicate_change_keys_raise(spark):
    hist = _hist(spark, [(1, "A", "n", D(1995, 1, 1), None)])
    ch = _ch(spark, [(1, "X", D(2000, 1, 1)), (1, "Y", D(2001, 1, 1))])
    with pytest.raises(ValueError, match="duplicate or NULL"):
        scd2_apply(hist, ch, key_cols=["k"], compare_cols=["seg"])


def test_scd2_sequential_batches_build_history(spark):
    hist = _hist(spark, [(1, "A", "n", D(1995, 1, 1), None)])
    h2 = scd2_apply(
        hist, _ch(spark, [(1, "B", D(2000, 1, 1))]),
        key_cols=["k"], compare_cols=["seg"],
    )
    h3 = scd2_apply(
        h2, _ch(spark, [(1, "C", D(2005, 1, 1))]),
        key_cols=["k"], compare_cols=["seg"],
    )
    got = sorted(
        (r["seg"], r["valid_from"], r["valid_to"]) for r in h3.collect()
    )
    assert got == [
        ("A", D(1995, 1, 1), D(2000, 1, 1)),
        ("B", D(2000, 1, 1), D(2005, 1, 1)),
        ("C", D(2005, 1, 1), None),
    ]
