"""Regression tests for the round-9 ADVICE items: the all-zero-weight
apportionment invariant, SAX segment indexing for series starting at
t0 > 0, the AUC oracle's NULL event_type semantics, and the removal of
the dead __sgnsum aggregate from simpson_check."""

import pyspark.sql.functions as F


def test_apportion_all_zero_weights_round_robin(spark):
    """All weights 0 → equal-weight fallback; Σ alloc == total EXACTLY
    even when total exceeds the key count (ADVICE r9 #1)."""
    from weaviate_txtai_spark.operators.sharding import (
        largest_remainder_apportion,
    )

    df = spark.createDataFrame(
        [("a", 0), ("b", 0), ("c", 0)], "k string, w long"
    )
    out = largest_remainder_apportion(df, "k", "w", total=11).collect()
    alloc = {r.k: r.alloc for r in out}
    assert sum(alloc.values()) == 11
    # round-robin with key-ascending remainder tie-break: 11 = 4+4+3
    assert alloc == {"a": 4, "b": 4, "c": 3}


def test_apportion_zero_total_and_nonzero_weights_unchanged(spark):
    from weaviate_txtai_spark.operators.sharding import (
        largest_remainder_apportion,
    )

    df = spark.createDataFrame(
        [("a", 0), ("b", 0)], "k string, w long"
    )
    out = largest_remainder_apportion(df, "k", "w", total=0).collect()
    assert sum(r.alloc for r in out) == 0

    df2 = spark.createDataFrame(
        [("a", 3), ("b", 1)], "k string, w long"
    )
    alloc = {
        r.k: r.alloc
        for r in largest_remainder_apportion(df2, "k", "w", total=8).collect()
    }
    assert alloc == {"a": 6, "b": 2}


def test_sax_offset_series_matches_zero_based(spark):
    """A regular series starting at t0 > 0 must symbolize identically
    to the same series shifted to t=0 (ADVICE r9 #2)."""
    from weaviate_txtai_spark.operators.seasonal import sax_symbols

    vals = [float((i * 7) % 13) for i in range(40)]
    base = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "t long, y double"
    )
    shifted = spark.createDataFrame(
        [(i + 1000, v) for i, v in enumerate(vals)], "t long, y double"
    )
    a = [tuple(r) for r in sax_symbols(base, n_segments=8).collect()]
    b = [tuple(r) for r in sax_symbols(shifted, n_segments=8).collect()]
    assert a == b
    # every segment is populated (no empty low segments)
    assert sorted(r[0] for r in b) == list(range(8))


def test_auc_null_event_type_parity(spark):
    """Spark drops NULL labels; the oracle now filters event_type IS
    NOT NULL — verify the Spark side really excludes NULL event_type
    rows (ADVICE r9 #3)."""
    from weaviate_txtai_spark.operators.evalmetrics import roc_auc

    df = spark.createDataFrame(
        [("purchase", 3.0), ("view", 1.0), (None, 9.0), ("view", 2.0)],
        "event_type string, value double",
    )
    row = roc_auc(
        df.select(
            (F.col("event_type") == "purchase").alias("y"), F.col("value")
        ),
        label_col="y",
        score_col="value",
    ).collect()[0]
    # NULL event_type row (score 9.0) excluded: 1 pos vs 2 neg, AUC=1
    assert row.n_pos == 1 and row.n_neg == 2
    assert row.auc == 1.0


def test_simpson_check_schema_has_no_dead_aggregate(spark):
    from weaviate_txtai_spark.operators.abtest import simpson_check

    df = spark.createDataFrame(
        [("s1", 1, 1), ("s1", 0, 0), ("s2", 1, 0), ("s2", 0, 1)],
        "s string, t int, y int",
    )
    out = simpson_check(df, "s", "t", "y")
    assert out.columns == [
        "k_strata", "k_usable", "pooled_diff",
        "n_agree", "n_reverse", "n_zero", "reversed",
    ]
    r = out.collect()[0]
    assert r.k_strata == 2 and r.k_usable == 2
