"""Regression tests for the four r12 ADVICE items (round 13).

1. capped_weighted_waterfill raises when the exact-int64 boundary-test
   terms could exceed 2^62 instead of silently wrapping (medium).
2. corpus_datasheet's dominant_lang tie-break is NULLS LAST on both
   engines (low).
3. capped_weighted_waterfill rejects fractional weights/caps instead of
   silently truncating them (low).
4. decontamination_report validates 0 <= review_at <= drop_at (low).
"""

import duckdb
import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from weaviate_txtai_spark.operators.budget import capped_weighted_waterfill
from weaviate_txtai_spark.operators.passages import decontamination_report
from weaviate_txtai_spark.plans import queries as Q

LONG_SCHEMA = StructType(
    [
        StructField("source", StringType()),
        StructField("weight", LongType()),
        StructField("cap", LongType()),
    ]
)
DOUBLE_SCHEMA = StructType(
    [
        StructField("source", StringType()),
        StructField("weight", DoubleType()),
        StructField("cap", DoubleType()),
    ]
)


def test_fractional_weight_rejected(spark):
    df = spark.createDataFrame([("a", 2.9, 10.0), ("b", 1.0, 5.0)],
                               DOUBLE_SCHEMA)
    with pytest.raises(Exception, match="non-negative integers"):
        capped_weighted_waterfill(df, 8).collect()


def test_fractional_cap_rejected(spark):
    df = spark.createDataFrame([("a", 2.0, 10.5)], DOUBLE_SCHEMA)
    with pytest.raises(Exception, match="non-negative integers"):
        capped_weighted_waterfill(df, 8).collect()


def test_integral_doubles_match_longs(spark):
    rows = [("a", 3, 10), ("b", 1, 2), ("c", 2, 100)]
    as_long = spark.createDataFrame(rows, LONG_SCHEMA)
    as_dbl = spark.createDataFrame(
        [(s, float(w), float(c)) for s, w, c in rows], DOUBLE_SCHEMA
    )
    got_l = {
        r["source"]: r["alloc"]
        for r in capped_weighted_waterfill(as_long, 50).collect()
    }
    got_d = {
        r["source"]: r["alloc"]
        for r in capped_weighted_waterfill(as_dbl, 50).collect()
    }
    assert got_l == got_d and set(got_l) == {"a", "b", "c"}


def test_overflow_headroom_raises(spark):
    # max(w)*sum(c) ~= 2^81 — the old code would wrap (non-ANSI) or
    # throw an opaque ARITHMETIC_OVERFLOW (ANSI); now a clear raise
    big = 1 << 40
    df = spark.createDataFrame(
        [("a", big, big), ("b", big, big), ("c", big, big)], LONG_SCHEMA
    )
    with pytest.raises(Exception, match="headroom"):
        capped_weighted_waterfill(df, big).collect()


def test_headroom_boundary_not_overreached(spark):
    # comfortably inside 2^62 on every term: must NOT raise
    df = spark.createDataFrame(
        [("a", 1 << 20, 1 << 25), ("b", 1 << 19, 1 << 24)], LONG_SCHEMA
    )
    out = capped_weighted_waterfill(df, 1 << 26).collect()
    assert len(out) == 2


@pytest.mark.parametrize(
    "kw", [{"review_at": 0.7, "drop_at": 0.5}, {"review_at": -0.1}]
)
def test_decontam_bad_thresholds_raise(spark, kw):
    df = spark.createDataFrame(
        [(1, "alpha bravo charlie delta echo foxtrot golf hotel")],
        StructType([StructField("doc_id", LongType()),
                    StructField("text", StringType())]),
    )
    with pytest.raises(ValueError, match="review_at"):
        decontamination_report(df, df, **kw)


DOCS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
        StructField("source", StringType()),
        StructField("n_chars", LongType()),
    ]
)


def test_datasheet_null_lang_tie_breaks_nulls_last(spark, tmp_path):
    # source s1: two NULL-lang docs tie with two 'aa' docs — both
    # engines must pick 'aa' (NULLS LAST), where pre-fix Spark's plain
    # asc picked NULL first and diverged from DuckDB
    rows = [
        (1, "one two three four five six seven eight nine", None, "s1", 300),
        (2, "ten eleven twelve thirteen fourteen fifteen", None, "s1", 300),
        (3, "alpha bravo charlie delta echo foxtrot golf", "aa", "s1", 300),
        (4, "hotel india juliet kilo lima mike november", "aa", "s1", 300),
        (5, "solo doc in the second source for contrast", "bb", "s2", 100),
    ]
    spark.createDataFrame(rows, DOCS_SCHEMA).coalesce(1).write.parquet(
        str(tmp_path / "documents.parquet")
    )
    got = {
        r["source"]: (r["dominant_lang"], r["lang_share"])
        for r in Q.queries()["corpus_datasheet"](
            spark, str(tmp_path)
        ).collect()
    }
    assert got["s1"] == ("aa", 0.5)
    assert got["s2"] == ("bb", 1.0)
    con = duckdb.connect()
    try:
        con.sql(
            "CREATE VIEW documents AS SELECT * FROM "
            f"'{tmp_path}/documents.parquet/*.parquet'"
        )
        oracle = {
            s: (d, ls)
            for s, d, ls in con.sql(
                "SELECT source, dominant_lang, lang_share FROM ("
                + Q.oracle_sql()["corpus_datasheet"]
                + ")"
            ).fetchall()
        }
    finally:
        con.close()
    assert oracle == got


def test_kendall_decimal_mode_matches_long_mode(spark):
    from decimal import Decimal

    from weaviate_txtai_spark.operators.rankstats import kendall_tau_b

    df = spark.createDataFrame(
        [(i % 5, (i * 3) % 7) for i in range(200)], "x long, y long"
    )
    a = kendall_tau_b(df, "x", "y").collect()[0]
    b = kendall_tau_b(df, "x", "y", count_type="decimal").collect()[0]
    assert a["tau_b"] == b["tau_b"]
    assert Decimal(a["n_concordant"]) == b["n_concordant"]
    assert Decimal(a["tie_x"]) == b["tie_x"]
    with __import__("pytest").raises(ValueError, match="count_type"):
        kendall_tau_b(df, "x", "y", count_type="float")


def test_knuth_term_safe_and_identical_for_huge_ids(spark):
    # the naive id*K product overflows int64 at id >= ~3.47e9 (ANSI
    # raises); the split multiply must agree with Python bigint truth
    # at ANY long id
    from weaviate_txtai_spark.functions.sampling import knuth_term

    ids = [0, 1, 2**31 - 1, 2**31, 3_470_000_000, 2**62, 2**63 - 1]
    df = spark.createDataFrame([(i,) for i in ids], "id long")
    got = {
        r["id"]: r["t"]
        for r in df.select("id", knuth_term("id").alias("t")).collect()
    }
    for i in ids:
        assert got[i] == (i % 2**32) * 2654435761 % 2**32, i
