"""Hostile-input hardening for operators/{phrase,stringjoin,resample}.py
(VERDICT r10 task 3). Finding fixed this round: edit_distance_join
lumped every NULL-id string into ONE rare-gram probe group before
silently dropping them — NULL ids (and NULL strings, already) are now
excluded up front by documented contract. The phrase and resample
probes recorded a CLEAN pass (behaviors asserted were already correct).
"""

import pytest

from pyspark.sql import functions as F


# ------------------------------------------------------------ stringjoin


def _sj(spark, rows, **kw):
    from weaviate_txtai_spark.operators.stringjoin import edit_distance_join

    df = spark.createDataFrame(rows, "id long, s string")
    return edit_distance_join(df, "id", "s", **kw)


def test_edit_join_null_ids_excluded(spark):
    out = _sj(
        spark,
        [(None, "abcdef"), (None, "abcdeg"), (1, "abcdef"), (2, "abcdeg")],
        k=1,
    ).collect()
    assert len(out) == 1
    assert (out[0].id1, out[0].id2) == (1, 2)


def test_edit_join_empty_and_unicode(spark):
    out = _sj(
        spark,
        [(1, ""), (2, "a"), (3, "héllo"), (4, "hållo"), (5, "zzzzzzzz")],
        k=1,
    ).collect()
    pairs = {(r.id1, r.id2) for r in out}
    # "" vs "a": distance 1 (short pool); héllo vs hållo: one substitution
    assert (1, 2) in pairs and (3, 4) in pairs
    assert all(5 not in p for p in pairs)


def test_edit_join_string_ids_dtype_generic(spark):
    from weaviate_txtai_spark.operators.stringjoin import edit_distance_join

    df = spark.createDataFrame(
        [("a", "quantify"), ("b", "quantity"), ("c", "qualify")],
        "id string, s string",
    )
    out = edit_distance_join(df, "id", "s", k=1).collect()
    assert {(r.id1, r.id2) for r in out} == {("a", "b")}


def test_edit_join_duplicate_strings_distance_zero(spark):
    out = _sj(spark, [(1, "same-string"), (2, "same-string")], k=1).collect()
    assert len(out) == 1 and out[0].dist == 0


# ---------------------------------------------------------------- phrase
# clean pass — probes assert already-correct behavior


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_phrase_multiple_spaces_consistent(spark):
    from weaviate_txtai_spark.operators.phrase import phrase_match

    docs = _docs(spark, [(1, "the  quick   brown fox")])
    # both the corpus tokenizer and the phrase splitter drop empties, so
    # runs of spaces cannot desynchronize positions
    out = phrase_match(docs, "quick  brown").collect()
    assert [(r.doc_id, r.start) for r in out] == [(1, 1)]


def test_phrase_repeated_term(spark):
    from weaviate_txtai_spark.operators.phrase import phrase_match

    docs = _docs(spark, [(1, "the cat the cat the dog")])
    out = sorted(
        (r.doc_id, r.start) for r in phrase_match(docs, "the cat the").collect()
    )
    assert out == [(1, 0), (1, 2)]


def test_phrase_null_text_dropped(spark):
    from weaviate_txtai_spark.operators.phrase import phrase_match

    docs = _docs(spark, [(1, None), (2, "hello world")])
    out = phrase_match(docs, "hello world").collect()
    assert [(r.doc_id, r.start) for r in out] == [(2, 0)]


def test_multi_phrase_empty_phrase_rejected(spark):
    from weaviate_txtai_spark.operators.phrase import multi_phrase_match

    docs = _docs(spark, [(1, "x")])
    with pytest.raises(ValueError, match="empty phrase"):
        multi_phrase_match(docs, {"p1": "   "})


# -------------------------------------------------------------- resample
# clean pass — probes assert already-correct behavior


def test_resample_null_ts_rows_ignored(spark):
    from weaviate_txtai_spark.operators.resample import resample_ffill

    df = spark.createDataFrame(
        [
            ("u", "2024-01-01 00:10:00", 1.0),
            ("u", None, 99.0),
            ("u", "2024-01-01 02:20:00", 3.0),
        ],
        "k string, ts string, value double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = resample_ffill(df, keys=["k"]).orderBy("bucket_ts").collect()
    # NULL-ts events form no bucket and never skew the grid
    assert len(out) == 3  # hours 0,1,2
    assert [r.n_events for r in out] == [1, 0, 1]
    assert out[1].is_gap and out[1].filled_value == 1.0


def test_resample_bad_unit_rejected(spark):
    from weaviate_txtai_spark.operators.resample import resample_ffill

    df = spark.createDataFrame(
        [("u", "2024-01-01 00:00:00", 1.0)], "k string, ts string, value double"
    )
    with pytest.raises(ValueError, match="unit"):
        resample_ffill(df, keys=["k"], unit="fortnight")


def test_time_weighted_avg_single_sample_null(spark):
    from weaviate_txtai_spark.operators.resample import time_weighted_avg

    df = spark.createDataFrame(
        [("g", "2024-01-01 00:00:00", 5.0)],
        "g string, ts string, value double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    row = time_weighted_avg(
        df, group_col="g", ts_col="ts", value_col="value"
    ).collect()[0]
    assert row.n_samples == 1 and row.twa is None
