"""remove_repeated_spans (operators/passages.py, r13) — Lee et al.
2021 exact-substring-dedup semantics at token granularity."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from weaviate_txtai_spark.operators.passages import remove_repeated_spans

SCHEMA = StructType(
    [StructField("doc_id", LongType()), StructField("text", StringType())]
)

BOILER = "all rights reserved contact us terms of service apply here"


def _docs(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def test_cross_doc_boilerplate_removed_from_all_copies(spark):
    # the banner occurs in two docs -> removed from BOTH (the paper's
    # all-occurrences rule); unique bodies survive untouched
    rows = [
        (1, BOILER + " alpha beta gamma delta epsilon zeta eta theta"),
        (2, BOILER + " one two three four five six seven eight"),
        (3, "completely unique text with nothing repeated at all ok"),
    ]
    out = {
        r["doc_id"]: r
        for r in remove_repeated_spans(_docs(spark, rows)).collect()
    }
    assert out[1]["cleaned_text"] == (
        "alpha beta gamma delta epsilon zeta eta theta"
    )
    assert out[2]["cleaned_text"] == (
        "one two three four five six seven eight"
    )
    assert out[1]["n_removed"] == out[2]["n_removed"] == 10
    assert out[3]["n_removed"] == 0
    assert out[3]["cleaned_text"] == rows[2][1]


def test_intra_doc_repeat_removed(spark):
    # one doc repeats its own 8-token run: window count >= 2 within a
    # single doc counts (matching the paper), both copies go
    run = "q w e r t y u i"
    rows = [(1, f"{run} middle filler words {run}")]
    out = remove_repeated_spans(_docs(spark, rows)).collect()[0]
    assert out["cleaned_text"] == "middle filler words"
    assert out["n_removed"] == 16


def test_short_docs_pass_whole(spark):
    rows = [(1, "short doc"), (2, "short doc")]  # < 8 tokens: no windows
    out = {r["doc_id"]: r for r in
           remove_repeated_spans(_docs(spark, rows)).collect()}
    assert out[1]["cleaned_text"] == "short doc"
    assert out[1]["n_removed"] == 0


def test_null_text_and_null_id(spark):
    rows = [(1, None), (None, BOILER), (2, BOILER + " x y z a b c d e")]
    out = remove_repeated_spans(_docs(spark, rows)).collect()
    by_id = {r["doc_id"]: r for r in out}
    assert set(by_id) == {1, 2}  # NULL id excluded (census discipline)
    assert by_id[1]["cleaned_text"] is None
    assert by_id[1]["n_tokens"] == 0 and by_id[1]["n_removed"] == 0
    # the NULL-id doc's copy of the banner is NOT in the corpus, so
    # doc 2's banner occurs once -> kept
    assert by_id[2]["n_removed"] == 0


def test_fully_removed_doc_yields_empty_string(spark):
    rows = [(1, BOILER), (2, BOILER)]
    out = {r["doc_id"]: r for r in
           remove_repeated_spans(_docs(spark, rows)).collect()}
    assert out[1]["cleaned_text"] == ""
    assert out[1]["n_removed"] == out[1]["n_tokens"] == 10


def test_hash_modes_agree(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(200)
    a = remove_repeated_spans(docs, hash_mode="md5").orderBy("doc_id")
    b = remove_repeated_spans(docs, hash_mode="xxhash64").orderBy("doc_id")
    assert a.collect() == b.collect()


def test_validation(spark):
    with pytest.raises(ValueError, match="min_count"):
        remove_repeated_spans(_docs(spark, [(1, "x")]), min_count=1)
