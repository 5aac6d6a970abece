"""JSONL/CSV sources: schema-enforced round trips + corrupt-row policy."""

import pytest

from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from weaviate_txtai_spark.sources.tables import load_table
from weaviate_txtai_spark.sources.text_formats import read_csv, read_jsonl

DOC_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
        StructField("source", StringType()),
        StructField("n_chars", LongType()),
    ]
)


def _docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source", F.col("n_chars").cast("long")
    )


def test_jsonl_roundtrip_matches_parquet(spark, sf_dir, tmp_path):
    docs = _docs(spark, sf_dir)
    path = str(tmp_path / "docs.jsonl")
    docs.write.json(path)
    back_rows = read_jsonl(spark, path, DOC_SCHEMA).collect()
    assert all(r["_corrupt_record"] is None for r in back_rows)
    a = {tuple(r) for r in docs.collect()}
    b = {tuple(r)[:-1] for r in back_rows}
    assert a == b


def test_csv_roundtrip_matches_parquet(spark, sf_dir, tmp_path):
    docs = _docs(spark, sf_dir)
    path = str(tmp_path / "docs.csv")
    # quote/escape defaults round-trip embedded separators via Spark's own writer
    docs.write.option("header", "true").csv(path)
    back_rows = read_csv(spark, path, DOC_SCHEMA).collect()
    assert all(r["_corrupt_record"] is None for r in back_rows)
    a = {tuple(r) for r in docs.collect()}
    b = {tuple(r)[:-1] for r in back_rows}
    assert a == b


def test_jsonl_corrupt_rows_are_flagged_not_dropped(spark, tmp_path):
    p = tmp_path / "bad.jsonl"
    p.write_text(
        '{"doc_id": 1, "text": "ok", "lang": "en", "source": "s", "n_chars": 2}\n'
        "this is not json\n"
        '{"doc_id": "NOT A NUMBER", "text": "x", "lang": "en", "source": "s", "n_chars": 1}\n'
    )
    df = read_jsonl(spark, str(p), DOC_SCHEMA)
    rows = df.collect()
    assert len(rows) == 3
    corrupt = [r for r in rows if r["_corrupt_record"] is not None]
    assert len(corrupt) == 2  # the non-JSON line and the type mismatch
    clean = [r for r in rows if r["_corrupt_record"] is None]
    assert clean[0]["doc_id"] == 1


def test_failfast_mode_raises(spark, tmp_path):
    p = tmp_path / "bad2.jsonl"
    p.write_text('{"doc_id": 1}\nnot json\n')
    with pytest.raises(Exception):
        read_jsonl(spark, str(p), DOC_SCHEMA, mode="FAILFAST").collect()


def test_orc_roundtrip_with_pushdown(spark, sf_dir, tmp_path):
    from weaviate_txtai_spark.plans.explain import physical_plan
    from weaviate_txtai_spark.sources.text_formats import read_orc

    docs = _docs(spark, sf_dir)
    path = str(tmp_path / "docs.orc")
    docs.write.orc(path)
    back = read_orc(spark, path)
    assert {tuple(r) for r in back.collect()} == {tuple(r) for r in docs.collect()}
    scan = read_orc(spark, path).filter(F.col("n_chars") > 100).select("doc_id")
    assert "PushedFilters" in physical_plan(scan)
