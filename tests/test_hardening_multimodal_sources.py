"""Hostile-input hardening for multimodal/ and sources/ (VERDICT r10
task 3). Findings fixed this round:

- media.load_media_dir and PAYLOAD_META_SCHEMA carried n_bytes as INT —
  a >2 GiB media file overflows the cast, which under ANSI mode kills
  the whole read job. Now long.
- the three mapInPandas media ops hardcoded `{id_col} long` in their
  output schemas — string document ids (uuid crawls) crashed or
  corrupted; now the id column's own dtype (the coreset/MMR
  dtype-generic stance).
- sample_frames(n_frames=0) silently emitted zero frames for every
  payload; now raises.

sources/text_formats.py probes below recorded a CLEAN pass (PERMISSIVE
corrupt-row capture and FAILFAST loud failure both behave).
"""

import pytest

from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)


def test_payload_meta_n_bytes_is_long():
    from weaviate_txtai_spark.multimodal.binary import PAYLOAD_META_SCHEMA

    f = {x.name: x.dataType for x in PAYLOAD_META_SCHEMA.fields}
    assert isinstance(f["n_bytes"], LongType)


def test_attach_fake_payload_meta_long(spark):
    from weaviate_txtai_spark.multimodal.binary import attach_fake_payload

    df = spark.createDataFrame([(1, "hello")], "doc_id long, text string")
    out = attach_fake_payload(df)
    meta = out.schema["payload_meta"].dataType
    assert isinstance(meta["n_bytes"].dataType, LongType)


def test_load_media_dir_n_bytes_long(spark, tmp_path):
    from weaviate_txtai_spark.sources.media import load_media_dir

    p = tmp_path / "a.bin"
    p.write_bytes(b"\x00\x01\x02")
    out = load_media_dir(spark, str(tmp_path))
    meta = out.schema["payload_meta"].dataType
    assert isinstance(meta["n_bytes"].dataType, LongType)
    rows = out.collect()
    assert len(rows) == 1 and rows[0].payload_meta.n_bytes == 3


def test_string_doc_ids_flow_through_media_ops(spark):
    from weaviate_txtai_spark.multimodal.binary import (
        attach_fake_payload,
        extract_features,
        resize_images,
        sample_frames,
    )

    docs = spark.createDataFrame(
        [("doc-aa", "alpha"), ("doc-bb", "beta")], "doc_id string, text string"
    )
    payloads = attach_fake_payload(docs)
    rs = resize_images(payloads).collect()
    assert {r.doc_id for r in rs} == {"doc-aa", "doc-bb"}
    assert all(len(r.resized) == 16 for r in rs)  # 4x4 uint8
    fr = sample_frames(payloads, n_frames=2).collect()
    assert {r.doc_id for r in fr} == {"doc-aa", "doc-bb"}
    ft = extract_features(payloads).collect()
    assert {r.doc_id for r in ft} == {"doc-aa", "doc-bb"}
    assert all(len(r.features) == 8 for r in ft)


def test_sample_frames_rejects_nonpositive(spark):
    from weaviate_txtai_spark.multimodal.binary import (
        attach_fake_payload,
        sample_frames,
    )

    docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError, match="n_frames"):
        sample_frames(attach_fake_payload(docs), n_frames=0)


# ---------------------------------------------------------------- sources
# recorded clean pass: the readers already capture / fail loudly


def test_read_jsonl_permissive_captures_corrupt_row(spark, tmp_path):
    from weaviate_txtai_spark.sources.text_formats import read_jsonl

    p = tmp_path / "d.jsonl"
    p.write_text('{"a": 1}\n{not json\n{"a": 3}\n')
    schema = StructType([StructField("a", LongType())])
    out = read_jsonl(spark, str(p), schema).collect()
    bad = [r for r in out if r._corrupt_record is not None]
    good = sorted(r.a for r in out if r._corrupt_record is None)
    assert len(bad) == 1 and good == [1, 3]


def test_read_csv_failfast_is_loud(spark, tmp_path):
    from weaviate_txtai_spark.sources.text_formats import read_csv

    p = tmp_path / "d.csv"
    p.write_text("a\n1\nnot_a_number\n")
    schema = StructType([StructField("a", LongType())])
    with pytest.raises(Exception, match="FAILFAST|Malformed|malformed"):
        read_csv(spark, str(p), schema, mode="FAILFAST").collect()


def test_read_csv_permissive_nulls_bad_cell(spark, tmp_path):
    from weaviate_txtai_spark.sources.text_formats import read_csv

    p = tmp_path / "d.csv"
    p.write_text("a\n1\nnot_a_number\n")
    schema = StructType([StructField("a", LongType())])
    out = read_csv(spark, str(p), schema).collect()
    assert sorted([r.a for r in out], key=lambda x: (x is None, x)) == [1, None]
