"""Streaming ingest → VectorIndex: dense docids across micro-batches,
search over streamed data, batch/stream parity via availableNow."""


import pytest
from pyspark.sql.types import StringType, StructField, StructType

from weaviate_txtai_spark.functions.encoders import HashingEncoder
from weaviate_txtai_spark.index import VectorIndex
from weaviate_txtai_spark.streaming.ingest import stream_ingest

SCHEMA = StructType(
    [StructField("id", StringType()), StructField("text", StringType())]
)


@pytest.fixture()
def source_dir(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    texts = [(str(i), f"document number {i} about topic {i % 3}") for i in range(20)]
    # two files → at least one micro-batch each under availableNow
    spark.createDataFrame(texts[:10], SCHEMA).coalesce(1).write.parquet(
        str(src / "a")
    )
    spark.createDataFrame(texts[10:], SCHEMA).coalesce(1).write.parquet(
        str(src / "b")
    )
    return str(src)


def test_stream_ingest_dense_docids_and_search(spark, tmp_path, source_dir):
    idx = VectorIndex(spark, str(tmp_path / "idx")).create()
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)  # force multiple micro-batches
        .parquet(source_dir + "/*")
    )
    q = stream_ingest(
        stream, idx, checkpoint=str(tmp_path / "cp")
    )
    q.awaitTermination(120)
    assert idx.count() == 20
    assert idx.offset == 20
    # dense, collision-free docids across micro-batches
    docids = sorted(r["docid"] for r in idx.to_df().select("docid").collect())
    assert docids == list(range(20))
    # the streamed vectors are searchable
    enc = HashingEncoder()
    res = idx.search([enc.encode("document number 7 about topic 1")], limit=3)
    assert len(res[0]) == 3


def test_checkpoint_prevents_replay(spark, tmp_path, source_dir):
    idx = VectorIndex(spark, str(tmp_path / "idx2")).create()
    cp = str(tmp_path / "cp2")
    stream = spark.readStream.schema(SCHEMA).parquet(source_dir + "/*")
    stream_ingest(stream, idx, checkpoint=cp).awaitTermination(120)
    assert idx.count() == 20
    # second drain over the same checkpoint: nothing new to process
    stream2 = spark.readStream.schema(SCHEMA).parquet(source_dir + "/*")
    stream_ingest(stream2, idx, checkpoint=cp).awaitTermination(120)
    assert idx.count() == 20
    assert idx.offset == 20


def test_stream_upsert_last_writer_wins(spark, tmp_path):
    import os

    from weaviate_txtai_spark.streaming.ingest import stream_upsert

    idx = VectorIndex(spark, str(tmp_path / "idx3")).create()
    idx.append([[1.0, 0.0], [0.0, 1.0], [0.5, 0.5]])  # docids 0,1,2

    # CDC feed: two files -> two micro-batches; docid 1 updated twice
    # (later ts must win), docid 3 is a fresh insert
    cdc_dir = str(tmp_path / "cdc")
    os.makedirs(cdc_dir)
    spark.createDataFrame(
        [(1, [9.0, 9.0], 10), (3, [7.0, 7.0], 10)],
        "docid long, vector array<float>, ts long",
    ).coalesce(1).write.parquet(cdc_dir + "/b1")
    spark.createDataFrame(
        [(1, [5.0, 5.0], 20)],
        "docid long, vector array<float>, ts long",
    ).coalesce(1).write.parquet(cdc_dir + "/b2")

    stream = (
        spark.readStream.schema("docid long, vector array<float>, ts long")
        .option("maxFilesPerTrigger", 1)
        .parquet(cdc_dir + "/*")
    )
    stream_upsert(
        stream, idx, checkpoint=str(tmp_path / "cp3")
    ).awaitTermination(120)

    rows = {
        r["docid"]: [round(float(x), 1) for x in r["vector"]]
        for r in idx.to_df().collect()
    }
    assert rows[3] == [7.0, 7.0]          # insert landed
    assert rows[1] == [5.0, 5.0]          # ts=20 beat ts=10
    assert rows[0] == [1.0, 0.0]          # untouched rows survive
    assert idx.count() == 4
    st = idx.stats()
    assert st["rows"] == 4 and st["files"] >= 1 and st["bytes"] > 0
    assert st["offset"] == 4              # max docid + 1 after upsert


def test_stream_upsert_bucketed_touches_only_its_buckets(spark, tmp_path):
    """VERDICT r1 item 2 done-criterion: a streaming upsert micro-batch
    that touches one bucket leaves every other bucket's files
    byte-identical (bounded rewrite), via the real foreachBatch path."""
    import hashlib
    import os

    from weaviate_txtai_spark.streaming.ingest import stream_upsert

    cfg = {"weaviate": {"buckets": 4}}
    idx = VectorIndex(spark, str(tmp_path / "bidx"), config=cfg).create()
    idx.append([[float(i), 1.0] for i in range(40)])  # docids 0..39

    def fingerprints():
        out = {}
        for entry in sorted(os.listdir(idx._data_path())):
            if not entry.startswith("bucket="):
                continue
            d = os.path.join(idx._data_path(), entry)
            out[entry] = {
                f: hashlib.sha256(
                    open(os.path.join(d, f), "rb").read()
                ).hexdigest()
                for f in sorted(os.listdir(d))
                if f.endswith(".parquet")
            }
        return out

    before = fingerprints()
    cdc_dir = str(tmp_path / "cdc")
    os.makedirs(cdc_dir)
    # docids 5 and 13 both hash to bucket 1
    spark.createDataFrame(
        [(5, [9.0, 9.0]), (13, [8.0, 8.0])],
        "docid long, vector array<float>",
    ).coalesce(1).write.parquet(cdc_dir + "/b1")
    stream = spark.readStream.schema(
        "docid long, vector array<float>"
    ).parquet(cdc_dir + "/*")
    stream_upsert(
        stream, idx, checkpoint=str(tmp_path / "cp")
    ).awaitTermination(120)

    after = fingerprints()
    assert after["bucket=1"] != before["bucket=1"]
    for b in ("bucket=0", "bucket=2", "bucket=3"):
        assert after[b] == before[b]  # untouched buckets byte-identical
    rows = {r["docid"]: list(r["vector"]) for r in idx.to_df().collect()}
    assert rows[5] == [9.0, 9.0] and rows[13] == [8.0, 8.0]
    assert len(rows) == 40


def test_stream_upsert_skips_replayed_batch(spark, tmp_path):
    """Idempotent sink: a batch id at-or-below the persisted watermark is
    skipped (the at-least-once foreachBatch replay window)."""
    idx = VectorIndex(spark, str(tmp_path / "ridx")).create()
    idx.append([[1.0, 0.0]])
    # simulate an applied batch 0 for this checkpoint key
    cp = str(tmp_path / "cp")
    idx.stream_state[cp] = 0
    idx._save_meta()

    from weaviate_txtai_spark.streaming.ingest import stream_upsert

    cdc_dir = str(tmp_path / "cdc")
    import os

    os.makedirs(cdc_dir)
    spark.createDataFrame(
        [(0, [5.0, 5.0])], "docid long, vector array<float>"
    ).coalesce(1).write.parquet(cdc_dir + "/b1")
    stream = spark.readStream.schema(
        "docid long, vector array<float>"
    ).parquet(cdc_dir + "/*")
    # fresh checkpoint → Spark assigns batch_id 0 → sink must skip it
    stream_upsert(stream, idx, checkpoint=cp).awaitTermination(120)
    rows = {r["docid"]: list(r["vector"]) for r in idx.to_df().collect()}
    assert rows[0] == [1.0, 0.0]  # replayed batch did NOT re-apply
