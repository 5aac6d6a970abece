"""r13 window-orderBy tie-determinism census regressions
(tools/windoworder_audit.py).

The defect class: rank-sensitive window functions over a non-total
order pick among ties by PHYSICAL row order, which Spark does not
define after a shuffle — same query, different partitioning, different
answer, and the sf0.01 oracle can stay green by luck. Two real
instances fixed: asof_join's match among duplicate (key, ts) right
rows, and stream_upsert's last-writer pick among equal-ts updates.
"""

import pytest
from pyspark.sql import functions as F

from weaviate_txtai_spark.index import VectorIndex
from weaviate_txtai_spark.operators.asof import asof_join


def _left(spark):
    return spark.createDataFrame(
        [("k", 100), ("k", 250)], "key string, ts long"
    ).withColumn("ts", F.timestamp_micros(F.col("ts") * 1_000_000))


def _right(spark, rows, n_parts):
    df = spark.createDataFrame(
        rows, "key string, ts long, payload string"
    ).withColumn("ts", F.timestamp_micros(F.col("ts") * 1_000_000))
    return df.repartition(n_parts)


TIED = [
    ("k", 100, "bbb"),
    ("k", 100, "aaa"),
    ("k", 100, "ccc"),
    ("k", 200, "mmm"),
]


@pytest.mark.parametrize("n_parts", [1, 3, 7])
def test_asof_backward_tie_is_content_deterministic(spark, n_parts):
    # three right rows share (k, ts=100): backward must match the
    # GREATEST payload struct on every partitioning — pre-fix the pick
    # followed physical row order
    out = {
        int(r["ts"].timestamp()): r["payload"]
        for r in asof_join(
            _left(spark),
            _right(spark, TIED, n_parts),
            on=["key"],
        ).collect()
    }
    assert out == {100: "ccc", 250: "mmm"}


@pytest.mark.parametrize("n_parts", [1, 3, 7])
def test_asof_forward_tie_is_content_deterministic(spark, n_parts):
    out = {
        int(r["ts"].timestamp()): r["payload"]
        for r in asof_join(
            _left(spark),
            _right(spark, TIED, n_parts),
            on=["key"],
            direction="forward",
        ).collect()
    }
    # forward from ts=100: least payload among the equal-ts ties;
    # forward from ts=250: nothing follows -> NULL
    assert out == {100: "aaa", 250: None}


def test_asof_map_payload_skips_tiebreak(spark):
    # a map payload is not orderable: the tiebreak is skipped (documented
    # fallback) and the join still runs
    left = _left(spark)
    right = spark.createDataFrame(
        [("k", 100, {"a": 1})], "key string, ts long, payload map<string,int>"
    ).withColumn("ts", F.timestamp_micros(F.col("ts") * 1_000_000))
    rows = asof_join(left, right, on=["key"]).collect()
    assert len(rows) == 2


def test_stream_upsert_equal_ts_tie_is_content_deterministic(
    spark, tmp_path
):
    import os

    from weaviate_txtai_spark.streaming.ingest import stream_upsert

    idx = VectorIndex(spark, str(tmp_path / "idx")).create()
    idx.append([[1.0, 0.0]])  # docid 0

    # one micro-batch, docid 0 updated TWICE at the same ts with
    # different vectors, written across partitions so physical order is
    # not the data order
    cdc_dir = str(tmp_path / "cdc")
    os.makedirs(cdc_dir)
    spark.createDataFrame(
        [(0, [3.0, 3.0], 10), (0, [8.0, 8.0], 10)],
        "docid long, vector array<float>, ts long",
    ).repartition(4).write.parquet(cdc_dir + "/b1")
    stream = (
        spark.readStream.schema("docid long, vector array<float>, ts long")
        .parquet(cdc_dir + "/*")
    )
    stream_upsert(
        stream, idx, checkpoint=str(tmp_path / "cp")
    ).awaitTermination(120)
    rows = {
        r["docid"]: [round(float(x), 1) for x in r["vector"]]
        for r in idx.to_df().collect()
    }
    # greatest vector wins the tie — on every run
    assert rows[0] == [8.0, 8.0]
