"""Parallel dense-id assignment (operators/ids) — value parity with the
old global-order window, and the plan property that motivated the swap:
NO single-partition exchange / Window on the ingest path."""

import pytest

from pyspark.sql import functions as F

from weaviate_txtai_spark.operators.ids import with_dense_ids
from weaviate_txtai_spark.plans.explain import physical_plan


def test_ids_dense_and_ordered(spark):
    df = spark.range(0, 1000).repartition(7).select(F.col("id").alias("v"))
    tagged, n = with_dense_ids(df, start=100, id_col="docid")
    rows = tagged.collect()
    assert n == 1000
    ids = sorted(r["docid"] for r in rows)
    assert ids == list(range(100, 1100))  # dense in [start, start+n)
    assert len({r["v"] for r in rows}) == 1000  # no row lost/duplicated


def test_ids_match_global_window_order(spark):
    # The two-pass scheme must assign the SAME total order the old
    # row_number()-over-monotonic-id window produced (partition, position).
    from pyspark.sql import Window

    df = spark.createDataFrame(
        [(f"r{i}",) for i in range(200)], "v string"
    ).repartition(5)
    w = Window.orderBy(F.monotonically_increasing_id())
    old = {
        r["v"]: r["docid"]
        for r in df.withColumn(
            "docid", F.row_number().over(w) - 1 + F.lit(10)
        ).collect()
    }
    new = {
        r["v"]: r["docid"]
        for r in with_dense_ids(df, start=10, id_col="docid")[0].collect()
    }
    assert new == old


def test_ids_empty_frame(spark):
    df = spark.createDataFrame([], "v string")
    tagged, n = with_dense_ids(df, start=5)
    assert n == 0
    assert tagged.count() == 0
    assert "__dense_id" in tagged.columns


def test_ids_single_row(spark):
    df = spark.createDataFrame([("only",)], "v string")
    tagged, n = with_dense_ids(df, start=42, id_col="docid")
    assert n == 1
    assert tagged.collect()[0]["docid"] == 42


def test_ids_plan_no_single_partition_exchange(spark):
    """The scale property: id assignment is a narrow projection + a
    broadcast join — no global-order Window, no Exchange SinglePartition
    funneling the batch through one task (VERDICT r1 item 1)."""
    df = spark.range(0, 10_000).repartition(8).select(F.col("id").alias("v"))
    tagged, _ = with_dense_ids(df, start=0, id_col="docid")
    plan = physical_plan(tagged)
    assert "Window" not in plan
    assert "SinglePartition" not in plan
    assert "rangepartitioning" not in plan
    assert "BroadcastHashJoin" in plan  # offsets join is broadcast


def test_index_append_plan_stays_parallel(spark, tmp_path):
    """End-to-end: VectorIndex.append over a multi-partition DataFrame
    keeps every written partition; the data lands with dense docids."""
    from weaviate_txtai_spark.index import VectorIndex

    idx = VectorIndex(spark, str(tmp_path)).create()
    vecs = spark.range(0, 500).select(
        F.array(
            (F.col("id") % 10).cast("float"),
            F.lit(1.0).cast("float"),
        ).alias("vector")
    ).repartition(6)
    idx.append(vecs)
    assert idx.offset == 500
    got = sorted(r["docid"] for r in idx.to_df().collect())
    assert got == list(range(500))
    # second append continues the offset densely
    idx.append([[1.0, 0.0], [0.0, 1.0]])
    assert idx.offset == 502
    got = sorted(r["docid"] for r in idx.to_df().collect())
    assert got == list(range(502))


# ------------------------------------------------------- deterministic uuids


def test_uuid5_dns_matches_python_uuid5(spark):
    """The codegen uuid5 expression is bit-for-bit Python's
    uuid.uuid5(NAMESPACE_DNS, str(docid)) (ADVICE r2)."""
    import uuid as uuidlib

    from weaviate_txtai_spark.operators.ids import uuid5_dns

    ids = [0, 1, 7, 42, 999999, 2**40 + 3]
    df = spark.createDataFrame([(i,) for i in ids], "docid long")
    got = {
        r["docid"]: r["u"]
        for r in df.select("docid", uuid5_dns("docid").alias("u")).collect()
    }
    for d in ids:
        assert got[d] == str(uuidlib.uuid5(uuidlib.NAMESPACE_DNS, str(d)))


def test_upsert_df_uuid_agrees_with_driver_upsert(spark, tmp_path):
    """The distributed merge and the driver-side upsert must assign the
    SAME uuid to the same docid — and re-running the identical change set
    must leave rows byte-identical (idempotent by value, ADVICE r2)."""
    import uuid as uuidlib

    from weaviate_txtai_spark.index import VectorIndex

    idx = VectorIndex(spark, str(tmp_path / "u5")).create()
    idx.append([[1.0, 0.0], [0.0, 1.0]])
    changes = spark.createDataFrame(
        [(0, [9.0, 9.0]), (5, [3.0, 4.0])], "docid long, vector array<float>"
    )
    idx.upsert_df(changes)
    rows1 = {r["docid"]: (r["uuid"], list(r["vector"])) for r in idx.to_df().collect()}
    for d in (0, 5):
        assert rows1[d][0] == str(uuidlib.uuid5(uuidlib.NAMESPACE_DNS, str(d)))
    # driver-side upsert of docid 0 yields the same uuid
    idx.upsert([(0, [9.0, 9.0])])
    rows2 = {r["docid"]: (r["uuid"], list(r["vector"])) for r in idx.to_df().collect()}
    assert rows2 == rows1
    # replaying the distributed change set is a value-level no-op
    idx.upsert_df(changes)
    rows3 = {r["docid"]: (r["uuid"], list(r["vector"])) for r in idx.to_df().collect()}
    assert rows3 == rows1


def test_stream_batch_uuids_deterministic(spark, tmp_path):
    """Streaming appends derive uuid from docid, so a crash-window replay
    rewrites identical rows."""
    import uuid as uuidlib

    from weaviate_txtai_spark.index import VectorIndex

    idx = VectorIndex(spark, str(tmp_path / "s5")).create()
    batch = spark.createDataFrame(
        [([1.0, 0.0],), ([0.0, 1.0],)], "vector array<float>"
    )
    idx.append_stream_batch(batch, stream_key="cp", batch_id=0)
    for r in idx.to_df().collect():
        assert r["uuid"] == str(
            uuidlib.uuid5(uuidlib.NAMESPACE_DNS, str(r["docid"]))
        )
