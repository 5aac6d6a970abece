"""Index operations walkthrough: the storage modes and maintenance ops a
production deployment runs day-to-day.

    python examples/index_ops.py

Covers: bucketed layout (mutations rewrite only touched buckets), int8
quantized storage (~4x smaller), exactly-once streaming append, CDC
upsert, compaction, and the stats surface that drives maintenance.
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession


def main() -> None:
    spark = (
        SparkSession.builder.master("local[*]")
        .appName("index-ops-example")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import numpy as np

    from weaviate_txtai_spark.index import VectorIndex

    rng = np.random.default_rng(0)
    vecs = rng.standard_normal((2000, 32))
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    vecs = [list(map(float, v)) for v in vecs]

    root = tempfile.mkdtemp(prefix="index_ops_")

    # ---- bucketed + quantized index: the 100 TB configuration ----------
    cfg = {"weaviate": {"buckets": 16, "quantize": True}}
    idx = VectorIndex(spark, root, config=cfg).create()
    idx.append(vecs)
    print("stats after ingest:", idx.stats())

    # mutations rewrite ONLY the buckets their docids hash into
    idx.upsert([(5, vecs[6]), (21, vecs[7])])  # both hash to bucket 5
    idx.delete([32])  # bucket 0
    print("stats after CDC-ish mutations:", idx.stats())

    # search is unchanged: the int8 storage decodes lazily
    hits = idx.search([vecs[42]], limit=5)
    print("top-5 for vec 42:", [(d, round(s, 4)) for d, s in hits[0]])

    # ---- exactly-once streaming append ---------------------------------
    batch = spark.createDataFrame(
        [(v,) for v in vecs[:8]], "vector array<float>"
    )
    idx.append_stream_batch(batch, stream_key="demo-stream", batch_id=0)
    idx.append_stream_batch(batch, stream_key="demo-stream", batch_id=0)  # replay: no-op
    print("after stream batch (replay skipped):", idx.stats())

    # ---- compaction folds fragments back into the bucketed layout ------
    n_files = idx.compact(target_rows_per_file=1000)
    print("files after compact:", n_files, idx.stats())

    spark.stop()


if __name__ == "__main__":
    main()
