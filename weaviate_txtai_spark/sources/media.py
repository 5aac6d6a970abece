"""Binary media source: files → BinaryType payload rows (M3.4 source).

Production form of ``attach_fake_payload``: Spark's built-in
``binaryFile`` source reads whole files as (path, modificationTime,
length, content) — the idiomatic way to get images/audio/video into a
BinaryType column next to vectors (reference stores media as txtai
``object`` payloads, examples/01_simple.ipynb cells 21-29).

Scale notes: binaryFile splits at file granularity (one file = one row,
never split), so parallelism == file count; pair with
``spark.sql.files.maxPartitionBytes`` for many-small-file dirs, or
pack small media into parquet via this loader once and read columnar
afterwards (payload columns compress + prune like any other column).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def load_media_dir(
    spark: SparkSession,
    path: str,
    *,
    glob: str | None = None,
    media_type: str = "application/octet-stream",
) -> DataFrame:
    """Read a directory of media files into the payload schema used by
    the multimodal operators: (doc_id, payload, payload_meta)."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    raw = reader.load(path)
    w_path = F.col("path")
    return raw.select(
        # raw xxhash64 (possibly negative): abs() would both overflow
        # under ANSI on Long.MIN_VALUE and halve the id space. The hash
        # id is a convenience key — source_path stays the authoritative
        # unique key (64-bit birthday collisions silently merge files at
        # billions-of-files scale; join on source_path where that
        # matters).
        F.xxhash64(w_path).alias("doc_id"),
        w_path.alias("source_path"),
        F.col("content").alias("payload"),
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            # long, not int: a >2 GiB media file (video) overflows an
            # int cast, which under ANSI mode kills the whole read job
            F.col("length").cast("long").alias("n_bytes"),
        ).alias("payload_meta"),
    )
