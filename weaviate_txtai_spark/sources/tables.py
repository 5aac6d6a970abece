"""Parquet table sources for the driver testdata star schema.

Plain ``spark.read.parquet`` scans — Catalyst handles column pruning and
predicate pushdown into the Parquet reader automatically (SURVEY §4), which
is the Spark-native replacement for the reference's server-side projection
(``properties=["docid"]``, weaviate.py:184) and where-filters
(weaviate.py:154-161).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def spread(df: DataFrame) -> DataFrame:
    """Round-robin repartition iff the input has fewer partitions than the
    cluster has cores.

    The driver testdata is one single-row-group parquet file per table, so a
    plain scan yields ONE input partition and every downstream narrow
    transformation (tokenize/shingle/explode, mapInPandas GEMM) serializes
    onto one core. Per-row-heavy operators call this before their hot map
    stage. At real scale inputs arrive in many splits and this is a no-op —
    it never *reduces* parallelism and never adds a shuffle when the scan
    is already wide.

    Width is estimated from ``inputFiles()`` sizes (a listing, no job)
    rather than ``df.rdd.getNumPartitions()``: under AQE (on by
    default), ``.rdd`` finalizes the adaptive plan by EXECUTING upstream
    shuffle stages, so probing a join/aggregate output's width would run
    the expensive part of the job twice. Split count ≈ Σ ceil(bytes /
    maxPartitionBytes) — a few LARGE parquet files are already wide via
    128 MB splits and must not trigger a shuffle (raw file COUNT would).
    Frames with no file lineage (post-shuffle), or non-local files whose
    sizes we can't stat cheaply, pass through untouched."""
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism
    try:
        files = df.inputFiles()
    except Exception:
        files = []
    if not files:
        return df
    raw = spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728")
    units = {"k": 1 << 10, "m": 1 << 20, "g": 1 << 30}
    s = raw.strip().lower().removesuffix("b")
    max_bytes = (
        int(s[:-1]) * units[s[-1]] if s and s[-1] in units else int(s or 0)
    ) or 134217728
    splits = 0
    for f in files:
        local = f[7:] if f.startswith("file:") and f[5:7] == "//" else (
            f[5:] if f.startswith("file:") else f
        )
        if not os.path.exists(local):
            return df  # non-local FS: can't stat cheaply, leave as-is
        splits += max(1, -(-os.path.getsize(local) // max_bytes))
    if splits < target:
        return df.repartition(target)
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        return _load_events(spark, sf_dir)
    return _normalize_ntz(
        spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    )


def _normalize_ntz(df: DataFrame) -> DataFrame:
    """Cast TIMESTAMP_NTZ columns to TIMESTAMP (session-TZ, pinned UTC).

    The driver testdata has shipped both tz-aware and naive parquet
    timestamps across rounds; naive loads as TIMESTAMP_NTZ in Spark 4,
    which ``unix_micros``/range frames reject. With the session TZ at
    UTC the cast is value-identical and matches DuckDB's naive reading,
    so oracle hashes are unaffected — this just pins ONE type at the
    single load choke point instead of per-query special-casing."""
    ntz = [c for c, t in df.dtypes if t == "timestamp_ntz"]
    for c in ntz:
        df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


def normalize_ts(df: DataFrame, col: str = "ts") -> DataFrame:
    """Normalize a timestamp column to session-TZ TIMESTAMP across every
    physical dialect the driver testdata has shipped: TIMESTAMP(NANOS)
    read as long (nanosAsLong), naive micros (TIMESTAMP_NTZ), and
    tz-aware micros. The SHARED helper for the batch and stream loaders —
    the format has already changed once between rounds, so there must be
    exactly one place to fix next time."""
    t = dict(df.dtypes).get(col)
    if t == "bigint":  # TIMESTAMP(NANOS) read as long
        df = df.withColumn(
            col, F.timestamp_micros(F.expr(f"{col} div 1000").cast("long"))
        )
    elif t == "timestamp_ntz":
        df = df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def _load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.parquet has shipped TIMESTAMP(NANOS) (which Spark's reader
    refuses — PARQUET_TYPE_ILLEGAL) and naive micros across driver rounds.
    Read nanos as long and truncate to micros — the same conversion DuckDB
    applies — and normalize naive to session-TZ. Session TZ is pinned to
    UTC here so timestamp-returning queries hash identically to the
    oracle regardless of the host/driver session timezone."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    return _normalize_ntz(normalize_ts(df))


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view for spark.sql use."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def write_partitioned(
    df: DataFrame,
    path: str,
    *,
    partition_cols: list[str],
    sort_cols: list[str] | None = None,
    max_records_per_file: int = 0,
) -> None:
    """Hive-style partitioned layout: ``partition_cols`` become directory
    keys (``lang=en/``...), so equality/IN predicates on them are
    *partition pruning* — unmatched directories are never listed, the
    same mechanism IVFIndex.save uses for cells. ``sort_cols`` sorts
    within each task's output files (sortWithinPartitions — no extra
    shuffle), tightening parquet min/max row-group stats for range
    predicates on those columns."""
    if sort_cols:
        df = df.sortWithinPartitions(*partition_cols, *sort_cols)
    w = df.write.mode("overwrite")
    if max_records_per_file:
        w = w.option("maxRecordsPerFile", max_records_per_file)
    w.partitionBy(*partition_cols).parquet(path)
