"""JSONL / CSV sources with enforced schemas.

The driver testdata is parquet, but a real corpus arrives as JSONL or
CSV more often than not. Both readers here take an EXPLICIT StructType:
schema inference reads the data twice and silently widens types
(`1` → long in one file, double in another), which at 100 TB is both a
full extra pass and a correctness hazard — so it is simply not offered.

Malformed rows follow Spark's PERMISSIVE mode with an explicit
``_corrupt_record`` column the caller must decide about (count it,
quarantine it, or fail the batch); ``mode="FAILFAST"`` turns any bad
row into a job failure for ingest paths that prefer loud breakage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StringType, StructField, StructType


def _with_corrupt(schema: StructType) -> StructType:
    if any(f.name == "_corrupt_record" for f in schema.fields):
        return schema
    return StructType(
        list(schema.fields) + [StructField("_corrupt_record", StringType())]
    )


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: StructType,
    *,
    mode: str = "PERMISSIVE",
) -> DataFrame:
    """Line-delimited JSON with an enforced schema. Returns the declared
    columns plus ``_corrupt_record`` (NULL for clean rows) in PERMISSIVE
    mode."""
    reader = (
        spark.read.schema(_with_corrupt(schema) if mode == "PERMISSIVE" else schema)
        .option("mode", mode)
        .option("columnNameOfCorruptRecord", "_corrupt_record")
    )
    return reader.json(path)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType,
    *,
    header: bool = True,
    mode: str = "PERMISSIVE",
    sep: str = ",",
) -> DataFrame:
    """CSV with an enforced schema (never inferred)."""
    reader = (
        spark.read.schema(_with_corrupt(schema) if mode == "PERMISSIVE" else schema)
        .option("header", str(header).lower())
        .option("sep", sep)
        .option("mode", mode)
        .option("columnNameOfCorruptRecord", "_corrupt_record")
    )
    return reader.csv(path)


def read_orc(
    spark: SparkSession,
    path: str,
    schema: StructType | None = None,
) -> DataFrame:
    """ORC source — columnar like parquet (pushdown/pruning work the
    same); schema optional since ORC files carry their own, passed only
    to assert an expected contract."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.orc(path)
