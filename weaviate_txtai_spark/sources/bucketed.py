"""Co-bucketed table layout: delete the fact⋈fact shuffle at write time.

The biggest shuffle in the relational suite is lineitem⋈orders on
orderkey (SCALING.md "Relational"). Spark's bucketed tables fix it the
way a 100 TB warehouse would: both tables are written pre-hashed into
the same number of buckets on the join key (``bucketBy`` +
``saveAsTable``), so a later equi-join on that key is bucket-local —
SortMergeJoin with **no Exchange on either side** (asserted in
tests/test_bucketed.py).

Cost model: one extra shuffle per table at write time buys zero
shuffles on every subsequent join/aggregate keyed on the bucket
column. For append-mostly fact tables read many times, that trade is
the default choice at scale. Bucket count: aim for buckets ≈ data
size / 128 MB at the largest SF; it must MATCH across co-joined
tables (Spark requires equal bucket counts for shuffle-free joins;
one side may be a multiple of the other with
``spark.sql.bucketing.coalesceBucketsInJoin.enabled``).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession


def _drop_table_and_location(spark: SparkSession, table: str) -> None:
    """DROP IF EXISTS plus orphaned-location cleanup: a managed table's
    directory can outlive the (ephemeral, per-session derby) catalog
    entry, and saveAsTable refuses to reuse it (LOCATION_ALREADY_EXISTS)."""
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    for prefix in ("file://", "file:"):
        if warehouse.startswith(prefix):
            warehouse = warehouse[len(prefix):]
            break
    shutil.rmtree(os.path.join(warehouse, table.lower()), ignore_errors=True)


def write_bucketed(
    df: DataFrame,
    table: str,
    *,
    bucket_col: str,
    n_buckets: int = 8,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (and bucket-sorted) managed table.

    Sorting within buckets lets SortMergeJoin skip its sort as well —
    the join degenerates to a zip of pre-sorted bucket files."""
    if mode == "overwrite":
        _drop_table_and_location(df.sparkSession, table)
    writer = df.write.mode(mode).bucketBy(n_buckets, bucket_col)
    if sort:
        writer = writer.sortBy(bucket_col)
    writer.saveAsTable(table)


def cobucket_facts(
    spark: SparkSession,
    sf_dir: str,
    *,
    n_buckets: int = 8,
) -> tuple[str, str]:
    """Materialize lineitem/orders co-bucketed on orderkey; returns the
    table names. Idempotent per session (overwrite)."""
    from weaviate_txtai_spark.sources.tables import load_table

    write_bucketed(
        load_table(spark, sf_dir, "lineitem"),
        "lineitem_bucketed",
        bucket_col="l_orderkey",
        n_buckets=n_buckets,
    )
    write_bucketed(
        load_table(spark, sf_dir, "orders"),
        "orders_bucketed",
        bucket_col="o_orderkey",
        n_buckets=n_buckets,
    )
    return "lineitem_bucketed", "orders_bucketed"
