"""Parallel dense-id assignment (the reference's docid offset contract,
weaviate_txtai/ann/weaviate.py:67,149, without the single-task stage).

The naive Spark form — ``row_number() OVER (ORDER BY
monotonically_increasing_id())`` — is correct but funnels the whole batch
through ONE task (a global-order window has no partitionBy), the classic
ingest-path scale-killer. The scale-safe form is the two-pass scheme every
distributed engine uses (it is exactly what ``RDD.zipWithIndex`` does on
the JVM, re-expressed in DataFrame ops so rows never leave Tungsten):

1. tag rows with ``monotonically_increasing_id()`` — a *narrow* projection.
   By construction the id is ``(partition_id << 33) + local_row_index``
   with the local index dense from 0 within each partition, so both the
   partition id and the in-partition position are recoverable with two
   bit ops — no window, no shuffle.
2. count rows per partition (a tiny aggregate: one row per input
   partition survives the map side) and turn the counts into cumulative
   start offsets on the driver.
3. broadcast-join the ≤num_partitions offset table back and add
   ``start + partition_offset + local_index`` — again narrow.

Ids are dense in [start, start+n) and ordered by (partition, position) —
the SAME total order the global-order window produced, so the swap is
value-identical, not just count-identical.

Determinism note: passes 2 and 3 evaluate the input lineage twice, so the
input's partitioning must be deterministic across evaluations (true for
file sources, createDataFrame, and any deterministic transformation —
the same assumption the previous count()+window form already made).
Callers holding a nondeterministic frame (e.g. fresh ``rand()`` output)
should persist it first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# monotonically_increasing_id packs the partition id above bit 33
_LOCAL_MASK = (1 << 33) - 1


def with_dense_ids(
    df: DataFrame, *, start: int = 0, id_col: str = "__dense_id"
) -> tuple[DataFrame, int]:
    """Attach dense ids ``start..start+n-1`` without a single-task stage.

    Returns ``(tagged_df, n)`` — the row count falls out of pass 2 for
    free, saving callers the separate ``df.count()`` job they previously
    ran alongside the window.

    The two passes evaluate the input lineage twice; a caller whose
    lineage is expensive to recompute (e.g. an Arrow-batched encoder UDF
    on the ingest path) should ``persist()`` the input first and
    unpersist after materializing the result — that also discharges the
    determinism requirement (see module docstring). ``VectorIndex``'s
    ingest paths do exactly this.
    """
    spark = df.sparkSession
    tagged = df.withColumn("__mid", F.monotonically_increasing_id())
    pid = F.shiftrightunsigned("__mid", 33).alias("__pid")
    counts = sorted(
        (r["__pid"], r["__cnt"])
        for r in tagged.groupBy(pid)
        .agg(F.count(F.lit(1)).alias("__cnt"))
        .collect()
    )
    offsets, acc = [], 0
    for p, c in counts:
        offsets.append((p, acc))
        acc += c
    if not offsets:
        return df.withColumn(id_col, F.lit(None).cast("long")), 0
    odf = spark.createDataFrame(offsets, "__pid long, __off long")
    out = (
        tagged.withColumn("__pid", F.shiftrightunsigned("__mid", 33))
        .join(F.broadcast(odf), "__pid")
        .withColumn(
            id_col,
            F.lit(int(start))
            + F.col("__off")
            + F.col("__mid").bitwiseAND(F.lit(_LOCAL_MASK)),
        )
        .drop("__mid", "__pid", "__off")
    )
    return out, acc
