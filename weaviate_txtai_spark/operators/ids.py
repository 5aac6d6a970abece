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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# monotonically_increasing_id packs the partition id above bit 33
_LOCAL_MASK = (1 << 33) - 1

# RFC-4122 DNS namespace, the same constant uuid.NAMESPACE_DNS holds
_DNS_NS_HEX = "6ba7b8109dad11d180b400c04fd430c8"


def uuid5_dns(col) -> Column:
    """RFC-4122 version-5 UUID of ``str(col)`` under NAMESPACE_DNS, as a
    pure codegen expression — bit-for-bit equal to Python's
    ``uuid.uuid5(uuid.NAMESPACE_DNS, str(value))``.

    Why: mutation paths that run on executors (``upsert_df``, streaming
    ingest) need uuids that are a FUNCTION of the docid, not fresh
    randomness — a crash-window replay of the same micro-batch must
    rewrite byte-identical rows ("idempotent by value"), and the
    distributed path must agree with the driver-side ``upsert()``'s
    ``uuidlib.uuid5`` scheme (ADVICE r2). uuid5 = SHA-1(namespace_bytes
    || name) with the version/variant bits patched in, which maps to
    ``sha1`` plus string surgery on the hex form.
    """
    name = F.col(col) if isinstance(col, str) else col
    h = F.sha1(
        F.concat(
            F.to_binary(F.lit(_DNS_NS_HEX), F.lit("hex")),
            F.encode(name.cast("string"), "UTF-8"),
        )
    )
    # variant nibble: (x & 0b0011) | 0b1000  -> one of 8,9,a,b
    variant = F.lower(
        F.hex(
            F.conv(F.substring(h, 17, 1), 16, 10)
            .cast("int")
            .bitwiseAND(F.lit(3))
            .bitwiseOR(F.lit(8))
        )
    )
    return F.concat_ws(
        "-",
        F.substring(h, 1, 8),
        F.substring(h, 9, 4),
        F.concat(F.lit("5"), F.substring(h, 14, 3)),  # version nibble := 5
        F.concat(variant, F.substring(h, 18, 3)),
        F.substring(h, 21, 12),
    )


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
