"""Z-order (Morton) file layout for multi-column data skipping.

Parquet readers skip whole files/row-groups when the scan predicate
falls outside a file's min/max column statistics. Sorting by ONE column
makes that column's ranges tight but leaves every other column's range
spanning the whole domain — a filter on the second column then reads
everything. Interleaving the bits of several columns into one Morton
key and range-partitioning + sorting by it keeps EVERY participating
column's per-file range narrow (each file covers a small hyper-rectangle
of the key space) — the layout move behind Delta's OPTIMIZE ZORDER and
ClickHouse/Databricks multi-dimensional clustering, expressed here with
stock DataFrame ops so it works on plain parquet.

Mechanics (all JVM-side, no UDFs):
1. per column: rank → fixed-width integer. Ranks come from
   ``percentile_approx`` sketch boundaries broadcast back (the same
   no-global-sort machinery as ``quantile_buckets``), so the encode is
   MAP-ONLY and robust to skew/outliers — raw value bits would let one
   outlier collapse every other row into the same prefix.
2. interleave the top ``bits_per_col`` bits of each column's bucket id
   into the Morton key (bitwise exprs — codegen).
3. ``repartitionByRange(zkey)`` + ``sortWithinPartitions(zkey)`` +
   write: one range shuffle at write time buys skipping on every
   subsequent read filtered by ANY prefix-participating column.

Trade: Z-order write = one extra shuffle (like bucketing); reads that
filter on any clustered column touch ~N^((d-1)/d) of the files instead
of all of them. Verified in tests/test_layout.py by reading the parquet
footers: per-file min/max spans shrink for BOTH columns vs the
single-column-sort baseline, and a point predicate overlaps a small
fraction of files.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_zorder_key(
    df: DataFrame,
    cols: Sequence[str],
    *,
    bits_per_col: int = 8,
    accuracy: int = 10000,
    key_col: str = "__z",
) -> DataFrame:
    """Add the Morton key column: per-column equi-depth bucket ids
    (sketch boundaries, map-only assignment) bit-interleaved into one
    long. The boundary arrays ride along as ``__b_<col>`` columns
    (dropped by :func:`zorder_write`).

    ``bits_per_col × len(cols)`` must fit in 63 bits. The encode is a
    LINEAR boundary scan per row per column (2^bits comparisons), so
    resolution is paid for in map-side CPU: the default 8 bits (256
    buckets per dimension) is already ~16× finer than any sane file
    count needs; raise it only if file counts reach the thousands.
    """
    if not cols:
        raise ValueError("zorder_key: need at least one column")
    total = bits_per_col * len(cols)
    if total > 63:
        raise ValueError(
            f"zorder_key: {len(cols)} cols × {bits_per_col} bits = {total} > 63"
        )
    n_buckets = 1 << bits_per_col
    probs = [i / n_buckets for i in range(1, n_buckets)]
    bounds = df.agg(
        *[
            F.percentile_approx(c, probs, accuracy).alias(f"__b_{c}")
            for c in cols
        ]
    )
    # bucket id = count of boundaries strictly below the value (0..n-1),
    # the quantile_buckets assignment, inlined per column
    ids = [
        F.aggregate(
            F.filter(f"__b_{c}", lambda b: b < F.col(c).cast("double")),
            F.lit(0),
            lambda acc, _: acc + 1,
        ).cast("long")
        for c in cols
    ]
    # bit-interleave: output bit (i*len(cols)+j) = bit i of column j
    z = F.lit(0).cast("long")
    for i in range(bits_per_col):
        for j, bid in enumerate(ids):
            bit = F.shiftrightunsigned(bid, i).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, i * len(ids) + j))
    return df.crossJoin(F.broadcast(bounds)).withColumn(key_col, z)


def zorder_write(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    *,
    n_files: int = 16,
    bits_per_col: int = 8,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as parquet clustered by the Morton key of ``cols``.

    One range shuffle (``repartitionByRange`` — sampled range bounds,
    no single-task global sort) + an in-partition sort; every output
    file then covers a compact hyper-rectangle, so min/max file stats
    prune reads filtered on ANY of ``cols``. Content is unchanged
    (gate-checked: read-back hash equals the source)."""
    keyed = with_zorder_key(df, cols, bits_per_col=bits_per_col)
    (
        keyed.repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z", *[f"__b_{c}" for c in cols])
        .write.mode(mode)
        .parquet(path)
    )
