"""Count-Min sketch: mergeable approximate frequency table.

Completes the engine's sketch family — HLL++ (cardinality), GK
(quantiles), Misra–Gries (heavy hitters, exactness-verified): CMS
answers point frequency queries ("how often does THIS token/url/id
occur?") over streams or unions of corpora with a fixed-size summary,
where the exact answer needs a full |vocabulary|-key aggregate. The
estimate always over-counts (never under): est(x) ≤ true(x) + εN with
probability 1−δ for width = ⌈e/ε⌉, depth = ⌈ln(1/δ)⌉.

Distributed shape: ONE pass — each row explodes into ``depth``
(row, bucket) pairs (a narrow JVM-side transform; bucket =
xxhash64(item, d) mod width) and a single partial-agg shuffle of at
most depth×width keys collapses them. The finished sketch is
depth×width longs on the driver (tens of KB — same bounded-artifact
contract as centroids/quotas), so merging sketches from different
corpora/days is numpy matrix addition. Exact counterpart for the gate
registry: the plain token-count aggregates already oracled
(``tokens_by_source``, ``token_heavy_hitters``); the sketch itself is
rows-only + error-bound pytest like the other sketches.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class CountMinSketch:
    """depth × width counter matrix + the total item count."""

    width: int
    depth: int
    table: "list[list[int]]"  # depth rows × width cols
    total: int

    def estimate(self, item: str) -> int:
        """Point frequency estimate: min over rows of the item's cell.
        The hash family is Spark's xxhash64 (no public Python twin), so
        the buckets come from ONE 1-row local Spark job covering all
        depths — fine for interactive spot checks; batch lookups should
        use :func:`estimate_df` (distributed, one job for any number of
        items)."""
        bs = _buckets(item, self.depth, self.width)
        return min(self.table[d][bs[d]] for d in range(self.depth))

    def merge(self, other: "CountMinSketch") -> "CountMinSketch":
        """Sketch union = cell-wise addition (same dims required) —
        the property that makes per-day / per-corpus sketches
        combinable without re-reading anything."""
        if (self.width, self.depth) != (other.width, other.depth):
            raise ValueError("CountMinSketch.merge: dimension mismatch")
        t = [
            [a + b for a, b in zip(r1, r2)]
            for r1, r2 in zip(self.table, other.table)
        ]
        return CountMinSketch(self.width, self.depth, t, self.total + other.total)


def _buckets(item: str, depth: int, width: int) -> "list[int]":
    """All depth buckets for one item in a single 1-row local job —
    Spark's xxhash64 has no public Python twin, so the driver asks the
    JVM for the exact same hashes the build used."""
    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    row = spark.range(1).select(
        F.array(
            *[
                F.pmod(F.xxhash64(F.lit(item), F.lit(d)), F.lit(width))
                for d in range(depth)
            ]
        ).alias("bs")
    ).collect()[0]
    return [int(b) for b in row["bs"]]


def estimate_df(
    cms: CountMinSketch, items: DataFrame, col: str
) -> DataFrame:
    """Distributed point queries: one job for any number of items. Each
    depth's row travels as ONE literal array indexed exactly once
    (width longs × depth — embedding the full 2-D table once per depth
    would multiply the plan size by depth); each item takes the min
    over its depth cells, pure codegen. NULL items get NULL estimates —
    the build skipped NULLs, and xxhash64 silently hashing a
    missing child would otherwise return some arbitrary cell's count
    for a value the sketch never saw."""
    cells = F.array(
        *[
            F.array(*[F.lit(v) for v in cms.table[d]])[
                F.pmod(
                    F.xxhash64(F.col(col).cast("string"), F.lit(d)),
                    F.lit(cms.width),
                )
            ]
            for d in range(cms.depth)
        ]
    )
    est = F.when(F.col(col).isNull(), F.lit(None)).otherwise(F.array_min(cells))
    return items.withColumn("est", est.cast("long"))


def build_cms(
    df: DataFrame,
    col: str,
    *,
    width: int = 2048,
    depth: int = 5,
) -> CountMinSketch:
    """One-pass sketch build over a column (NULLs skipped — they are a
    data-quality fact for ``profile_table``, not a frequency)."""
    if width <= 0 or depth <= 0:
        raise ValueError("build_cms: width and depth must be positive")
    items = df.select(F.col(col).cast("string").alias("__it")).filter(
        F.col("__it").isNotNull()
    )
    pairs = items.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"),
                        F.pmod(
                            F.xxhash64(F.col("__it"), F.lit(d)), F.lit(width)
                        ).alias("b"),
                    )
                    for d in range(depth)
                ]
            )
        ).alias("p")
    ).select(F.col("p.d").alias("d"), F.col("p.b").alias("b"))
    rows = (
        pairs.groupBy("d", "b").agg(F.count(F.lit(1)).alias("n")).collect()
    )  # ≤ depth × width rows — bounded
    table = [[0] * width for _ in range(depth)]
    total = 0
    for r in rows:
        table[r["d"]][r["b"]] = r["n"]
    if rows:
        total = sum(table[0])
    return CountMinSketch(width=width, depth=depth, table=table, total=total)
