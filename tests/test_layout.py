"""Z-order layout: content preservation, per-file bound tightening on
BOTH clustered columns vs a single-column sort, and point-predicate
file overlap — all read straight from the parquet footers."""

import glob
import os

import pyarrow.parquet as pq
import pytest

from pyspark.sql import functions as F

from weaviate_txtai_spark.sources.layout import with_zorder_key, zorder_write


def _file_bounds(path, col):
    """[(min, max)] per parquet file for a column, from footer stats."""
    out = []
    for f in sorted(glob.glob(os.path.join(path, "*.parquet"))):
        md = pq.ParquetFile(f).metadata
        lo, hi = None, None
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                c = md.row_group(rg).column(ci)
                if c.path_in_schema == col and c.statistics is not None:
                    s = c.statistics
                    lo = s.min if lo is None else min(lo, s.min)
                    hi = s.max if hi is None else max(hi, s.max)
        if lo is not None:
            out.append((lo, hi))
    return out


def _mean_span(bounds, domain):
    return sum((hi - lo) / domain for lo, hi in bounds) / len(bounds)


def test_zorder_preserves_content_and_tightens_both_columns(spark, tmp_path):
    n = 40_000
    # two independent uniform columns: a single-column sort can tighten
    # only one of them; z-order must tighten both
    df = spark.range(n).select(
        F.col("id"),
        (F.xxhash64("id") % 10_000).alias("a"),
        (F.xxhash64("id", F.lit(1)) % 10_000).alias("b"),
    ).select("id", F.abs("a").alias("a"), F.abs("b").alias("b"))
    zdir, sdir = str(tmp_path / "z"), str(tmp_path / "s")
    zorder_write(df, zdir, ["a", "b"], n_files=16)
    df.repartitionByRange(16, "a").sortWithinPartitions("a").write.parquet(sdir)
    # content identical
    back = spark.read.parquet(zdir)
    assert back.count() == n
    assert back.agg(F.sum("id"), F.sum("a"), F.sum("b")).collect() == df.agg(
        F.sum("id"), F.sum("a"), F.sum("b")
    ).collect()
    dom = 10_000
    za, zb = _file_bounds(zdir, "a"), _file_bounds(zdir, "b")
    sa, sb = _file_bounds(sdir, "a"), _file_bounds(sdir, "b")
    # the single-column sort: tight on a, full-domain on b
    assert _mean_span(sa, dom) < 0.2
    assert _mean_span(sb, dom) > 0.8
    # z-order: BOTH columns materially narrower than full domain
    assert _mean_span(za, dom) < 0.6
    assert _mean_span(zb, dom) < 0.6
    # a point predicate on b overlaps a minority of z-ordered files but
    # every single-sorted file
    probe = 5_000
    z_hit = sum(1 for lo, hi in zb if lo <= probe <= hi)
    s_hit = sum(1 for lo, hi in sb if lo <= probe <= hi)
    assert s_hit == len(sb)
    assert z_hit <= len(zb) // 2


def test_zorder_key_validation(spark):
    df = spark.range(10).select(F.col("id").alias("a"))
    with pytest.raises(ValueError, match="at least one"):
        with_zorder_key(df, [])
    with pytest.raises(ValueError, match="> 63"):
        with_zorder_key(df, ["a"] * 6, bits_per_col=12)


def test_zorder_key_is_deterministic(spark):
    df = spark.range(1000).select(
        F.col("id"), (F.col("id") % 37).alias("a"), (F.col("id") % 91).alias("b")
    )
    k1 = with_zorder_key(df, ["a", "b"]).select("id", "__z")
    k2 = with_zorder_key(df.repartition(7), ["a", "b"]).select("id", "__z")
    assert sorted(map(tuple, k1.collect())) == sorted(map(tuple, k2.collect()))
