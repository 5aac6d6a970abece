"""Regressions for the r10 repo-wide review hardening: edge inputs the
gates' fixtures never exercise (empty margins, string ids/strata, NULL
timestamps, 64-bit unit ids) must fail loudly or compute correctly —
never silently corrupt."""

import pytest

from pyspark.sql import functions as F


def test_odds_ratio_empty_margin_is_null(spark):
    from weaviate_txtai_spark.operators.abtest import odds_ratio

    # no treated rows at all: OR is not estimable — the Haldane
    # correction must not manufacture a finite interval
    df = spark.createDataFrame(
        [(0, 1), (0, 0), (0, 1)], "t int, y int"
    )
    row = odds_ratio(df, "t", "y").collect()[0]
    assert row.a == 0 and row.b == 0
    assert row.or_ is None and row.or_lo is None and row.or_hi is None
    # ...while a mere zero CELL (not margin) still corrects and emits
    df2 = spark.createDataFrame(
        [(1, 1), (1, 1), (0, 1), (0, 0)], "t int, y int"
    )
    row2 = odds_ratio(df2, "t", "y").collect()[0]
    assert row2.corrected and row2.or_ is not None


def test_stratified_ate_rejects_string_stratum(spark):
    from weaviate_txtai_spark.operators.abtest import stratified_ate

    df = spark.createDataFrame(
        [("us", 1, 1.0), ("us", 0, 0.0)], "country string, t int, y double"
    )
    with pytest.raises(ValueError, match="integral stratum"):
        stratified_ate(df, "t", "y", "country")


def test_stratified_ate_integral_strata_still_work(spark):
    from weaviate_txtai_spark.operators.abtest import stratified_ate

    rows = [(s, t, float(s * 2 + t)) for s in (1, 2)
            for t in (0, 1) for _ in range(3)]
    df = spark.createDataFrame(rows, "s int, t int, y double")
    out = {r.stratum: r for r in stratified_ate(df, "t", "y", "s").collect()}
    assert set(out) == {1, 2, -1}
    assert out[1].diff == 1.0 and out[2].diff == 1.0
    assert out[-1].diff == 1.0  # pooled ATE


def test_mann_kendall_null_t_uniformly_excluded(spark):
    from weaviate_txtai_spark.operators.seasonal import mann_kendall

    clean = spark.createDataFrame(
        [(t, float(t)) for t in range(10)], "t long, y double"
    )
    dirty = spark.createDataFrame(
        [(t, float(t)) for t in range(10)]
        + [(None, 99.0), (None, -5.0)],
        "t long, y double",
    )
    a = mann_kendall(clean).collect()[0]
    b = mann_kendall(dirty).collect()[0]
    # NULL-t rows must not leak into n or the tie correction
    assert (a.n, a.s, a.var_s, a.z) == (b.n, b.s, b.var_s, b.z)


def test_mmr_select_string_ids(spark):
    from weaviate_txtai_spark.operators.mmr import mmr_select

    rows = [
        (1, "doc_b", 0.9, [1.0, 0.0]),
        (1, "doc_a", 0.9, [1.0, 0.0]),  # same score: tie -> lowest id
        (1, "doc_c", 0.5, [0.0, 1.0]),
    ]
    df = spark.createDataFrame(
        rows, "q int, doc string, score double, vec array<double>"
    )
    out = mmr_select(
        df, 2, query_col="q", id_col="doc",
        score_col="score", vector_col="vec", lam=0.5,
    ).orderBy("rank").collect()
    assert [r.doc for r in out] == ["doc_a", "doc_c"]
    assert [r["rank"] for r in out] == [1, 2]
