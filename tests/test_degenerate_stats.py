"""Degenerate-input Inf/NaN survey (r12): the double-division audit's
probe set, kept as regressions. ANSI mode makes integer division and
invalid casts RAISE, but IEEE double division silently yields Inf/NaN —
and both engines agree on IEEE semantics, so a leak would be
oracle-INVISIBLE (hash still matches DuckDB). These cases pin the
documented convention instead: a statistic whose denominator
degenerates (n=1 arms, zero variance, all ties, single class, constant
series, all-zero mass) surfaces as NULL, never as Inf/NaN."""

import math

from pyspark.sql import functions as F


def _no_inf_nan(rows):
    leaks = [
        (k, v)
        for r in rows
        for k, v in r.asDict().items()
        if isinstance(v, float) and (math.isinf(v) or math.isnan(v))
    ]
    assert not leaks, leaks
    return rows


def test_welch_degenerate_arms_yield_null(spark):
    from weaviate_txtai_spark.operators.abtest import welch_ttest

    one_each = spark.createDataFrame(
        [("a", 1.0), ("b", 2.0)], "g string, v double"
    )
    rows = _no_inf_nan(
        welch_ttest(one_each, "g", "v", group_a="a", group_b="b").collect()
    )
    assert rows[0]["t"] is None  # no variance estimate from n=1

    zero_var = spark.createDataFrame(
        [("a", 1.0)] * 3 + [("b", 2.0)] * 3, "g string, v double"
    )
    rows = _no_inf_nan(
        welch_ttest(zero_var, "g", "v", group_a="a", group_b="b").collect()
    )
    assert rows[0]["t"] is None  # 0/0 SE must not become Inf


def test_mwu_and_cliffs_all_ties(spark):
    from weaviate_txtai_spark.operators.abtest import (
        cliffs_delta,
        mann_whitney_u,
    )

    ties = spark.createDataFrame(
        [("a", 5.0)] * 3 + [("b", 5.0)] * 3, "g string, v double"
    )
    _no_inf_nan(mann_whitney_u(ties, "g", "v", group_a="a", group_b="b").collect())
    rows = _no_inf_nan(
        cliffs_delta(ties, "g", "v", group_a="a", group_b="b").collect()
    )
    assert rows[0]["delta"] == 0.0


def test_gini_theil_all_zero_mass(spark):
    from weaviate_txtai_spark.operators.inequality import (
        gini,
        theil_decomposition,
    )

    rows = _no_inf_nan(
        gini(spark.createDataFrame([(0.0,), (0.0,)], "v double"), "v").collect()
    )
    assert rows[0][-1] is None  # zero total mass has no concentration
    _no_inf_nan(
        theil_decomposition(
            spark.createDataFrame([("g", 0.0), ("h", 0.0)], "g string, v double"),
            "v",
            "g",
        ).collect()
    )


def test_auc_single_class_and_kappa_single_category(spark):
    from weaviate_txtai_spark.operators.evalmetrics import (
        cohens_kappa,
        roc_auc,
    )

    rows = _no_inf_nan(
        roc_auc(
            spark.createDataFrame([(1, 0.3), (1, 0.9)], "label int, score double"),
            label_col="label",
            score_col="score",
        ).collect()
    )
    assert rows[0]["auc"] is None  # U/(n+*n-) with n-=0 must not be Inf
    rows = _no_inf_nan(
        cohens_kappa(
            spark.createDataFrame([("x", "x")] * 4, "a string, b string"),
            "a",
            "b",
        ).collect()
    )
    assert rows[0]["kappa"] is None  # pe=1 -> 0/0


def test_mutual_information_constant_columns(spark):
    from weaviate_txtai_spark.operators.infotheory import (
        categorical_dependence,
    )

    rows = _no_inf_nan(
        categorical_dependence(
            spark.createDataFrame([("x", "y")] * 5, "a string, b string"),
            "a",
            "b",
        ).collect()
    )
    r = rows[0]
    assert r["mi"] == 0.0 and r["nmi"] is None  # mi/sqrt(0*0)


def test_constant_series_acf_xcf_sax_mann_kendall(spark):
    from weaviate_txtai_spark.operators.seasonal import (
        acf,
        mann_kendall,
        sax_symbols,
        xcf,
    )

    const = spark.createDataFrame(
        [(t, 5.0) for t in range(10)], "t long, y double"
    )
    for r in _no_inf_nan(acf(const, max_lag=2).collect()):
        assert r[-1] is None  # zero-variance denominator
    for r in _no_inf_nan(xcf(const, const, max_lag=2).collect()):
        assert r[-1] is None
    short8 = spark.createDataFrame(
        [(t, 5.0) for t in range(8)], "t long, y double"
    )
    # constant series: z-normalization denominator is 0 — values must
    # surface NULL (the probe saw (seg, n, None, 'b') rows), never NaN
    _no_inf_nan(sax_symbols(short8, n_segments=4).collect())
    _no_inf_nan(
        mann_kendall(
            spark.createDataFrame([(1, 5.0)], "t long, y double")
        ).collect()
    )


def test_ztest_extreme_rates(spark):
    from weaviate_txtai_spark.operators.abtest import two_proportion_ztest

    df = spark.createDataFrame(
        [("a", 0)] * 3 + [("b", 1)] * 3, "g string, c int"
    )
    _no_inf_nan(
        two_proportion_ztest(df, "g", "c", group_a="a", group_b="b").collect()
    )
