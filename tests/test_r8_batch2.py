"""Round-8 batch 2: item-item co-visitation, join-skew diagnostics,
seasonality profile / MA trend, Holt smoothing (float + fixed-point)."""

import datetime as dt
import math

import pytest

from pyspark.sql import functions as F


# ------------------------------------------------------------ itemsets


def test_item_similarity_closed_form(spark):
    from weaviate_txtai_spark.operators.itemsets import item_similarity

    # baskets: {1:ab, 2:ab, 3:a, 4:bc}
    rows = [(1, "a"), (1, "b"), (2, "a"), (2, "b"), (3, "a"), (4, "b"), (4, "c")]
    df = spark.createDataFrame(rows, "basket long, item string")
    out = {
        (r["p1"], r["p2"]): r
        for r in item_similarity(df, "basket", "item", min_pair_count=1).collect()
    }
    ab = out[("a", "b")]
    assert ab["pair_count"] == 2 and ab["n1"] == 3 and ab["n2"] == 3
    assert ab["cosine"] == round(2 / 3, 6)
    assert ab["jaccard"] == 0.5  # 2 / (3 + 3 - 2)
    assert out[("b", "c")]["pair_count"] == 1


def test_also_bought_rank_determinism(spark):
    from weaviate_txtai_spark.operators.itemsets import also_bought_topk

    rows = [(1, "a"), (1, "b"), (1, "c"), (2, "a"), (2, "b"), (2, "c")]
    df = spark.createDataFrame(rows, "basket long, item string")
    out = also_bought_topk(df, "basket", "item", 2, min_pair_count=1).collect()
    got = {(r["item"], r["rank"]): r["neighbor"] for r in out}
    # all cosines tie at 1.0 and pair counts tie -> neighbor id ASC
    assert got[("a", 1)] == "b" and got[("a", 2)] == "c"
    assert got[("c", 1)] == "a"


# ---------------------------------------------------------------- skew


def test_join_size_estimate_exact(spark):
    from weaviate_txtai_spark.operators.skew import join_size_estimate

    left = spark.createDataFrame([(1,), (1,), (2,), (3,)], "key long")
    right = spark.createDataFrame([(1,), (1,), (1,), (2,)], "key long")
    r = join_size_estimate(left, right, "key").collect()[0]
    # key1: 2*3=6, key2: 1*1=1; key3 left-only
    assert r["n_keys_both"] == 2 and r["out_rows"] == 7
    assert r["max_key_rows"] == 6
    assert r["max_share"] == round(6 / 7, 6)
    assert r["skew_ratio"] == round(6 / 3.5, 6)
    # cross-check vs the actual join
    assert left.join(right, "key").count() == 7


def test_join_skew_topk_order(spark):
    from weaviate_txtai_spark.operators.skew import join_skew_topk

    left = spark.createDataFrame([(1,), (1,), (2,), (3,), (3,)], "key long")
    out = join_skew_topk(left, left, "key", 2).collect()
    assert [r["key"] for r in out] == [1, 3]  # 4, 4 -> tie broken by key
    assert out[0]["out_rows"] == 4


def test_join_size_empty_join_nulls(spark):
    from weaviate_txtai_spark.operators.skew import join_size_estimate

    left = spark.createDataFrame([(1,)], "key long")
    right = spark.createDataFrame([(2,)], "key long")
    r = join_size_estimate(left, right, "key").collect()[0]
    assert r["n_keys_both"] == 0 and r["max_share"] is None


# ------------------------------------------------------------ seasonal


def _daily_events(spark, spec):
    # spec: list of (grp, date, count)
    rows = []
    for g, d, n in spec:
        for i in range(n):
            rows.append((g, dt.datetime.combine(d, dt.time(1, 0)) +
                         dt.timedelta(minutes=i)))
    return spark.createDataFrame(rows, "event_type string, ts timestamp")


def test_weekday_profile_index(spark):
    from weaviate_txtai_spark.operators.seasonal import weekday_profile

    # two Mondays at 4/day, two Tuesdays at 2/day -> overall mean 3
    mon1, tue1 = dt.date(2024, 1, 1), dt.date(2024, 1, 2)
    mon2, tue2 = dt.date(2024, 1, 8), dt.date(2024, 1, 9)
    ev = _daily_events(spark, [("a", mon1, 4), ("a", mon2, 4),
                               ("a", tue1, 2), ("a", tue2, 2)])
    out = {r["weekday"]: r for r in weekday_profile(ev).collect()}
    # Spark dayofweek: Monday=2, Tuesday=3
    assert out[2]["avg_n"] == 4.0 and out[2]["index"] == round(4 / 3, 6)
    assert out[3]["n_days"] == 2 and out[3]["index"] == round(2 / 3, 6)


def test_trend_ma_calendar_window(spark):
    from weaviate_txtai_spark.operators.seasonal import trend_ma

    # days 1,2,10 — day 10 is outside day 1/2's ±3 band (gap respected)
    d = dt.date(2024, 1, 1)
    ev = _daily_events(spark, [("a", d, 1),
                               ("a", d + dt.timedelta(days=1), 3),
                               ("a", d + dt.timedelta(days=9), 5)])
    out = {str(r["day"]): r["trend"] for r in trend_ma(ev).collect()}
    assert out["2024-01-01"] == 2.0  # avg(1, 3)
    assert out["2024-01-10"] == 5.0  # alone in its band
    with pytest.raises(ValueError, match="odd"):
        trend_ma(ev, window_days=4)


# ---------------------------------------------------------------- holt


def _holt_ref(xs, alpha, beta):
    l, b = xs[0], 0.0
    out = [(l, b)]
    for x in xs[1:]:
        nl = alpha * x + (1 - alpha) * (l + b)
        b = beta * (nl - l) + (1 - beta) * b
        l = nl
        out.append((l, b))
    return out


def test_holt_linear_matches_reference(spark):
    from weaviate_txtai_spark.operators.changepoint import holt_linear

    xs = [10.0, 12.0, 15.0, 11.0, 18.0, 20.0]
    df = spark.createDataFrame(
        [("g", i, x) for i, x in enumerate(xs)], "g string, t int, v double"
    )
    got = sorted(
        holt_linear(df, "g", "t", "v", alpha=0.5, beta=0.4).collect(),
        key=lambda r: r["t"],
    )
    ref = _holt_ref(xs, 0.5, 0.4)
    for r, (l, b) in zip(got, ref):
        assert math.isclose(r["level"], l, abs_tol=2e-6), (r, l)
        assert math.isclose(r["trend"], b, abs_tol=2e-6), (r, b)
        assert math.isclose(r["forecast"], r["level"] + r["trend"], abs_tol=2e-6)


def test_holt_exact_matches_float_and_is_partition_stable(spark):
    from weaviate_txtai_spark.operators.changepoint import (
        holt_linear,
        holt_linear_exact,
    )

    xs = [40.0, 55.0, 61.0, 58.0, 70.0, 64.0, 80.0]
    df = spark.createDataFrame(
        [("g", i, x) for i, x in enumerate(xs)], "g string, t int, v double"
    )
    ex = sorted(
        holt_linear_exact(df, "g", "t", "v").collect(), key=lambda r: r["t"]
    )
    fl = sorted(
        holt_linear(df, "g", "t", "v", alpha=0.3, beta=0.2).collect(),
        key=lambda r: r["t"],
    )
    for a, b in zip(ex, fl):
        # fixed-point floor vs float round: ≤ 1 µunit per step, bounded drift
        assert math.isclose(a["level"], b["level"], abs_tol=1e-4)
        assert math.isclose(a["trend"], b["trend"], abs_tol=1e-4)
    # partitioning invariance (bit-exact)
    ex7 = sorted(
        holt_linear_exact(df.repartition(7), "g", "t", "v").collect(),
        key=lambda r: r["t"],
    )
    assert [tuple(r) for r in ex] == [tuple(r) for r in ex7]


def test_holt_validation(spark):
    from weaviate_txtai_spark.operators.changepoint import (
        holt_linear,
        holt_linear_exact,
    )

    df = spark.createDataFrame([("g", 1, 1.0)], "g string, t int, v double")
    with pytest.raises(ValueError):
        holt_linear(df, "g", "t", "v", alpha=0.0, beta=0.5)
    with pytest.raises(ValueError):
        holt_linear_exact(df, "g", "t", "v", alpha_num=11, den=10)
