"""operators/survival.kaplan_meier."""

import pytest

from weaviate_txtai_spark.operators.survival import kaplan_meier


def test_km_textbook_fixture(spark):
    # classic example: durations (event=1 / censored=0)
    # t=1 e, t=2 c, t=3 e, t=3 e, t=4 c, t=5 e
    rows = [
        ("g", 1, 1), ("g", 2, 0), ("g", 3, 1),
        ("g", 3, 1), ("g", 4, 0), ("g", 5, 1),
    ]
    df = spark.createDataFrame(rows, ["g", "t", "e"])
    got = {r.t: r for r in kaplan_meier(df, "t", "e", group_col="g").collect()}
    # n_risk: t1:6 t2:5 t3:4 t4:2 t5:1
    assert [got[t].n_risk for t in [1, 2, 3, 4, 5]] == [6, 5, 4, 2, 1]
    s1 = 1 - 1 / 6
    s3 = s1 * (1 - 2 / 4)
    s5 = s3 * (1 - 1 / 1)
    assert got[1].survival == pytest.approx(round(s1, 6), abs=2e-6)
    assert got[2].survival == got[1].survival  # censoring doesn't drop
    assert got[3].survival == pytest.approx(round(s3, 6), abs=2e-6)
    assert got[5].survival == 0.0  # risk set exhausted -> exactly 0
    assert got[5].n_events == 1 and got[3].n_events == 2


def test_km_all_censored_flat_curve(spark):
    rows = [("g", t, 0) for t in [1, 2, 3]]
    df = spark.createDataFrame(rows, ["g", "t", "e"])
    got = kaplan_meier(df, "t", "e", group_col="g").collect()
    assert all(r.survival == 1.0 for r in got)


def test_km_groups_independent(spark):
    rows = [("a", 1, 1), ("a", 2, 1), ("b", 1, 0), ("b", 2, 1)]
    df = spark.createDataFrame(rows, ["g", "t", "e"])
    got = {(r.g, r.t): r.survival
           for r in kaplan_meier(df, "t", "e", group_col="g").collect()}
    assert got[("a", 1)] == 0.5 and got[("a", 2)] == 0.0
    assert got[("b", 1)] == 1.0 and got[("b", 2)] == 0.0
