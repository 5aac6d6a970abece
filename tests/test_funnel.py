"""Ordered funnel + cohort retention (operators/funnel.py)."""

import datetime as dt

import pytest

from pyspark.sql import functions as F

from weaviate_txtai_spark.operators.funnel import cohort_retention, funnel


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, event_type string, ts timestamp"
    )


def _ts(day, sec=0):
    return dt.datetime(2024, 1, day, 0, 0, sec)


def test_funnel_strict_order(spark):
    ev = _events(
        spark,
        [
            # u1 completes in order
            (1, "signup", _ts(1)),
            (1, "view", _ts(2)),
            (1, "click", _ts(3)),
            # u2 clicked BEFORE viewing -> stops at view
            (2, "signup", _ts(1)),
            (2, "click", _ts(2)),
            (2, "view", _ts(3)),
            # u3 never signed up -> counted nowhere
            (3, "view", _ts(1)),
            (3, "click", _ts(2)),
        ],
    )
    rows = {
        r["step"]: r
        for r in funnel(ev, ["signup", "view", "click"]).collect()
    }
    assert rows["signup"]["n_users"] == 2
    assert rows["view"]["n_users"] == 2
    assert rows["click"]["n_users"] == 1
    assert rows["click"]["conversion"] == 0.5
    assert [rows[s]["step_idx"] for s in ("signup", "view", "click")] == [
        0,
        1,
        2,
    ]


def test_funnel_same_timestamp_not_after(spark):
    # strictly-after: a view at the exact signup instant does not count
    ev = _events(
        spark,
        [
            (1, "signup", _ts(1)),
            (1, "view", _ts(1)),
            (2, "signup", _ts(1)),
            (2, "view", _ts(1, 1)),
        ],
    )
    rows = {r["step"]: r for r in funnel(ev, ["signup", "view"]).collect()}
    assert rows["signup"]["n_users"] == 2 and rows["view"]["n_users"] == 1


def test_funnel_greedy_earliest_is_optimal(spark):
    # signup@1, view@2, signup@3, click@4: greedy takes view@2 (after
    # signup@1) then click@4 — the later signup must not reset progress
    ev = _events(
        spark,
        [
            (1, "signup", _ts(1)),
            (1, "view", _ts(2)),
            (1, "signup", _ts(3)),
            (1, "click", _ts(4)),
        ],
    )
    rows = {
        r["step"]: r["n_users"]
        for r in funnel(ev, ["signup", "view", "click"]).collect()
    }
    assert rows == {"signup": 1, "view": 1, "click": 1}


def test_funnel_empty_input_zero_rows_not_crash(spark):
    ev = _events(spark, []).filter(F.lit(False))
    rows = funnel(ev, ["signup", "view"]).collect()
    assert {r["step"]: r["n_users"] for r in rows} == {"signup": 0, "view": 0}
    assert all(r["conversion"] is None for r in rows)


def test_funnel_validates_steps(spark):
    ev = _events(spark, [(1, "signup", _ts(1))])
    with pytest.raises(ValueError):
        funnel(ev, ["signup"])
    with pytest.raises(ValueError):
        funnel(ev, ["signup", "signup"])


def test_cohort_retention_matrix(spark):
    # u1 first week W0, active W0+W2; u2 first W0, active W0 only;
    # u3 first W1, active W1+W2
    ev = _events(
        spark,
        [
            (1, "view", _ts(1)),     # Mon Jan 1 -> week 2024-01-01
            (1, "view", _ts(16)),    # week 2024-01-15 = offset 2
            (2, "view", _ts(2)),
            (3, "view", _ts(8)),     # week 2024-01-08
            (3, "view", _ts(15)),    # offset 1
        ],
    )
    got = {
        (str(r["cohort_week"]), r["week_offset"]): r["n_users"]
        for r in cohort_retention(ev).collect()
    }
    assert got == {
        ("2024-01-01", 0): 2,
        ("2024-01-01", 2): 1,
        ("2024-01-08", 0): 1,
        ("2024-01-08", 1): 1,
    }


def test_cohort_retention_max_offset(spark):
    ev = _events(spark, [(1, "view", _ts(1)), (1, "view", _ts(29))])
    full = cohort_retention(ev).count()
    capped = cohort_retention(ev, max_offset=1).count()
    assert full == 2 and capped == 1


# ---------------------------------------------------------------- window


def test_windowed_funnel_late_anchor_wins(spark):
    # greedy-from-first-anchor would fail: signup@0 has no view within
    # 10s, but signup@50 -> view@55 converts. Every anchor is tried.
    ev = _events(
        spark,
        [
            (1, "signup", _ts(1, 0)),
            (1, "signup", _ts(1, 50)),
            (1, "view", _ts(1, 55)),
        ],
    )
    rows = {
        r["step"]: r["n_users"]
        for r in funnel(ev, ["signup", "view"], window=10).collect()
    }
    assert rows == {"signup": 1, "view": 1}


def test_windowed_funnel_outside_window_drops(spark):
    ev = _events(
        spark,
        [
            (1, "signup", _ts(1, 0)),
            (1, "view", _ts(1, 30)),  # 30s after the only anchor
        ],
    )
    rows = {
        r["step"]: r["n_users"]
        for r in funnel(ev, ["signup", "view"], window=10).collect()
    }
    assert rows == {"signup": 1, "view": 0}


def test_windowed_funnel_boundary_inclusive_and_strict(spark):
    ev = _events(
        spark,
        [
            # view exactly at anchor+window: included
            (1, "signup", _ts(1, 0)),
            (1, "view", _ts(1, 10)),
            # view exactly AT the anchor: strict > excludes it
            (2, "signup", _ts(1, 0)),
            (2, "view", _ts(1, 0)),
        ],
    )
    rows = {
        r["step"]: r["n_users"]
        for r in funnel(ev, ["signup", "view"], window=10).collect()
    }
    assert rows == {"signup": 2, "view": 1}


def test_windowed_funnel_whole_chain_within_anchor_window(spark):
    # u1: chain 0 -> 4 -> 8 fits in 10s. u2: view fits but click lands
    # at anchor+12 -> level 2 only. The window binds to the ANCHOR, not
    # to the previous step.
    ev = _events(
        spark,
        [
            (1, "signup", _ts(1, 0)),
            (1, "view", _ts(1, 4)),
            (1, "click", _ts(1, 8)),
            (2, "signup", _ts(1, 0)),
            (2, "view", _ts(1, 9)),
            (2, "click", _ts(1, 12)),
        ],
    )
    rows = {
        r["step"]: r["n_users"]
        for r in funnel(ev, ["signup", "view", "click"], window=10).collect()
    }
    assert rows == {"signup": 2, "view": 2, "click": 1}


def test_windowed_funnel_huge_window_matches_unwindowed(spark):
    ev = _events(
        spark,
        [
            (u, t, _ts(d, s))
            for u, seq in [
                (1, [("signup", 1, 0), ("view", 2, 0), ("click", 3, 0)]),
                (2, [("signup", 1, 0), ("click", 2, 0), ("view", 3, 0)]),
                (3, [("view", 1, 0), ("click", 2, 0)]),
            ]
            for t, d, s in seq
        ],
    )
    steps = ["signup", "view", "click"]
    a = {
        (r["step_idx"], r["n_users"])
        for r in funnel(ev, steps).collect()
    }
    b = {
        (r["step_idx"], r["n_users"])
        for r in funnel(ev, steps, window=10**9).collect()
    }
    assert a == b


def test_windowed_funnel_rejects_nonpositive_window(spark):
    ev = _events(spark, [(1, "signup", _ts(1))])
    with pytest.raises(ValueError):
        funnel(ev, ["signup", "view"], window=0)


def test_funnel_ab_hand_computed(spark):
    import math

    from weaviate_txtai_spark.operators.funnel import funnel_ab

    rows = []
    # variant A: 4 users signup, 3 view; variant B: 4 signup, 1 view
    for u in range(4):
        rows.append((u, "signup", _ts(1), "A"))
        if u < 3:
            rows.append((u, "view", _ts(2), "A"))
    for u in range(10, 14):
        rows.append((u, "signup", _ts(1), "B"))
    rows.append((10, "view", _ts(2), "B"))
    ev = spark.createDataFrame(
        rows, "user_id long, event_type string, ts timestamp, variant string"
    )
    got = {
        r.step_idx: r
        for r in funnel_ab(
            ev, ["signup", "view"], variant_col="variant",
            group_a="A", group_b="B",
        ).collect()
    }
    assert got[0].z is None and got[0].rate_a == 1.0
    r = got[1]
    assert (r.n_a, r.n_b) == (3, 1)
    assert r.rate_a == 0.75 and r.rate_b == 0.25
    p = 4 / 8
    z = (0.75 - 0.25) / math.sqrt(p * (1 - p) * (1 / 4 + 1 / 4))
    assert r.z == round(z, 6)
