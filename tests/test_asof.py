"""Temporal joins: as-of (nearest prior) and bounded range join.

The reference has no temporal joins (SURVEY §2.4); these pin the exact
semantics of operators/asof.py with hand-built rows where every boundary
case is enumerable: equal-timestamp inclusivity, unmatched-left NULLs,
per-key isolation, and the (l.ts, l.ts+w] range bounds across epoch-bucket
boundaries.
"""

from __future__ import annotations

import datetime as dt


from weaviate_txtai_spark.operators.asof import asof_join, range_join


def _ts(s: float):
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)


def test_asof_backward_inclusive_and_left_semantics(spark):
    left = spark.createDataFrame(
        [(1, _ts(10), "l10"), (1, _ts(20), "l20"), (2, _ts(5), "l5")],
        "k int, ts timestamp, lv string",
    )
    right = spark.createDataFrame(
        [(1, _ts(10), "r10"), (1, _ts(15), "r15"), (3, _ts(1), "r-other")],
        "k int, ts timestamp, rv string",
    )
    out = {
        r["lv"]: (r["rv"], r["matched_ts"])
        for r in asof_join(left, right, on=["k"]).collect()
    }
    # equal ts matches (inclusive backward)
    assert out["l10"] == ("r10", _ts(10))
    # latest prior wins, not just any prior
    assert out["l20"] == ("r15", _ts(15))
    # key 2 has no right rows at all -> left join NULLs
    assert out["l5"] == (None, None)


def test_asof_does_not_leak_across_keys(spark):
    left = spark.createDataFrame(
        [(1, _ts(100), "a"), (2, _ts(100), "b")], "k int, ts timestamp, lv string"
    )
    right = spark.createDataFrame(
        [(1, _ts(50), "only-k1")], "k int, ts timestamp, rv string"
    )
    out = {r["lv"]: r["rv"] for r in asof_join(left, right, on=["k"]).collect()}
    assert out == {"a": "only-k1", "b": None}


def test_range_join_bounds_and_bucket_crossing(spark):
    # window = 60s; buckets are 60s epochs. A left row late in its bucket
    # must still see right rows early in the NEXT bucket (the ×2 explode).
    left = spark.createDataFrame(
        [(1, 100, _ts(50.0))], "k int, lid int, ts timestamp"
    )
    right = spark.createDataFrame(
        [
            (1, 200, _ts(50.0)),   # == l.ts -> excluded (strict lower)
            (1, 201, _ts(50.5)),   # in range, same bucket
            (1, 202, _ts(70.0)),   # in range, NEXT bucket (61..119 epoch)
            (1, 203, _ts(110.0)),  # == l.ts + 60 -> included (inclusive upper)
            (1, 204, _ts(110.5)),  # beyond window -> excluded
            (2, 205, _ts(55.0)),   # other key -> excluded
        ],
        "k int, rid int, r_ts timestamp",
    )
    got = sorted(
        r["rid"]
        for r in range_join(
            left, right, window_seconds=60, on=["k"], left_ts="ts", right_ts="r_ts"
        ).collect()
    )
    assert got == [201, 202, 203]


def test_range_join_no_duplicate_pairs(spark):
    # right row in the same bucket as both left explode targets must
    # appear exactly once per qualifying left row
    left = spark.createDataFrame(
        [(1, 1, _ts(10.0)), (1, 2, _ts(20.0))], "k int, lid int, ts timestamp"
    )
    right = spark.createDataFrame(
        [(1, 9, _ts(30.0))], "k int, rid int, r_ts timestamp"
    )
    rows = range_join(
        left, right, window_seconds=60, on=["k"], left_ts="ts", right_ts="r_ts"
    ).collect()
    assert sorted((r["lid"], r["rid"]) for r in rows) == [(1, 9), (2, 9)]


def test_asof_plan_single_shuffle(spark):
    """The union+window formulation must cost ONE exchange on the key —
    that's its whole reason to exist vs an inequality join."""
    left = spark.createDataFrame(
        [(1, _ts(10), "x")], "k int, ts timestamp, lv string"
    )
    right = spark.createDataFrame(
        [(1, _ts(5), "y")], "k int, ts timestamp, rv string"
    )
    plan = (
        asof_join(left, right, on=["k"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1


def test_range_join_plan_has_no_nested_loop(spark):
    """The epoch-bucket rewrite must plan as an equi-join — never the
    BroadcastNestedLoopJoin/CartesianProduct Catalyst produces for raw
    inequality conditions."""
    left = spark.createDataFrame(
        [(1, 1, _ts(10.0))], "k int, lid int, ts timestamp"
    )
    right = spark.createDataFrame(
        [(1, 9, _ts(30.0))], "k int, rid int, r_ts timestamp"
    )
    plan = (
        range_join(
            left, right, window_seconds=60, on=["k"], left_ts="ts", right_ts="r_ts"
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "NestedLoop" not in plan
    assert "CartesianProduct" not in plan


def test_asof_rejects_payload_column_collision(spark):
    """A right payload column named like a left non-key column would emit
    a duplicate output column (ADVICE r1); asof_join now raises."""
    import pytest

    left = spark.createDataFrame(
        [(1, 10, "x")], "k long, ts long, val string"
    )
    right = spark.createDataFrame(
        [(1, 9, "y")], "k long, ts long, val string"
    )
    with pytest.raises(ValueError, match="collide"):
        asof_join(left, right, on=["k"])
    # non-colliding payload still works
    right_ok = right.withColumnRenamed("val", "rval")
    out = asof_join(left, right_ok, on=["k"]).collect()
    assert out[0]["rval"] == "y"


def test_asof_forward_nearest_following(spark):
    import datetime

    T = lambda s: datetime.datetime(2024, 1, 1, 0, 0, s)  # noqa: E731
    left = spark.createDataFrame(
        [(1, T(10)), (1, T(30)), (2, T(5))], "user_id long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(1, T(10), 1.0), (1, T(20), 2.0), (1, T(40), 3.0)],
        "user_id long, ts timestamp, v double",
    )
    from weaviate_txtai_spark.operators.asof import asof_join

    got = {
        (r["user_id"], r["ts"].second): (r["v"], r["matched_ts"].second if r["matched_ts"] else None)
        for r in asof_join(left, right, on=["user_id"], direction="forward").collect()
    }
    assert got[(1, 10)] == (1.0, 10)   # equal ts matches (inclusive)
    assert got[(1, 30)] == (3.0, 40)   # next following
    assert got[(2, 5)] == (None, None)  # no right rows for key


def test_asof_direction_validated(spark):
    import pytest as _pytest

    from weaviate_txtai_spark.operators.asof import asof_join

    df = spark.createDataFrame([(1, 1)], "user_id long, ts long")
    with _pytest.raises(ValueError, match="unknown direction"):
        asof_join(df, df, on=["user_id"], direction="sideways")


def test_asof_payload_stitched_from_one_row(spark):
    """ADVICE r4: a right row carrying a NULL in one payload column must
    NOT have that column back-filled from a farther right row — every
    output payload value and matched_ts come from the SAME matched row.
    Pinned in both directions."""
    from weaviate_txtai_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [("k", 50)], "key string, ts int"
    )
    right = spark.createDataFrame(
        [("k", 10, "early", 1.0),
         ("k", 40, None, 4.0),      # nearest-backward: a NULL in col a
         ("k", 60, None, 6.0),      # nearest-forward: a NULL in col a
         ("k", 90, "late", 9.0)],
        "key string, ts int, a string, b double",
    )
    back = asof_join(left, right, on=["key"], left_ts="ts",
                     right_ts="ts").collect()[0]
    assert back["matched_ts"] == 40
    assert back["b"] == 4.0
    assert back["a"] is None       # NOT "early" from ts=10
    fwd = asof_join(left, right, on=["key"], left_ts="ts", right_ts="ts",
                    direction="forward").collect()[0]
    assert fwd["matched_ts"] == 60
    assert fwd["b"] == 6.0
    assert fwd["a"] is None        # NOT "late" from ts=90
