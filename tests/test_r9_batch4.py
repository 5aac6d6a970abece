"""Round-9 batch 4: isotonic PAV fit, largest-remainder apportionment,
Good-Turing adjusted frequencies."""

import pytest

from pyspark.sql import functions as F


# -------------------------------------------------------------- isotonic


def _pav_reference(buckets):
    """Classic sequential PAV over (x, sum_y, n) sorted by x."""
    blocks = [[sy, n, [x]] for x, sy, n in sorted(buckets)]
    out, i = [], 0
    stack = []
    for b in blocks:
        stack.append(list(b))
        while (
            len(stack) > 1
            and stack[-2][0] / stack[-2][1] >= stack[-1][0] / stack[-1][1]
        ):
            sy2, n2, xs2 = stack.pop()
            stack[-1][0] += sy2
            stack[-1][1] += n2
            stack[-1][2] = stack[-1][2] + xs2
        # strict violations only merge when prev mean > cur mean; equal
        # means merging is harmless (same fitted value)
    fit = {}
    for sy, n, xs in stack:
        for x in xs:
            fit[x] = sy / n
    return fit


def test_isotonic_matches_sequential_pav(spark):
    from weaviate_txtai_spark.operators.isotonic import isotonic_fit

    import random

    rng = random.Random(11)
    rows = []
    for x in range(12):
        p = min(0.9, 0.1 + 0.06 * x + rng.uniform(-0.2, 0.2))
        for _ in range(rng.randint(3, 9)):
            rows.append((x, 1.0 if rng.random() < p else 0.0))
    df = spark.createDataFrame(rows, "x int, y double")
    got = {
        r["x"]: r["y_iso"]
        for r in isotonic_fit(df, "x", "y").collect()
    }
    buckets = {}
    for x, y in rows:
        sy, n = buckets.get(x, (0.0, 0))
        buckets[x] = (sy + y, n + 1)
    want = _pav_reference([(x, sy, n) for x, (sy, n) in buckets.items()])
    assert set(got) == set(want)
    for x in got:
        assert got[x] == pytest.approx(round(want[x], 6), abs=1e-9), x
    # monotone non-decreasing by construction
    xs = sorted(got)
    assert all(got[a] <= got[b] + 1e-12 for a, b in zip(xs, xs[1:]))


def test_isotonic_already_monotone_is_identity(spark):
    from weaviate_txtai_spark.operators.isotonic import isotonic_fit

    rows = [(0, 0.0), (0, 0.0), (1, 0.0), (1, 1.0), (2, 1.0), (2, 1.0)]
    df = spark.createDataFrame(rows, "x int, y double")
    got = {r["x"]: (r["y_mean"], r["y_iso"])
           for r in isotonic_fit(df, "x", "y").collect()}
    assert got == {0: (0.0, 0.0), 1: (0.5, 0.5), 2: (1.0, 1.0)}


def test_isotonic_pools_violation(spark):
    from weaviate_txtai_spark.operators.isotonic import isotonic_fit

    # means 1.0 then 0.0 -> pooled to 0.5 on both buckets
    rows = [(0, 1.0), (1, 0.0)]
    df = spark.createDataFrame(rows, "x int, y double")
    got = {r["x"]: r["y_iso"] for r in isotonic_fit(df, "x", "y").collect()}
    assert got == {0: 0.5, 1: 0.5}


# ---------------------------------------------------------- apportionment


def test_apportion_sums_to_total_and_matches_hand_case(spark):
    from weaviate_txtai_spark.operators.sharding import (
        largest_remainder_apportion,
    )

    # classic Hamilton example: quotas 4.7, 3.4, 1.9 for total 10
    df = spark.createDataFrame(
        [("a", 47), ("b", 34), ("c", 19)], "k string, w long"
    )
    got = {r["k"]: r["alloc"]
           for r in largest_remainder_apportion(df, "k", "w", total=10)
           .collect()}
    assert got == {"a": 5, "b": 3, "c": 2}
    assert sum(got.values()) == 10


def test_apportion_remainder_tie_breaks_on_key(spark):
    from weaviate_txtai_spark.operators.sharding import (
        largest_remainder_apportion,
    )

    # equal weights, total not divisible: extras go to smallest keys
    df = spark.createDataFrame(
        [("a", 1), ("b", 1), ("c", 1)], "k string, w long"
    )
    got = {r["k"]: r["alloc"]
           for r in largest_remainder_apportion(df, "k", "w", total=4)
           .collect()}
    assert got == {"a": 2, "b": 1, "c": 1}


def test_apportion_zero_and_negative_weights(spark):
    from weaviate_txtai_spark.operators.sharding import (
        largest_remainder_apportion,
    )

    df = spark.createDataFrame(
        [("a", 10), ("z", 0), ("n", -5)], "k string, w long"
    )
    got = {r["k"]: r["alloc"]
           for r in largest_remainder_apportion(df, "k", "w", total=7)
           .collect()}
    assert got["a"] == 7 and got["z"] == 0 and got["n"] == 0
    with pytest.raises(ValueError):
        largest_remainder_apportion(df, "k", "w", total=-1)


def test_apportion_aggregates_duplicate_keys(spark):
    from weaviate_txtai_spark.operators.sharding import (
        largest_remainder_apportion,
    )

    df = spark.createDataFrame(
        [("a", 30), ("a", 17), ("b", 53)], "k string, w long"
    )
    got = {r["k"]: (r["weight"], r["alloc"])
           for r in largest_remainder_apportion(df, "k", "w", total=100)
           .collect()}
    assert got == {"a": (47, 47), "b": (53, 53)}


# ------------------------------------------------------------ Good-Turing


def test_good_turing_hand_counts(spark):
    from weaviate_txtai_spark.operators.lm import good_turing_rstar

    # corpus: a a a b b c d  -> counts: a=3, b=2, c=1, d=1
    # N1=2, N2=1, N3=1, T=7
    docs = spark.createDataFrame(
        [(1, "a a a b b c d")], "doc_id long, text string"
    )
    rows = {r["r"]: r for r in good_turing_rstar(docs, max_r=3).collect()}
    assert rows[1]["n_r"] == 2
    # r*=2*N2/N1 = 2*1/2 = 1.0 ; r*(2) = 3*N3/N2 = 3
    assert rows[1]["r_star"] == pytest.approx(1.0)
    assert rows[2]["r_star"] == pytest.approx(3.0)
    assert rows[3]["r_star"] is None  # N4 = 0
    for r in rows.values():
        assert r["p_unseen"] == pytest.approx(round(2 / 7, 6))


def test_good_turing_no_hapaxes_gives_zero_unseen(spark):
    from weaviate_txtai_spark.operators.lm import good_turing_rstar

    docs = spark.createDataFrame(
        [(1, "a a b b")], "doc_id long, text string"
    )
    rows = good_turing_rstar(docs, max_r=5).collect()
    assert rows and all(r["p_unseen"] == 0.0 for r in rows)


def test_good_turing_bigram_mode_and_validation(spark):
    from weaviate_txtai_spark.operators.lm import good_turing_rstar

    docs = spark.createDataFrame(
        [(1, "a b a b c")], "doc_id long, text string"
    )
    # bigrams: "a b" x2, "b a" x1, "b c" x1 -> N1=2, N2=1
    rows = {r["r"]: r
            for r in good_turing_rstar(docs, max_r=2, ngram=2).collect()}
    assert rows[1]["n_r"] == 2 and rows[2]["n_r"] == 1
    assert rows[1]["r_star"] == pytest.approx(1.0)
    with pytest.raises(ValueError):
        good_turing_rstar(docs, ngram=3)
    with pytest.raises(ValueError):
        good_turing_rstar(docs, max_r=0)
