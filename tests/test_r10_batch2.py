"""Round-10 batch 2: log-rank test and the hash-permutation test."""

import pytest

from pyspark.sql import functions as F


# ------------------------------------------------------------ logrank


def test_logrank_identical_groups_chi2_zero(spark):
    from weaviate_txtai_spark.operators.survival import logrank_test

    rows = []
    for g in ("A", "B"):
        rows += [(g, t, 1) for t in (1, 2, 3, 5, 8)]
        rows += [(g, 9, 0)] * 3
    df = spark.createDataFrame(rows, "g string, t int, e int")
    r = logrank_test(df, "t", "e", "g").collect()[0]
    assert (r.n1, r.n2) == (8, 8)
    assert r.o1 == 5
    # identical curves: O1 == E1 exactly (every split is half/half)
    assert abs(r.o1 - r.e1) < 1e-5
    assert r.chi2 is not None and r.chi2 < 1e-9


def test_logrank_separated_groups_large_chi2(spark):
    from weaviate_txtai_spark.operators.survival import logrank_test

    rows = [("A", t, 1) for t in range(1, 21)]
    rows += [("B", t + 100, 1) for t in range(1, 21)]
    df = spark.createDataFrame(rows, "g string, t int, e int")
    r = logrank_test(df, "t", "e", "g").collect()[0]
    # group A dies entirely before any B event: maximal separation
    assert r.o1 == 20
    assert r.chi2 > 25


def test_logrank_hand_computed_single_time(spark):
    """One event time: t=1, group A: 2 subjects 1 event; group B: 2
    subjects 0 events, all others censored later. n=4, n1=2, d=1 →
    E1 = 0.5, V = 1·(2/4)(2/4)(3/3) = 0.25, χ² = (1−0.5)²/0.25 = 1."""
    from weaviate_txtai_spark.operators.survival import logrank_test

    rows = [("A", 1, 1), ("A", 5, 0), ("B", 5, 0), ("B", 5, 0)]
    df = spark.createDataFrame(rows, "g string, t int, e int")
    r = logrank_test(df, "t", "e", "g").collect()[0]
    assert r.o1 == 1
    assert r.e1 == 0.5
    assert r.v == 0.25
    assert r.chi2 == 1.0


def test_logrank_validation(spark):
    from weaviate_txtai_spark.operators.survival import logrank_test

    one = spark.createDataFrame([("A", 1, 1)], "g string, t int, e int")
    with pytest.raises(ValueError, match="2 groups"):
        logrank_test(one, "t", "e", "g")
    three = spark.createDataFrame(
        [("A", 1, 1), ("B", 1, 1), ("C", 1, 1)], "g string, t int, e int"
    )
    with pytest.raises(ValueError, match="2 groups"):
        logrank_test(three, "t", "e", "g")


# ------------------------------------------------------- permutation


def _hash_label(u, seed):
    # top bit of the 32-bit Knuth product (the low bit of x·odd is
    # just x's parity — not a permutation at all)
    return ((u + seed) % 2147483648) * 2654435761 % 4294967296 // 2147483648


def test_permutation_test_matches_python_replay(spark):
    from weaviate_txtai_spark.operators.abtest import (
        permutation_test_rates,
    )

    import random

    rng = random.Random(9)
    units = [(u, u % 2, rng.randint(0, 1)) for u in range(500)]
    df = spark.createDataFrame(units, "u long, t int, y int")
    r = permutation_test_rates(df, "u", "t", "y", n_perms=32).collect()[0]

    n1 = sum(1 for _, t, _ in units if t == 1)
    n0 = 500 - n1
    s1 = sum(y for _, t, y in units if t == 1)
    s0 = sum(y for _, t, y in units if t == 0)
    a_obs, b_obs = abs(s1 * n0 - s0 * n1), n1 * n0
    n_ext = 0
    for seed in range(1, 33):
        pn1 = sum(1 for u, _, _ in units if _hash_label(u, seed))
        pn0 = 500 - pn1
        ps1 = sum(y for u, _, y in units if _hash_label(u, seed))
        ps0 = s1 + s0 - ps1
        if pn1 * pn0 == 0 or (
            abs(ps1 * pn0 - ps0 * pn1) * b_obs >= a_obs * (pn1 * pn0)
        ):
            n_ext += 1
    assert (r.n1, r.n0) == (n1, n0)
    assert r.n_extreme == n_ext
    assert r.p_value == round((n_ext + 1) / 33.0, 6)


def test_permutation_test_detects_planted_effect(spark):
    from weaviate_txtai_spark.operators.abtest import (
        permutation_test_rates,
    )

    # huge effect: treated units always convert, controls never
    units = [(u, u % 2, u % 2) for u in range(2000)]
    df = spark.createDataFrame(units, "u long, t int, y int")
    r = permutation_test_rates(df, "u", "t", "y", n_perms=64).collect()[0]
    assert r.obs_diff == 1.0
    # no random split can match a perfect separation
    assert r.n_extreme == 0
    assert r.p_value == round(1 / 65.0, 6)


def test_permutation_test_null_is_not_extreme(spark):
    from weaviate_txtai_spark.operators.abtest import (
        permutation_test_rates,
    )

    import random

    rng = random.Random(21)
    # outcome independent of the label: many permutations at least as
    # extreme as the observed split
    units = [(u, u % 2, rng.randint(0, 1)) for u in range(3000)]
    df = spark.createDataFrame(units, "u long, t int, y int")
    r = permutation_test_rates(df, "u", "t", "y", n_perms=64).collect()[0]
    assert r.p_value > 0.1


def test_permutation_test_validation(spark):
    from weaviate_txtai_spark.operators.abtest import (
        permutation_test_rates,
    )

    df = spark.createDataFrame([(1, 1, 1)], "u long, t int, y int")
    with pytest.raises(ValueError):
        permutation_test_rates(df, "u", "t", "y", n_perms=0)
