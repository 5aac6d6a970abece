"""profile.trimmed_means / k_anonymity_report, scd.log_state_as_of."""

import pytest

from weaviate_txtai_spark.operators.profile import (
    k_anonymity_report,
    trimmed_means,
)
from weaviate_txtai_spark.operators.scd import log_state_as_of


def test_trimmed_and_winsor_means(spark):
    # 1..10 with band [P10, P90] (interpolated: 1.9 and 9.1)
    rows = [("a", float(x)) for x in range(1, 11)]
    df = spark.createDataFrame(rows, ["g", "v"])
    r = trimmed_means(df, "v", group_col="g", lower=0.1, upper=0.9).collect()[0]
    inside = [x for x in range(1, 11) if 1.9 <= x <= 9.1]  # 2..9
    assert r.trimmed_mean == round(sum(inside) / len(inside), 6)
    wins = [min(max(x, 1.9), 9.1) for x in range(1, 11)]
    assert r.winsor_mean == round(sum(wins) / len(wins), 6)
    assert r.n == 10


def test_trimmed_mean_resists_outlier(spark):
    rows = [("a", float(x)) for x in [1, 2, 3, 4, 5, 10**9]]
    df = spark.createDataFrame(rows, ["g", "v"])
    r = trimmed_means(df, "v", group_col="g", lower=0.2, upper=0.8).collect()[0]
    assert r.trimmed_mean < 10  # the 1e9 outlier is outside the band


def test_k_anonymity_report(spark):
    rows = (
        [("US", "M")] * 6 + [("US", "F")] * 2 + [("DE", "F")] * 1
    )
    df = spark.createDataFrame(rows, ["country", "sex"])
    r = k_anonymity_report(df, ["country", "sex"], k=5).collect()[0]
    assert (r.n_rows, r.n_groups) == (9, 3)
    assert (r.risky_groups, r.risky_rows) == (2, 3)
    assert r.risky_frac == round(3 / 9, 6)
    with pytest.raises(ValueError):
        k_anonymity_report(df, [])


def test_log_state_as_of(spark):
    rows = [
        (1, "a1", 1, "upsert"),
        (2, "b1", 2, "upsert"),
        (1, "a2", 3, "upsert"),
        (2, None, 4, "delete"),
        (3, "c1", 5, "upsert"),
        (2, "b2", 6, "upsert"),
    ]
    log = spark.createDataFrame(rows, ["k", "payload", "version", "op"])

    def state(v):
        return {
            r.k: r.payload
            for r in log_state_as_of(
                log, key_cols=["k"], as_of=v
            ).collect()
        }

    assert state(1) == {1: "a1"}
    assert state(3) == {1: "a2", 2: "b1"}
    assert state(4) == {1: "a2"}          # key 2 deleted
    assert state(None) == {1: "a2", 2: "b2", 3: "c1"}


def test_log_state_duplicate_version_raises(spark):
    rows = [(1, "x", 1, "upsert"), (1, "y", 1, "upsert")]
    log = spark.createDataFrame(rows, ["k", "payload", "version", "op"])
    with pytest.raises(ValueError):
        log_state_as_of(log, key_cols=["k"])
