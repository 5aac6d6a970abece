"""Out-of-fold target encoding: leakage exclusion, smoothing limits,
row-level application, fold-source validation."""

import pytest

from pyspark.sql import functions as F

from weaviate_txtai_spark.operators.encoding import (
    target_encode,
    target_encoding_map,
)


def _df(spark):
    # cat 'a': fold0 has y=[1,1], fold1 has y=[0]; cat 'b': fold0 y=[0]
    rows = [
        (1, "a", 1.0, 0),
        (2, "a", 1.0, 0),
        (3, "a", 0.0, 1),
        (4, "b", 0.0, 0),
    ]
    return spark.createDataFrame(rows, "id long, cat string, y double, fold int")


def test_oof_mean_excludes_own_fold(spark):
    m = {
        (r["cat"], r["fold"]): (r["n_oof"], r["enc"])
        for r in target_encoding_map(
            _df(spark), "cat", "y", fold_col="fold", n_folds=2, smoothing=0.0
        ).collect()
    }
    # cat a fold 0: OOF rows = fold1 only -> mean 0.0
    assert m[("a", 0)] == (1, 0.0)
    # cat a fold 1: OOF rows = fold0 -> mean 1.0
    assert m[("a", 1)] == (2, 1.0)


def test_smoothing_pulls_to_global_oof_mean(spark):
    m = {
        (r["cat"], r["fold"]): r["enc"]
        for r in target_encoding_map(
            _df(spark), "cat", "y", fold_col="fold", n_folds=2,
            smoothing=1e9,
        ).collect()
    }
    # infinite smoothing: every encoding ~= the fold's global OOF mean
    # fold 0's OOF rows = fold 1 rows = [0.0] -> 0.0
    assert abs(m[("a", 0)] - 0.0) < 1e-6
    # fold 1's OOF = fold 0 rows = [1,1,0] -> 2/3
    assert abs(m[("a", 1)] - 2 / 3) < 1e-6


def test_row_level_application_joins_mapping(spark):
    out = target_encode(
        _df(spark), "cat", "y", fold_col="fold", n_folds=2, smoothing=0.0
    )
    got = {r["id"]: r["te"] for r in out.collect()}
    assert got[1] == 0.0 and got[2] == 0.0  # a/fold0 encoded from fold1
    assert got[3] == 1.0  # a/fold1 encoded from fold0


def test_hash_folds_are_deterministic(spark):
    df = _df(spark)
    a = target_encoding_map(df, "cat", "y", id_col="id", n_folds=3).collect()
    b = target_encoding_map(df, "cat", "y", id_col="id", n_folds=3).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_fold_source_validation(spark):
    df = _df(spark)
    with pytest.raises(ValueError, match="exactly one"):
        target_encoding_map(df, "cat", "y", n_folds=2)
    with pytest.raises(ValueError, match="exactly one"):
        target_encoding_map(
            df, "cat", "y", id_col="id", fold_col="fold", n_folds=2
        )
    with pytest.raises(ValueError, match="n_folds"):
        target_encoding_map(df, "cat", "y", id_col="id", n_folds=1)


def test_null_rows_excluded(spark):
    rows = [(1, "a", 1.0, 0), (2, None, 1.0, 0), (3, "a", None, 1)]
    df = spark.createDataFrame(
        rows, "id long, cat string, y double, fold int"
    )
    out = target_encoding_map(
        df, "cat", "y", fold_col="fold", n_folds=2, smoothing=0.0
    ).collect()
    # only the one valid row survives -> single (a, 0) cell, 0 OOF rows
    assert len(out) == 1 and out[0]["n_oof"] == 0
