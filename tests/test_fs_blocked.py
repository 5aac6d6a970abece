"""Parity pins for the enumeration-free Fellegi–Sunter paths:
fs_weights_blocked == fs_weights and fs_topk_blocked == full scoring,
on randomized blocked inputs."""

import random

import pytest

from pyspark.sql import functions as F


def _tables(spark, seed=7, n=120):
    rng = random.Random(seed)
    a_rows, b_rows = [], []
    for i in range(n):
        blk = rng.randint(0, 3)
        seg = rng.choice(["s1", "s2", "s3"])
        name = f"n{rng.randint(0, 20)}"
        a_rows.append((i, blk, seg, name))
        # perturbed copy: same key, sometimes changed fields
        seg_b = seg if rng.random() < 0.7 else rng.choice(["s1", "s2", "s3"])
        name_b = name if rng.random() < 0.6 else f"n{rng.randint(0, 20)}"
        b_rows.append((i, blk, seg_b, name_b))
    a = spark.createDataFrame(
        a_rows, "ak long, an int, aseg string, aname string"
    )
    b = spark.createDataFrame(
        b_rows, "bk long, bn int, bseg string, bname string"
    )
    return a, b


def _pairs(a, b):
    return a.join(b, F.col("an") == F.col("bn")).select(
        "ak", "bk",
        (F.col("ak") == F.col("bk")).alias("is_match"),
        (F.col("aseg") == F.col("bseg")).alias("eq_seg"),
        (F.col("aname") == F.col("bname")).alias("eq_name"),
    )


_FIELDS = {"eq_seg": ("aseg", "bseg"), "eq_name": ("aname", "bname")}


def test_blocked_weights_equal_pair_weights(spark):
    from weaviate_txtai_spark.operators.recordlinkage import (
        fs_weights,
        fs_weights_blocked,
    )

    a, b = _tables(spark)
    w_pairs = fs_weights(_pairs(a, b), ["eq_seg", "eq_name"], "is_match")
    w_blk = fs_weights_blocked(
        a, b, a_key="ak", b_key="bk", a_block="an", b_block="bn",
        fields=_FIELDS,
    )
    assert w_pairs == w_blk  # bit-identical weights


def test_topk_blocked_equals_full_enumeration(spark):
    from weaviate_txtai_spark.operators.recordlinkage import (
        fs_score,
        fs_topk_blocked,
        fs_weights_blocked,
    )

    a, b = _tables(spark, seed=13)
    w = fs_weights_blocked(
        a, b, a_key="ak", b_key="bk", a_block="an", b_block="bn",
        fields=_FIELDS,
    )
    for k in (5, 40, 200):
        full = (
            fs_score(_pairs(a, b), w)
            .orderBy(F.desc("score"), "ak", "bk")
            .limit(k)
            .select("ak", "bk", "score")
            .collect()
        )
        fast = (
            fs_topk_blocked(
                a, b, w, k,
                a_key="ak", b_key="bk", a_block="an", b_block="bn",
                fields=_FIELDS,
            )
            .orderBy(F.desc("score"), "ak", "bk")
            .limit(k)
            .select("ak", "bk", "score")
            .collect()
        )
        assert fast == full, k


def test_topk_blocked_null_fields_are_disagreement(spark):
    from weaviate_txtai_spark.operators.recordlinkage import (
        fs_score,
        fs_topk_blocked,
    )

    a = spark.createDataFrame(
        [(1, 0, None, "x"), (2, 0, "s", "y")],
        "ak long, an int, aseg string, aname string",
    )
    b = spark.createDataFrame(
        [(1, 0, None, "x"), (2, 0, "s", "z")],
        "bk long, bn int, bseg string, bname string",
    )
    w = {"eq_seg": (1.0, -1.0), "eq_name": (2.0, -2.0)}
    fast = (
        fs_topk_blocked(
            a, b, w, 10,
            a_key="ak", b_key="bk", a_block="an", b_block="bn",
            fields=_FIELDS,
        )
        .orderBy(F.desc("score"), "ak", "bk")
        .select("ak", "bk", "score")
        .collect()
    )
    full = (
        fs_score(_pairs(a, b), w)
        .orderBy(F.desc("score"), "ak", "bk")
        .select("ak", "bk", "score")
        .collect()
    )
    assert fast == full
    # NULL seg on both sides is a DISAGREEMENT, not a match
    top = fast[0]
    assert top["score"] == 1.0  # name agree (+2), seg disagree (-1)


def test_topk_blocked_validation_and_cap(spark):
    from weaviate_txtai_spark.operators.recordlinkage import (
        fs_topk_blocked,
    )

    a, b = _tables(spark, seed=3, n=30)
    w = {"eq_seg": (1.0, -1.0), "eq_name": (2.0, -2.0)}
    with pytest.raises(ValueError):
        fs_topk_blocked(
            a, b, w, 0,
            a_key="ak", b_key="bk", a_block="an", b_block="bn",
            fields=_FIELDS,
        )
    with pytest.raises(ValueError):
        fs_topk_blocked(
            a, b, w, 10,
            a_key="ak", b_key="bk", a_block="an", b_block="bn",
            fields=_FIELDS, enumeration_cap=1,
        )
