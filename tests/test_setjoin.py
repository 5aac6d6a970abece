"""prefix_filtered_pairs (PPJoin) — exactness vs the all-items join,
prefix-boundary cases, and the float-ceil hazard."""

import pytest
from pyspark.sql import functions as F

from weaviate_txtai_spark.operators.setjoin import (
    jaccard_prefix_pairs,
    prefix_filtered_pairs,
)
from weaviate_txtai_spark.sources.tables import load_table


def _sets(spark, data):
    rows = [(i, it) for i, items in data.items() for it in items]
    return spark.createDataFrame(rows, "id long, item string")


def test_hand_computed_pairs(spark):
    """{a,b,c,d} vs {a,b,c,e}: J = 3/5 = 0.6 — found at θ=0.6, gone at
    θ=0.7; the disjoint set never pairs."""
    df = _sets(
        spark,
        {1: ["a", "b", "c", "d"], 2: ["a", "b", "c", "e"], 3: ["x", "y"]},
    )
    got = prefix_filtered_pairs(
        df, 0.6, id_col="id", item_col="item"
    ).collect()
    assert [(r["d1"], r["d2"], r["jaccard"]) for r in got] == [(1, 2, 0.6)]
    assert (
        prefix_filtered_pairs(df, 0.7, id_col="id", item_col="item").count()
        == 0
    )


def test_float_ceil_boundary_pair_survives(spark):
    """The tight case of the prefix bound: B ⊂ A with |B| = θ·|A| gives
    J = θ EXACTLY and the first common element sits at the LAST correct
    prefix position of A. θ = 3/17, |A| = 85, |B| = 15 is a REAL double
    hazard: 3/17·85 = 15 in rational arithmetic but 15.000000000000002
    in binary, so an un-nudged ⌈θ·n⌉ returns 16, A's prefix shrinks
    from 71 (ending at the first shared item) to 70 (all unique items)
    and the J = θ pair is silently lost; the size-band test
    min ≥ θ·max fails on the same 15 vs 15.0…02 comparison. One pair
    pins both 1e-9 nudges."""
    shared = [f"s{i:02d}" for i in range(15)]
    uniq = [f"u{i:02d}" for i in range(70)]
    df = _sets(spark, {1: uniq + shared, 2: shared})
    out = prefix_filtered_pairs(
        df, 3 / 17, id_col="id", item_col="item"
    ).collect()
    assert [(r["d1"], r["d2"]) for r in out] == [(1, 2)]
    assert out[0]["jaccard"] == pytest.approx(3 / 17, abs=1e-6)


def test_threshold_validation(spark):
    df = _sets(spark, {1: ["a"]})
    with pytest.raises(ValueError, match="threshold"):
        prefix_filtered_pairs(df, 0.0, id_col="id", item_col="item")


def test_matches_all_items_join_on_documents(spark, sf_dir):
    """The PPJoin twin returns EXACTLY the inverted-index join's pairs
    on real near-dup data (same θ, same shingles, same rounding)."""
    from weaviate_txtai_spark.operators.dedup import jaccard_pairs

    docs = load_table(spark, sf_dir, "documents")
    a = {
        (r["d1"], r["d2"]): r["jaccard"]
        for r in jaccard_pairs(docs, threshold=0.8).collect()
    }
    b = {
        (r["d1"], r["d2"]): r["jaccard"]
        for r in jaccard_prefix_pairs(docs, threshold=0.8).collect()
    }
    assert a == b
    assert len(a) > 0, "vacuous: no near-dup pairs at this sf"


def test_duplicate_item_rows_are_deduped(spark):
    """(id, item) duplicates must not inflate sizes or counts."""
    df = _sets(spark, {1: ["a", "a", "b"], 2: ["a", "b", "b"]})
    out = prefix_filtered_pairs(df, 0.9, id_col="id", item_col="item").collect()
    assert [(r["d1"], r["d2"], r["jaccard"]) for r in out] == [(1, 2, 1.0)]
