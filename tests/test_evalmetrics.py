"""ranking_metrics / macro_metrics — hand-computable fixtures.

Tiny rankings whose recall/MRR/AP/nDCG are worked out by hand, plus the
degenerate cases (no hits, empty relevant set, graded relevance)."""

import math

import pytest
from pyspark.sql import functions as F

from weaviate_txtai_spark.operators.evalmetrics import (
    macro_metrics,
    ranking_metrics,
)


def _results(spark, rows):
    return spark.createDataFrame(rows, "query_id long, doc_id long, rank long")


def _truth(spark, rows, graded=False):
    schema = (
        "query_id long, doc_id long, rel double"
        if graded
        else "query_id long, doc_id long"
    )
    return spark.createDataFrame(rows, schema)


def test_hand_computed_binary(spark):
    """q1: ranking [A✓, B✗, C✓] vs relevant {A, C, D}, k=3.
    recall 2/3, precision 2/3, mrr 1, AP (1/1 + 2/3)/min(3,3)=5/9,
    DCG 1/log2(2)+1/log2(4)=1.5, IDCG 1+1/log2(3)+0.5 → ndcg."""
    res = _results(spark, [(1, 10, 1), (1, 20, 2), (1, 30, 3)])
    tr = _truth(spark, [(1, 10), (1, 30), (1, 40)])
    row = ranking_metrics(res, tr, 3).collect()[0]
    assert row["recall_at_k"] == pytest.approx(2 / 3, abs=1e-6)
    assert row["precision_at_k"] == pytest.approx(2 / 3, abs=1e-6)
    assert row["mrr_at_k"] == 1.0
    assert row["ap_at_k"] == pytest.approx((1 + 2 / 3) / 3, abs=1e-6)
    idcg = 1 + 1 / math.log2(3) + 0.5
    assert row["ndcg_at_k"] == pytest.approx(1.5 / idcg, abs=1e-6)


def test_no_hits_and_k_filter(spark):
    """No relevant doc retrieved → all zeros; rank > k rows ignored
    (the hit at rank 4 must not count at k=3)."""
    res = _results(
        spark, [(1, 10, 1), (1, 20, 2), (1, 30, 3), (1, 40, 4)]
    )
    tr = _truth(spark, [(1, 40)])
    row = ranking_metrics(res, tr, 3).collect()[0]
    for m in ("recall_at_k", "precision_at_k", "mrr_at_k", "ap_at_k",
              "ndcg_at_k"):
        assert row[m] == 0.0, m


def test_empty_relevant_set_scores_zero(spark):
    """A query absent from truth keeps its row with zero metrics (the
    guard coalesces, it doesn't divide by zero or drop)."""
    res = _results(spark, [(1, 10, 1), (2, 10, 1)])
    tr = _truth(spark, [(1, 10)])
    rows = {r["query_id"]: r for r in ranking_metrics(res, tr, 1).collect()}
    assert rows[1]["recall_at_k"] == 1.0
    assert rows[2]["recall_at_k"] == 0.0
    assert rows[2]["ndcg_at_k"] == 0.0


def test_graded_relevance_ndcg(spark):
    """Graded rel: system ranks the rel=1 doc above the rel=3 doc, so
    nDCG = (1/log2(2) + 3/log2(3)) / (3/log2(2) + 1/log2(3))."""
    res = _results(spark, [(1, 10, 1), (1, 20, 2)])
    tr = _truth(spark, [(1, 10, 1.0), (1, 20, 3.0)], graded=True)
    row = ranking_metrics(res, tr, 2, rel_col="rel").collect()[0]
    dcg = 1 / math.log2(2) + 3 / math.log2(3)
    idcg = 3 / math.log2(2) + 1 / math.log2(3)
    assert row["ndcg_at_k"] == pytest.approx(dcg / idcg, abs=1e-6)


def test_perfect_ranking_is_all_ones(spark):
    res = _results(spark, [(1, 10, 1), (1, 20, 2)])
    tr = _truth(spark, [(1, 10), (1, 20)])
    row = ranking_metrics(res, tr, 2).collect()[0]
    for m in ("recall_at_k", "precision_at_k", "mrr_at_k", "ap_at_k",
              "ndcg_at_k"):
        assert row[m] == 1.0, m


def test_macro_average(spark):
    """Macro over one perfect and one zero query = 0.5 everywhere."""
    res = _results(spark, [(1, 10, 1), (2, 20, 1)])
    tr = _truth(spark, [(1, 10), (2, 99)])
    macro = macro_metrics(ranking_metrics(res, tr, 1)).collect()[0]
    assert macro["n_queries"] == 2
    assert macro["macro_recall_at_k"] == 0.5
    assert macro["macro_ndcg_at_k"] == 0.5
