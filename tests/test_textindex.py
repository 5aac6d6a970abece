"""operators/textindex.py: persisted inverted index, BM25 from index."""

import shutil
import tempfile

import pytest

from pyspark.sql import functions as F

from weaviate_txtai_spark.operators.bm25 import bm25_scores
from weaviate_txtai_spark.operators.textindex import (
    bm25_from_index,
    build_text_index,
)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (0, "spark join spark vector"),
        (1, "join the table with spark"),
        (2, "vector search over embeddings"),
        (3, "nothing relevant here"),
        (4, "spark spark spark"),
        (5, ""),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


@pytest.fixture(scope="module")
def index_path(spark, corpus):
    d = tempfile.mkdtemp(prefix="textindex_test_")
    build_text_index(corpus, d)
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_index_scores_match_direct_bm25(spark, corpus, index_path):
    terms = ["spark", "vector", "join"]
    direct = {
        r.doc_id: r.score for r in bm25_scores(corpus, terms).collect()
    }
    from_idx = {
        r.doc_id: r.score
        for r in bm25_from_index(spark, index_path, terms).collect()
    }
    assert from_idx == direct
    assert set(from_idx) == {0, 1, 2, 4}  # doc 3/5 match no term


def test_single_term_query(spark, index_path):
    got = {
        r.doc_id: r.score
        for r in bm25_from_index(spark, index_path, ["embeddings"]).collect()
    }
    assert set(got) == {2}


def test_empty_query_raises(spark, index_path):
    with pytest.raises(ValueError):
        bm25_from_index(spark, index_path, [])


def test_unknown_term_empty(spark, index_path):
    assert bm25_from_index(spark, index_path, ["zzzzz"]).count() == 0


def test_partition_pruning_in_plan(spark, index_path):
    df = bm25_from_index(spark, index_path, ["spark"])
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the postings scan must carry a bucket partition filter (pruned
    # read) and the term filter must be pushed into the row groups
    assert "PartitionFilters" in plan
    seg = plan[plan.index("PartitionFilters"):]
    assert "bucket" in seg[:200]
    assert "PushedFilters" in plan
