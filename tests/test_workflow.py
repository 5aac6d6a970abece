"""Workflow surface parity (reference README.md:30-43, api.http:4-24):
the exact index-then-search flow the reference's API examples run."""

import pytest

from weaviate_txtai_spark.embeddings import Embeddings
from weaviate_txtai_spark.workflow import Workflows

HEADLINES = [
    "US tops 5 million confirmed virus cases",
    "Canadas last fully intact ice shelf has suddenly collapsed, "
    "forming a Manhattan-sized iceberg",
    "Beijing mobilises invasion craft along coast as Taiwan tensions escalate",
    "The National Park Service warns against sacrificing slower friends "
    "in a bear attack",
    "Maine man wins $1M from $25 lottery ticket",
    "Make huge profits without work, earn up to $100,000 a day",
]


def test_index_then_search_workflow(spark):
    emb = Embeddings(spark)
    wf = Workflows(emb)
    ids = wf.run("index", HEADLINES)
    assert ids == list(range(6))
    assert emb.count() == 6

    results = wf.run("search", ["lottery ticket win"], limit=3)
    assert len(results) == 1
    assert results[0][0][0] == "4"  # the lottery headline

    # batched re-index continues the offset, api.http-style repeat POST
    more = wf.run("index", ["another lottery story"])
    assert more == [6]
    assert emb.count() == 7


def test_workflow_batch_slicing(spark):
    emb = Embeddings(spark)
    wf = Workflows(emb, {"index": {"batch": 2, "tasks": ["transform", "index"]}})
    ids = wf.run("index", HEADLINES[:5])
    assert ids == list(range(5))
    assert emb.count() == 5


def test_workflow_transform_only_and_errors(spark):
    emb = Embeddings(spark)
    wf = Workflows(
        emb, {"encode": {"tasks": [{"action": ["nop", "transform"]}]}}
    )
    vecs = wf.run("encode", ["some text"])
    assert len(vecs) == 1 and len(vecs[0]) == emb.encoder.dim
    with pytest.raises(KeyError):
        wf.run("nope", ["x"])
    with pytest.raises(ValueError):
        Workflows(emb, {"bad": {"tasks": ["explode"]}})
