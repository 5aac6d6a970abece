"""Round-9 batch 3: TextRank keyterms, multi-source BFS hops."""

import pytest

from pyspark.sql import functions as F


# -------------------------------------------------------------- TextRank


def test_textrank_hub_term_wins(spark):
    from weaviate_txtai_spark.operators.textrank import textrank_terms

    # 'hub' is adjacent to many distinct terms; satellites only to hub
    docs = spark.createDataFrame(
        [(i, "hub sat%d" % i) for i in range(8)]
        + [(100, "lone pair"), (101, "pair lone")],
        "doc_id long, text string",
    )
    got = textrank_terms(docs, top_k=3).collect()
    assert got[0]["term"] == "hub"
    assert got[0]["rank_fp"] > got[1]["rank_fp"]


def test_textrank_edges_undirected_no_selfloops(spark):
    from weaviate_txtai_spark.operators.textrank import cooccurrence_edges

    docs = spark.createDataFrame(
        [(1, "a b b c a")], "doc_id long, text string"
    )
    got = {(r["src"], r["dst"]) for r in cooccurrence_edges(docs).collect()}
    # pairs: (a,b), (b,b)->dropped, (b,c), (c,a); both directions each
    want = {
        ("a", "b"), ("b", "a"),
        ("b", "c"), ("c", "b"),
        ("c", "a"), ("a", "c"),
    }
    assert got == want


def test_textrank_rejects_bad_k(spark):
    from weaviate_txtai_spark.operators.textrank import textrank_terms

    docs = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError):
        textrank_terms(docs, top_k=0)


# ------------------------------------------------------------------- BFS


def _edges(spark, pairs):
    both = [(a, b) for a, b in pairs] + [(b, a) for a, b in pairs]
    return spark.createDataFrame(both, "src string, dst string")


def test_bfs_hand_graph_distances(spark):
    from weaviate_txtai_spark.operators.graph import bfs_hops

    # a - b - c - d - e  plus shortcut a - c
    e = _edges(spark, [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"),
                       ("a", "c")])
    seeds = spark.createDataFrame([("a",)], "node string")
    got = {r["node"]: r["dist"]
           for r in bfs_hops(e, seeds, max_hops=3).collect()}
    assert got == {"a": 0, "b": 1, "c": 1, "d": 2, "e": 3}


def test_bfs_cutoff_excludes_far_nodes(spark):
    from weaviate_txtai_spark.operators.graph import bfs_hops

    e = _edges(spark, [("a", "b"), ("b", "c"), ("c", "d")])
    seeds = spark.createDataFrame([("a",)], "node string")
    got = {r["node"]: r["dist"]
           for r in bfs_hops(e, seeds, max_hops=2).collect()}
    assert got == {"a": 0, "b": 1, "c": 2}


def test_bfs_multi_source_takes_min(spark):
    from weaviate_txtai_spark.operators.graph import bfs_hops

    e = _edges(spark, [("a", "b"), ("b", "c"), ("c", "d")])
    seeds = spark.createDataFrame([("a",), ("d",)], "node string")
    got = {r["node"]: r["dist"]
           for r in bfs_hops(e, seeds, max_hops=3).collect()}
    assert got == {"a": 0, "d": 0, "b": 1, "c": 1}


def test_bfs_hop0_and_isolated_seed(spark):
    from weaviate_txtai_spark.operators.graph import bfs_hops

    e = _edges(spark, [("a", "b")])
    seeds = spark.createDataFrame([("a",), ("z",)], "node string")
    got = {r["node"]: r["dist"]
           for r in bfs_hops(e, seeds, max_hops=0).collect()}
    assert got == {"a": 0, "z": 0}
    with pytest.raises(ValueError):
        bfs_hops(e, seeds, max_hops=-1)


def test_bfs_directed_semantics(spark):
    from weaviate_txtai_spark.operators.graph import bfs_hops

    e = spark.createDataFrame([("a", "b"), ("c", "b")], "src string, dst string")
    seeds = spark.createDataFrame([("a",)], "node string")
    got = {r["node"]: r["dist"]
           for r in bfs_hops(e, seeds, max_hops=3).collect()}
    assert got == {"a": 0, "b": 1}  # c unreachable along direction
