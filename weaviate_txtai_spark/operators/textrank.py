"""TextRank keyword extraction (Mihalcea & Tarau 2004).

Corpus-level keyterm scoring: build the word co-occurrence graph
(tokens adjacent within a document are linked, both directions —
the undirected window-2 graph of the paper) and rank vertices with
PageRank; the top-ranked vertices are the corpus keywords. Pipelines
use this as the unsupervised companion to frequency lexica: a term
ranks high when it co-occurs with many other well-connected terms,
not merely when it is frequent.

The ranking runs on the FIXED-POINT PageRank (scaled longs, floor
division — see ``graph.pagerank_exact``), so scores are exact
integers and the top-k cut has no float tie hazard; the undirected
construction means no dangling vertices, keeping the oracle's
iteration body dangling-free.

Scale shape: one adjacent-pair explode (narrow, no join), one
distinct (shuffle on the pair), then the pagerank iterations —
one groupBy(dst) partial-agg shuffle each. The vocabulary graph is
many orders smaller than the corpus (|V| terms, not |corpus| tokens):
the explode is the only corpus-sized stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from weaviate_txtai_spark.functions.text import tokens
from weaviate_txtai_spark.operators.graph import pagerank_exact


def cooccurrence_edges(
    docs: DataFrame, *, text_col: str = "text"
) -> DataFrame:
    """Distinct undirected adjacent-token edges (both directions),
    self-loops dropped: ``src, dst``."""
    toks = tokens(text_col)
    n = F.size(toks)
    pairs = docs.select(
        F.explode(
            F.zip_with(
                F.slice(toks, 1, F.greatest(n - 1, F.lit(0))),
                F.slice(toks, 2, F.greatest(n - 1, F.lit(0))),
                lambda a, b: F.struct(a.alias("a"), b.alias("b")),
            )
        ).alias("p")
    ).select(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
    pairs = pairs.filter(F.col("a") != F.col("b"))
    return (
        pairs.select(F.col("a").alias("src"), F.col("b").alias("dst"))
        .unionByName(
            pairs.select(F.col("b").alias("src"), F.col("a").alias("dst"))
        )
        .distinct()
    )


def textrank_terms(
    docs: DataFrame,
    *,
    text_col: str = "text",
    top_k: int = 20,
    iters: int = 3,
) -> DataFrame:
    """Top-``top_k`` TextRank keyterms: ``term, rank_fp`` (fixed-point
    long; divide by 1e12 for the float score), ordered by rank desc
    then term — ties exact by construction."""
    if top_k < 1:
        raise ValueError("textrank_terms: top_k must be >= 1")
    ranks = pagerank_exact(cooccurrence_edges(docs, text_col=text_col),
                           iters=iters)
    return (
        ranks.select(F.col("id").alias("term"), "rank_fp")
        .orderBy(F.desc("rank_fp"), F.asc("term"))
        .limit(top_k)
    )
