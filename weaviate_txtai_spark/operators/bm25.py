"""Batch BM25 scoring and hybrid (lexical + vector) retrieval.

txtai's SQL surface exposes `similar()` (vector-only); its ecosystem
pairs that with lexical scoring and hybrid fusion. Here both are batch
DataFrame plans:

- ``bm25_scores``: Okapi BM25 (Lucene's idf variant: ln(1 + (N-df+0.5)/
  (df+0.5))) for a fixed query-term set against the whole corpus.
  Shuffle profile: the corpus NEVER shuffles at term granularity — doc
  length is a map-only token_count carried through the explode, so the
  only shuffles are the groupBy over query-term hits (O(docs
  containing a query term) rows, not O(docs × vocabulary)), the tiny
  per-term df aggregate (broadcast back), and the 1-row corpus stats.
- Scores are rounded BEFORE ranking wherever ranks feed downstream
  fusion, so rank order is reproducible across engines (float sum order
  never flips a rank).

Reciprocal-rank fusion then needs only the two rank columns:
rrf = Σ 1/(k + rank) over each retriever's top list — implemented
directly in the gate query (plans/queries.py: hybrid_rrf) as an outer
join of the two ranked lists.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from weaviate_txtai_spark.cache import scoped_persist
from weaviate_txtai_spark.functions.text import token_count, tokens
from weaviate_txtai_spark.sources.tables import spread


def bm25_scores(
    docs: DataFrame,
    query_terms: list[str],
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Per-document BM25 score for ``query_terms`` (docs containing none
    of the terms are absent). Returns (doc_id, score) with score rounded
    to 6dp."""
    # doc length rides along through the explode — no doc-term tf table,
    # no corpus-granularity shuffle; only query-term hits survive the
    # filter and reach an aggregate. spread() only wraps the explode
    # branch: the stats branch is a plain map-side aggregate and needs
    # no repartition.
    # NULL ids excluded ONCE, before BOTH branches — one pseudo-doc
    # would otherwise aggregate every unkeyed document's term hits into
    # a single BM25 score, and N/avgdl/df must describe the same corpus
    # that is actually scored (an unkeyed doc can never receive a score
    # or count toward df, so it must not inflate N or skew avgdl).
    docs = docs.filter(F.col(id_col).isNotNull())
    qtf = (
        spread(docs)
        .select(
            F.col(id_col).alias("__id"),
            token_count(text_col).alias("__len"),
            F.explode(tokens(text_col)).alias("__t"),
        )
        .filter(F.col("__t").isin(query_terms))
        .groupBy("__id", "__len", "__t")
        .agg(F.count(F.lit(1)).alias("__tf"))
    )
    # eager: the df broadcast build and the score aggregate fan out
    # concurrently and raced the lazy fill (r14 opt)
    qtf = scoped_persist(qtf, eager=True)
    n_avg = docs.agg(
        F.count(F.lit(1)).alias("__n"),
        F.avg(token_count(text_col)).alias("__avgdl"),
    )
    dfreq = qtf.groupBy("__t").agg(F.count(F.lit(1)).alias("__df"))
    idf = F.log(
        F.lit(1.0)
        + (F.col("__n") - F.col("__df") + 0.5) / (F.col("__df") + 0.5)
    )
    tf_norm = (F.col("__tf") * (k1 + 1)) / (
        F.col("__tf") + k1 * (1 - b + b * F.col("__len") / F.col("__avgdl"))
    )
    return (
        qtf.join(F.broadcast(dfreq), "__t")
        .crossJoin(F.broadcast(n_avg))
        .withColumn("__s", idf * tf_norm)
        .groupBy(F.col("__id").alias(id_col))
        .agg(F.round(F.sum("__s"), 6).alias("score"))
    )


def qlm_scores(
    docs: DataFrame,
    query_terms: list[str],
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    mu: float = 2000.0,
) -> DataFrame:
    """Query-likelihood retrieval with Dirichlet smoothing (Zhai &
    Lafferty, SIGIR 2001 — public knowledge): the language-model IR
    scorer next to BM25's probabilistic-relevance one; the two disagree
    exactly where document length and collection frequency pull apart,
    which is why ensembles fuse both.

    score(d) = Σ_{t∈q} log( (tf_{t,d} + μ·P(t|C)) / (|d| + μ) ),
    computed via the standard decomposition
        Σ_t log(μ·P(t|C)) − |q|·log(|d| + μ)
        + Σ_{t: tf>0} log(1 + tf / (μ·P(t|C)))
    so only HIT rows (docs × matched terms) ever aggregate — the same
    shuffle profile as ``bm25_scores``: corpus scanned once with doc
    length riding the explode, query-term hits are the only
    corpus-dependent shuffle, collection stats are two broadcast
    scalars. Query terms absent from the corpus are dropped (their
    P(t|C) = 0 would zero every document's likelihood; the standard
    practical convention).

    Output: (doc_id, score) for docs containing ≥1 query term, score
    rounded to 6dp (log-likelihoods, negative; higher = better).
    """
    qt = list(dict.fromkeys(query_terms))
    # NULL ids excluded before BOTH the hit branch and the collection
    # stats: unkeyed docs would otherwise merge into one pseudo-doc in
    # the groupBy AND inflate the collection token total / P(t|C)
    # against a corpus that can never be scored.
    docs = docs.filter(F.col(id_col).isNotNull())
    exp = spread(docs).select(
        F.col(id_col).alias("__id"),
        token_count(text_col).alias("__len"),
        F.explode(tokens(text_col)).alias("__t"),
    )
    hits = (
        exp.filter(F.col("__t").isin(qt))
        .groupBy("__id", "__len", "__t")
        .agg(F.count(F.lit(1)).alias("__tf"))
    )
    # eager: the cf broadcast build and the score aggregate fan out
    # concurrently and raced the lazy fill (r14 opt)
    hits = scoped_persist(hits, eager=True)
    ctot = docs.agg(
        F.sum(token_count(text_col)).cast("double").alias("__c")
    )
    cf = (
        hits.groupBy("__t")
        .agg(F.sum("__tf").cast("double").alias("__cf"))
        .crossJoin(F.broadcast(ctot))
        .withColumn("__mup", F.lit(mu) * F.col("__cf") / F.col("__c"))
    )
    consts = cf.agg(
        F.sum(F.log("__mup")).alias("__tc"),
        F.count(F.lit(1)).alias("__nq"),
    )
    return (
        hits.join(F.broadcast(cf.select("__t", "__mup")), "__t")
        .withColumn("__part", F.log(F.lit(1.0) + F.col("__tf") / F.col("__mup")))
        .groupBy("__id", "__len")
        .agg(F.sum("__part").alias("__hs"))
        .crossJoin(F.broadcast(consts))
        .select(
            F.col("__id").alias(id_col),
            F.round(
                F.col("__tc")
                - F.col("__nq") * F.log(F.col("__len") + F.lit(mu))
                + F.col("__hs"),
                6,
            ).alias("score"),
        )
    )
