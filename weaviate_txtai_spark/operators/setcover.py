"""Greedy maximum-coverage document selection (set cover).

The coverage-maximizing curation primitive: pick k documents whose
union of tokens (or any item column) covers as much of the vocabulary
as possible — the classic (1−1/e)-approximate greedy algorithm
(Nemhauser et al. 1978), used to seed evaluation sets, pick exemplar
documents per domain, and build compact probe corpora.

Each greedy step is ONE anti-join of the item table against the
covered set plus one groupBy(doc) count and a 1-row TakeOrdered pick —
all integer arithmetic, so the selection trajectory is exactly
replayable in unrolled SQL (gain ties break on the smaller doc id).
The covered set and the pick are eagerly localCheckpointed per step:
k small jobs, lineage never compounds (the order_scc 3^k lesson), and
nothing but 1-row picks ever leaves the executors.

Scale: the item table is the only corpus-sized structure (persisted
once); each step shuffles on the term key. k is small by use-case.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from weaviate_txtai_spark.cache import scoped_persist
from weaviate_txtai_spark.functions.text import tokens


def greedy_set_cover(
    docs: DataFrame,
    k: int,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    ngram: int = 1,
) -> DataFrame:
    """Select up to ``k`` documents greedily maximizing distinct
    token (``ngram=1``) or bigram (``ngram=2``) coverage — bigrams give
    a quadratically richer target space when the raw vocabulary is
    small enough for one document to saturate it.

    Output: ``rank, doc_id, gain`` — gain = newly covered items at
    that step; steps whose best gain is 0 (space exhausted) are
    dropped, so fewer than k rows can return.
    """
    if k < 1:
        raise ValueError("greedy_set_cover: k must be >= 1")
    toks = tokens(text_col)
    if ngram == 1:
        item = F.explode(F.array_distinct(toks))
    elif ngram == 2:
        n = F.size(toks)
        item = F.explode(
            F.array_distinct(
                F.zip_with(
                    F.slice(toks, 1, F.greatest(n - 1, F.lit(0))),
                    F.slice(toks, 2, F.greatest(n - 1, F.lit(0))),
                    lambda a, b: F.concat_ws(" ", a, b),
                )
            )
        )
    else:
        raise ValueError("greedy_set_cover: ngram must be 1 or 2")
    items = scoped_persist(
        # a NULL doc id would lump every unkeyed document's terms into
        # one mega-"document" that wins the first greedy pick
        docs.filter(F.col(id_col).isNotNull())
        .select(F.col(id_col).alias("doc"), item.alias("term"))
        .distinct()
    )
    covered = items.select("term").filter(F.lit(False))
    picks = []
    for step in range(1, k + 1):
        gains = (
            items.join(covered, "term", "left_anti")
            .groupBy("doc")
            .agg(F.count(F.lit(1)).alias("gain"))
        )
        pick = (
            gains.orderBy(F.desc("gain"), F.asc("doc"))
            .limit(1)
            .select(
                F.lit(step).alias("rank"),
                F.col("doc"),
                F.col("gain").cast("long").alias("gain"),
            )
            .localCheckpoint(eager=True)
        )
        picks.append(pick)
        covered = (
            covered.unionByName(
                items.join(pick.select("doc"), "doc").select("term")
            )
            .distinct()
            .localCheckpoint(eager=True)
        )
    out = picks[0]
    for p in picks[1:]:
        out = out.unionByName(p)
    return out.filter(F.col("gain") > 0).select(
        "rank", F.col("doc").alias(id_col), "gain"
    )
