"""Exact top-k heavy hitters with bounded-memory candidate pruning.

``tokens -> groupBy(term).count() -> top-k`` is correct but shuffles one
partial count per DISTINCT term per partition — at 100 TB of web text
the vocabulary is billions of terms (typos, ids, urls), so the shuffle
and the reduce-side hash tables are vocabulary-sized even though only
the top few thousand terms matter.

The classic two-phase fix (Misra–Gries 1982 summaries, merged as in
Agarwal et al., "Mergeable Summaries", PODS 2012):

1. **Candidate pass** — each input partition streams its terms through a
   Misra–Gries summary with ``capacity`` counters (mapInPandas,
   Arrow-batched; memory O(capacity) per task regardless of vocabulary).
   MG guarantees: any term with partition count > n_p/(capacity+1)
   survives partition p. Summing over partitions, any term with GLOBAL
   count > N/(capacity+1) survives in at least one partition — so the
   union of per-partition candidates is a superset of every sufficiently
   frequent term.
2. **Verify pass** — exact counts for candidate terms only (semi-join on
   the broadcast candidate set, then groupBy). The shuffle now carries
   at most capacity x partitions partial counts instead of the
   vocabulary.

The result equals the exact top-k whenever the k-th verified count is
> N/(capacity+1) (the guarantee radius covers rank k). The operator
CHECKS that condition and, when it fails (capacity too small for the
distribution), transparently falls back to the full exact aggregate —
so callers always get exact answers; capacity only tunes the shuffle.

The reference has no corpus-statistics surface at all; this extends the
text-analysis family (tfidf_top_terms / bigram_top) with the
bounded-memory scale path.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from weaviate_txtai_spark.cache import scoped_persist
from weaviate_txtai_spark.functions.text import tokens

# term=NULL rows are per-partition stream-length markers (tokens() drops
# empties, so no real term is NULL) — they ride along so the total N
# needed by the guarantee check costs no extra corpus pass
_SUMMARY_SCHEMA = StructType(
    [
        StructField("term", StringType(), True),
        StructField("n", LongType(), False),
    ]
)


def _mg_summary(batches: Iterator[pd.DataFrame], capacity: int):
    """Misra–Gries over one partition's term stream: keep <= capacity
    counters; on overflow decrement all (zeros dropped). Memory is
    O(capacity) whatever the vocabulary. Emits the surviving terms plus
    one NULL-term marker row carrying the partition's stream length."""
    counters: dict[str, int] = {}
    n = 0
    for pdf in batches:
        n += len(pdf)
        for term in pdf["term"]:
            if term in counters:
                counters[term] += 1
            elif len(counters) < capacity:
                counters[term] = 1
            else:
                # decrement-all; amortized O(1) per element (every
                # decrement pays back an earlier increment)
                drop = [t for t, c in counters.items() if c <= 1]
                for t in drop:
                    del counters[t]
                for t in counters:
                    counters[t] -= 1
    yield pd.DataFrame(
        {"term": list(counters.keys()) + [None], "n": [0] * len(counters) + [n]}
    )


def exact_top_tokens(
    docs: DataFrame,
    k: int = 20,
    *,
    text_col: str = "text",
    capacity: int = 4096,
) -> DataFrame:
    """Exact global top-k terms as (term, n_occ), ties broken by term.

    ``capacity`` bounds per-task summary memory and the verify-shuffle
    width; it never affects the result (see module docstring — the
    guarantee is checked and the operator falls back to the full
    aggregate if the distribution defeats the chosen capacity).

    Two passes over the corpus (candidates, verify) — the same I/O as
    any two-phase exact algorithm; the saving vs the naive plan is the
    shuffle and reduce-side state, capacity x partitions instead of the
    full vocabulary. The summary table itself is tiny and persisted via
    :func:`~weaviate_txtai_spark.cache.scoped_persist` (it feeds both
    the candidate broadcast and the total-count check).
    """
    terms = docs.select(F.explode(tokens(text_col)).alias("term"))

    cap = int(capacity)
    summary = scoped_persist(
        terms.mapInPandas(lambda it: _mg_summary(it, cap), _SUMMARY_SCHEMA)
    )
    total = summary.filter(F.col("term").isNull()).agg(F.sum("n")).collect()[0][0] or 0
    cands = summary.filter(F.col("term").isNotNull()).select("term").distinct()
    # candidate cardinality <= capacity x partitions: small by
    # construction, broadcast it into the verify scan
    verified = (
        terms.join(F.broadcast(cands), "term")
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("n_occ"))
        .orderBy(F.desc("n_occ"), F.asc("term"))
        .limit(k)
    )
    rows = verified.collect()
    # guarantee radius: every term with count > total/(capacity+1) is a
    # candidate, so the verified top-k is THE top-k iff rank k clears it
    # (ties at rank k all clear it too, so tie-break order is also exact)
    if len(rows) >= k and rows[-1]["n_occ"] > total / (cap + 1):
        return docs.sparkSession.createDataFrame(rows, verified.schema)
    # distribution too flat for this capacity (or vocab < k): fall back
    # to the full exact aggregate — what a plain engine would always pay
    return (
        terms.groupBy("term")
        .agg(F.count(F.lit(1)).alias("n_occ"))
        .orderBy(F.desc("n_occ"), F.asc("term"))
        .limit(k)
    )
