"""Exact phrase search over a document corpus via positional postings.

``similar('...')`` (plans/vector.py) answers "about this topic";
BM25/QLM (operators/bm25.py) answer "contains these words"; this
operator answers the third classic IR query the reference's txtai layer
exposes through substring filters: "contains these words CONSECUTIVELY,
in this order" — license strings, quoted passages, exact error
messages.

Scale notes
-----------
The naive plan — ``contains(text, phrase)`` — rescans every byte of the
corpus per query and can never be indexed. The positional-postings plan
here touches only the phrase's own vocabulary:

1. postings: ``posexplode`` of the token array, FILTERED to the
   phrase's terms before anything shuffles — the per-doc cost is
   proportional to how often the phrase's words occur, not to document
   length, and the filter sits in the same codegen stage as the split.
2. each surviving (doc, pos, term) row maps to the candidate start
   position(s) ``pos − i`` for every index i where that term appears
   in the phrase (a phrase with repeated words maps one token to
   several indices — a ``posexplode`` of the index list, so
   "the cat the" is handled exactly).
3. ONE groupBy (doc, start): a start position is a match iff all
   |phrase| indices are present — ``count(DISTINCT idx) = k``. No
   k-way self-join (the textbook postings-intersection does k−1 joins;
   the arithmetic re-key folds them into one aggregate).

Hot stopword-only phrases ("of the") make stage 1 emit many rows —
inherent to the query, still linear, and map-side combined by the
aggregate. A production deployment materializes the unfiltered postings
table once (partitioned by term) and reuses it across queries; the
operator accepts either raw documents or a prebuilt postings frame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from weaviate_txtai_spark.functions.text import tokens


def build_postings(
    docs: DataFrame, *, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Positional postings: one row per token occurrence —
    ``(doc_id, pos, term)``, pos 0-based. Materialize once (partitioned
    by term) to amortize across phrase queries."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(tokens(text_col)).alias("pos", "term"),
    )


def phrase_match(
    source: DataFrame,
    phrase: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    postings: bool = False,
) -> DataFrame:
    """All phrase occurrences: one row per (doc_id, start) where the
    whitespace-token sequence of ``phrase`` occurs verbatim starting at
    0-based token position ``start``.

    ``source`` is the documents frame, or a prebuilt
    :func:`build_postings` frame when ``postings=True``.
    """
    terms = [t for t in phrase.split(" ") if t != ""]
    if not terms:
        raise ValueError("empty phrase")
    k = len(terms)
    post = (
        source
        if postings
        else build_postings(source, id_col=id_col, text_col=text_col)
    )
    # term -> list of phrase indices it occupies (repeated terms: several)
    idx_map = F.map_from_arrays(
        F.array(*[F.lit(t) for t in sorted(set(terms))]),
        F.array(
            *[
                F.array(
                    *[F.lit(i) for i, t2 in enumerate(terms) if t2 == t]
                )
                for t in sorted(set(terms))
            ]
        ),
    )
    hits = (
        post.filter(F.col("term").isin(terms))
        .select(
            "doc_id",
            "pos",
            F.explode(F.element_at(idx_map, F.col("term"))).alias("idx"),
        )
        .filter(F.col("pos") >= F.col("idx"))
        .select(
            "doc_id", (F.col("pos") - F.col("idx")).alias("start"), "idx"
        )
    )
    return (
        hits.groupBy("doc_id", "start")
        .agg(F.countDistinct("idx").alias("__n"))
        .filter(F.col("__n") == k)
        .select("doc_id", F.col("start").cast("int").alias("start"))
    )


def phrase_doc_counts(
    source: DataFrame,
    phrase: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    postings: bool = False,
) -> DataFrame:
    """Per-document occurrence counts for ``phrase``:
    ``(doc_id, n_matches)``, matching docs only."""
    return (
        phrase_match(
            source, phrase, id_col=id_col, text_col=text_col, postings=postings
        )
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_matches"))
    )
