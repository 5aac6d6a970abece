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
    # NULL ids excluded: a grouped/aggregated NULL doc_id would surface
    # a pseudo-doc in match counts (k=1 phrases never join on doc_id,
    # so nothing downstream filters it implicitly)
    return docs.filter(F.col(id_col).isNotNull()).select(
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


def multi_phrase_match(
    source: DataFrame,
    phrases: "dict[str, str] | list[str]",
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    postings: bool = False,
) -> DataFrame:
    """All occurrences of EVERY phrase in one pass: rows
    ``(doc_id, phrase, start)``. ``phrases`` is a list (each phrase is
    its own id) or a {phrase_id: phrase_text} dict.

    The blocklist/dictionary form of :func:`phrase_match` — a 10k-entry
    banned-phrase sweep is ONE postings filter + ONE aggregate, not 10k
    ``contains()`` corpus rescans. Each token maps to every
    (phrase_id, position) slot it fills across the whole dictionary
    (a broadcast-literal map, bounded by Σ phrase lengths); the
    pos − idx re-key and the countDistinct-equals-length check then run
    for all phrases in the same shuffle, with per-phrase lengths joined
    from a broadcast table.
    """
    if isinstance(phrases, dict):
        items = list(phrases.items())
    else:
        items = [(p, p) for p in phrases]
    if not items:
        raise ValueError("no phrases")
    parsed = {}
    for pid, text in items:
        terms = [t for t in text.split(" ") if t != ""]
        if not terms:
            raise ValueError(f"empty phrase {pid!r}")
        parsed[pid] = terms
    if len(parsed) != len(items):
        raise ValueError("duplicate phrase ids")

    slots: dict[str, list] = {}
    for pid, terms in parsed.items():
        for i, t in enumerate(terms):
            slots.setdefault(t, []).append((pid, i))
    vocab = sorted(slots)
    slot_map = F.map_from_arrays(
        F.array(*[F.lit(t) for t in vocab]),
        F.array(
            *[
                F.array(
                    *[
                        F.struct(
                            F.lit(pid).alias("pid"), F.lit(i).alias("idx")
                        )
                        for pid, i in slots[t]
                    ]
                )
                for t in vocab
            ]
        ),
    )
    spark = source.sparkSession
    lens = F.broadcast(
        spark.createDataFrame(
            [(pid, len(terms)) for pid, terms in parsed.items()],
            ["pid", "__k"],
        )
    )
    post = (
        source
        if postings
        else build_postings(source, id_col=id_col, text_col=text_col)
    )
    hits = (
        post.filter(F.col("term").isin(vocab))
        .select(
            "doc_id",
            "pos",
            F.explode(F.element_at(slot_map, F.col("term"))).alias("s"),
        )
        .filter(F.col("pos") >= F.col("s.idx"))
        .select(
            "doc_id",
            F.col("s.pid").alias("pid"),
            (F.col("pos") - F.col("s.idx")).alias("start"),
            F.col("s.idx").alias("idx"),
        )
    )
    return (
        hits.groupBy("doc_id", "pid", "start")
        .agg(F.countDistinct("idx").alias("__n"))
        .join(lens, "pid")
        .filter(F.col("__n") == F.col("__k"))
        .select(
            "doc_id",
            F.col("pid").alias("phrase"),
            F.col("start").cast("int").alias("start"),
        )
    )
