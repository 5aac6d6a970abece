"""Text-analysis gates: stats, quality, lang-id, TF-IDF, tokenization, normalization, PII, chunk/pack, BM25/hybrid.

Split out of plans/queries.py (round 4); registration order inside a module is
unchanged, and queries.py remains the single registry hub.
"""

from __future__ import annotations

import math
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from weaviate_txtai_spark.functions.vector import cosine_sim
from weaviate_txtai_spark.sources.tables import load_table
from weaviate_txtai_spark.plans.base import QueryFn, _emb, register

_LANG_DIST_SQL = """
SELECT lang, source,
       CAST(count(*) AS BIGINT) AS n_docs,
       round(avg(n_chars), 6) AS avg_chars
FROM documents
GROUP BY lang, source
ORDER BY lang, source
"""


@register("lang_distribution", _LANG_DIST_SQL)
def lang_distribution_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    ds = load_table(spark, sf_dir, "documents")
    return (
        ds.groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("n_chars"), 6).alias("avg_chars"),
        )
        .orderBy("lang", "source")
    )


# --------------------------------------------------------------------------
# Text analysis suite (north-star M3)
# --------------------------------------------------------------------------

# empty-doc guard in the SQL mirrors the Spark side's _per_token (0.0, not x/0)
_TEXT_STATS_SQL = """
SELECT doc_id,
       CAST(len(toks) AS INT) AS n_tokens,
       CAST(len(list_distinct(toks)) AS INT) AS n_unique,
       CASE WHEN len(toks) = 0 THEN 0.0
            ELSE round(len(list_distinct(toks)) * 1.0 / len(toks), 6)
       END AS diversity,
       md5(trim(lower(regexp_replace(text, '\\s+', ' ', 'g')))) AS fp
FROM (SELECT doc_id, text,
             list_filter(string_split(text, ' '), x -> x <> '') AS toks
      FROM documents)
"""


@register("text_stats", _TEXT_STATS_SQL)
def text_stats_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from weaviate_txtai_spark.functions.text import (
        fingerprint,
        lexical_diversity,
        token_count,
        tokens,
    )

    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        token_count("text").alias("n_tokens"),
        F.size(F.array_distinct(tokens("text"))).alias("n_unique"),
        F.round(lexical_diversity("text"), 6).alias("diversity"),
        fingerprint("text").alias("fp"),
    )


_TEXT_QUALITY_SQL = """
SELECT doc_id,
       CASE WHEN len(toks) = 0 THEN 0.0 ELSE
       round(least(len(toks) / 100.0, 1.0) * 0.4
             + (len(list_distinct(toks)) * 1.0 / len(toks)) * 0.3
             + least((len(list_filter(toks, x -> list_contains(
                 ['the','a','of','and','to','in','is','that','it','for',
                  'on','with','as','was','at','by'], x))) * 1.0 / len(toks))
                 * 5.0, 1.0) * 0.3,
             6) END AS quality
FROM (SELECT doc_id,
             list_filter(string_split(text, ' '), x -> x <> '') AS toks
      FROM documents)
"""


@register("text_quality", _TEXT_QUALITY_SQL)
def text_quality_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from weaviate_txtai_spark.functions.text import quality_score

    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", F.round(quality_score("text"), 6).alias("quality")
    )


_TOKENS_BY_SOURCE_SQL = """
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(len(list_filter(string_split(text, ' '), x -> x <> '')))
            AS BIGINT) AS total_tokens
FROM documents
GROUP BY source
ORDER BY source
"""


@register("tokens_by_source", _TOKENS_BY_SOURCE_SQL)
def tokens_by_source_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from weaviate_txtai_spark.functions.text import token_count

    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(token_count("text")).alias("total_tokens"),
        )
        .orderBy("source")
    )


def _lang_id_oracle() -> str:
    """Build the DuckDB argmax-over-profiles SQL from the SAME
    LANG_PROFILES dict the Spark expression uses — one source of truth,
    the oracle can't drift from the engine. Struct max() compares
    (score, lang) fields in order in both engines, so ties break
    identically (lexicographically larger code). Unsegmented scripts
    (UNSEGMENTED_LANGS) score by character containment, mirroring the
    Spark expression."""
    from weaviate_txtai_spark.functions.text import (
        LANG_PROFILES,
        UNSEGMENTED_LANGS,
    )

    def entry(code: str, words: list[str]) -> str:
        if code in UNSEGMENTED_LANGS:
            score = " + ".join(
                f"(CASE WHEN contains(lt, '{w}') THEN 1 ELSE 0 END)"
                for w in words
            )
            return "{'s': " + score + ", 'lang': '" + code + "'}"
        return (
            "{'s': len(list_filter(t, x -> list_contains(["
            + ", ".join(f"'{w}'" for w in words)
            + "], x))), 'lang': '" + code + "'}"
        )

    entries = ", ".join(
        entry(code, words) for code, words in LANG_PROFILES.items()
    )
    return f"""
WITH toks AS (
  SELECT doc_id, lower(text) AS lt,
         list_filter(string_split(lower(text), ' '), x -> x <> '') AS t
  FROM documents
), best AS (
  SELECT doc_id, max(s) AS b
  FROM (SELECT doc_id, unnest([{entries}]) AS s FROM toks)
  GROUP BY doc_id
)
SELECT CASE WHEN b.s > 0 THEN b.lang ELSE 'und' END AS detected_lang,
       CAST(count(*) AS BIGINT) AS n_docs
FROM best GROUP BY 1 ORDER BY 1
"""


@register("lang_id", _lang_id_oracle())
def lang_id_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from weaviate_txtai_spark.functions.text import lang_id

    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.groupBy(lang_id("text").alias("detected_lang"))
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("detected_lang")
    )


# --------------------------------------------------------------------------
# Corpus statistics: TF-IDF and n-gram frequency (text-pipeline vocabulary)
# --------------------------------------------------------------------------

_TFIDF_SQL = """
WITH tok AS (
  SELECT doc_id,
         unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS term
  FROM documents
), tf AS (
  SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2
), dfreq AS (
  SELECT term, count(*) AS df FROM tf GROUP BY 1
), n AS (SELECT count(*) AS n FROM documents)
SELECT doc_id, term, round(tfidf, 6) AS tfidf, rank FROM (
  SELECT tf.doc_id, tf.term,
         tf.tf * ln(CAST(n.n AS DOUBLE) / dfreq.df) AS tfidf,
         CAST(row_number() OVER (
             PARTITION BY tf.doc_id
             ORDER BY tf.tf * ln(CAST(n.n AS DOUBLE) / dfreq.df) DESC,
                      tf.term ASC) AS INT) AS rank
  FROM tf JOIN dfreq ON tf.term = dfreq.term CROSS JOIN n
) WHERE rank <= 3
"""


@register("tfidf_top_terms", _TFIDF_SQL)
def tfidf_top_terms_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF terms per document. Two partial-agg shuffles (doc-term
    tf, then term df); the df table and the corpus-count scalar broadcast
    back onto tf, so the scoring join never shuffles the big side; the
    final window partitions by doc_id."""
    from weaviate_txtai_spark.functions.text import tokens
    from weaviate_txtai_spark.sources.tables import spread

    docs = load_table(spark, sf_dir, "documents")
    tok = spread(docs).select("doc_id", F.explode(tokens("text")).alias("term"))
    # tf feeds BOTH the scoring join and the df aggregate; without persist
    # the tokenize+explode+agg lineage runs twice (plan showed 2 extra
    # document scans). StorageLevel (r14 audit, VERDICT item 6): this
    # table is CORPUS-sized (per-(doc, term) rows), so the explicit
    # MEMORY_AND_DISK_DESER level is a deliberate choice, not an
    # inherited default — Spark's unified memory manager spills cached
    # batches to disk under execution pressure, so the worst case
    # degrades to one disk round-trip of the compressed columnar form,
    # still cheaper than the second tokenize+shuffle pass it replaces;
    # DISK_ONLY would pay that round-trip unconditionally.
    from weaviate_txtai_spark.cache import scoped_persist

    # EAGER: the df aggregate and the scoring join fan out as
    # concurrent stages of one action and raced the lazy fill (r14 opt)
    from pyspark import StorageLevel

    tf = scoped_persist(
        tok.groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf")),
        StorageLevel.MEMORY_AND_DISK_DESER,
        eager=True,
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n = docs.agg(F.count(F.lit(1)).alias("n"))
    # no forced broadcast of dfreq: it is VOCABULARY-sized — billions
    # of rows on a web corpus, far past the 8 GB broadcast cap. AQE
    # broadcasts it while small (it is at every test SF) and falls back
    # to a hash join on term at scale (guide §3.1)
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n))
        .withColumn(
            "tfidf_raw",
            F.col("tf") * F.log(F.col("n").cast("double") / F.col("df")),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("tfidf_raw"), F.asc("term")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("doc_id", "term", F.round("tfidf_raw", 6).alias("tfidf"), "rank")
    )


_BIGRAM_SQL = """
WITH bg AS (
  SELECT doc_id, unnest(list_distinct(list_transform(
           range(1, greatest(len(toks) - 1, 0) + 1),
           i -> array_to_string(list_slice(toks, i, i + 1), ' ')))) AS bigram
  FROM (SELECT doc_id,
               list_filter(string_split(text, ' '), x -> x <> '') AS toks
        FROM documents)
)
SELECT bigram, CAST(count(*) AS BIGINT) AS n_docs
FROM bg GROUP BY bigram
ORDER BY n_docs DESC, bigram ASC
LIMIT 20
"""


@register("bigram_top", _BIGRAM_SQL)
def bigram_top_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 bigrams by document frequency (shingles are distinct per
    doc, so count(*) = doc frequency). orderBy().limit() compiles to
    TakeOrderedAndProject — per-partition heaps, no global sort."""
    from weaviate_txtai_spark.functions.text import shingles
    from weaviate_txtai_spark.sources.tables import spread

    docs = load_table(spark, sf_dir, "documents")
    bg = spread(docs).select(F.explode(shingles("text", 2)).alias("bigram"))
    return (
        bg.groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy(F.desc("n_docs"), F.asc("bigram"))
        .limit(20)
    )


# --------------------------------------------------------------------------
# Chunking / packing / repetition (LLM training-data preparation)
# --------------------------------------------------------------------------

_DOC_CHUNKS_SQL = """
SELECT d.doc_id, CAST(s.start // 100 AS INT) AS chunk_id,
       substr(d.text, CAST(s.start AS INT) + 1, 200) AS chunk_text,
       CAST(length(substr(d.text, CAST(s.start AS INT) + 1, 200)) AS INT)
         AS chunk_len
FROM documents d,
     unnest(generate_series(0, greatest(length(d.text) - 1, 0), 100)) AS s(start)
"""


@register("doc_chunks", _DOC_CHUNKS_SQL)
def doc_chunks_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping 200-char windows with stride 100 — map-only
    explode(sequence)+substring, zero shuffles; chunk_id is the window
    ordinal so downstream joins can reconstruct overlap adjacency."""
    from weaviate_txtai_spark.operators.chunking import chunk_docs

    docs = load_table(spark, sf_dir, "documents")
    return chunk_docs(docs, size=200, stride=100)


_PACK_SEQUENCES_SQL = """
WITH t AS (
  SELECT source, doc_id,
         CAST(length(list_filter(string_split(text, ' '), x -> x <> ''))
              AS BIGINT) AS n_tokens
  FROM documents
), c AS (
  SELECT source, doc_id, n_tokens,
         coalesce(sum(n_tokens) OVER (
           PARTITION BY source ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) AS cum_before
  FROM t
), r AS (
  SELECT source, doc_id, n_tokens,
         CAST(floor(cum_before / 512.0) AS BIGINT) AS raw_pack
  FROM c
)
SELECT source, doc_id, n_tokens,
       CAST(dense_rank() OVER (PARTITION BY source ORDER BY raw_pack) - 1
            AS BIGINT) AS pack_id
FROM r
"""


@register("pack_sequences", _PACK_SEQUENCES_SQL)
def pack_sequences_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-then-split sequence packing into 512-token budgets per
    source (operators/chunking.py) — one window shuffle on source."""
    from weaviate_txtai_spark.operators.chunking import pack_sequences

    docs = load_table(spark, sf_dir, "documents")
    return pack_sequences(docs, budget=512)


_REPETITION_SQL = """
WITH tok AS (
  SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS term
  FROM documents
), tc AS (
  SELECT doc_id, term, count(*) AS c FROM tok GROUP BY 1, 2
)
SELECT doc_id,
       round(max(c) / CAST(sum(c) AS DOUBLE), 6) AS top_token_ratio,
       round(count(*) / CAST(sum(c) AS DOUBLE), 6) AS type_token_ratio
FROM tc GROUP BY 1
"""


@register("docs_repetition", _REPETITION_SQL)
def docs_repetition_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc repetition signals (Gopher-style quality rules): most
    frequent token's share + type/token ratio. Both aggregates are
    partial-aggregatable: the doc-term counts shuffle once on doc_id
    and the per-doc reduction is map-side after that."""
    from weaviate_txtai_spark.functions.text import tokens
    from weaviate_txtai_spark.sources.tables import spread

    docs = load_table(spark, sf_dir, "documents")
    tc = (
        spread(docs)
        .select("doc_id", F.explode(tokens("text")).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    total = F.sum("c").cast("double")
    return tc.groupBy("doc_id").agg(
        F.round(F.max("c") / total, 6).alias("top_token_ratio"),
        F.round(F.count(F.lit(1)) / total, 6).alias("type_token_ratio"),
    )


# --------------------------------------------------------------------------
# Lexical scoring (BM25) + hybrid reciprocal-rank fusion
# --------------------------------------------------------------------------

_BM25_TERMS = ["spark", "vector", "join"]

# term list interpolated from _BM25_TERMS (single source of truth — a
# hardcoded IN-list silently desyncs when the Python list changes);
# doclen LEFT JOINs from documents so zero-token docs stay in n/avgdl,
# matching the Spark side's docs.agg over ALL documents.
_BM25_CORE_SQL = """
WITH tok AS (
  SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS t
  FROM documents
), tf AS (
  SELECT doc_id, t, count(*) AS tf FROM tok GROUP BY 1, 2
), doclen AS (
  SELECT d.doc_id, coalesce(sum(tf.tf), 0) AS len
  FROM documents d LEFT JOIN tf ON d.doc_id = tf.doc_id GROUP BY 1
), stats AS (
  SELECT count(*) AS n, avg(len) AS avgdl FROM doclen
), qtf AS (
  SELECT * FROM tf WHERE t IN (__TERMS__)
), dfreq AS (
  SELECT t, count(*) AS df FROM qtf GROUP BY 1
), scored AS (
  SELECT qtf.doc_id,
         round(sum(
           ln(1 + (stats.n - dfreq.df + 0.5) / (dfreq.df + 0.5))
           * qtf.tf * (1.2 + 1)
           / (qtf.tf + 1.2 * (1 - 0.75 + 0.75 * doclen.len / stats.avgdl))
         ), 6) AS score
  FROM qtf
  JOIN dfreq ON qtf.t = dfreq.t
  JOIN doclen ON qtf.doc_id = doclen.doc_id
  CROSS JOIN stats
  GROUP BY 1
)
""".replace("__TERMS__", ", ".join(f"'{t}'" for t in _BM25_TERMS))

_BM25_TOPK_SQL = (
    _BM25_CORE_SQL
    + "SELECT doc_id, score FROM scored ORDER BY score DESC, doc_id LIMIT 10"
)


@register("bm25_topk", _BM25_TOPK_SQL)
def bm25_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 top-10 for a fixed 3-term query (operators/bm25.py).
    Corpus-sized tables shuffle once each (tf, doclen); term stats
    broadcast; top-k is TakeOrderedAndProject."""
    from weaviate_txtai_spark.operators.bm25 import bm25_scores

    docs = load_table(spark, sf_dir, "documents")
    return (
        bm25_scores(docs, _BM25_TERMS)
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(10)
    )


_HYBRID_RRF_SQL = (
    _BM25_CORE_SQL
    + """
, bmr AS (
  SELECT doc_id, CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS INT) AS r
  FROM scored ORDER BY score DESC, doc_id LIMIT 50
), cos AS (
  SELECT vec_id,
         round(list_cosine_similarity(CAST(embedding AS DOUBLE[]),
               (SELECT CAST(embedding AS DOUBLE[]) FROM embeddings WHERE vec_id = 0)),
               6) AS cs
  FROM embeddings
), cr AS (
  SELECT vec_id, CAST(row_number() OVER (ORDER BY cs DESC, vec_id) AS INT) AS r
  FROM cos ORDER BY cs DESC, vec_id LIMIT 50
)
SELECT coalesce(bmr.doc_id, cr.vec_id) AS doc_id,
       round(coalesce(1.0 / (60 + bmr.r), 0) + coalesce(1.0 / (60 + cr.r), 0), 6)
         AS rrf
FROM bmr FULL JOIN cr ON bmr.doc_id = cr.vec_id
ORDER BY rrf DESC, doc_id LIMIT 10
"""
)


@register("hybrid_rrf", _HYBRID_RRF_SQL)
def hybrid_rrf_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: BM25 lexical ranks fused with cosine vector
    ranks by reciprocal-rank fusion (k=60). Each retriever prunes to
    its top-50 FIRST (TakeOrderedAndProject — per-partition heaps, no
    global sort of the corpus); row_number then runs on 50 rows in one
    tiny partition, and the fusion join is 50×50 at most. Scores are
    rounded before ranking so rank order — hence the fused output — is
    bit-identical across engines. Docs and vectors share ids 0..499
    (FIXTURES.md); the outer join keeps items surfaced by only one
    retriever."""
    from weaviate_txtai_spark.operators.bm25 import bm25_scores

    docs = load_table(spark, sf_dir, "documents")
    emb = _emb(spark, sf_dir)

    bm_top = (
        bm25_scores(docs, _BM25_TERMS)
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(50)
    )
    w_bm = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    bmr = bm_top.select("doc_id", F.row_number().over(w_bm).cast("int").alias("__rb"))

    qv = F.broadcast(
        emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))
    )
    cos_top = (
        emb.crossJoin(qv)
        .select("vec_id", F.round(cosine_sim("embedding", "qv"), 6).alias("cs"))
        .orderBy(F.desc("cs"), F.asc("vec_id"))
        .limit(50)
    )
    w_cos = Window.orderBy(F.desc("cs"), F.asc("vec_id"))
    cr = cos_top.select(
        F.col("vec_id").alias("doc_id"),
        F.row_number().over(w_cos).cast("int").alias("__rc"),
    )

    rrf = F.coalesce(1.0 / (60 + F.col("__rb")), F.lit(0.0)) + F.coalesce(
        1.0 / (60 + F.col("__rc")), F.lit(0.0)
    )
    return (
        bmr.join(cr, "doc_id", "full_outer")
        .select("doc_id", F.round(rrf, 6).alias("rrf"))
        .orderBy(F.desc("rrf"), F.asc("doc_id"))
        .limit(10)
    )


_BPE_TOKENS_SQL = """
SELECT source,
       CAST(sum(length(list_filter(
         regexp_split_to_array(lower(text), '[^a-z0-9À-ɏ一-鿿]+'),
         x -> x <> ''))) AS BIGINT) AS bpe_tokens,
       CAST(max(length(list_filter(
         regexp_split_to_array(lower(text), '[^a-z0-9À-ɏ一-鿿]+'),
         x -> x <> ''))) AS BIGINT) AS max_doc_tokens
FROM documents GROUP BY 1 ORDER BY 1
"""


@register("bpe_token_counts", _BPE_TOKENS_SQL)
def bpe_token_counts_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sub-word-ish token accounting per source (functions/text.py
    bpe_ish_tokens: the BPE pre-tokenizer regex — word chars + digit
    runs, latin + CJK ranges). The budget column a pretraining mixture
    planner actually consumes; swap in a real tokenizer via mapInPandas
    for byte-accurate counts. Map-side lengths, one partial-agg
    shuffle."""
    from weaviate_txtai_spark.functions.text import bpe_ish_tokens

    docs = load_table(spark, sf_dir, "documents")
    n = F.size(bpe_ish_tokens("text"))
    return (
        docs.groupBy("source")
        .agg(
            F.sum(n).cast("long").alias("bpe_tokens"),
            F.max(n).cast("long").alias("max_doc_tokens"),
        )
        .orderBy("source")
    )


# PII is injected deterministically (same expression in both engines) so
# the scrub machinery is exercised on text guaranteed to contain matches —
# the synthetic corpus itself has none.
_PII_SQL = """
SELECT doc_id,
       CAST(len(regexp_extract_all(aug,
           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS INT) AS n_emails,
       md5(regexp_replace(regexp_replace(aug,
           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
           '\\+?\\d[\\d ()-]{6,}\\d', '[PHONE]', 'g')) AS redacted_fp
FROM (SELECT doc_id,
             text || ' contact user' || CAST(doc_id AS VARCHAR)
                  || '@example.com or +1 (555) 010-2030' AS aug
      FROM documents)
ORDER BY doc_id
"""


@register("docs_redact_pii", _PII_SQL)
def docs_redact_pii_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub gate: email + phone redaction over the documents table
    with deterministically injected PII; the md5 of the redacted text
    hash-checks every byte of the replacement output across engines.
    Map-only (regexp_replace is codegen; no shuffle before the sort)."""
    from weaviate_txtai_spark.functions.text import pii_counts, redact_pii

    docs = load_table(spark, sf_dir, "documents")
    aug = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or +1 (555) 010-2030"),
    )
    return (
        docs.select(
            "doc_id",
            pii_counts(aug)["n_emails"].alias("n_emails"),
            F.md5(redact_pii(aug)).alias("redacted_fp"),
        )
        .orderBy("doc_id")
    )


@register("approx_token_counts", None)
def approx_token_counts_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch point queries for the exact top-20 tokens:
    build the depth×width sketch in one pass, then estimate the heavy
    hitters' frequencies from it — rows-only (xxhash64 has no DuckDB
    twin, same class as dedup_simhash's production mode); the
    never-undercount and εN bounds are pinned in tests/test_cms.py.
    Composition note: exact top-k comes from the Misra–Gries gate
    (token_heavy_hitters); CMS answers the complementary question —
    frequency of an ARBITRARY queried item from a mergeable summary."""
    from weaviate_txtai_spark.functions.text import tokens
    from weaviate_txtai_spark.operators.cms import build_cms, estimate_df
    from weaviate_txtai_spark.operators.heavy_hitters import exact_top_tokens

    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(F.explode(tokens("text")).alias("term"))
    cms = build_cms(tok, "term", width=2048, depth=5)
    top = exact_top_tokens(docs, 20, capacity=4096).select("term")
    return estimate_df(cms, top, "term").orderBy("term")


_NORMALIZE_SQL = r"""
SELECT doc_id,
       md5(lower(trim(regexp_replace(
           regexp_replace(text, '[\x00-\x08\x0e-\x1f\x7f\x{200B}-\x{200D}\x{FEFF}]',
                          '', 'g'),
           '[ \x09\x0a\x0b\x0c\x0d]+', ' ', 'g')))) AS norm_md5
FROM documents ORDER BY doc_id
"""


@register("docs_normalize", _NORMALIZE_SQL)
def docs_normalize_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-tokenization text normalization (control/zero-width strip,
    whitespace collapse, trim, lowercase) — native codegen exprs,
    byte-exact across engines; the gate hashes the normalized text
    (md5), the same contract as docs_redact_pii."""
    from weaviate_txtai_spark.functions.text import normalize_text

    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", F.md5(normalize_text("text")).alias("norm_md5")
    ).orderBy("doc_id")


_ZIPF_SQL = """
WITH tok AS (
  SELECT unnest(list_filter(string_split(lower(text), ' '), x -> x <> ''))
           AS term
  FROM documents
),
freq AS (
  SELECT term, CAST(count(*) AS BIGINT) AS f FROM tok GROUP BY 1
),
ranked AS (
  SELECT f, row_number() OVER (ORDER BY f DESC, term ASC) AS r FROM freq
)
SELECT round(regr_slope(ln(f), ln(r)), 6) AS zipf_slope,
       round(regr_r2(ln(f), ln(r)), 6) AS r2,
       CAST(count(*) AS BIGINT) AS n_terms
FROM ranked WHERE r <= 1000
"""


@register("docs_zipf_fit", _ZIPF_SQL)
def docs_zipf_fit_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf-law fit over the token frequency spectrum: OLS slope of
    ln(freq) on ln(rank) for the top-1000 terms (natural corpora sit
    near −1; a slope far off signals boilerplate floods or synthetic
    text — a one-number corpus-health check). regr_slope/regr_r2 are
    mergeable moment aggregates on both engines; the rank window runs
    over ≤ vocabulary rows with a deterministic (freq DESC, term ASC)
    order."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        F.explode(
            F.filter(
                F.split(F.lower("text"), " "), lambda t: t != ""
            )
        ).alias("term")
    )
    freq = tok.groupBy("term").agg(F.count(F.lit(1)).alias("f"))
    w = Window.orderBy(F.desc("f"), F.asc("term"))
    ranked = freq.withColumn("r", F.row_number().over(w)).filter(
        F.col("r") <= 1000
    )
    return ranked.agg(
        F.round(F.regr_slope(F.log("f"), F.log("r")), 6).alias("zipf_slope"),
        F.round(F.regr_r2(F.log("f"), F.log("r")), 6).alias("r2"),
        F.count(F.lit(1)).cast("long").alias("n_terms"),
    )


@register("bpe_train_encode", None)
def bpe_train_encode_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trained-tokenizer pipeline (operators/bpe.py): learn a BPE merge
    table from the documents corpus — ONE distinct-word aggregation,
    then the merge loop runs driver-side over word frequencies, the
    classic word-level factorization — and encode map-only with the
    ranks in the Arrow-kernel closure. Output: per-doc subword counts
    for the lowest 50 doc_ids (deterministic: lexicographic tie-breaks
    make the merge table a pure function of the corpus). Rows-only by
    design: the merge loop is iterative, not SQL-replayable; the merge
    order itself is pinned against a hand-run of the algorithm in
    tests/test_bpe.py."""
    from weaviate_txtai_spark.operators.bpe import bpe_encode, train_bpe

    docs = load_table(spark, sf_dir, "documents")
    model = train_bpe(docs, num_merges=100)
    return (
        bpe_encode(docs, model)
        .filter(F.col("doc_id") < 50)
        .select(
            "doc_id",
            F.size("bpe_tokens").alias("n_subwords"),
            F.size(F.split("text", r"\s+")).alias("n_words"),
        )
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# Gopher-style repetition battery (Rae et al. 2021 §A1.1 — public): the
# n-gram repetition signals a pretraining filter thresholds on. The char
# accounting is the occurrence-weighted definition (count × non-space
# chars of the gram / total non-space chars) — overlapping occurrences
# are NOT de-overlapped, and the top gram is the max-COVERAGE one (ties
# in raw count resolve by coverage, deterministically); both choices are
# replayed verbatim in the oracle.
# --------------------------------------------------------------------------

_GOPHER_REP_SQL = """
WITH tok AS (
  SELECT doc_id,
         list_filter(string_split(text, ' '), x -> x <> '') AS ts,
         CAST(len(replace(text, ' ', '')) AS DOUBLE) AS total_chars
  FROM documents
), ng AS (
  SELECT doc_id, total_chars, n,
         unnest(list_transform(range(1, greatest(len(ts) - n + 2, 1)),
                i -> array_to_string(list_slice(ts, i, i + n - 1), ' '))) AS g
  FROM tok, (SELECT unnest([2, 3]) AS n)
), c AS (
  SELECT doc_id, total_chars, n, g,
         count(*) AS cnt,
         CAST(len(replace(g, ' ', '')) AS DOUBLE) AS charlen
  FROM ng GROUP BY 1, 2, 3, 4
), per AS (
  SELECT doc_id, total_chars, n,
         max(cnt * charlen) AS top_cov,
         coalesce(sum(cnt * charlen) FILTER (cnt > 1), 0.0) AS dup_cov
  FROM c GROUP BY 1, 2, 3
)
SELECT doc_id,
       round(coalesce(max(CASE WHEN n = 2 THEN top_cov END), 0.0)
             / total_chars, 6) AS top2_char_frac,
       round(coalesce(max(CASE WHEN n = 2 THEN dup_cov END), 0.0)
             / total_chars, 6) AS dup2_char_frac,
       round(coalesce(max(CASE WHEN n = 3 THEN top_cov END), 0.0)
             / total_chars, 6) AS top3_char_frac,
       round(coalesce(max(CASE WHEN n = 3 THEN dup_cov END), 0.0)
             / total_chars, 6) AS dup3_char_frac
FROM per GROUP BY doc_id, total_chars
ORDER BY doc_id
"""


@register("docs_gopher_repetition", _GOPHER_REP_SQL)
def docs_gopher_repetition_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher repetition signals per doc: top-{2,3}-gram character
    coverage and duplicated-{2,3}-gram character fraction. ONE pass
    builds every (n, gram) occurrence row (tagged structs, flattened,
    exploded — no per-n rescan of the corpus), one shuffle counts
    (doc, n, gram), and the per-doc reduction after that is
    partial-aggregatable. All expressions are built-ins; the explode
    fan-out is ~2 rows per token — linear in corpus size, the 100 TB
    shape for per-doc token statistics."""
    from weaviate_txtai_spark.functions.text import ngrams
    from weaviate_txtai_spark.sources.tables import spread

    docs = load_table(spark, sf_dir, "documents")
    total = F.length(F.regexp_replace("text", " ", "")).cast("double")

    # single-arg closure per n: a TWO-arg lambda in F.transform is the
    # (element, index) form, which would bind n to the array index
    def _tag(n):
        return lambda g: F.struct(F.lit(n).alias("n"), g.alias("g"))

    tagged = F.flatten(
        F.array(
            *[
                F.transform(ngrams(F.col("text"), n), _tag(n))
                for n in (2, 3)
            ]
        )
    )
    c = (
        spread(docs)
        .select("doc_id", total.alias("total_chars"),
                F.explode(tagged).alias("t"))
        .select("doc_id", "total_chars", "t.n", "t.g")
        .groupBy("doc_id", "total_chars", "n", "g")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn(
            "charlen",
            F.length(F.regexp_replace("g", " ", "")).cast("double"),
        )
    )
    cov = F.col("cnt") * F.col("charlen")
    per = c.groupBy("doc_id", "total_chars", "n").agg(
        F.max(cov).alias("top_cov"),
        F.coalesce(
            F.sum(F.when(F.col("cnt") > 1, cov)), F.lit(0.0)
        ).alias("dup_cov"),
    )

    def pick(n, col):
        return F.coalesce(
            F.max(F.when(F.col("n") == n, F.col(col))), F.lit(0.0)
        )

    return (
        per.groupBy("doc_id", "total_chars")
        .agg(
            F.round(pick(2, "top_cov") / F.col("total_chars"), 6).alias(
                "top2_char_frac"
            ),
            F.round(pick(2, "dup_cov") / F.col("total_chars"), 6).alias(
                "dup2_char_frac"
            ),
            F.round(pick(3, "top_cov") / F.col("total_chars"), 6).alias(
                "top3_char_frac"
            ),
            F.round(pick(3, "dup_cov") / F.col("total_chars"), 6).alias(
                "dup3_char_frac"
            ),
        )
        .drop("total_chars")
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# DSIR importance weights (Xie et al. 2023): target = the 'en' slice of
# the corpus, raw = everything; weight = Σ_tok ln p̂_t − ln p̂_r with
# Laplace 0.5 smoothing over the union vocabulary. The oracle replays
# the exact estimator; ln on identical doubles matches (same pattern as
# the BM25 gate).
# --------------------------------------------------------------------------

_DSIR_SQL = """
WITH tok AS (
  SELECT doc_id, (lang = 'en') AS is_t,
         unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS f
  FROM documents
), vocab AS (
  SELECT f, count(*) AS c_raw,
         sum(CASE WHEN is_t THEN 1 ELSE 0 END) AS c_t
  FROM tok GROUP BY 1
), totals AS (
  SELECT sum(c_raw) AS n_raw, sum(c_t) AS n_t, count(*) AS v FROM vocab
), lr AS (
  SELECT f, ln((c_t + 0.5) / (n_t + 0.5 * v))
            - ln((c_raw + 0.5) / (n_raw + 0.5 * v)) AS lr
  FROM vocab, totals
)
, scored AS (
  SELECT tok.doc_id, sum(lr.lr) AS weight
  FROM tok JOIN lr ON tok.f = lr.f
  GROUP BY 1
)
-- every doc gets a row (tokenless docs: weight 0.0, the empty log-
-- ratio sum) — mirrors the operator's doc-id left join
SELECT d.doc_id, round(coalesce(s.weight, 0.0), 6) AS weight
FROM (SELECT DISTINCT doc_id FROM documents) d
LEFT JOIN scored s USING (doc_id)
ORDER BY 1
"""


@register("dsir_importance", _DSIR_SQL)
def dsir_importance_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weights (operators/importance.py): score every
    doc by target-likeness under smoothed unigram models, target =
    lang='en'. Gate mode uses raw-string features (oracle-exact); the
    100 TB mode sets num_buckets so the vocab join side is fixed-size
    and broadcast (pinned in tests/test_importance.py). Docs whose
    high weights mark them target-like feed the existing weighted
    samplers for the actual resample."""
    from weaviate_txtai_spark.operators.importance import dsir_weights
    from weaviate_txtai_spark.sources.tables import spread

    docs = load_table(spark, sf_dir, "documents")
    return (
        dsir_weights(
            spread(docs), F.col("lang") == "en", round_decimals=6
        )
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# round-7 surface: token-budget allocation (capped water-filling)
# --------------------------------------------------------------------------

_WATERFILL_SQL = """
WITH tok AS (
  SELECT source,
         CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT)
           AS nt
  FROM documents
), per_src AS (
  SELECT source, CAST(sum(nt) AS DOUBLE) AS a FROM tok GROUP BY 1
), tot AS (
  SELECT sum(a) * 0.55 AS b FROM per_src
), ranked AS (
  SELECT source, a,
         row_number() OVER (ORDER BY a, source) AS j,
         sum(a) OVER (ORDER BY a, source) AS prefix,
         count(*) OVER () AS n
  FROM per_src
), flagged AS (
  SELECT *,
         (prefix - a) + (n - j + 1) * a <= (SELECT b FROM tot) AS whole
  FROM ranked
), lvl AS (
  SELECT max(CASE WHEN whole THEN prefix END) AS s_j,
         max(CASE WHEN whole THEN j END) AS jj
  FROM flagged
)
SELECT source,
       round(a, 6) AS tokens,
       round(CASE WHEN whole THEN a
             ELSE least(a,
                  ((SELECT b FROM tot) - coalesce((SELECT s_j FROM lvl), 0))
                  / (n - coalesce((SELECT jj FROM lvl), 0))) END, 6) AS alloc
FROM flagged ORDER BY source
"""


@register("token_budget_waterfill", _WATERFILL_SQL)
def token_budget_waterfill_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pretraining token-budget allocation (operators/budget.py
    waterfill_allocation): whitespace token inventories per source,
    budget = 55% of the corpus total, max-min fair water-filling —
    sources below the water level θ are taken whole, larger sources
    cap at θ with Σ alloc = budget exactly. The raw token count is the
    fully-distributed groupBy; the θ construction is one closed-form
    prefix-sum window over the per-source aggregate (#sources rows).
    Integer token counts keep the whole/capped boundary test exact in
    double math, so Spark and the oracle flag identical sources."""
    from weaviate_txtai_spark.operators.budget import waterfill_allocation

    docs = load_table(spark, sf_dir, "documents")
    per_src = docs.groupBy("source").agg(
        F.sum(
            F.size(F.filter(F.split("text", " "), lambda x: x != ""))
            .cast("long")
        ).alias("tokens")
    )
    total = per_src.agg(F.sum("tokens").cast("double")).collect()[0][0]
    return waterfill_allocation(
        per_src, 0.55 * total, key_col="source", amount_col="tokens"
    ).orderBy("source")


_SOURCE_DRIFT_KS_SQL = """
WITH counts AS (
  SELECT source AS g, n_chars AS v, count(*) AS c
  FROM documents GROUP BY 1, 2
), gvals AS (
  SELECT v, CAST(sum(c) AS DOUBLE) AS gc FROM counts GROUP BY 1
), tot AS (
  SELECT sum(gc) AS t FROM gvals
), gcdf AS (
  SELECT v, sum(gc) OVER (ORDER BY v) / (SELECT t FROM tot) AS gcum
  FROM gvals
), groups AS (
  SELECT g, CAST(sum(c) AS BIGINT) AS n FROM counts GROUP BY 1
), grid AS (
  SELECT groups.g, groups.n, gcdf.v, gcdf.gcum,
         coalesce(counts.c, 0) AS c
  FROM groups CROSS JOIN gcdf
  LEFT JOIN counts ON counts.g = groups.g AND counts.v = gcdf.v
), cum AS (
  SELECT g, n, gcum,
         sum(c) OVER (PARTITION BY g ORDER BY v) * 1.0 / n AS gc2
  FROM grid
)
SELECT g AS source, n, round(max(abs(gc2 - gcum)), 6) AS ks
FROM cum GROUP BY 1, 2 ORDER BY source
"""


@register("source_drift_ks", _SOURCE_DRIFT_KS_SQL)
def source_drift_ks_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source distribution drift (operators/drift.py ks_drift):
    exact two-sample KS statistic of each source's document-length
    (n_chars) distribution against the pooled corpus — the
    corpus-health monitor that spikes when one source's length profile
    shifts, before means or quantiles move. Exact sup over the global
    step grid; everything after the first count runs on (sources ×
    distinct lengths) rows, bounded by the value DOMAIN, not the
    corpus."""
    from weaviate_txtai_spark.operators.drift import ks_drift

    docs = load_table(spark, sf_dir, "documents")
    return ks_drift(
        docs, group_col="source", value_col="n_chars"
    ).orderBy("source")


_QLM_TOPK_SQL = """
WITH tok AS (
  SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS t
  FROM documents
), dl AS (
  SELECT d.doc_id, CAST(coalesce(count(tok.t), 0) AS BIGINT) AS len
  FROM documents d LEFT JOIN tok ON d.doc_id = tok.doc_id GROUP BY 1
), ctot AS (
  SELECT CAST(sum(len) AS DOUBLE) AS c FROM dl
), hits AS (
  SELECT doc_id, t, count(*) AS tf FROM tok
  WHERE t IN (__TERMS__) GROUP BY 1, 2
), cf AS (
  SELECT t, 2000.0 * CAST(sum(tf) AS DOUBLE) / (SELECT c FROM ctot) AS mup
  FROM hits GROUP BY 1
), consts AS (
  SELECT sum(ln(mup)) AS tc, count(*) AS nq FROM cf
), persc AS (
  SELECT h.doc_id, sum(ln(1 + h.tf / cf.mup)) AS hs
  FROM hits h JOIN cf ON h.t = cf.t GROUP BY 1
)
SELECT p.doc_id,
       round((SELECT tc FROM consts)
             - (SELECT nq FROM consts) * ln(dl.len + 2000.0)
             + p.hs, 6) AS score
FROM persc p JOIN dl ON p.doc_id = dl.doc_id
ORDER BY score DESC, p.doc_id LIMIT 10
""".replace("__TERMS__", ", ".join(f"'{t}'" for t in _BM25_TERMS))


@register("qlm_topk", _QLM_TOPK_SQL)
def qlm_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dirichlet query-likelihood top-10 for the SAME 3-term query as
    bm25_topk (operators/bm25.py qlm_scores) — the language-model IR
    scorer beside the probabilistic one; same shuffle profile (doc
    length rides the explode, only hit rows aggregate, collection
    stats broadcast)."""
    from weaviate_txtai_spark.operators.bm25 import qlm_scores

    docs = load_table(spark, sf_dir, "documents")
    return (
        qlm_scores(docs, _BM25_TERMS)
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(10)
    )


# --------------------------------------------------------------------------
# Round 7: exact phrase search via positional postings (operators/phrase.py)
# --------------------------------------------------------------------------

# Oracle is the direct sliding-window compare (tok[i]='a' AND
# tok[i+1]='a') — an INDEPENDENT formulation, not a replay of the
# postings construction, so the hash match checks the arithmetic
# re-keying (pos − phrase_idx) end to end, overlaps included.
_PHRASE_MATCH_SQL = """
WITH t AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS tok
  FROM documents
)
SELECT doc_id, CAST(s.x - 1 AS INT) AS start
FROM t, unnest(generate_series(1, len(tok) - 1)) AS s(x)
WHERE tok[s.x] = 'a' AND tok[s.x + 1] = 'a'
ORDER BY doc_id, start
"""


@register("phrase_match_positions", _PHRASE_MATCH_SQL)
def phrase_match_positions_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every occurrence of the exact phrase "a a" (a repeated-term
    phrase — the hard case: one token feeds two phrase indices, and
    overlapping occurrences like "a a a" must yield two starts).
    The plan is postings-filter → arithmetic re-key → ONE aggregate;
    no contains() corpus rescan, no k-way postings self-join
    (operators/phrase.py)."""
    from weaviate_txtai_spark.operators.phrase import phrase_match

    docs = load_table(spark, sf_dir, "documents")
    return phrase_match(docs, "a a").orderBy("doc_id", "start")


# Oracle: the FULL sources × vocabulary grid (cross join + left join),
# the textbook JSD definition — independent of the Spark plan's
# hit-rows-only decomposition, so the hash match proves the absent-token
# mass term (1 − Σ_present q) exact.
_SOURCE_JSD_SQL = """
WITH tok AS (
  SELECT source, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS t
  FROM documents),
c AS (SELECT source, t, count(*) AS c FROM tok GROUP BY 1, 2),
n AS (SELECT source, sum(c) AS n FROM c GROUP BY 1),
pool AS (SELECT t, sum(c) AS pc FROM c GROUP BY 1),
tot AS (SELECT sum(c) AS total FROM c),
grid AS (
  SELECT nn.source, nn.n, coalesce(cc.c, 0) * 1.0 / nn.n AS pv,
         p.pc * 1.0 / tot.total AS qv
  FROM n nn CROSS JOIN pool p CROSS JOIN tot
  LEFT JOIN c cc ON cc.source = nn.source AND cc.t = p.t)
SELECT source, CAST(max(n) AS BIGINT) AS n_tokens,
       round(sum(CASE WHEN pv > 0 THEN 0.5 * pv * log2(2 * pv / (pv + qv))
                      ELSE 0 END
                 + 0.5 * qv * log2(2 * qv / (pv + qv))), 6) AS jsd
FROM grid GROUP BY source ORDER BY source
"""


@register("source_drift_jsd", _SOURCE_JSD_SQL)
def source_drift_jsd_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source Jensen–Shannon divergence of the token distribution
    vs the pooled corpus (operators/drift.py jsd_drift) — the discrete
    vocabulary-drift companion to `source_drift_ks`' numeric-CDF
    statistic. The Spark plan touches only each source's OWN
    (source, token) rows (hit-rows-only decomposition; absent-token
    mass folded into 1 − Σ q), never a sources × vocabulary grid."""
    from weaviate_txtai_spark.functions.text import tokens
    from weaviate_txtai_spark.operators.drift import jsd_drift

    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "source", F.explode(tokens("text")).alias("tok")
    )
    return jsd_drift(
        tok, group_col="source", token_col="tok"
    ).orderBy("source")


_DOCS_PCTRANK_SQL = """
SELECT doc_id, source, n_chars,
       round(cume_dist() OVER (PARTITION BY source ORDER BY n_chars), 6)
         AS pct_rank
FROM documents ORDER BY doc_id
"""


@register("docs_length_pctrank", _DOCS_PCTRANK_SQL)
def docs_length_pctrank_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-source percentile rank of document length
    (operators/rankstats.py group_percentile_rank) — the quantile
    normalization behind per-source quality cutoffs ("keep each
    source's top 30%"), computed with NO per-row window: a
    (source, length) count table, a prefix sum over each source's
    value DOMAIN, and a value-keyed join back. The oracle IS the
    per-row cume_dist window — fine at oracle scale, one giant
    partition per hot source at corpus scale."""
    from weaviate_txtai_spark.operators.rankstats import group_percentile_rank

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    return group_percentile_rank(
        docs, "n_chars", group_col="source"
    ).select("doc_id", "source", "n_chars", "pct_rank").orderBy("doc_id")


# Oracle: the SAME BM25 core SQL as bm25_topk — the index path must be
# bit-identical to the direct corpus scan, which is exactly the claim
# worth gating (build once, query forever, lose nothing).
_BM25_INDEX_SQL = (
    _BM25_CORE_SQL
    + "SELECT doc_id, score FROM scored ORDER BY score DESC, doc_id LIMIT 10"
)


@register("bm25_index_topk", _BM25_INDEX_SQL)
def bm25_index_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-10 answered from a PERSISTED inverted index
    (operators/textindex.py) — the text-side twin of the vector tier's
    save/load lifecycle: postings partitioned by term-hash bucket
    (query prunes to its own buckets — PartitionFilters in the scan),
    precomputed document frequencies, corpus stats. The query touches
    only the three query terms' postings; the corpus is never
    re-scanned. Same terms and oracle as `bm25_topk`, so the gate pins
    index == direct bit-identity."""
    import tempfile

    from weaviate_txtai_spark.operators.textindex import (
        bm25_from_index,
        build_text_index,
    )

    docs = load_table(spark, sf_dir, "documents")
    path = tempfile.mkdtemp(prefix="bm25_index_gate_")
    build_text_index(docs, path)
    return (
        bm25_from_index(spark, path, _BM25_TERMS)
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(10)
    )


_DOCS_ROBUST_Z_SQL = """
WITH m AS (SELECT source, median(n_chars) AS med FROM documents GROUP BY 1),
d AS (SELECT doc_id, source, n_chars, abs(n_chars - med) AS adev, med
      FROM documents JOIN m USING (source)),
md AS (SELECT source, median(adev) AS mad FROM d GROUP BY 1),
-- exact-integer half-away rounding: the true rz = 6745·Δ2/(10⁴·mad2)
-- can land EXACTLY on a 1e-6 midpoint (caught by the r10 sf0.1
-- sweep), where rounding a double diverges across engines — so both
-- sides round in integer arithmetic and divide once at the end
z AS (SELECT d.doc_id, d.source, d.n_chars,
        6745 * (2 * d.n_chars - CAST(2 * d.med AS BIGINT)) * 1000000
          AS num,
        10000 * CAST(2 * md.mad AS BIGINT) AS den
      FROM d JOIN md USING (source))
SELECT doc_id, source, n_chars,
       CASE WHEN den = 0 THEN NULL
            ELSE (CASE WHEN num < 0 THEN -1 ELSE 1 END)
                 * ((abs(num) * 2 + den) // (2 * den)) / 1000000.0 END
         AS rz
FROM z ORDER BY doc_id
"""


@register("docs_robust_zscores", _DOCS_ROBUST_Z_SQL)
def docs_robust_zscores_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median/MAD robust z-scores of document length per source
    (operators/profile.py robust_zscores) — the 50%-breakdown
    companion to `events_outliers`' mean/σ gate: two exact
    interpolated-percentile aggregates and two group-keyed joins, no
    window, no full sort."""
    from weaviate_txtai_spark.operators.profile import robust_zscores

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    return (
        robust_zscores(docs, "n_chars", group_col="source", exact_int=True)
        .select("doc_id", "source", "n_chars", "rz")
        .orderBy("doc_id")
    )


# Oracle: per-doc window argmax over the (doc × shard) weight grid —
# independent of the Spark side's expression-fold argmax.
_SHARD_ASSIGN_SQL = """
WITH s(shard) AS (VALUES ('s0'), ('s1'), ('s2'), ('s3'),
                         ('s4'), ('s5'), ('s6'), ('s7')),
w AS (
  SELECT d.doc_id, s.shard,
         md5(CAST(d.doc_id AS VARCHAR) || ':' || s.shard) AS h
  FROM documents d CROSS JOIN s)
SELECT doc_id, shard FROM w
QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY h DESC, shard DESC) = 1
ORDER BY doc_id
"""


@register("doc_shard_assign", _SHARD_ASSIGN_SQL)
def doc_shard_assign_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rendezvous (highest-random-weight) shard assignment of documents
    to 8 shards (operators/sharding.py): a pure codegen argmax over
    per-shard hashes — no shuffle, no lookup table, and adding a shard
    provably moves only ~1/(n+1) of keys (pinned with the movement
    report in tests/test_batch9_ops.py). mod-n hashing would move
    (n−1)/n on every reshard."""
    from weaviate_txtai_spark.operators.sharding import rendezvous_assign

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return rendezvous_assign(
        docs, "doc_id", [f"s{i}" for i in range(8)]
    ).orderBy("doc_id")


# Oracle: per-phrase direct sliding-window compares, UNION ALL'd —
# independent of the shared-shuffle slot-map plan.
_MULTI_PHRASE_SQL = """
WITH t AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS tok
  FROM documents
)
SELECT doc_id, 'a a' AS phrase, CAST(s.x - 1 AS INT) AS start
FROM t, unnest(generate_series(1, len(tok) - 1)) AS s(x)
WHERE tok[s.x] = 'a' AND tok[s.x + 1] = 'a'
UNION ALL
SELECT doc_id, 'table value', CAST(s.x - 1 AS INT)
FROM t, unnest(generate_series(1, len(tok) - 1)) AS s(x)
WHERE tok[s.x] = 'table' AND tok[s.x + 1] = 'value'
UNION ALL
SELECT doc_id, 'spark a a', CAST(s.x - 1 AS INT)
FROM t, unnest(generate_series(1, len(tok) - 2)) AS s(x)
WHERE tok[s.x] = 'spark' AND tok[s.x + 1] = 'a' AND tok[s.x + 2] = 'a'
ORDER BY doc_id, phrase, start
"""


@register("multi_phrase_match", _MULTI_PHRASE_SQL)
def multi_phrase_match_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dictionary phrase sweep (operators/phrase.py multi_phrase_match):
    every occurrence of every blocklist phrase in ONE postings filter +
    ONE aggregate — the token→(phrase, slot) map rides as a broadcast
    literal, so a 10k-phrase banned-list costs the same shuffle count
    as one phrase. The three gate phrases share tokens ('a a' inside
    'spark a a') to pin cross-phrase slot handling."""
    from weaviate_txtai_spark.operators.phrase import multi_phrase_match

    docs = load_table(spark, sf_dir, "documents")
    return multi_phrase_match(
        docs, ["a a", "table value", "spark a a"]
    ).orderBy("doc_id", "phrase", "start")


# Oracle: per-(source,value) fraction via rank windows + a CORRELATED
# min-subquery lookup into the pooled CDF — independent of the Spark
# side's union-as-of mapping.
_DOCS_QNORM_SQL = """
WITH c AS (SELECT source, n_chars, count(*) AS c FROM documents GROUP BY 1, 2),
t AS (SELECT source, sum(c) AS n FROM c GROUP BY 1),
gv AS (
  SELECT c.source, c.n_chars,
         CASE WHEN t.n = 1 THEN 0.5
              ELSE (coalesce(sum(c.c) OVER (PARTITION BY c.source
                         ORDER BY c.n_chars
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                    + (c.c + 1) / 2.0 - 1) / (t.n - 1) END AS f
  FROM c JOIN t USING (source)),
pc AS (SELECT n_chars AS v, count(*) AS pc FROM documents GROUP BY 1),
np AS (SELECT sum(pc) AS np FROM pc),
pcdf AS (SELECT v, sum(pc) OVER (ORDER BY v) / np.np AS frac FROM pc, np)
SELECT d.doc_id, d.source, d.n_chars,
       round((SELECT min(v) FROM pcdf WHERE pcdf.frac >= gv.f), 6) AS qnorm
FROM documents d JOIN gv ON d.source = gv.source AND d.n_chars = gv.n_chars
ORDER BY doc_id
"""


@register("docs_length_qnorm", _DOCS_QNORM_SQL)
def docs_length_qnorm_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile normalization of document length across sources
    (operators/rankstats.py quantile_normalize, Bolstad 2003): each
    doc's length maps to the pooled quantile at its within-source
    fractional rank, removing per-source scale effects before a global
    length filter. All stages run on value-domain tables; the
    fraction→quantile lookup is a forward as-of over the union of the
    two domain CDFs."""
    from weaviate_txtai_spark.operators.rankstats import quantile_normalize

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    return (
        quantile_normalize(docs, "n_chars", group_col="source")
        .select("doc_id", "source", "n_chars", "qnorm")
        .orderBy("doc_id")
    )


_PMI_SQL = """
WITH pres AS (
  SELECT DISTINCT doc_id,
         unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS item
  FROM documents),
n AS (SELECT CAST(count(DISTINCT doc_id) AS DOUBLE) AS n FROM pres),
dfq AS (SELECT item, CAST(count(*) AS DOUBLE) AS df FROM pres GROUP BY 1),
p AS (SELECT a.item AS t1, b.item AS t2, CAST(count(*) AS BIGINT) AS pair_count
      FROM pres a JOIN pres b ON a.doc_id = b.doc_id AND a.item < b.item
      GROUP BY 1, 2 HAVING count(*) >= 100)
SELECT p.t1, p.t2, p.pair_count,
       round(log2(n.n * p.pair_count / (d1.df * d2.df)), 6) AS pmi
FROM p JOIN dfq d1 ON p.t1 = d1.item JOIN dfq d2 ON p.t2 = d2.item, n
ORDER BY t1, t2
"""


@register("token_pmi_pairs", _PMI_SQL)
def token_pmi_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document-level token-pair PMI (operators/itemsets.py pmi_pairs,
    Church–Hanks collocation statistic): pairs generate map-side from
    per-doc sorted distinct-token arrays — never a token-granularity
    self-join (the oracle IS that self-join). min_pair_count=100 keeps
    the gate to the statistically meaningful co-occurrences on the
    small synthetic vocabulary."""
    from weaviate_txtai_spark.operators.itemsets import pmi_pairs

    docs = load_table(spark, sf_dir, "documents")
    return pmi_pairs(docs, min_pair_count=100).orderBy("t1", "t2")


# Oracle replays the PSI construction: baseline quantile edges,
# correlated bin assignment, dense grid with the 0.5 Laplace floor.
_PSI_SQL = """
WITH b AS (SELECT source AS g, CAST(n_chars AS DOUBLE) AS v FROM documents),
ed AS (SELECT DISTINCT unnest(quantile_cont(v,
             [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9])) AS e
       FROM b WHERE g = 'src0'),
ne AS (SELECT count(*) AS k FROM ed),
binned AS (
  SELECT g, (SELECT count(*) FROM ed WHERE b.v > ed.e) AS bin FROM b),
c AS (SELECT g, bin, count(*) * 1.0 AS c FROM binned GROUP BY 1, 2),
t AS (SELECT g, sum(c) AS n FROM c GROUP BY 1),
grid AS (
  SELECT t.g, gs.bin, t.n,
         greatest(coalesce(c.c, 0), 0.5) AS cf
  FROM t CROSS JOIN (SELECT unnest(generate_series(0, (SELECT k FROM ne)))
                     AS bin) gs
  LEFT JOIN c ON c.g = t.g AND c.bin = gs.bin),
base AS (SELECT bin, cf / n AS pb FROM grid WHERE g = 'src0')
SELECT grid.g AS source, CAST(max(grid.n) AS BIGINT) AS n,
       round(sum((grid.cf / grid.n - base.pb)
                 * ln((grid.cf / grid.n) / base.pb)), 6) AS psi
FROM grid JOIN base USING (bin)
GROUP BY grid.g ORDER BY source
"""


@register("source_drift_psi", _PSI_SQL)
def source_drift_psi_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population stability index of document length per source vs the
    src0 baseline (operators/drift.py psi_drift) — the third drift
    lens beside KS (CDF sup-distance) and JSD (token mass): decile
    bins from the BASELINE's quantiles, Laplace-floored empty bins,
    the model-monitoring industry convention with its 0.1/0.25
    rule-of-thumb thresholds."""
    from weaviate_txtai_spark.operators.drift import psi_drift

    docs = load_table(spark, sf_dir, "documents")
    return psi_drift(
        docs, group_col="source", value_col="n_chars",
        baseline="src0", n_bins=10,
    ).withColumnRenamed("source", "source").orderBy("source")


# --------------------------------------------------------------------------
# Round 8 batch 4: Zipf fit + negative-sampling table over the token
# frequency domain
# --------------------------------------------------------------------------

_ZIPF_SQL = """
WITH tok AS (
  SELECT unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS term
  FROM documents),
c AS (SELECT term, count(*) AS cnt FROM tok GROUP BY 1),
top AS (SELECT term, cnt FROM c ORDER BY cnt DESC, term ASC LIMIT 500),
pts AS (SELECT ln(CAST(row_number() OVER (ORDER BY cnt DESC, term ASC)
                       AS DOUBLE)) AS x,
               ln(CAST(cnt AS DOUBLE)) AS y
        FROM top),
a AS (SELECT count(*) AS n, avg(x) AS mx, avg(y) AS my,
             covar_pop(x, y) AS cxy, var_pop(x) AS vx, var_pop(y) AS vy
      FROM pts)
SELECT CAST(n AS BIGINT) AS n_terms,
       round(cxy / vx, 6) AS slope,
       round(my - (cxy / vx) * mx, 6) AS intercept,
       round(cxy * cxy / (vx * vy), 6) AS r2
FROM a
"""


@register("token_zipf_fit", _ZIPF_SQL)
def token_zipf_fit_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit over the corpus token frequencies
    (operators/profile.py zipf_fit): OLS of log freq on log rank for
    the top-500 terms — the corpus-health gauge (natural text ≈ slope
    −1; boilerplate or bad dedup bends the curve). TakeOrdered bounds
    the rank window to the already-limited top-N."""
    from weaviate_txtai_spark.functions.text import tokens
    from weaviate_txtai_spark.operators.profile import zipf_fit

    docs = load_table(spark, sf_dir, "documents")
    counts = (
        docs.select(F.explode(tokens("text")).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return zipf_fit(counts, "term", "cnt", top_n=500)


_NEGSAMPLE_SQL = """
WITH tok AS (
  SELECT unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS term
  FROM documents),
c AS (SELECT term, CAST(count(*) AS BIGINT) AS count FROM tok GROUP BY 1),
t AS (SELECT sum(pow(CAST(count AS DOUBLE), 0.75)) AS tt FROM c)
SELECT term, count,
       round(pow(CAST(count AS DOUBLE), 0.75) / t.tt, 9) AS weight
FROM c, t ORDER BY term
"""


@register("token_negative_sampling", _NEGSAMPLE_SQL)
def token_negative_sampling_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """word2vec negative-sampling distribution (operators/lm.py
    negative_sampling_weights): P(term) ∝ count^0.75 over the token
    domain — the tempered unigram table contrastive-pair mining and
    hard-negative quotas draw from. One domain pass + a broadcast
    total."""
    from weaviate_txtai_spark.functions.text import tokens
    from weaviate_txtai_spark.operators.lm import negative_sampling_weights

    docs = load_table(spark, sf_dir, "documents")
    counts = (
        docs.select(F.explode(tokens("text")).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return negative_sampling_weights(counts, "term", "cnt").orderBy("term")


_NB_LANGID_SQL = """
WITH tr AS MATERIALIZED (
  SELECT doc_id, lang,
         list_filter(string_split(text, ' '), x -> x <> '') AS tok
  FROM documents WHERE doc_id % 5 <> 0),
te AS MATERIALIZED (
  SELECT doc_id, lang,
         list_filter(string_split(text, ' '), x -> x <> '') AS tok
  FROM documents WHERE doc_id % 5 = 0),
ctc AS MATERIALIZED (
  SELECT lang AS c, t AS term, CAST(count(*) AS BIGINT) AS n
  FROM (SELECT lang, unnest(tok) AS t FROM tr) GROUP BY 1, 2),
cls AS MATERIALIZED (
  SELECT c, CAST(sum(n) AS BIGINT) AS nc FROM ctc GROUP BY 1),
pri AS MATERIALIZED (
  SELECT lang AS c, CAST(count(*) AS BIGINT) AS dc FROM tr GROUP BY 1),
vv AS (SELECT CAST(count(DISTINCT term) AS BIGINT) AS v FROM ctc),
nd AS (SELECT CAST(count(*) AS BIGINT) AS ndocs FROM tr),
cstats AS MATERIALIZED (
  SELECT cls.c, ln(pri.dc / CAST(nd.ndocs AS DOUBLE)) AS logprior,
         ln(cls.nc + 1.0 * vv.v) AS lognorm
  FROM cls JOIN pri USING (c), vv, nd),
tf AS MATERIALIZED (
  SELECT u.doc_id, u.t AS term, CAST(count(*) AS BIGINT) AS tf
  FROM (SELECT doc_id, unnest(tok) AS t FROM te) u
  JOIN (SELECT DISTINCT term FROM ctc) vcb ON u.t = vcb.term
  GROUP BY 1, 2),
s0 AS MATERIALIZED (
  SELECT tf.doc_id, cs.c,
         sum(tf.tf * ln(COALESCE(ctc.n, 0) + 1.0)) AS s,
         CAST(sum(tf.tf) AS BIGINT) AS ndt
  FROM tf CROSS JOIN (SELECT c FROM cstats) cs
  LEFT JOIN ctc ON ctc.c = cs.c AND ctc.term = tf.term
  GROUP BY 1, 2),
scored AS MATERIALIZED (
  SELECT s0.doc_id, s0.c,
         round(s0.s + cs.logprior - s0.ndt * cs.lognorm, 6) AS score
  FROM s0 JOIN cstats cs ON s0.c = cs.c),
pick AS (
  SELECT doc_id, c AS pred, score,
         row_number() OVER (
           PARTITION BY doc_id ORDER BY score DESC, c) AS rn
  FROM scored)
SELECT p.doc_id, p.pred, p.score, te.lang AS actual,
       CAST(CASE WHEN p.pred = te.lang THEN 1 ELSE 0 END AS INT) AS correct
FROM pick p JOIN te ON p.doc_id = te.doc_id
WHERE p.rn = 1 ORDER BY p.doc_id
"""


@register("docs_nb_langid", _NB_LANGID_SQL)
def docs_nb_langid_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multinomial Naive Bayes language ID (operators/nbayes.py
    nb_classify) — train on the doc_id%5!=0 split, classify the held-out
    fifth, report prediction + truth + hit flag. The generative-counts
    classifier pretraining pipelines run as the cheap router before
    anything neural: train side is two count shuffles, scoring is the
    sparse (test-term × class) join — never a dense V×C grid. Scores are
    rounded log-joints (trigram-NLL float discipline); argmax tie-break
    (score DESC, class ASC) replays in the oracle."""
    from weaviate_txtai_spark.operators.nbayes import nb_classify

    docs = load_table(spark, sf_dir, "documents")
    train = docs.filter(F.col("doc_id") % 5 != 0)
    test = docs.filter(F.col("doc_id") % 5 == 0)
    preds = nb_classify(train, test, label_col="lang")
    return (
        preds.join(test.select("doc_id", F.col("lang").alias("actual")),
                   "doc_id")
        .select(
            "doc_id", "pred", "score", "actual",
            F.when(F.col("pred") == F.col("actual"), 1)
            .otherwise(0).cast("int").alias("correct"),
        )
        .orderBy("doc_id")
    )


_CHI2_TERMS_SQL = """
WITH d AS MATERIALIZED (
  SELECT source,
         list_distinct(
           list_filter(string_split(text, ' '), x -> x <> '')) AS tok
  FROM documents),
p AS (SELECT source AS class, unnest(tok) AS term FROM d),
n11 AS MATERIALIZED (
  SELECT class, term, CAST(count(*) AS DOUBLE) AS n11
  FROM p GROUP BY 1, 2),
dft AS MATERIALIZED (
  SELECT term, sum(n11) AS df_t FROM n11 GROUP BY 1),
nc AS (SELECT source AS class, CAST(count(*) AS DOUBLE) AS n_c
       FROM documents GROUP BY 1),
tot AS (SELECT CAST(count(*) AS DOUBLE) AS n_total FROM documents),
sc AS MATERIALIZED (
  SELECT class, term,
         round(n_total
               * (n11 * (n_total - n_c - df_t + n11)
                  - (df_t - n11) * (n_c - n11))
               * (n11 * (n_total - n_c - df_t + n11)
                  - (df_t - n11) * (n_c - n11))
               / (n_c * (n_total - n_c) * df_t * (n_total - df_t)),
               4) AS chi2,
         CAST(n11 AS BIGINT) AS n11
  FROM n11 JOIN dft USING (term) JOIN nc USING (class), tot
  WHERE df_t < n_total
    AND n11 * (n_total - n_c - df_t + n11)
        > (df_t - n11) * (n_c - n11))
SELECT class, term, chi2, n11 FROM (
  SELECT *, row_number() OVER (
    PARTITION BY class ORDER BY chi2 DESC, term) AS rn
  FROM sc)
WHERE rn <= 10 ORDER BY class, chi2 DESC, term
"""


@register("source_chi2_terms", _CHI2_TERMS_SQL)
def source_chi2_terms_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source χ² term selection (operators/featsel.py chi2_terms):
    the supervised companion to source_llr_keyterms — 2×2
    document-presence contingency per (source, term), positively
    associated top-10 per source. Three count shuffles; the class and
    corpus totals ride broadcast; the cut is a class-partitioned
    window. All products are exact integer-valued doubles below 2^53,
    so the rounded statistic replays bit-identically."""
    from weaviate_txtai_spark.operators.featsel import chi2_terms

    docs = load_table(spark, sf_dir, "documents")
    return chi2_terms(docs, class_col="source", top_k=10)


_GOOD_TURING_SQL = """
WITH t AS MATERIALIZED (
  SELECT list_filter(string_split(text, ' '), x -> x <> '') AS tok
  FROM documents),
bg AS (
  SELECT tok[s.x] || ' ' || tok[s.x + 1] AS term
  FROM t, unnest(generate_series(1, len(tok) - 1)) AS s(x)
  WHERE len(tok) >= 2),
c AS MATERIALIZED (
  SELECT term, CAST(count(*) AS BIGINT) AS c FROM bg GROUP BY 1),
nr AS MATERIALIZED (
  SELECT c AS r, CAST(count(*) AS BIGINT) AS n_r FROM c GROUP BY 1),
tot AS (SELECT CAST(sum(c) AS DOUBLE) AS t FROM c),
n1 AS (SELECT CAST(COALESCE(
         sum(CASE WHEN r = 1 THEN n_r END), 0) AS DOUBLE) AS n1 FROM nr)
SELECT nr.r, nr.n_r,
       round((nr.r + 1) * CAST(nx.n_r AS DOUBLE) / nr.n_r, 6) AS r_star,
       round(n1.n1 / tot.t, 6) AS p_unseen
FROM nr LEFT JOIN nr nx ON nx.r = nr.r + 1, tot, n1
WHERE nr.r <= 15 ORDER BY nr.r
"""


@register("token_good_turing", _GOOD_TURING_SQL)
def token_good_turing_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Good–Turing adjusted frequencies r* = (r+1)·N_{r+1}/N_r from the
    unigram count-of-counts (operators/lm.py good_turing_rstar), plus
    the N₁/T unseen-mass estimate — the LM smoothing companion to
    docs_zipf_fit (whose log-log regression is the Gale–Sampson fill
    for the N_{r+1}=0 holes, surfaced here as NULL r*). BIGRAM type
    space: the synthetic unigram vocabulary is saturated (min count 26
    — no low-r types at all), while bigrams keep the low-count tail
    Good–Turing exists for. One token shuffle + one count-of-counts
    aggregate; everything after is count-domain-sized."""
    from weaviate_txtai_spark.operators.lm import good_turing_rstar

    docs = load_table(spark, sf_dir, "documents")
    return good_turing_rstar(docs, max_r=15, ngram=2)


_HEAPS_SQL = """
WITH tok AS MATERIALIZED (
  SELECT doc_id,
         unnest(list_filter(string_split(text, ' '), x -> x <> ''))
           AS term
  FROM documents),
tb AS (SELECT doc_id // 25 AS b, CAST(count(*) AS BIGINT) AS nt
       FROM tok GROUP BY 1),
fo AS (SELECT min(doc_id) AS fd FROM tok GROUP BY term),
vb AS (SELECT fd // 25 AS b, CAST(count(*) AS BIGINT) AS nv
       FROM fo GROUP BY 1),
pb AS (SELECT tb.b AS b, nt, COALESCE(nv, 0) AS nv
       FROM tb LEFT JOIN vb ON tb.b = vb.b),
ck AS (SELECT b, CAST(sum(nt) OVER (ORDER BY b) AS BIGINT) AS N,
              CAST(sum(nv) OVER (ORDER BY b) AS BIGINT) AS V
       FROM pb),
pts AS (SELECT ln(CAST(N AS DOUBLE)) AS x, ln(CAST(V AS DOUBLE)) AS y,
               N, V
        FROM ck WHERE N > 0 AND V > 0)
SELECT CAST(count(*) AS BIGINT) AS n_checkpoints,
       CAST(max(N) AS BIGINT) AS total_tokens,
       CAST(max(V) AS BIGINT) AS vocab,
       round(covar_pop(x, y) / var_pop(x), 6) AS heaps_beta,
       round(exp(avg(y) - covar_pop(x, y) / var_pop(x) * avg(x)), 6)
         AS heaps_k,
       round(covar_pop(x, y) * covar_pop(x, y)
             / (var_pop(x) * var_pop(y)), 6) AS r2
FROM pts
"""


@register("docs_heaps_law", _HEAPS_SQL)
def docs_heaps_law_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law vocabulary-growth fit over the document stream
    (operators/profile.py heaps_fit) — V(N) ≈ K·N^β, the dual of the
    Zipf gate and the exponent behind tokenizer-vocab sizing: token
    totals and type first-occurrences reduce to ONE 25-doc-bucket
    table each, prefixes come from the buckets² self-join, and the fit
    is one moment aggregate over the checkpoints."""
    from weaviate_txtai_spark.functions.text import tokens
    from weaviate_txtai_spark.operators.profile import heaps_fit

    docs = load_table(spark, sf_dir, "documents")
    doc_tokens = docs.select(
        "doc_id", F.explode(tokens("text")).alias("term")
    )
    return heaps_fit(doc_tokens, "doc_id", "term", step=25)
