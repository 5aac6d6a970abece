"""Dedup + decontamination gates: exact/Jaccard/MinHash/SimHash/embedding families, survivors, incremental, containment.

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

# --------------------------------------------------------------------------
# Dedup suite (north-star M3): exact, n-gram Jaccard, MinHash LSH,
# SimHash, embedding cosine
# --------------------------------------------------------------------------

_DEDUP_EXACT_SQL = """
SELECT CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(DISTINCT fp) AS BIGINT) AS n_unique,
       CAST(count(*) - count(DISTINCT fp) AS BIGINT) AS n_exact_dups
FROM (SELECT md5(trim(lower(regexp_replace(text, '\\s+', ' ', 'g')))) AS fp
      FROM documents)
"""


@register("dedup_exact", _DEDUP_EXACT_SQL)
def dedup_exact_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from weaviate_txtai_spark.operators.dedup import exact_dedup_stats

    return exact_dedup_stats(load_table(spark, sf_dir, "documents"))


# Shared CTE: distinct 3-gram shingles + exact Jaccard pairs >= 0.8.
_JACCARD_CTE = """
WITH sh AS (
  SELECT doc_id, unnest(list_distinct(list_transform(
           range(1, greatest(len(toks) - 2, 0) + 1),
           i -> array_to_string(list_slice(toks, i, i + 2), ' ')))) AS shingle
  FROM (SELECT doc_id,
               list_filter(string_split(text, ' '), x -> x <> '') AS toks
        FROM documents)
), sz AS (
  SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
), common AS (
  SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS c
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
), pairs AS (
  SELECT d1, d2,
         round(c * 1.0 / (s1.n + s2.n - c), 6) AS jaccard
  FROM common
  JOIN sz s1 ON common.d1 = s1.doc_id
  JOIN sz s2 ON common.d2 = s2.doc_id
)
"""

_JACCARD_SQL = _JACCARD_CTE + "SELECT d1, d2, jaccard FROM pairs WHERE jaccard >= 0.8"


@register("dedup_ngram_jaccard", _JACCARD_SQL)
def dedup_jaccard_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact near-dup specification: shingle inverted-index join."""
    from weaviate_txtai_spark.operators.dedup import jaccard_pairs

    return jaccard_pairs(load_table(spark, sf_dir, "documents"), threshold=0.8)


@register("dedup_minhash", _JACCARD_SQL)
def dedup_minhash_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH candidates verified by exact Jaccard. Same oracle as
    the exact query: with 16 bands x 4 rows a 0.8-Jaccard pair escapes
    with p ~ 2e-5, and the testdata dups sit at >= 0.9 (p ~ 1e-8), so
    LSH output == exact output; a recall miss WOULD fail the gate, which
    is exactly what we want to know."""
    from weaviate_txtai_spark.operators.dedup import minhash_lsh_pairs

    return minhash_lsh_pairs(load_table(spark, sf_dir, "documents"), threshold=0.8)


# True connected components over the undirected pair graph: a recursive
# CTE enumerating every (node, reachable id) and taking the min. Valid
# for ANY graph shape — the previous single-hop-min form silently assumed
# min-id-star clusters and would reject correct engine output on e.g.
# pairs (1,3),(2,3) with no (1,2) (ADVICE r2).
_CC_SQL_TAIL = """
, edges AS (
  SELECT d1, d2 FROM pairs WHERE jaccard >= 0.8
), undirected AS (
  SELECT d1 AS a, d2 AS b FROM edges
  UNION ALL
  SELECT d2 AS a, d1 AS b FROM edges
), reach AS (
  SELECT a AS node, a AS r FROM undirected
  UNION
  SELECT u.b AS node, reach.r AS r
  FROM reach JOIN undirected u ON reach.node = u.a
)
"""

_DEDUP_GROUPS_SQL = (
    _JACCARD_CTE.replace("WITH sh AS", "WITH RECURSIVE sh AS")
    + _CC_SQL_TAIL
    + """
SELECT node AS doc_id, min(r) AS group_id FROM reach GROUP BY node
"""
)


@register("dedup_groups", _DEDUP_GROUPS_SQL)
def dedup_groups_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected duplicate groups (min-id label propagation). Oracle is
    a recursive-CTE connected components — exact for any pair-graph
    shape, same fixpoint the Spark side computes."""
    from weaviate_txtai_spark.operators.dedup import (
        duplicate_groups,
        jaccard_pairs,
    )

    pairs = jaccard_pairs(load_table(spark, sf_dir, "documents"), threshold=0.8)
    return duplicate_groups(pairs)


_SURVIVORS_SQL = (
    _JACCARD_CTE.replace("WITH sh AS", "WITH RECURSIVE sh AS")
    + _CC_SQL_TAIL
    + """
SELECT doc_id, source, CAST(n_chars AS BIGINT) AS n_chars
FROM documents
WHERE doc_id NOT IN (
  SELECT node FROM reach GROUP BY node HAVING min(r) < node
)
ORDER BY doc_id
"""
)


@register("dedup_survivors", _SURVIVORS_SQL)
def dedup_survivors_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup END-PRODUCT: the corpus minus non-representative
    duplicates (keep min-id per near-dup group). Oracle computes true
    connected components via recursive CTE and drops every node whose
    component min is below it — exact for any pair-graph shape, matching
    the Spark side's connected-components fixpoint + anti-join."""
    from weaviate_txtai_spark.operators.dedup import (
        dedup_survivors,
        jaccard_pairs,
    )

    docs = load_table(spark, sf_dir, "documents")
    pairs = jaccard_pairs(docs, threshold=0.8)
    return (
        dedup_survivors(docs, pairs)
        .select("doc_id", "source", F.col("n_chars").cast("long").alias("n_chars"))
        .orderBy("doc_id")
    )


_EMB_DUP_SQL = """
SELECT a.vec_id AS d1, b.vec_id AS d2,
       round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                    CAST(b.embedding AS DOUBLE[])), 6) AS cosine
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                   CAST(b.embedding AS DOUBLE[])), 6) >= 0.45
"""


@register("dedup_embedding", _EMB_DUP_SQL)
def dedup_embedding_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from weaviate_txtai_spark.operators.dedup import embedding_dup_pairs

    return embedding_dup_pairs(load_table(spark, sf_dir, "embeddings"))


@register("dedup_embedding_lsh", _EMB_DUP_SQL)
def dedup_embedding_lsh_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyperplane-LSH embedding dedup, gated at num_planes=0 (one table,
    one bucket → every pair a candidate, recall exactly 1): the bucketing
    + bucket-local chunked GEMM verify machinery must equal the exact
    crossJoin spec (`dedup_embedding`). Production 4-plane × 16-table
    recall is pinned in tests/test_dedup.py (VERDICT r2 item 1)."""
    from weaviate_txtai_spark.operators.dedup import embedding_dup_pairs_lsh

    return embedding_dup_pairs_lsh(
        load_table(spark, sf_dir, "embeddings"), num_planes=0, num_tables=1
    )


# 32-bit SimHash with md5-derived token hashes: every step (token hash,
# per-bit majority vote, signature assembly, pigeonhole-blocked hamming
# join) is reproduced in DuckDB SQL, so the SimHash pipeline itself is
# hash-checked; the xxhash64 64-bit production variant is pinned
# structurally in tests/test_dedup.py (VERDICT r2 item 1).
_SIMHASH_SQL = """
WITH tok AS (
  SELECT doc_id,
         unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS t
  FROM documents
), th AS (
  SELECT doc_id, ('0x' || substr(md5(t), 1, 8))::BIGINT AS h FROM tok
), votes AS (
  SELECT doc_id, b.b AS b,
         sum(CASE WHEN (h >> b.b) & 1 = 1 THEN 1 ELSE -1 END) AS v
  FROM th CROSS JOIN (SELECT unnest(generate_series(0, 31)) AS b) b
  GROUP BY doc_id, b.b
), sig AS (
  SELECT doc_id,
         CAST(sum(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << b) ELSE 0 END)
              AS BIGINT) AS s
  FROM votes GROUP BY doc_id
), sig0 AS (
  SELECT d.doc_id, coalesce(s.s, 0) AS s
  FROM (SELECT doc_id FROM documents) d LEFT JOIN sig s USING (doc_id)
)
SELECT a.doc_id AS d1, b.doc_id AS d2,
       CAST(bit_count(xor(a.s, b.s)) AS INT) AS hamming
FROM sig0 a JOIN sig0 b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.s, b.s)) <= 3
"""


@register("dedup_simhash", _SIMHASH_SQL)
def dedup_simhash_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from weaviate_txtai_spark.operators.dedup import simhash_pairs

    res = simhash_pairs(
        load_table(spark, sf_dir, "documents"),
        max_hamming=3,
        bits=32,
        token_hash="md5",
    )
    return res.select("d1", "d2", F.col("hamming").cast("int").alias("hamming"))


_ROLLING_FP_SQL = """
SELECT doc_id,
       list_reduce(
         list_prepend(CAST(0 AS BIGINT),
           list_transform(
             list_filter(string_split(text, ' '), x -> x <> ''),
             t -> CAST(ascii(t) * 31 + length(t) AS BIGINT))),
         (acc, x) -> (acc * 131 + x) % 1000000007) AS fp
FROM documents
ORDER BY doc_id
"""


@register("doc_fingerprint_rolling", _ROLLING_FP_SQL)
def doc_fingerprint_rolling_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-hash document fingerprint (position-sensitive, pure
    codegen fold — no UDF); the md5 form is covered by text_stats."""
    from weaviate_txtai_spark.functions.text import rolling_fingerprint

    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", rolling_fingerprint("text").alias("fp")
    ).orderBy("doc_id")


_CONTAMINATION_SQL = _JACCARD_CTE + """
, sides AS (
  SELECT doc_id, CAST(substr(source, 4) AS INT) % 2 AS side FROM documents
)
SELECT p.d1, p.d2, p.jaccard,
       CAST(sa.side AS INT) AS side1, CAST(sb.side AS INT) AS side2
FROM pairs p
JOIN sides sa ON p.d1 = sa.doc_id
JOIN sides sb ON p.d2 = sb.doc_id
WHERE p.jaccard >= 0.8 AND sa.side <> sb.side
"""


@register("contamination_check", _CONTAMINATION_SQL)
def contamination_check_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-decontamination: near-dup pairs that CROSS a corpus
    boundary (here: even- vs odd-numbered sources standing in for
    train vs eval). Reuses the MinHash-LSH scale path — the side
    predicate filters the verified pairs, so the expensive stages are
    shared with in-corpus dedup and the check costs one extra broadcast
    join. The exact-Jaccard oracle proves no cross-side pair escapes
    the LSH bands at this threshold."""
    from weaviate_txtai_spark.operators.dedup import minhash_lsh_pairs

    docs = load_table(spark, sf_dir, "documents")
    sides = docs.select(
        "doc_id",
        (F.substring("source", 4, 10).cast("int") % 2).cast("int").alias("side"),
    )
    pairs = minhash_lsh_pairs(docs, threshold=0.8)
    return (
        pairs.join(
            F.broadcast(sides.select(F.col("doc_id").alias("d1"),
                                     F.col("side").alias("side1"))), "d1"
        )
        .join(
            F.broadcast(sides.select(F.col("doc_id").alias("d2"),
                                     F.col("side").alias("side2"))), "d2"
        )
        .filter(F.col("side1") != F.col("side2"))
        .select("d1", "d2", "jaccard", "side1", "side2")
    )


_DEDUP_INCREMENTAL_SQL = _JACCARD_CTE + """
, cut AS (SELECT CAST(0.9 * max(doc_id) AS BIGINT) AS c FROM documents)
SELECT CASE WHEN p.d1 > cut.c THEN p.d1 ELSE p.d2 END AS new_id,
       CASE WHEN p.d1 > cut.c THEN p.d2 ELSE p.d1 END AS corpus_id,
       p.jaccard
FROM pairs p, cut
WHERE p.jaccard >= 0.8
  AND ((p.d1 > cut.c) <> (p.d2 > cut.c))
"""


@register("dedup_incremental", _DEDUP_INCREMENTAL_SQL)
def dedup_incremental_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental dedup: the newest 10% of doc ids (the 'daily batch')
    against the older 90% (the 'corpus'). Old×old pairs are never
    generated — the recurring cost of production dedup is the batch,
    not the history (operators/dedup.minhash_lsh_pairs_incremental).
    Oracle: the exact-Jaccard pair set restricted to pairs crossing
    the cut."""
    from weaviate_txtai_spark.operators.dedup import (
        minhash_lsh_pairs_incremental,
    )

    docs = load_table(spark, sf_dir, "documents")
    # round-half-up matches the oracle's CAST(0.9*max AS BIGINT)
    # (DuckDB rounds to nearest; Python int() truncates)
    cut = math.floor(docs.agg(F.max("doc_id")).head()[0] * 0.9 + 0.5)
    new_docs = docs.filter(F.col("doc_id") > cut)
    corpus = docs.filter(F.col("doc_id") <= cut)
    return minhash_lsh_pairs_incremental(new_docs, corpus, threshold=0.8)


_REPEATED_PASSAGE_STATS_SQL = """
WITH t AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS tok
  FROM documents
), w AS (
  SELECT doc_id, md5(array_to_string(tok[s.x : s.x + 7], ' ')) AS wh
  FROM t, unnest(generate_series(1, len(tok) - 7)) AS s(x)
  WHERE len(tok) >= 8
), p AS (
  SELECT doc_id, wh, count(*) AS n_occ FROM w GROUP BY 1, 2
), f AS (
  SELECT wh, count(*) AS dfq FROM p GROUP BY 1
), r AS (
  SELECT p.doc_id,
         sum(p.n_occ) AS nw,
         sum(CASE WHEN f.dfq >= 2 THEN p.n_occ ELSE 0 END) AS nr
  FROM p JOIN f USING (wh) GROUP BY 1
)
SELECT d.doc_id,
       CAST(coalesce(r.nw, 0) AS BIGINT) AS n_windows,
       CAST(coalesce(r.nr, 0) AS BIGINT) AS n_repeated,
       round(CASE WHEN coalesce(r.nw, 0) > 0
                  THEN CAST(r.nr AS DOUBLE) / r.nw ELSE 0.0 END, 6)
         AS repeated_ratio,
       round(CASE WHEN coalesce(r.nw, 0) > 0
                  THEN CAST(r.nr AS DOUBLE) / r.nw ELSE 0.0 END, 6) <= 0.5
         AS keep
FROM documents d LEFT JOIN r USING (doc_id)
"""


@register("repeated_passage_stats", _REPEATED_PASSAGE_STATS_SQL)
def repeated_passage_stats_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sub-document dedup signal (Lee et al. 2021 shape): fraction of
    each doc's 8-token windows that recur in other docs, plus the
    C4-style keep flag. Gate runs md5 hash mode so DuckDB reproduces the
    window hashes byte-for-byte; production xxhash64 mode (8-byte keys,
    ~4x less shuffle than hex digests) is pinned equal in pytest. All
    corpus-wide steps are aggregates or hash-equi-joins — a boilerplate
    window in 10M docs costs 10M rows through a map-side-combined count,
    never 10M² pairs."""
    from weaviate_txtai_spark.operators.passages import repeated_passage_stats

    docs = load_table(spark, sf_dir, "documents")
    return repeated_passage_stats(
        docs, k=8, min_docs=2, max_ratio=0.5, hash_mode="md5"
    )


_REPEATED_PASSAGES_SQL = """
WITH t AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS tok
  FROM documents
), w AS (
  SELECT doc_id, md5(array_to_string(tok[s.x : s.x + 7], ' ')) AS wh
  FROM t, unnest(generate_series(1, len(tok) - 7)) AS s(x)
  WHERE len(tok) >= 8
), p AS (
  SELECT doc_id, wh, count(*) AS n_occ FROM w GROUP BY 1, 2
)
SELECT wh,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_occ) AS BIGINT) AS n_occ
FROM p GROUP BY 1 HAVING count(*) >= 2
"""


@register("repeated_passages", _REPEATED_PASSAGES_SQL)
def repeated_passages_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus-level boilerplate inventory: every 8-token window
    occurring in >= 2 distinct docs, with doc- and occurrence-counts
    (feeds blocklists / redaction passes)."""
    from weaviate_txtai_spark.operators.passages import repeated_passages

    docs = load_table(spark, sf_dir, "documents")
    return repeated_passages(docs, k=8, min_docs=2, hash_mode="md5")


# --------------------------------------------------------------------------
# Quality-policy dedup survivors (keep best member per duplicate group)
# --------------------------------------------------------------------------

_SURVIVORS_BY_SQL = (
    _JACCARD_CTE.replace("WITH sh AS", "WITH RECURSIVE sh AS")
    + _CC_SQL_TAIL
    + """
, members AS (
  SELECT node AS doc_id, min(r) AS group_id FROM reach GROUP BY node
), mq AS (
  SELECT m.group_id, m.doc_id, d.n_chars
  FROM members m JOIN documents d USING (doc_id)
), bq AS (
  SELECT group_id, max(n_chars) AS bq FROM mq GROUP BY group_id
), best AS (
  -- IS NOT DISTINCT FROM, not '=': an all-NULL-quality group has
  -- bq NULL, and a NULL-unsafe join would emit no best row for it —
  -- every member would survive, diverging from the engine's
  -- eqNullSafe min-id fallback (pinned in pytest)
  SELECT mq.group_id, min(mq.doc_id) AS best_id
  FROM mq JOIN bq ON mq.group_id = bq.group_id
                 AND mq.n_chars IS NOT DISTINCT FROM bq.bq
  GROUP BY mq.group_id
)
SELECT doc_id, source, CAST(n_chars AS BIGINT) AS n_chars
FROM documents
WHERE doc_id NOT IN (
  SELECT mq.doc_id FROM mq JOIN best USING (group_id)
  WHERE mq.doc_id <> best.best_id
)
ORDER BY doc_id
"""
)


@register("dedup_survivors_longest", _SURVIVORS_BY_SQL)
def dedup_survivors_longest_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup end-product with the production KEEP rule: per duplicate
    group keep the LONGEST member (n_chars, ties to min id) instead of
    the arbitrary min-id one — truncated copies lose to full copies.
    Oracle: recursive-CTE connected components + the same two-step
    argmax (max quality, then min id among the maximal)."""
    from weaviate_txtai_spark.operators.dedup import (
        dedup_survivors_by,
        jaccard_pairs,
    )

    docs = load_table(spark, sf_dir, "documents")
    pairs = jaccard_pairs(docs, threshold=0.8)
    return (
        dedup_survivors_by(docs, pairs, quality_col="n_chars", keep="max")
        .select("doc_id", "source", F.col("n_chars").cast("long").alias("n_chars"))
        .orderBy("doc_id")
    )


_CONTAINMENT_SQL = """
WITH t AS (
  SELECT doc_id, CAST(substring(source, 4, 10) AS INT) % 2 AS side,
         list_filter(string_split(text, ' '), x -> x <> '') AS tok
  FROM documents
),
w AS (
  SELECT doc_id, side, md5(array_to_string(tok[s.x : s.x + 7], ' ')) AS wh
  FROM t, unnest(generate_series(1, len(tok) - 7)) AS s(x)
  WHERE len(tok) >= 8
),
dw AS (SELECT DISTINCT doc_id, side, wh FROM w),
train_set AS (SELECT DISTINCT wh FROM dw WHERE side = 0),
ev AS (SELECT doc_id, wh FROM dw WHERE side = 1),
tot AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_windows FROM ev GROUP BY 1),
hit AS (
  SELECT ev.doc_id, CAST(count(*) AS BIGINT) AS n_hit
  FROM ev JOIN train_set USING (wh) GROUP BY 1
)
SELECT tot.doc_id, tot.n_windows,
       CAST(coalesce(hit.n_hit, 0) AS BIGINT) AS n_hit,
       round(coalesce(hit.n_hit, 0) * 1.0 / tot.n_windows, 6) AS containment
FROM tot LEFT JOIN hit USING (doc_id)
UNION ALL
SELECT doc_id, CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(NULL AS DOUBLE)
FROM t WHERE side = 1 AND (tok IS NULL OR len(tok) < 8)
ORDER BY doc_id
"""


@register("eval_containment", _CONTAINMENT_SQL)
def eval_containment_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GRADED decontamination (GPT-3/PaLM containment): per eval doc
    (odd sources), the fraction of its distinct 8-token windows found
    anywhere in the training side (even sources). Complements
    contamination_check's whole-document pair list — this catches an
    eval question embedded in an otherwise-novel page and yields a
    thresholdable score. Train side collapses to a distinct hash SET
    (never pair-joined); eval windows semi-join it. md5 mode for the
    byte-exact oracle; xxhash64 production mode pinned equal in
    pytest."""
    from weaviate_txtai_spark.operators.passages import ngram_containment

    docs = load_table(spark, sf_dir, "documents")
    side = (F.substring("source", 4, 10).cast("int") % 2).alias("side")
    tagged = docs.select("doc_id", "text", side)
    return (
        ngram_containment(
            tagged.filter(F.col("side") == 1),
            tagged.filter(F.col("side") == 0),
            k=8,
            hash_mode="md5",
        )
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# Soft dedup: down-weight duplicate-cluster members instead of dropping
# --------------------------------------------------------------------------

_DEDUP_WEIGHTS_SQL = (
    _JACCARD_CTE.replace("WITH sh AS", "WITH RECURSIVE sh AS")
    + _CC_SQL_TAIL
    + """
, grp AS (SELECT node AS doc_id, min(r) AS gid FROM reach GROUP BY node),
gsz AS (SELECT gid, count(*) AS sz FROM grp GROUP BY gid)
SELECT d.doc_id,
       CAST(coalesce(gsz.sz, 1) AS BIGINT) AS group_size,
       round(CAST(1.0 AS DOUBLE) / coalesce(gsz.sz, 1), 6) AS weight
FROM documents d
LEFT JOIN grp ON d.doc_id = grp.doc_id
LEFT JOIN gsz ON grp.gid = gsz.gid
ORDER BY d.doc_id
"""
)


@register("dedup_weights", _DEDUP_WEIGHTS_SQL)
def dedup_weights_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SOFT dedup: instead of dropping duplicates, every member of a
    near-dup cluster gets sampling weight 1/|cluster| (ungrouped docs
    weight 1) — the cluster contributes one doc's worth of mass in
    expectation while keeping intra-cluster diversity (the SoftDeDup
    idea; also how repetition-aware samplers consume dedup output).
    Same machinery as dedup_groups plus one size agg and a left join;
    the oracle recomputes components via the recursive CTE."""
    from weaviate_txtai_spark.operators.dedup import (
        duplicate_groups,
        jaccard_pairs,
    )

    docs = load_table(spark, sf_dir, "documents")
    pairs = jaccard_pairs(docs, threshold=0.8)
    groups = duplicate_groups(pairs)
    sizes = groups.groupBy("group_id").agg(F.count(F.lit(1)).alias("sz"))
    return (
        docs.join(groups, "doc_id", "left")
        # no broadcast hint on sizes: one row per duplicate GROUP, which
        # a dup-heavy corpus makes arbitrarily large (same hazard as the
        # dedup_survivors drop set, NOTES r2) — let AQE pick
        .join(sizes, "group_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("sz"), F.lit(1)).cast("long").alias("group_size"),
            F.round(
                F.lit(1.0) / F.coalesce(F.col("sz"), F.lit(1)), 6
            ).alias("weight"),
        )
        .orderBy("doc_id")
    )


@register("dedup_prefix_jaccard", _JACCARD_SQL)
def dedup_prefix_jaccard_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PPJoin-style prefix-filtered exact set-similarity join
    (operators/setjoin.py, round 7): the THIRD strategy under the same
    brute-inverted-index oracle as dedup_ngram_jaccard /
    dedup_minhash. Only each doc's p = n − ⌈θn⌉ + 1 RAREST shingles
    enter the self-join (at θ=0.8 ~20% of the index volume, and the
    prefix items are by construction the low-df keys — the stopword
    hot-key blowup never materializes); candidates are a provable
    superset of true pairs and are verified exactly, so the output is
    identical to the all-items join."""
    from weaviate_txtai_spark.operators.setjoin import jaccard_prefix_pairs

    return jaccard_prefix_pairs(
        load_table(spark, sf_dir, "documents"), threshold=0.8
    )


# --------------------------------------------------------------------------
# Round 7: winnowing fingerprints (Schleimer 2003 / MOSS) + shared
# verbatim runs (Lee et al. 2021 suffix-array semantics, re-expressed
# as positional k-gram islands)
# --------------------------------------------------------------------------

# Shared CTE: k=5-gram rolling hashes -> w=4 rightmost-min winnowing ->
# distinct (doc, pos, fp). Mirrors operators/passages.py
# winnow_fingerprints arithmetic exactly (ascii*31+len token hash,
# base-131 fold mod 1e9+7).
_WINNOW_CTE = """
WITH th AS (
  SELECT doc_id,
         list_transform(list_filter(string_split(text, ' '), x -> x <> ''),
                        t -> CAST(ascii(t) * 31 + length(t) AS BIGINT)) AS th
  FROM documents
), kgt AS (
  SELECT doc_id,
         list_transform(generate_series(1, len(th) - 4),
           i -> list_reduce(list_prepend(CAST(0 AS BIGINT), list_slice(th, i, i + 4)),
                            (a, x) -> (a * 131 + x) % 1000000007)) AS kg
  FROM th WHERE len(th) >= 5
), sel AS (
  SELECT doc_id,
         list_transform(
           generate_series(1, len(kg) - least(len(kg), 4) + 1),
           j -> list_reduce(
                  list_prepend({'fp': CAST(1000000008 AS BIGINT), 'pos': -1},
                    list_transform(generate_series(j, j + least(len(kg), 4) - 1),
                                   p -> {'fp': kg[p], 'pos': CAST(p AS INT)})),
                  (acc, x) -> CASE WHEN x.fp <= acc.fp THEN x ELSE acc END)) AS sel
  FROM kgt WHERE len(kg) >= 1
), fps AS (
  SELECT DISTINCT doc_id, f.pos AS pos, f.fp AS fp
  FROM (SELECT doc_id, unnest(sel) AS f FROM sel)
)
"""

_WINNOW_FP_SQL = _WINNOW_CTE + """
SELECT doc_id, pos, fp FROM fps
WHERE doc_id % 7 = 3
ORDER BY doc_id, pos
"""


@register("winnow_fingerprints", _WINNOW_FP_SQL)
def winnow_fingerprints_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing fingerprint selection (operators/passages.py
    winnow_fingerprints — Schleimer/Wilkerson/Aiken 2003): per doc, the
    rightmost-min k=5-gram rolling hash of every w=4 window, deduped to
    (pos, fp). Entirely map-side codegen array expressions — the gate's
    only exchange is the output sort. The doc_id % 7 slice keeps the
    gate's row count driver-sized; the operator is per-doc, so the
    slice commutes with the computation."""
    from weaviate_txtai_spark.operators.passages import winnow_fingerprints

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 7 == 3
    )
    return (
        winnow_fingerprints(docs, k=5, w=4)
        .select("doc_id", "pos", F.col("fp").cast("long").alias("fp"))
        .orderBy("doc_id", "pos")
    )


_WINNOW_PAIRS_SQL = _WINNOW_CTE + """
, s AS (SELECT DISTINCT doc_id, fp FROM fps),
sizes AS (SELECT doc_id, count(*) AS n FROM s GROUP BY doc_id),
rare AS (SELECT s.* FROM s JOIN (SELECT fp FROM s GROUP BY fp
         HAVING count(*) BETWEEN 2 AND 50) r USING (fp)),
shared AS (
  SELECT a.doc_id d1, b.doc_id d2, count(*) AS n_shared
  FROM rare a JOIN rare b USING (fp) WHERE a.doc_id < b.doc_id
  GROUP BY 1, 2 HAVING count(*) >= 2)
SELECT d1, d2, CAST(n_shared AS BIGINT) AS n_shared,
       round(n_shared / least(sa.n, sb.n), 6) AS containment
FROM shared JOIN sizes sa ON sa.doc_id = d1 JOIN sizes sb ON sb.doc_id = d2
ORDER BY d1, d2
"""


@register("winnow_pairs", _WINNOW_PAIRS_SQL)
def winnow_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MOSS-style clone-pair report over winnowed fingerprints
    (operators/passages.py winnow_pairs): pairs sharing >= 2 distinct
    fingerprint values, containment = shared/min(|A|,|B|). The pair
    join runs on the SPARSE fingerprint sets (expected density 2/(w+1)
    of the dense window table) through a df-capped inverted index —
    never all-pairs."""
    from weaviate_txtai_spark.operators.passages import winnow_pairs

    docs = load_table(spark, sf_dir, "documents")
    return winnow_pairs(docs, k=5, w=4, min_shared=2, max_df=50).orderBy(
        "d1", "d2"
    )


_SHARED_RUNS_SQL = """
WITH tok AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t
  FROM documents
), g AS (
  SELECT doc_id, CAST(i AS INT) AS pos,
         md5(array_to_string(list_slice(t, i, i + 7), ' ')) AS wh
  FROM tok, unnest(generate_series(1, len(t) - 7)) AS u(i)
  WHERE len(t) >= 8
), rare AS (
  SELECT g.* FROM g JOIN (
    SELECT wh FROM g GROUP BY wh
    HAVING count(DISTINCT doc_id) >= 2 AND count(*) <= 20) f USING (wh)
), p AS (
  SELECT a.doc_id d1, b.doc_id d2, a.pos p1, b.pos p2
  FROM rare a JOIN rare b USING (wh) WHERE a.doc_id < b.doc_id
), runs AS (
  SELECT d1, d2, count(*) + 7 AS run_tokens
  FROM (SELECT d1, d2, p2 - p1 AS diff,
               p1 - row_number() OVER (PARTITION BY d1, d2, p2 - p1 ORDER BY p1) AS grp
        FROM p)
  GROUP BY d1, d2, diff, grp HAVING count(*) + 7 >= 12
)
SELECT d1, d2, CAST(max(run_tokens) AS BIGINT) AS max_run_tokens,
       CAST(count(*) AS BIGINT) AS n_runs
FROM runs GROUP BY d1, d2 ORDER BY d1, d2
"""


@register("shared_run_pairs", _SHARED_RUNS_SQL)
def shared_run_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal shared verbatim token runs per doc pair
    (operators/passages.py shared_runs — the Lee et al. 2021
    suffix-array span report as positional-k-gram islands). md5 hash
    mode for cross-engine window identity; production mode is
    xxhash64 (pytest pins mode parity)."""
    from weaviate_txtai_spark.operators.passages import shared_runs

    docs = load_table(spark, sf_dir, "documents")
    return shared_runs(
        docs, k=8, min_run_tokens=12, max_occ=20, hash_mode="md5"
    ).orderBy("d1", "d2")


_SPAN_REMOVAL_SQL = """
WITH t AS (
  SELECT doc_id, text,
         list_filter(string_split(text, ' '), x -> x <> '') AS tok
  FROM documents WHERE doc_id IS NOT NULL
),
w AS (
  SELECT doc_id, s.x AS p,
         md5(array_to_string(tok[s.x : s.x + 7], ' ')) AS wh
  FROM t, unnest(generate_series(1, len(tok) - 7)) AS s(x)
  WHERE len(tok) >= 8
),
hot AS (SELECT wh FROM w GROUP BY wh HAVING count(*) >= 2),
cov AS (
  SELECT DISTINCT w.doc_id, s2.y AS i
  FROM w JOIN hot USING (wh), unnest(generate_series(w.p, w.p + 7)) AS s2(y)
),
tk AS (
  SELECT doc_id, s.x AS i, tok[s.x] AS tkn
  FROM t, unnest(generate_series(1, len(tok))) AS s(x)
),
kept AS (
  SELECT tk.doc_id, tk.i, tk.tkn
  FROM tk LEFT JOIN cov ON tk.doc_id = cov.doc_id AND tk.i = cov.i
  WHERE cov.i IS NULL
),
agg AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
         md5(string_agg(tkn, ' ' ORDER BY i)) AS fp
  FROM kept GROUP BY doc_id
),
tot AS (
  SELECT doc_id, CAST(coalesce(len(tok), 0) AS BIGINT) AS n_tokens FROM t
)
SELECT tot.doc_id, tot.n_tokens,
       CAST(tot.n_tokens - coalesce(a.n_kept, 0) AS BIGINT) AS n_removed,
       coalesce(a.fp, md5('')) AS cleaned_fp
FROM tot LEFT JOIN agg a USING (doc_id)
ORDER BY tot.doc_id
"""


@register("dedup_span_removal", _SPAN_REMOVAL_SQL)
def dedup_span_removal_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact repeated-SPAN removal (operators/passages.py
    remove_repeated_spans — Lee et al. 2021, arXiv:2107.06499): every
    token covered by an 8-token window occurring >= 2 times in the
    corpus is deleted, ALL occurrences. The span-level complement to
    whole-document dedup: it cuts the boilerplate banner repeated
    across otherwise-distinct pages. The gate hashes the CLEANED TEXT
    (md5) per doc, so the oracle verifies the actual reconstructed
    output string, not just counts; md5 window mode for the byte-exact
    replay. Everything is token-linear — hot-hash set + semi join +
    anti join — never pairwise (the suffix-array formulation's
    shuffle-native twin)."""
    from weaviate_txtai_spark.operators.passages import (
        remove_repeated_spans,
    )

    docs = load_table(spark, sf_dir, "documents")
    out = remove_repeated_spans(docs, k=8, min_count=2, hash_mode="md5")
    return out.select(
        "doc_id",
        "n_tokens",
        "n_removed",
        F.md5(F.coalesce("cleaned_text", F.lit(""))).alias("cleaned_fp"),
    ).orderBy("doc_id")
