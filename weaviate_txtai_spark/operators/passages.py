"""Repeated-passage detection across a corpus (sub-document dedup).

Whole-document dedup (operators/dedup.py) misses the dominant failure
mode of web-scale training corpora: *passages* — boilerplate sentences,
license headers, navigation chrome — repeated verbatim across millions
of otherwise-distinct documents ("Deduplicating Training Data Makes
Language Models Better", Lee et al. 2021, which finds them with suffix
arrays on a single machine). The distributed re-expression here is the
standard n-gram-window form: every k-token window is hashed, window
hashes are counted across the corpus, and a window that occurs in
``min_docs`` distinct documents is a repeated passage. Per-doc output is
the fraction of window positions covered by repeated passages plus a
C4-style keep flag.

Scale shape (the reason this survives 100 TB where a suffix array
cannot): the window table is ~tokens-per-corpus rows but every operation
on it is an AGGREGATE or an equi-join on the window hash — never a
pair-join — so a boilerplate window shared by 10M docs costs 10M rows
through a map-side-combined count, not 10M² candidate pairs. Two
shuffles total: (doc, hash) distinct-count, then the hash-keyed join
back. Both AQE-skew-splittable because hot hashes only ever meet a
1-row-per-hash frequency table.

The reference has no sub-document operator at all (its unit is the
Weaviate object, `/root/reference/weaviate_txtai/ann/weaviate.py:140-147`);
this is a north-star extension.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from weaviate_txtai_spark.functions.text import tokens


def _window_hash(win: Column, hash_mode: str) -> Column:
    if hash_mode == "md5":
        # oracle mode: DuckDB computes the identical hex digest, so the
        # whole operator is value-checkable end-to-end
        return F.md5(win)
    if hash_mode == "xxhash64":
        # production mode: 8-byte int keys shuffle ~4x less than 32-char
        # hex strings. Same semantics (counts of equal windows) — pytest
        # pins md5-mode == xxhash64-mode results.
        return F.xxhash64(win)
    raise ValueError(f"hash_mode must be 'md5' or 'xxhash64', got {hash_mode!r}")


def window_doc_pairs(
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    hash_mode: str = "xxhash64",
) -> DataFrame:
    """(doc, window-hash, occurrence-count) for every distinct k-token
    window of every doc. Docs shorter than k tokens contribute nothing.

    Map-side explode then one aggregate; grouping to (doc, hash) BEFORE
    any corpus-wide step collapses intra-doc repeats early (the same
    window repeated 50x inside one page shuffles once, with n_occ=50).
    """
    tok = tokens(text_col)
    # 1-based slice starts over the materialized token array
    starts = F.sequence(F.lit(1), F.size("__tok") - (k - 1))
    win = F.concat_ws(" ", F.slice(F.col("__tok"), F.col("__s"), k))
    return (
        docs.filter(F.col(id_col).isNotNull())  # no pseudo-doc lumping
        .select(F.col(id_col), tok.alias("__tok"))
        .filter(F.size("__tok") >= k)
        .select(id_col, F.explode(starts).alias("__s"), F.col("__tok"))
        .select(id_col, _window_hash(win, hash_mode).alias("wh"))
        .groupBy(id_col, "wh")
        .agg(F.count(F.lit(1)).alias("n_occ"))
    )


def repeated_passage_stats(
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    min_docs: int = 2,
    max_ratio: float = 0.5,
    hash_mode: str = "xxhash64",
) -> DataFrame:
    """Per-doc repeated-passage profile: (doc_id, n_windows, n_repeated,
    repeated_ratio, keep).

    ``n_windows`` counts window POSITIONS (a window repeated inside one
    doc counts each occurrence); ``n_repeated`` counts positions whose
    window occurs in >= ``min_docs`` DISTINCT docs; ``keep`` is the
    C4-style doc filter ``repeated_ratio <= max_ratio``. Docs with fewer
    than k tokens have zero windows and are kept (ratio 0).
    """
    pairs = window_doc_pairs(
        docs, text_col=text_col, id_col=id_col, k=k, hash_mode=hash_mode
    )
    # frequency table: 1 row per distinct window hash. NOT broadcast —
    # a web corpus has ~tokens/10 distinct windows; this is a hash-keyed
    # sort-merge/shuffle join both sides of which are already (wh)-keyed
    # aggregates, so the join reuses the aggregation's partitioning.
    dfreq = pairs.groupBy("wh").agg(
        F.count(F.lit(1)).alias("__df")  # pairs is distinct on (doc, wh)
    )
    rep = (
        pairs.join(dfreq, "wh")
        .groupBy(id_col)
        .agg(
            F.sum("n_occ").alias("__nw"),
            F.sum(F.when(F.col("__df") >= min_docs, F.col("n_occ")).otherwise(0))
            .alias("__nr"),
        )
    )
    ratio = F.when(
        F.coalesce(F.col("__nw"), F.lit(0)) > 0,
        F.col("__nr") / F.col("__nw"),
    ).otherwise(F.lit(0.0))
    return (
        # NULL ids excluded here too: their windows never entered the
        # frequency table, so a restored NULL row would falsely claim
        # "0 windows, keep" for the lumped pseudo-doc
        docs.filter(F.col(id_col).isNotNull())
        .select(id_col)
        .join(rep, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("__nw"), F.lit(0)).cast("long").alias("n_windows"),
            F.coalesce(F.col("__nr"), F.lit(0)).cast("long").alias("n_repeated"),
            F.round(ratio, 6).alias("repeated_ratio"),
            (F.round(ratio, 6) <= max_ratio).alias("keep"),
        )
    )


def repeated_passages(
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    min_docs: int = 2,
    hash_mode: str = "xxhash64",
) -> DataFrame:
    """The repeated passages themselves: (wh, n_docs, n_occ) for every
    window occurring in >= min_docs distinct docs — the corpus-level
    boilerplate inventory (feeds blocklists / redaction passes)."""
    pairs = window_doc_pairs(
        docs, text_col=text_col, id_col=id_col, k=k, hash_mode=hash_mode
    )
    return (
        pairs.groupBy("wh")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_occ").cast("long").alias("n_occ"),
        )
        .filter(F.col("n_docs") >= min_docs)
    )


def ngram_containment(
    eval_docs: DataFrame,
    train_docs: DataFrame,
    *,
    k: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_mode: str = "xxhash64",
    round_decimals: int | None = 6,
) -> DataFrame:
    """GRADED decontamination: per eval document, the fraction of its
    distinct k-token windows that appear ANYWHERE in the training
    corpus — the GPT-3/PaLM-style containment metric. The MinHash
    cross-corpus check (``contamination_check``) finds whole-document
    near-dups; containment catches the harder case of an eval QUESTION
    embedded inside an otherwise-novel training page, and returns a
    score to threshold rather than a pair list.

    Plan: the training side collapses to a DISTINCT window-hash set
    (aggregate — never pair-joined); the eval side's windows LEFT join
    it 1:1 on the hash with a hit flag (hot boilerplate hashes meet a
    1-row-per-hash set, AQE-skew-splittable), and ONE per-doc groupBy
    yields totals and hit counts together. Eval docs
    shorter than k tokens are surfaced with n_windows=0 / NULL
    containment, not dropped.

    Output: ``id_col, n_windows, n_hit, containment``.
    """
    ev = window_doc_pairs(
        eval_docs, text_col=text_col, id_col=id_col, k=k, hash_mode=hash_mode
    ).select(id_col, "wh")
    train_set = (
        window_doc_pairs(
            train_docs, text_col=text_col, id_col=id_col, k=k,
            hash_mode=hash_mode,
        )
        .select("wh")
        .distinct()
    )
    # ONE left join carries both answers: train_set is distinct on wh,
    # so the join is 1:1 and a hit flag per window feeds totals and hit
    # counts from the same groupBy — no second aggregation, no re-join,
    # no persist (a semi-join + separate totals needed ev twice)
    ratio = F.col("n_hit") / F.col("n_windows")
    if round_decimals is not None:
        ratio = F.round(ratio, round_decimals)
    scored = (
        ev.join(train_set.withColumn("__hit", F.lit(1)), "wh", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_windows"),
            F.sum(F.coalesce("__hit", F.lit(0))).alias("n_hit"),
        )
        .select(id_col, "n_windows", "n_hit", ratio.alias("containment"))
    )
    shorts = (
        # NULL ids stay excluded here too: the scored branch drops them
        # via window_doc_pairs, and restoring them as a NULL row would
        # falsely claim an unkeyed doc has zero windows
        eval_docs.filter(
            F.col(id_col).isNotNull()
            & (F.col(text_col).isNull() | (F.size(tokens(text_col)) < k))
        )
        .select(
            F.col(id_col),
            F.lit(0).cast("long").alias("n_windows"),
            F.lit(0).cast("long").alias("n_hit"),
            F.lit(None).cast("double").alias("containment"),
        )
    )
    return scored.unionByName(shorts)


def winnow_fingerprints(
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    w: int = 4,
    base: int = 131,
    mod: int = 1_000_000_007,
) -> DataFrame:
    """Winnowing fingerprint selection (Schleimer, Wilkerson & Aiken,
    SIGMOD 2003 — the MOSS algorithm): from each doc's k-gram hash
    stream, select the RIGHTMOST-MINIMUM hash of every window of ``w``
    consecutive k-grams, then dedup the selected (pos, hash) pairs.
    Guarantees: at least one fingerprint per ``w`` positions (density
    2/(w+1) expected), and any verbatim token run of >= w+k-1 tokens
    shared by two docs shares at least one fingerprint — the sparse
    index ``repeated_passages``' dense window table cannot afford at
    fingerprint-retention scale.

    All per-doc work is ONE map-side projection over array expressions
    (token hash -> positional k-gram rolling hash -> per-window
    rightmost-min fold) — whole-stage codegen, no UDF, no shuffle; the
    only exchange is whatever the caller does with the exploded
    (doc, pos, fp) rows. Docs with >= 1 but < w k-grams yield a single
    global-min fingerprint (standard short-doc convention); docs with
    fewer than k tokens yield nothing.

    The k-gram hash is the repo's arithmetic rolling hash
    (``functions.text.rolling_fingerprint`` constants: per-token
    ascii(first)*31+len folded mod 1e9+7 base 131) so any SQL engine
    reproduces it exactly for oracle checks; base*mod ~ 1.3e11 keeps
    the fold inside int64 under ANSI arithmetic. Fingerprint ties
    resolve to the RIGHTMOST window position (fold updates on <=),
    per the paper's robust-winnowing rule.

    Output: ``id_col, pos, fp`` — pos is the 1-based token index of the
    selected k-gram's start.
    """
    if k < 1 or w < 1:
        raise ValueError(f"k and w must be >= 1, got k={k} w={w}")
    modl = F.lit(mod).cast("long")
    th = F.transform(
        tokens(text_col), lambda t: (F.ascii(t) * 31 + F.length(t)).cast("long")
    )
    kg = F.transform(
        F.sequence(F.lit(1), F.size("__th") - (k - 1)),
        lambda i: F.aggregate(
            F.slice("__th", i, k),
            F.lit(0).cast("long"),
            lambda a, x: F.pmod(a * base + x, modl),
        ),
    )
    # short docs (1 <= m < w) get one window spanning all m k-grams
    wlen = F.least(F.size("__kg"), F.lit(w))
    sel = F.transform(
        F.sequence(F.lit(1), F.size("__kg") - wlen + 1),
        lambda j: F.aggregate(
            F.sequence(j, j + wlen - 1),
            F.struct(
                (modl + 1).alias("fp"), F.lit(-1).cast("integer").alias("pos")
            ),
            lambda acc, p: F.when(
                F.element_at(F.col("__kg"), p) <= acc["fp"],
                F.struct(
                    F.element_at(F.col("__kg"), p).alias("fp"),
                    p.cast("integer").alias("pos"),
                ),
            ).otherwise(acc),
        ),
    )
    return (
        docs.filter(F.col(id_col).isNotNull())  # no pseudo-doc lumping
        .select(F.col(id_col), th.alias("__th"))
        .filter(F.size("__th") >= k)
        .select(id_col, kg.alias("__kg"))
        .select(id_col, F.explode(F.array_distinct(sel)).alias("__f"))
        .select(
            id_col,
            F.col("__f.pos").alias("pos"),
            F.col("__f.fp").alias("fp"),
        )
    )


def winnow_pairs(
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    w: int = 4,
    min_shared: int = 2,
    max_df: int = 50,
    round_decimals: int | None = 6,
) -> DataFrame:
    """MOSS-style pair report over winnowed fingerprints: doc pairs
    sharing >= ``min_shared`` distinct fingerprint VALUES, scored by
    containment = shared / min(|A|, |B|) over each doc's distinct-value
    fingerprint set. The sparse fingerprint sets stand in for the full
    window tables, so the candidate join touches ~2/(w+1) of the
    positions ``repeated_passages`` would.

    Scale shape: fingerprint sets are per-doc DISTINCT aggregates (one
    shuffle), the pair join goes through a per-fp inverted index with
    hot fingerprints capped at ``max_df`` docs (boilerplate belongs to
    ``repeated_passages``; this join targets rare clone material), and
    sizes join back via two 1-row-per-doc aggregates.

    Output: ``d1, d2, n_shared, containment``.
    """
    fps = (
        winnow_fingerprints(
            docs, text_col=text_col, id_col=id_col, k=k, w=w
        )
        .select(id_col, "fp")
        .distinct()
    )
    sizes = fps.groupBy(id_col).agg(F.count(F.lit(1)).alias("__n"))
    rare = fps.join(
        fps.groupBy("fp")
        .agg(F.count(F.lit(1)).alias("__df"))
        .filter((F.col("__df") >= 2) & (F.col("__df") <= max_df))
        .select("fp"),
        "fp",
    )
    shared = (
        rare.alias("a")
        .join(rare.alias("b"), "fp")
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("d1"), F.col(f"b.{id_col}").alias("d2")
        )
        .groupBy("d1", "d2")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )
    containment = F.col("n_shared") / F.least(F.col("__na"), F.col("__nb"))
    if round_decimals is not None:
        containment = F.round(containment, round_decimals)
    return (
        shared.join(
            sizes.select(F.col(id_col).alias("d1"), F.col("__n").alias("__na")),
            "d1",
        )
        .join(
            sizes.select(F.col(id_col).alias("d2"), F.col("__n").alias("__nb")),
            "d2",
        )
        .select(
            "d1",
            "d2",
            F.col("n_shared").cast("long").alias("n_shared"),
            containment.alias("containment"),
        )
    )


def shared_runs(
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    min_run_tokens: int = 12,
    max_occ: int = 20,
    hash_mode: str = "xxhash64",
) -> DataFrame:
    """Maximal shared verbatim token runs per doc pair — the
    cross-document span report behind suffix-array dedup ("Deduplicating
    Training Data Makes Language Models Better", Lee et al. 2021, §4):
    for every doc pair sharing at least one run of >= ``min_run_tokens``
    consecutive identical tokens, the longest such run and the run
    count. ``repeated_passages`` answers "which WINDOWS are boilerplate";
    this answers "which DOC PAIRS share a long clone, and how long" —
    the forensic unit for license-header tracing and decontamination
    audits.

    Distributed re-expression of the suffix-array scan: positional
    k-gram inverted index -> equi-join doc pairs on the hash -> runs are
    islands of consecutive positions at constant offset p2-p1, found
    with the classic gaps-and-islands trick (p1 - row_number() per
    (d1, d2, diff) partition); a run of c matched k-gram positions spans
    c + k - 1 tokens.

    Scale: the ONLY pair-generating join is gated on hashes with total
    occurrence count <= ``max_occ`` (pairs per hash bounded by
    max_occ^2/2; corpus-hot boilerplate hashes never enter — they are
    ``repeated_passages``' domain). The cap is the standard trade-off:
    a run whose interior crosses a hotter-than-cap k-gram splits into
    two reported runs.

    Output: ``d1, d2, max_run_tokens, n_runs``.
    """
    tok = tokens(text_col)
    grams = (
        docs.filter(F.col(id_col).isNotNull())  # no pseudo-doc lumping
        .select(F.col(id_col), tok.alias("__tok"))
        .filter(F.size("__tok") >= k)
        .select(
            id_col,
            F.explode(
                F.sequence(F.lit(1), F.size("__tok") - (k - 1))
            ).alias("pos"),
            F.col("__tok"),
        )
        .select(
            id_col,
            "pos",
            _window_hash(
                F.concat_ws(" ", F.slice("__tok", F.col("pos"), k)), hash_mode
            ).alias("wh"),
        )
    )
    rare = grams.join(
        grams.groupBy("wh")
        .agg(
            F.countDistinct(id_col).alias("__docs"),
            F.count(F.lit(1)).alias("__occ"),
        )
        .filter((F.col("__docs") >= 2) & (F.col("__occ") <= max_occ))
        .select("wh"),
        "wh",
    )
    pairs = (
        rare.alias("a")
        .join(rare.alias("b"), "wh")
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("d1"),
            F.col(f"b.{id_col}").alias("d2"),
            F.col("a.pos").alias("p1"),
            F.col("b.pos").alias("p2"),
        )
    )
    from pyspark.sql import Window

    win = Window.partitionBy("d1", "d2", "__diff").orderBy("p1")
    runs = (
        pairs.withColumn("__diff", F.col("p2") - F.col("p1"))
        .withColumn("__grp", F.col("p1") - F.row_number().over(win))
        .groupBy("d1", "d2", "__diff", "__grp")
        .agg((F.count(F.lit(1)) + (k - 1)).alias("run_tokens"))
        .filter(F.col("run_tokens") >= min_run_tokens)
    )
    return runs.groupBy("d1", "d2").agg(
        F.max("run_tokens").cast("long").alias("max_run_tokens"),
        F.count(F.lit(1)).cast("long").alias("n_runs"),
    )


def decontamination_report(
    eval_docs: DataFrame,
    train_docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    winnow_k: int = 5,
    winnow_w: int = 4,
    drop_at: float = 0.5,
    review_at: float = 0.2,
    hash_mode: str = "xxhash64",
    round_decimals: int | None = 6,
) -> DataFrame:
    """Benchmark-decontamination REPORT: one row per eval document with
    every overlap signal and an explicit keep/review/drop decision —
    the end-product a training run consumes (the GPT-3 appendix-C /
    PaLM decontamination workflow: score each benchmark item against
    the pretraining corpus, then act on a threshold).

    Two complementary signals per eval doc, each a composition of this
    module's kernels:

    - ``containment``: fraction of the doc's distinct ``k``-token
      windows found anywhere in the training corpus
      (:func:`ngram_containment` — catches verbatim inclusions).
    - ``fp_overlap``: fraction of the doc's winnowed fingerprints
      (:func:`winnow_fingerprints`, MOSS selection) present in the
      training corpus's fingerprint set — the SPARSE variant that
      survives small edits and costs ~2/(w+1) of the dense windows.

    ``evidence`` = max of the available signals (a doc too short for
    one signal is judged on the other); decision thresholds:
    evidence >= ``drop_at`` -> 'drop', >= ``review_at`` -> 'review',
    else 'keep'; docs too short for BOTH signals -> 'short' (surfaced,
    never silently kept).

    Scale shape: both training-side structures are DISTINCT hash SETS
    (aggregates — never pair-joined against the corpus); each eval doc
    meets them through two hash joins and one per-doc groupBy each.
    The report join is per-eval-doc 1:1. Nothing is all-pairs and the
    only corpus-granularity shuffles are the two distinct-set builds.

    Output: ``id_col, n_windows, containment, n_fps, fp_overlap,
    evidence, decision``.
    """
    # review_at > drop_at would silently make 'review' unreachable and
    # a negative review_at makes 'keep' unreachable — fail loud instead
    if not (0.0 <= review_at <= drop_at):
        raise ValueError(
            "decontamination_report: thresholds must satisfy "
            f"0 <= review_at <= drop_at; got review_at={review_at} "
            f"drop_at={drop_at}"
        )
    cont = ngram_containment(
        eval_docs,
        train_docs,
        k=k,
        text_col=text_col,
        id_col=id_col,
        hash_mode=hash_mode,
        round_decimals=round_decimals,
    ).select(id_col, "n_windows", "containment")
    ev_fps = (
        winnow_fingerprints(
            eval_docs, text_col=text_col, id_col=id_col,
            k=winnow_k, w=winnow_w,
        )
        .select(id_col, "fp")
        .distinct()
    )
    train_fp_set = (
        winnow_fingerprints(
            train_docs, text_col=text_col, id_col=id_col,
            k=winnow_k, w=winnow_w,
        )
        .select("fp")
        .distinct()
    )
    ratio = F.col("n_fp_hit") / F.col("n_fps")
    if round_decimals is not None:
        ratio = F.round(ratio, round_decimals)
    fp_scored = (
        ev_fps.join(train_fp_set.withColumn("__hit", F.lit(1)), "fp", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_fps"),
            F.sum(F.coalesce("__hit", F.lit(0))).alias("n_fp_hit"),
        )
        .select(id_col, "n_fps", ratio.alias("fp_overlap"))
    )
    # cont covers EVERY keyed eval doc (shorts restored with NULL
    # containment); fp_scored is a subset (docs with >= winnow_k
    # tokens), so a left join from cont is complete
    evidence = F.when(
        F.col("containment").isNull() & F.col("fp_overlap").isNull(),
        F.lit(None).cast("double"),
    ).otherwise(
        F.greatest(
            F.coalesce("containment", F.lit(0.0)),
            F.coalesce("fp_overlap", F.lit(0.0)),
        )
    )
    return (
        cont.join(fp_scored, id_col, "left")
        .select(
            id_col,
            "n_windows",
            "containment",
            F.coalesce("n_fps", F.lit(0)).cast("long").alias("n_fps"),
            "fp_overlap",
            evidence.alias("evidence"),
        )
        .withColumn(
            "decision",
            F.when(F.col("evidence").isNull(), F.lit("short"))
            .when(F.col("evidence") >= drop_at, F.lit("drop"))
            .when(F.col("evidence") >= review_at, F.lit("review"))
            .otherwise(F.lit("keep")),
        )
    )


def remove_repeated_spans(
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    min_count: int = 2,
    hash_mode: str = "xxhash64",
) -> DataFrame:
    """EXACT repeated-substring removal at token granularity — the
    span-level complement to whole-document dedup (Lee et al. 2021,
    "Deduplicating Training Data Makes Language Models Better",
    arXiv:2107.06499: delete every substring that occurs more than
    once in the corpus, ALL occurrences, both copies). Whole-doc dedup
    drops near-identical pages; this removes the boilerplate banner
    repeated across ten million otherwise-distinct pages — the
    dominant duplication mode in crawled pretraining data.

    Semantics: a token is removed iff it is covered by at least one
    k-token window whose hash occurs >= ``min_count`` times in the
    corpus (across OR within documents — intra-doc repetition counts,
    matching the paper). Docs shorter than k tokens have no windows
    and pass through whole. Tokens are whitespace tokens; the cleaned
    text re-joins survivors with single spaces.

    Scale shape — everything is linear in total tokens, nothing
    pairwise: one window explode + one groupBy(hash) partial-agg
    (the hot-hash SET), one semi join of positions against that set
    (a corpus-universal boilerplate hash meets a 1-row set entry —
    AQE-skew-splittable, never a pair join), a k-wide explode of HOT
    positions only, one anti join at token granularity, and one
    per-doc re-collect whose order key (token position) is unique by
    construction (r13 window-order census discipline). The paper's
    suffix-array formulation needs a global sort; this is the
    shuffle-native re-expression with min-match-length = k tokens.

    Output: ``id_col, n_tokens, n_removed, cleaned_text``
    (cleaned_text NULL iff the input text is NULL; n_tokens 0 then).
    """
    if k < 1 or min_count < 2:
        raise ValueError(
            f"remove_repeated_spans: need k >= 1 and min_count >= 2, "
            f"got k={k} min_count={min_count}"
        )
    from weaviate_txtai_spark.cache import scoped_persist
    from weaviate_txtai_spark.functions.text import tokens
    from weaviate_txtai_spark.sources.tables import spread

    base = scoped_persist(
        spread(docs.filter(F.col(id_col).isNotNull())).select(
            F.col(id_col).alias("__id"),
            F.col(text_col).alias("__text"),
            tokens(text_col).alias("__tok"),
        )
    )
    starts = F.sequence(F.lit(1), F.size("__tok") - (k - 1))
    win = F.concat_ws(" ", F.slice(F.col("__tok"), F.col("__p"), k))
    # eager: computing posh scans every base partition, so ONE count
    # barrier fills BOTH caches sequentially before the hot aggregate
    # and the covered semi-join fan out over them (r14 opt).
    # StorageLevel (r14 audit): posh is OCCURRENCE-sized (one row per
    # token position) — the largest persist in the package;
    # MEMORY_AND_DISK_DESER deliberately: both consumers need every row
    # (a frequency aggregate and a semi-join), recompute would re-run
    # the window-hash explode per consumer, and unified-memory spill
    # bounds the worst case at one disk round-trip of the 3-column
    # compressed form (id, pos, hash — no strings).
    from pyspark import StorageLevel

    posh = scoped_persist(
        base.filter(F.size("__tok") >= k)
        .select("__id", F.explode(starts).alias("__p"), "__tok")
        .select("__id", "__p", _window_hash(win, hash_mode).alias("wh")),
        StorageLevel.MEMORY_AND_DISK_DESER,
        eager=True,
    )
    hot = (
        posh.groupBy("wh")
        .agg(F.count(F.lit(1)).alias("__c"))
        .filter(F.col("__c") >= int(min_count))
        .select("wh")
    )
    covered = (
        posh.join(hot, "wh", "left_semi")
        .select(
            "__id",
            F.explode(
                F.sequence(F.col("__p"), F.col("__p") + (k - 1))
            ).alias("__t"),
        )
        .distinct()
    )
    toks = base.select(
        "__id", F.posexplode("__tok").alias("__i0", "__tkn")
    ).select("__id", (F.col("__i0") + 1).alias("__t"), "__tkn")
    kept = toks.join(covered, ["__id", "__t"], "left_anti")
    cleaned = kept.groupBy("__id").agg(
        F.count(F.lit(1)).alias("__n_kept"),
        F.concat_ws(
            " ",
            F.transform(
                F.sort_array(
                    F.collect_list(F.struct("__t", "__tkn"))
                ),
                lambda s: s["__tkn"],
            ),
        ).alias("__cleaned"),
    )
    nt = F.coalesce(F.size("__tok"), F.lit(0))
    return (
        base.join(cleaned, "__id", "left")
        .select(
            F.col("__id").alias(id_col),
            nt.cast("long").alias("n_tokens"),
            (nt - F.coalesce("__n_kept", F.lit(0)))
            .cast("long")
            .alias("n_removed"),
            F.when(
                F.col("__text").isNotNull(),
                F.coalesce("__cleaned", F.lit("")),
            ).alias("cleaned_text"),
        )
    )
