"""Corpus-trained unigram language-model scoring (CCNet-style quality).

The CCNet / Gopher pipelines rank web documents by LM perplexity and
keep the low-perplexity head. The full KenLM 5-gram isn't available in
this container, but the distributed SHAPE of the operator — train token
statistics over the corpus in one pass, broadcast-or-join them back,
score every document — is the same for any order-n model, and the
unigram version is useful on its own (it flags gibberish, wrong-language
and boilerplate-token documents, and is the standard smoke-level
quality score). Swapping a real LM in changes only the per-token logp
table, not the plan.

Plan shape (corpus of N docs, V distinct tokens, T total tokens):
- token stream: one narrow explode (no shuffle);
- counts: ONE partial-agg shuffle on token (map-side combine collapses
  each partition to its local vocabulary first);
- scalars (T, V): one tiny agg, broadcast back as a literal-free
  crossJoin of a 1-row frame (the same broadcast-scalar idiom the BM25
  operator uses);
- scoring: token stream ⋈ counts on token — AQE broadcasts the counts
  side when V is small, else both sides hash-shuffle on token (the
  unavoidable join for corpus-frequency scoring; identical to BM25's
  df-join) — then one partial-agg shuffle on doc_id for the mean.

No Python in the hot path: ln/avg are codegen'd; the whole operator is
four exchanges end-to-end regardless of N.

Smoothing is add-alpha: logp(t) = ln((c_t + α) / (T + α·V)). Unseen
tokens (scoring a NEW frame against a trained model) get the α-floor
ln(α / (T + α·V)).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from weaviate_txtai_spark.cache import scoped_persist
from weaviate_txtai_spark.functions.text import tokens


@dataclass
class UnigramModel:
    """A trained unigram LM: the per-token logp table plus the smoothing
    floor for tokens never seen in training — ln(α / (T + α·V)). The
    floor is driver-side state (one double, from a 1-row collect) so
    scoring a foreign corpus never silently drops unseen tokens from
    the mean."""

    logprobs: DataFrame  # term, logp
    floor_logp: float


def unigram_counts(
    docs: DataFrame, *, text_col: str = "text"
) -> tuple[DataFrame, DataFrame]:
    """(per-token counts, 1-row scalars frame with total tokens T and
    vocabulary size V). Counts carry ``term, c``; scalars carry
    ``total_t, vocab_v``."""
    tok = docs.select(F.explode(tokens(text_col)).alias("term"))
    counts = tok.groupBy("term").agg(F.count(F.lit(1)).alias("c"))
    scalars = counts.agg(
        F.sum("c").alias("total_t"), F.count(F.lit(1)).alias("vocab_v")
    )
    return counts, scalars


def unigram_logprobs(
    docs: DataFrame, *, text_col: str = "text", alpha: float = 1.0
) -> DataFrame:
    """Per-token log probability under the corpus unigram model:
    ``term, logp`` with add-alpha smoothing.

    ``counts`` feeds two consumers (the T/V scalar agg and the logp
    projection) and Spark shares no common subplans across join inputs —
    without the persist the corpus explode + term shuffle runs TWICE
    (the measured r3 hazard class; release via ``cache_scope``)."""
    counts, scalars = unigram_counts(docs, text_col=text_col)
    counts = scoped_persist(counts, eager=True)  # r14: fill before fan-out
    return counts.crossJoin(F.broadcast(scalars)).select(
        "term",
        F.log(
            (F.col("c") + F.lit(alpha))
            / (F.col("total_t") + F.lit(alpha) * F.col("vocab_v"))
        ).alias("logp"),
    )


def train_unigram(
    docs: DataFrame, *, text_col: str = "text", alpha: float = 1.0
) -> UnigramModel:
    """Train a reusable unigram model (the CCNet move: train on a
    REFERENCE corpus — Wikipedia — then score crawls against it). One
    extra 1-row collect vs :func:`unigram_logprobs` to fix the
    unseen-token floor driver-side."""
    counts, scalars = unigram_counts(docs, text_col=text_col)
    row = scalars.collect()[0]
    t, v = int(row["total_t"] or 0), int(row["vocab_v"] or 0)
    if t == 0:
        raise ValueError("train_unigram: training corpus has no tokens")
    lp = counts.select(
        "term",
        F.log((F.col("c") + F.lit(alpha)) / F.lit(t + alpha * v)).alias("logp"),
    )
    return UnigramModel(logprobs=lp, floor_logp=math.log(alpha / (t + alpha * v)))


def unigram_nll(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = 1.0,
    model: Optional[UnigramModel] = None,
    round_decimals: Optional[int] = None,
) -> DataFrame:
    """Per-document mean negative log-likelihood under a unigram model —
    low = head (ordinary text), high = tail (gibberish, wrong-language,
    rare-token soup). ``exp(nll)`` is the unigram perplexity if a
    familiar unit is wanted.

    ``model``: a :class:`UnigramModel` trained on a REFERENCE corpus
    (:func:`train_unigram`) — the CCNet move of scoring a crawl against
    Wikipedia's model. Tokens the model never saw get its smoothing
    floor (never silently dropped from the mean). Default: self-trained
    on ``docs``, where every token is in-vocabulary by construction.

    Output: ``id_col, n_tokens, nll`` (tokenless docs: n_tokens=0,
    nll NULL — surfaced, not silently dropped).

    Plan shape: the token-occurrence stream reduces ONCE into a
    persisted per-(doc, term) count table — every occurrence of a term
    scores the same logp, so nothing downstream needs occurrence-sized
    rows: the self-trained corpus model is this table's term-marginal
    (same longs as a direct ``count(*)``, same logp arithmetic as
    :func:`unigram_logprobs`), the scoring join shuffles (doc, term)
    rows, and the per-doc mean is the cnt-weighted mean over the
    identical logp multiset (``n_tokens`` = Σcnt, exact; guide §2.4 —
    aggregate early, shuffle the reduced form). Release the persist via
    ``cache_scope``.
    """
    # NULL doc ids would lump every unkeyed document's tokens into one
    # pseudo-document's NLL (and its row count) — exclude them BEFORE
    # self-training so the model corpus matches the scored corpus
    # (mirrors bigram_nll / trigram_jm_nll, which filter first)
    docs = docs.filter(F.col(id_col).isNotNull())
    # EAGER: the self-trained model branch (counts → scalars → lp) and
    # the scoring join fan out as concurrent stages of one action and
    # raced the unfilled cache on the lazy shape (2.1 s@32c vs 1.0 s@8c,
    # driver r13; r14 opt). StorageLevel (r14 audit): per-(doc, term)
    # rows — ≤ occurrence-sized, strictly smaller wherever text repeats
    # a term; MEMORY_AND_DISK_DESER deliberately (unified-memory spill
    # degrades to one disk round-trip of the compressed batches, still
    # cheaper than the second tokenize pass the table replaces). The
    # bigram/trigram analogues of this table were REVERTED (see
    # bigram_nll/trigram_jm_nll): their repetition factor at realistic
    # document sizes was too low to pay for the materialization.
    from pyspark import StorageLevel

    dt = scoped_persist(
        docs.select(F.col(id_col), F.explode(tokens(text_col)).alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("cnt")),
        StorageLevel.MEMORY_AND_DISK_DESER,
        eager=True,
    )
    if model is not None:
        lp, logp = model.logprobs, F.coalesce("logp", F.lit(model.floor_logp))
    else:
        counts = dt.groupBy("term").agg(F.sum("cnt").alias("c"))
        scalars = counts.agg(
            F.sum("c").alias("total_t"), F.count(F.lit(1)).alias("vocab_v")
        )
        lp = counts.crossJoin(F.broadcast(scalars)).select(
            "term",
            F.log(
                (F.col("c") + F.lit(alpha))
                / (F.col("total_t") + F.lit(alpha) * F.col("vocab_v"))
            ).alias("logp"),
        )
        logp = F.col("logp")
    per_term = dt.join(lp, on="term", how="left")
    nll = -(F.sum(F.col("cnt") * logp) / F.sum("cnt"))
    if round_decimals is not None:
        nll = F.round(nll, round_decimals)
    scored = per_term.groupBy(id_col).agg(
        F.sum("cnt").alias("n_tokens"), nll.alias("nll")
    )
    # docs whose token list is empty (or whose text is NULL — tokens()
    # is NULL there and explode drops the row, while size(NULL) is
    # never == 0, so a bare size test would miss them) never reach the
    # explode — restore them with n_tokens=0 / NULL nll so the output
    # covers every input row
    empties = (
        docs.filter(
            F.col(text_col).isNull() | (F.size(tokens(text_col)) == 0)
        )
        .select(
            F.col(id_col),
            F.lit(0).cast("long").alias("n_tokens"),
            F.lit(None).cast("double").alias("nll"),
        )
    )
    return scored.unionByName(empties)


def nll_quality_filter(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = 1.0,
    round_decimals: Optional[int] = None,
) -> DataFrame:
    """CCNet-style head selection with a mean threshold: keep documents
    whose nll is at or below the corpus mean (the full CCNet recipe cuts
    at perplexity terciles; the scale-safe tercile machinery already
    exists as ``functions.sampling.quantile_buckets`` — compose it over
    the ``nll`` column for head/middle/tail splits).

    The corpus mean is one scalar agg broadcast back — map-only keep
    flag, no sort, no window. ``scored`` is persisted (N small rows)
    because it feeds both the mean agg and the output projection —
    Spark would otherwise re-run the whole tokenize-join-aggregate
    lineage for the one-row mean (measured: the plan carried its
    exchanges twice). Release via ``cache_scope``. Output: ``id_col,
    n_tokens, nll, keep`` (tokenless docs keep=false: no evidence of
    quality)."""
    scored = scoped_persist(
        unigram_nll(
            docs,
            id_col=id_col,
            text_col=text_col,
            alpha=alpha,
            round_decimals=round_decimals,
        )
    )
    mean = scored.agg(F.avg("nll").alias("mean_nll"))
    if round_decimals is not None:
        mean = mean.select(F.round("mean_nll", round_decimals).alias("mean_nll"))
    return (
        scored.crossJoin(F.broadcast(mean))
        .select(
            id_col,
            "n_tokens",
            "nll",
            F.coalesce(F.col("nll") <= F.col("mean_nll"), F.lit(False)).alias(
                "keep"
            ),
        )
    )


def bigram_nll(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = 1.0,
    round_decimals: Optional[int] = None,
) -> DataFrame:
    """Per-document mean negative log-likelihood under a corpus-trained
    BIGRAM model — one order closer to CCNet's KenLM than the unigram
    score, and it catches what unigrams cannot: scrambled/shuffled text
    reuses a corpus's vocabulary perfectly but breaks its transitions.

    p(t_i | t_{i-1}) = (c(t_{i-1}, t_i) + α) / (c(t_{i-1}) + α·V),
    add-alpha smoothed against the unigram context count; a document
    scores the mean over its len−1 transitions (docs with < 2 tokens:
    n_bigrams=0, NULL nll — surfaced like tokenless docs in
    :func:`unigram_nll`).

    Plan shape (re-adjudicated r14, VERDICT r13 item 2): the r13
    per-(doc, bigram) count table was REVERTED alongside the trigram one
    (same family, same occurrence-sized-persist economics measured
    slower at both core counts). The types-then-attach scoring stays:
    logp is a function of the bigram TYPE, so the bigram-count table
    takes the unigram join + vocab broadcast and the occurrence stream
    joins the scored types ONCE. uni persists EAGERLY (feeds the
    context join AND the vocab scalar; the r14 fill-before-fan-out
    rule).
    """
    docs = docs.filter(F.col(id_col).isNotNull())  # no pseudo-doc lumping
    toks = tokens(text_col)
    bigrams = F.zip_with(
        F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    big = docs.select(F.col(id_col), F.explode(bigrams).alias("bg")).select(
        id_col, F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2")
    )
    uni = scoped_persist(
        docs.select(F.explode(toks).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("cu")),
        eager=True,
    )
    bcounts = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("cb"))
    vocab = uni.agg(F.count(F.lit(1)).alias("vocab_v"))
    # logp is a function of the bigram TYPE: score the (much smaller)
    # bigram-count table through the unigram join and attach logp to
    # the occurrence stream with ONE join — the previous plan shuffled
    # the full stream twice (bigram join, then unigram join). Same
    # types-then-attach shape as trigram_jm_nll (r13 opt, guide §2.3);
    # per-occurrence doubles identical.
    types = (
        bcounts.join(uni.withColumnRenamed("term", "w1"), "w1")
        .crossJoin(F.broadcast(vocab))
        .select(
            "w1",
            "w2",
            F.log(
                (F.col("cb") + F.lit(alpha))
                / (F.col("cu") + F.lit(alpha) * F.col("vocab_v"))
            ).alias("logp"),
        )
    )
    scored = big.join(types, ["w1", "w2"]).select(id_col, "logp")
    nll = -F.avg("logp")
    if round_decimals is not None:
        nll = F.round(nll, round_decimals)
    out = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_bigrams"), nll.alias("nll")
    )
    shorts = docs.filter(
        F.col(text_col).isNull() | (F.size(toks) < 2)
    ).select(
        F.col(id_col),
        F.lit(0).cast("long").alias("n_bigrams"),
        F.lit(None).cast("double").alias("nll"),
    )
    return out.unionByName(shorts)


def negative_sampling_weights(
    counts: DataFrame,
    term_col: str,
    count_col: str,
    *,
    power: float = 0.75,
    round_decimals: int = 9,
) -> DataFrame:
    """The word2vec negative-sampling distribution (Mikolov 2013,
    public knowledge): P(term) ∝ count^0.75 — the tempering that keeps
    ultra-frequent tokens from swallowing the negative budget while
    still sampling them more than the tail. The same table drives
    contrastive-pair mining and hard-negative quotas in embedding
    training pipelines.

    One term-domain pass + a 1-row broadcast total. Output: term,
    count, ``weight`` (normalized, Σ = 1)."""
    if power <= 0:
        raise ValueError("power must be > 0")
    base = counts.filter(
        F.col(count_col).isNotNull() & (F.col(count_col) > 0)
    ).select(
        F.col(term_col).alias("term"),
        F.col(count_col).cast("long").alias("count"),
        F.pow(F.col(count_col).cast("double"), F.lit(float(power))).alias(
            "__p"
        ),
    )
    tot = base.agg(F.sum("__p").alias("__t"))
    return base.join(F.broadcast(tot)).select(
        "term",
        "count",
        F.round(F.col("__p") / F.col("__t"), round_decimals).alias("weight"),
    )


def trigram_jm_nll(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    lambdas: "tuple[float, float, float]" = (0.6, 0.3, 0.1),
    round_decimals: Optional[int] = None,
) -> DataFrame:
    """Per-document mean NLL under a Jelinek–Mercer INTERPOLATED
    trigram model (Jelinek & Mercer 1980; the KenLM-family smoothing
    CCNet-style quality filters actually run, one order beyond
    :func:`bigram_nll`):

        p(w₃|w₁w₂) = λ₃·c(w₁w₂w₃)/c(w₁w₂) + λ₂·c(w₂w₃)/c(w₂)
                   + λ₁·c(w₃)/T

    Every observed trigram's context counts are ≥1 (the context occurs
    in the same position), and the unigram floor keeps p > 0, so no
    add-alpha is needed — interpolation IS the smoothing. Docs with
    < 3 tokens surface with n_trigrams=0 and NULL nll.

    Plan shape (re-adjudicated r14, VERDICT r13 item 2): the r13
    per-(doc, trigram) count table was REVERTED — the driver measured it
    slower at BOTH core counts (2.83 s@32c / 3.36 s@8c vs 2.24 s r12)
    and the r14 interleaved A/B agreed (median 0.72x): at sf0.1-scale
    documents within-doc trigram repetition is ~zero, so the table is
    occurrence-sized and its materialization costs more than the one
    occurrence shuffle it saves. What stays from r13 is the
    types-then-attach scoring (guide §2.3): every probability factor is
    a function of the trigram TYPE, so the distinct-type table takes the
    four count joins + the broadcast total and the occurrence stream
    joins the scored types ONCE. uni/bigr persist EAGERLY (each feeds
    two joins + a broadcast build — the r14 fill-before-fan-out rule).
    """
    l3, l2, l1 = (float(x) for x in lambdas)
    if abs(l3 + l2 + l1 - 1.0) > 1e-9 or min(l3, l2, l1) <= 0:
        raise ValueError("trigram_jm_nll: lambdas must be positive and sum to 1")
    docs = docs.filter(F.col(id_col).isNotNull())  # no pseudo-doc lumping
    toks = tokens(text_col)
    n = F.size(toks)
    tri = F.zip_with(
        F.zip_with(
            F.slice(toks, 1, F.greatest(n - 2, F.lit(0))),
            F.slice(toks, 2, F.greatest(n - 2, F.lit(0))),
            lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
        ),
        F.slice(toks, 3, F.greatest(n - 2, F.lit(0))),
        lambda ab, c: F.struct(
            ab["w1"].alias("w1"), ab["w2"].alias("w2"), c.alias("w3")
        ),
    )
    stream = docs.select(F.col(id_col), F.explode(tri).alias("t")).select(
        id_col,
        F.col("t.w1").alias("w1"),
        F.col("t.w2").alias("w2"),
        F.col("t.w3").alias("w3"),
    )
    uni = scoped_persist(
        docs.select(F.explode(toks).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("cu")),
        eager=True,
    )
    bigr = scoped_persist(
        docs.select(
            F.explode(
                F.zip_with(
                    F.slice(toks, 1, F.greatest(n - 1, F.lit(0))),
                    F.slice(toks, 2, F.greatest(n - 1, F.lit(0))),
                    lambda a, b: F.struct(a.alias("b1"), b.alias("b2")),
                )
            ).alias("b")
        )
        .select(F.col("b.b1").alias("b1"), F.col("b.b2").alias("b2"))
        .groupBy("b1", "b2")
        .agg(F.count(F.lit(1)).alias("cb")),
        eager=True,
    )
    tcounts = stream.groupBy("w1", "w2", "w3").agg(
        F.count(F.lit(1)).alias("ct")
    )
    total = uni.agg(F.sum("cu").alias("tot"))
    # every probability factor is a function of the trigram TYPE, so
    # score the DISTINCT-trigram table through the four count joins and
    # attach logp to the occurrence stream with ONE join — the previous
    # plan dragged the full occurrence stream through five sequential
    # shuffle joins (guide §2.3: shuffle the small proxy, not the
    # corpus-sized stream; the per-occurrence logp doubles are
    # bit-identical, same factors, same arithmetic)
    types = (
        tcounts.join(
            bigr.select(
                F.col("b1").alias("w1"), F.col("b2").alias("w2"),
                F.col("cb").alias("c12"),
            ),
            ["w1", "w2"],
        )
        .join(
            bigr.select(
                F.col("b1").alias("w2"), F.col("b2").alias("w3"),
                F.col("cb").alias("c23"),
            ),
            ["w2", "w3"],
        )
        .join(
            uni.select(F.col("term").alias("w2"), F.col("cu").alias("c2")),
            "w2",
        )
        .join(
            uni.select(F.col("term").alias("w3"), F.col("cu").alias("c3")),
            "w3",
        )
        .crossJoin(F.broadcast(total))
        .select(
            "w1",
            "w2",
            "w3",
            F.log(
                F.lit(l3) * (F.col("ct") / F.col("c12"))
                + F.lit(l2) * (F.col("c23") / F.col("c2"))
                + F.lit(l1) * (F.col("c3") / F.col("tot"))
            ).alias("logp"),
        )
    )
    scored = stream.join(types, ["w1", "w2", "w3"]).select(id_col, "logp")
    nll = -F.avg("logp")
    if round_decimals is not None:
        nll = F.round(nll, round_decimals)
    out = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_trigrams"), nll.alias("nll")
    )
    shorts = docs.filter(F.col(text_col).isNull() | (n < 3)).select(
        F.col(id_col),
        F.lit(0).cast("long").alias("n_trigrams"),
        F.lit(None).cast("double").alias("nll"),
    )
    return out.unionByName(shorts)


def good_turing_rstar(
    docs: DataFrame,
    *,
    text_col: str = "text",
    max_r: int = 15,
    ngram: int = 1,
    round_decimals: int = 6,
) -> DataFrame:
    """Good–Turing adjusted frequencies over the unigram vocabulary
    (Good 1953): r* = (r+1)·N_{r+1}/N_r from the count-of-counts table
    N_r — the smoothing estimate LM pipelines use to reserve mass for
    unseen types (p₀ = N₁/T) and to deflate low-count types whose raw
    MLE overestimates them.

    Output: one row per r in 1..``max_r`` with ``r, n_r, r_star,
    p_unseen`` — ``r_star`` NULL where N_{r+1} = 0 (undefined without a
    fitted extension; the Gale–Sampson smoothing that fills those holes
    regresses log N_r on log r, which ``zipf_fit`` already provides),
    and ``p_unseen`` the N₁/T leave-one-out mass (0.0 when the corpus
    has no hapaxes), repeated per row for a flat schema. Rows with
    N_r = 0 are absent (no types at that count).

    ``ngram``: type space to count — 1 (unigrams) or 2 (bigrams).
    Saturated synthetic corpora can lack low-count unigram types
    entirely; the bigram space is quadratically sparser and keeps the
    low-r rows Good–Turing exists for.

    Scale: one token-count shuffle + one count-of-counts aggregate;
    everything after is count-domain-sized (≤ max types) joined by
    r = r+1. All ratios are exact-integer doubles → deterministic
    rounding.
    """
    if max_r < 1:
        raise ValueError("good_turing_rstar: max_r must be >= 1")
    if ngram == 1:
        counts, _ = unigram_counts(docs, text_col=text_col)
    elif ngram == 2:
        toks = tokens(text_col)
        n = F.size(toks)
        counts = (
            docs.select(
                F.explode(
                    F.zip_with(
                        F.slice(toks, 1, F.greatest(n - 1, F.lit(0))),
                        F.slice(toks, 2, F.greatest(n - 1, F.lit(0))),
                        lambda a, b: F.concat_ws(" ", a, b),
                    )
                ).alias("term")
            )
            .groupBy("term")
            .agg(F.count(F.lit(1)).alias("c"))
        )
    else:
        raise ValueError("good_turing_rstar: ngram must be 1 or 2")
    nr = scoped_persist(
        counts.groupBy(F.col("c").alias("r")).agg(
            F.count(F.lit(1)).cast("long").alias("n_r")
        )
    )
    tot = counts.agg(F.sum("c").cast("double").alias("__t"))
    # always-1-row N1 (0.0 when no hapaxes) so a saturated corpus
    # degrades to p_unseen = 0 instead of an empty result
    n1 = nr.agg(
        F.coalesce(
            F.sum(F.when(F.col("r") == 1, F.col("n_r"))), F.lit(0)
        ).cast("double").alias("__n1")
    )
    nxt = nr.select(
        (F.col("r") - 1).alias("r"), F.col("n_r").alias("n_r1")
    )
    return (
        nr.filter(F.col("r") <= max_r)
        .join(nxt, "r", "left")
        .join(F.broadcast(tot))
        .join(F.broadcast(n1))
        .select(
            F.col("r").cast("long").alias("r"),
            "n_r",
            F.round(
                (F.col("r") + 1)
                * F.col("n_r1").cast("double")
                / F.col("n_r"),
                round_decimals,
            ).alias("r_star"),
            F.round(F.col("__n1") / F.col("__t"), round_decimals).alias(
                "p_unseen"
            ),
        )
        .orderBy("r")
    )
