"""Text-analysis column expressions for LLM-data-pipeline curation.

Beyond the reference surface (its only derived metadata is ``length``,
examples/01_simple.ipynb cell 24 — see T5 in SURVEY §2.3); these are the
operators a 100 TB training-data pipeline needs: token stats, quality
scoring, language ID, fingerprinting, shingling for near-dup detection.

All pure Column expressions (JVM-side, codegen) unless noted. Tokenization
is deliberately defined as split-on-single-space + drop-empties so that a
SQL oracle (``list_filter(string_split(text,' '), x -> x <> '')``) computes
the identical tokens.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language function-word profiles for the n-gram/stopword language
# heuristic. Public knowledge (most frequent function words per language).
LANG_PROFILES: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "that", "it", "for"],
    "de": ["der", "die", "das", "und", "ist", "von", "mit", "den", "ein", "zu"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "los", "es", "por"],
    "fr": ["le", "la", "de", "et", "les", "des", "un", "une", "du", "est"],
    "zh": ["的", "了", "是", "在", "我", "有", "和", "就", "不", "人"],
}

EN_STOPWORDS = LANG_PROFILES["en"] + ["on", "with", "as", "was", "at", "by"]


def _c(x) -> Column:
    return F.col(x) if isinstance(x, str) else x


def tokens(text) -> Column:
    """Whitespace tokens, empties dropped (oracle-parity definition)."""
    return F.filter(F.split(_c(text), " "), lambda x: x != "")


def token_count(text) -> Column:
    return F.size(tokens(text))


def bpe_ish_tokens(text) -> Column:
    """Sub-word-ish tokenization: split on word boundaries AND digit runs,
    the standard pre-tokenizer regex shape used by BPE vocabularies.
    Heavier than ``tokens``; for byte-accurate LLM token counts swap in a
    real tokenizer via mapInPandas."""
    return F.filter(
        F.split(F.lower(_c(text)), r"[^a-z0-9À-ɏ一-鿿]+"),
        lambda x: x != "",
    )


def _per_token(num: Column, t: Column) -> Column:
    """num / token-count with the empty-text guard: real corpora contain
    empty/whitespace-only docs, and ANSI mode turns the bare division
    into a job-killing DIVIDE_BY_ZERO on exactly the rows a quality pass
    exists to score. Empty text scores 0.0."""
    n = F.size(t)
    return F.when(n == 0, F.lit(0.0)).otherwise(num / n)


def lexical_diversity(text) -> Column:
    """distinct tokens / total tokens — degenerate repetition detector."""
    t = tokens(text)
    return _per_token(F.size(F.array_distinct(t)), t)


def stopword_ratio(text, stopwords: list[str] | None = None) -> Column:
    sw = F.array(*[F.lit(s) for s in (stopwords or EN_STOPWORDS)])
    t = tokens(text)
    return _per_token(F.size(F.filter(t, lambda x: F.array_contains(sw, x))), t)


def mean_token_len(text) -> Column:
    t = tokens(text)
    return _per_token(
        F.aggregate(t, F.lit(0.0), lambda acc, x: acc + F.length(x)), t
    )


def quality_score(text) -> Column:
    """Heuristic quality in [0,1]: length saturation + lexical diversity +
    stopword presence (Gopher/C4-style rule-of-thumb filters, re-expressed
    as one scalar). Deterministic and oracle-expressible."""
    t = _c(text)
    length_part = F.least(token_count(t) / F.lit(100.0), F.lit(1.0))
    diversity_part = lexical_diversity(t)
    stopword_part = F.least(stopword_ratio(t) * F.lit(5.0), F.lit(1.0))
    return length_part * 0.4 + diversity_part * 0.3 + stopword_part * 0.3


def fingerprint(text) -> Column:
    """Deterministic document fingerprint: md5 of trimmed,
    whitespace-normalized lowercase text. Exact-dedup key (md5 exists in
    every SQL engine)."""
    return F.md5(F.trim(F.lower(F.regexp_replace(_c(text), r"\s+", " "))))


def rolling_fingerprint(text, base: int = 131, mod: int = 1_000_000_007) -> Column:
    """Polynomial rolling-hash fingerprint over the token stream.

    fp = fold(tokens, acc -> (acc·base + h(tok)) mod M) with
    h(tok) = ascii(first char)·31 + length — position-sensitive (token
    swaps change the hash, unlike a bag-of-words md5), cheap (pure
    codegen exprs, no UDF), and expressible identically in any SQL
    engine for oracle checks. M·base ≈ 1.3e11 stays far under int64 so
    the fold never overflows even under ANSI arithmetic.

    Complements ``fingerprint`` (md5 of normalized text): that one is
    the exact-dup key; this one is the streaming-friendly form a
    rolling/content-defined-chunking pipeline would maintain per chunk.
    """
    toks = tokens(text)
    h = F.transform(
        toks, lambda t: F.ascii(t) * 31 + F.length(t)
    )
    return F.aggregate(
        h,
        F.lit(0).cast("long"),
        lambda acc, x: F.pmod(acc * base + x, F.lit(mod).cast("long")),
    )


def ngrams(text, n: int) -> Column:
    """ALL word n-grams in order (with repeats — unlike ``shingles``,
    which dedups); [] when fewer than n tokens. Repeats are the point:
    repetition-quality signals count occurrences."""
    t = tokens(text)
    make = F.transform(
        F.sequence(F.lit(1), F.size(t) - (n - 1)),
        lambda i: F.concat_ws(" ", F.slice(t, i, n)),
    )
    return F.when(F.size(t) >= n, make).otherwise(
        F.array().cast("array<string>")
    )


def shingles(text, n: int = 3) -> Column:
    """Distinct word n-gram shingles; [] when fewer than n tokens.
    Defined as ``array_distinct(ngrams(...))`` so the gram construction
    lives in exactly one place."""
    return F.array_distinct(ngrams(text, n))


# Profiles whose scripts are written WITHOUT spaces: token-equality
# scoring never fires on them (the whole sentence is one "token"), so
# they score by substring containment of their function characters.
UNSEGMENTED_LANGS = {"zh"}


def lang_id(text) -> Column:
    """Language-ID heuristic: argmax over per-language function-word hit
    counts; 'und' (undetermined) when nothing matches. Pure exprs: builds
    a (score, lang) struct per language and takes array_max — ties break
    to the lexicographically larger code, deterministically. Unsegmented
    scripts (zh) score by character containment instead of token
    equality — whitespace tokenization leaves Chinese text as one giant
    token that can never equal a profile word."""
    lower = F.lower(_c(text))
    t = tokens(lower)
    scored = []
    for code, words in LANG_PROFILES.items():
        if code in UNSEGMENTED_LANGS:
            score = sum(
                (F.when(F.contains(lower, F.lit(w)), 1).otherwise(0) for w in words),
                F.lit(0),
            )
        else:
            sw = F.array(*[F.lit(w) for w in words])
            score = F.size(F.filter(t, lambda x: F.array_contains(sw, x)))
        scored.append(F.struct(score.alias("score"), F.lit(code).alias("lang")))
    best = F.array_max(F.array(*scored))
    return F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("und"))


# Dialect-safe PII patterns: identical semantics under Java regex (Spark)
# and RE2-ish (DuckDB) — no lookarounds, no backrefs, explicit classes.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+?\d[\d ()-]{6,}\d"


def redact_pii(text) -> Column:
    """Replace emails with [EMAIL] and phone-shaped digit runs with
    [PHONE] — the standard pre-training scrub pass. Native regexp_replace
    (codegen, map-only); order matters (emails first so their digit runs
    are gone before the phone pass)."""
    t = F.regexp_replace(_c(text), EMAIL_RE, "[EMAIL]")
    return F.regexp_replace(t, PHONE_RE, "[PHONE]")


def pii_counts(text) -> Column:
    """struct(n_emails, n_phones) found in the text (audit metric for the
    scrub pass)."""
    t = _c(text)
    return F.struct(
        F.size(F.regexp_extract_all(t, F.lit(EMAIL_RE), F.lit(0))).alias("n_emails"),
        F.size(
            F.regexp_extract_all(
                F.regexp_replace(t, EMAIL_RE, "[EMAIL]"), F.lit(PHONE_RE), F.lit(0)
            )
        ).alias("n_phones"),
    )


def normalize_text(text) -> Column:
    """Pre-tokenization cleanup, all native codegen exprs (the standard
    crawl-text normalization pass): strip control and zero-width
    characters, collapse whitespace runs to single spaces, trim, then
    lowercase. Deterministic and byte-identical across engines (the
    character classes use \\x{...} escapes valid in both Java regex and
    RE2), so the gate compares md5 of the normalized text — the same
    byte-exact contract as ``redact_pii``. Unicode NFC normalization is
    deliberately NOT included: Spark has no native normalizer and a
    Python UDF would leave codegen for a step most corpora don't need —
    when required, do it at INGEST in the source decoder."""
    c = _c(text)
    c = F.regexp_replace(
        # \x09-\x0d (tab/LF/VT/FF/CR) are EXCLUDED from the strip:
        # they are whitespace and must survive into the collapse step
        c, "[\\x00-\\x08\\x0e-\\x1f\\x7f\\x{200B}-\\x{200D}\\x{FEFF}]", ""
    )
    # explicit whitespace class, NOT \s: Java regex \s includes
    # vertical tab (\x0b) but RE2's does not — \s here would break the
    # byte-exact cross-engine contract on any corpus containing VT
    c = F.regexp_replace(c, "[ \\x09\\x0a\\x0b\\x0c\\x0d]+", " ")
    return F.lower(F.trim(c))
