"""Byte-pair-encoding tokenizer training + distributed encode.

The real-tokenizer step of a pretraining pipeline (Sennrich et al.
2016, "Neural Machine Translation of Rare Words with Subword Units" —
public knowledge; the GPT-2 tokenizer is this algorithm over bytes).
``plans/text.py``'s ``bpe_token_counts`` gate covers the REGEX
pre-tokenizer; this module adds the trained merge table.

Scale shape — the classic word-level factorization:

- **train** never iterates over the corpus: ONE distinct-word count
  aggregation (shuffle on the word — the corpus's token stream
  collapses to its vocabulary), cap to the top ``max_words`` frequent
  words (driver-bounded model state, the same ceiling discipline as
  ``CooccurrenceEncoder``), then the merge loop runs DRIVER-SIDE over
  the word-frequency dict — O(distinct words) per merge, zero Spark
  jobs. This is how production BPE trainers work: pair statistics are
  weighted by word frequency, so the raw corpus adds nothing after the
  count.
- **encode** is map-only: the merge ranking (a dict of ≤ num_merges
  pairs) ships in the Arrow-kernel closure; each batch tokenizes with
  a per-batch WORD CACHE — a word seen twice is merged once — so the
  per-row cost approaches a dict lookup on natural (Zipfian) text.

Determinism: pair-count ties break on the lexicographically smallest
pair, so the merge table is a pure function of the corpus + params.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: end-of-word sentinel (the classic </w> marker): merges never cross
#: word boundaries, and a word-final subword is distinct from the same
#: subword mid-word.
EOW = "▁"

_MAX_WORDS = 200_000


@dataclass
class BPEModel:
    """Ordered merge table: ``merges[i]`` is the pair merged at step i
    (earlier = higher priority at encode time)."""

    merges: list[tuple[str, str]] = field(default_factory=list)

    @property
    def ranks(self) -> dict[tuple[str, str], int]:
        # memoized: encode_word runs per unique word — rebuilding an
        # O(merges) dict for each would dominate the encode
        r = getattr(self, "_ranks", None)
        if r is None or len(r) != len(self.merges):
            r = {pair: i for i, pair in enumerate(self.merges)}
            object.__setattr__(self, "_ranks", r)
        return r

    def encode_word(self, word: str) -> list[str]:
        """Apply the merge table to one word (greedy lowest-rank-first
        — the standard BPE encode)."""
        if not word:
            return []
        ranks = self.ranks
        parts = list(word) + [EOW]
        while len(parts) > 1:
            best, best_rank = None, None
            for i in range(len(parts) - 1):
                r = ranks.get((parts[i], parts[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best, best_rank = i, r
            if best is None:
                break
            parts[best : best + 2] = [parts[best] + parts[best + 1]]
        return parts


def train_bpe(
    df: DataFrame,
    *,
    text_col: str = "text",
    num_merges: int = 200,
    max_words: int = _MAX_WORDS,
    lowercase: bool = True,
) -> BPEModel:
    """Train ``num_merges`` BPE merges from the corpus (see module
    docstring for the one-aggregation scale shape). Words are
    whitespace-split (compose with the regex pre-tokenizer upstream
    for GPT-2-style splitting)."""
    if max_words > _MAX_WORDS:
        raise ValueError(
            f"train_bpe: max_words {max_words} exceeds the driver-side "
            f"ceiling {_MAX_WORDS}"
        )
    text = F.coalesce(F.col(text_col), F.lit(""))
    if lowercase:
        text = F.lower(text)
    words = (
        df.select(
            F.explode(
                F.filter(F.split(text, r"\s+"), lambda t: t != "")
            ).alias("w")
        )
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("w"))
        .limit(max_words)
        .collect()
    )
    if not words:
        raise ValueError("train_bpe: empty corpus")

    # driver-side merge loop over the word-frequency dict
    vocab: dict[tuple[str, ...], int] = {
        tuple(list(r["w"]) + [EOW]): int(r["n"]) for r in words
    }
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        counts: dict[tuple[str, str], int] = {}
        for parts, n in vocab.items():
            for i in range(len(parts) - 1):
                p = (parts[i], parts[i + 1])
                counts[p] = counts.get(p, 0) + n
        if not counts:
            break
        # max count, ties to the lexicographically smallest pair
        best = min(counts, key=lambda p: (-counts[p], p))
        if counts[best] < 2:
            break  # nothing repeats — further merges memorize noise
        merges.append(best)
        merged = best[0] + best[1]
        new_vocab: dict[tuple[str, ...], int] = {}
        for parts, n in vocab.items():
            out = []
            i = 0
            while i < len(parts):
                if (
                    i + 1 < len(parts)
                    and parts[i] == best[0]
                    and parts[i + 1] == best[1]
                ):
                    out.append(merged)
                    i += 2
                else:
                    out.append(parts[i])
                    i += 1
            key = tuple(out)
            new_vocab[key] = new_vocab.get(key, 0) + n
        vocab = new_vocab
    return BPEModel(merges=merges)


def bpe_encode(
    df: DataFrame,
    model: BPEModel,
    *,
    text_col: str = "text",
    out_col: str = "bpe_tokens",
    lowercase: bool = True,
) -> DataFrame:
    """Add ``out_col`` (array<string> of subword tokens) — map-only
    Arrow kernel; merge ranks ship in the closure, words memoized per
    batch."""
    merges = list(model.merges)

    @F.pandas_udf("array<string>")
    def enc(s):
        import pandas as pd

        local = BPEModel(merges=merges)
        cache: dict[str, list[str]] = {}

        def one(text):
            toks: list[str] = []
            t = (text or "")
            if lowercase:
                t = t.lower()
            for w in t.split():
                got = cache.get(w)
                if got is None:
                    got = cache[w] = local.encode_word(w)
                toks.extend(got)
            return toks

        return s.map(one)

    return df.withColumn(out_col, enc(F.col(text_col)))
