"""Text→vector encoders (the reference delegates this to txtai's
sentence-transformers upstream — SURVEY §3.1; here it's pluggable).

``HashingEncoder`` is the deterministic, dependency-free stand-in: a
feature-hashing bag-of-words embedding (token → bucket via md5, sign via
one hash bit, L2-normalized). Lexically similar texts get high cosine —
enough to drive the full index→search pipeline and its tests without any
model. Swap in a real model by implementing ``encode_df`` with a
pandas_udf that calls the model per Arrow batch; everything downstream
(VectorIndex, knn, SQL surface) is encoder-agnostic.
"""

from __future__ import annotations

import hashlib
from typing import Sequence

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _token_bucket_sign(token: str, dim: int) -> tuple[int, int]:
    h = int.from_bytes(hashlib.md5(token.encode()).digest()[:8], "big")
    return h % dim, 1 if (h >> 63) & 1 else -1


class HashingEncoder:
    def __init__(self, dim: int = 64):
        self.dim = dim

    def encode(self, text: str) -> list[float]:
        import numpy as np

        v = np.zeros(self.dim)
        for tok in text.lower().split():
            if tok:
                b, s = _token_bucket_sign(tok, self.dim)
                v[b] += s
        n = np.linalg.norm(v)
        return (v / (n or 1.0)).tolist()

    def encode_many(self, texts: Sequence[str]) -> list[list[float]]:
        return [self.encode(t) for t in texts]

    def encode_df(
        self, df: DataFrame, text_col: str = "text", out_col: str = "vector"
    ) -> DataFrame:
        """Arrow-batched encoding of a text column (map-only, no shuffle)."""
        dim = self.dim

        @F.pandas_udf("array<float>")
        def enc(s: pd.Series) -> pd.Series:
            encoder = HashingEncoder(dim)
            return s.map(lambda t: encoder.encode(t or ""))

        return df.withColumn(out_col, enc(F.col(text_col)))


class CooccurrenceEncoder:
    """Corpus-TRAINED encoder with no external model dependency: token
    co-occurrence → PPMI → truncated SVD word vectors, documents encoded
    as the L2-normalized mean of their word vectors. The LSA lineage
    (Deerwester et al. 1990), with the PPMI+SVD form Levy & Goldberg
    (NeurIPS 2014) showed approximates skip-gram with negative sampling —
    public knowledge throughout. This is the step between the
    lexical ``HashingEncoder`` and a real transformer behind the same
    seam: unlike hashing, two documents sharing NO tokens can embed
    close if their tokens co-occur elsewhere in the corpus.

    Scale shape of ``fit``:
    - vocab: one token-count aggregation, top-V collect (V rows).
    - co-occurrence: one Arrow pass; each batch accumulates a local
      pair-Counter RESTRICTED to the vocab (≤ V² keys, sparse in
      practice) and emits its partials; one groupBy(w1, w2) sum. The
      corpus text never leaves executors un-aggregated.
    - driver: the aggregated pair table (≤ V², default V=1024) builds
      the PPMI matrix; numpy SVD keeps ``dim`` components, rows scaled
      by sqrt(singular values) (the standard symmetric weighting).
    Driver state is O(V·dim) floats — the same bounded-model contract
    as IVF centroids / PQ codebooks.

    Deterministic within a process (ties in vocab break on token; SVD
    runs on the same matrix). Across BLAS builds singular-vector SIGNS
    may flip — fit artifacts should be saved and shipped, not refit per
    session, exactly like any trained model.
    """

    # Hard V ceiling (VERDICT r4 minor #4): fit collects ≤ V² pair rows
    # and runs a dense V×V SVD driver-side — V=1024 is ~8 MB, V=4096 is
    # ~134 MB and O(V³) SVD minutes; past that the driver-side model
    # contract is broken and the answer is a different factorization
    # (distributed ALS / randomized SVD), not a bigger collect.
    MAX_VOCAB = 4096

    def __init__(self, dim: int = 64, vocab_size: int = 1024, window: int = 4):
        if vocab_size > self.MAX_VOCAB:
            raise ValueError(
                f"CooccurrenceEncoder: vocab_size {vocab_size} exceeds the "
                f"driver-side model ceiling {self.MAX_VOCAB} (V² pair "
                "collect + dense V×V SVD); use a distributed "
                "factorization for larger vocabularies"
            )
        if dim > vocab_size:
            raise ValueError(
                f"CooccurrenceEncoder: dim {dim} > vocab_size {vocab_size} "
                "(SVD rank cannot exceed the matrix side)"
            )
        self.dim = dim
        self.vocab_size = vocab_size
        self.window = window
        self.vocab: dict[str, int] = {}
        self.vectors = None  # numpy (V, dim)

    # ------------------------------------------------------------- train

    def fit(self, df: DataFrame, text_col: str = "text") -> "CooccurrenceEncoder":
        import numpy as np

        toks = df.select(
            F.explode(
                F.filter(
                    F.split(F.lower(F.coalesce(F.col(text_col), F.lit(""))), " "),
                    lambda t: t != "",
                )
            ).alias("tok")
        )
        top = (
            toks.groupBy("tok")
            .agg(F.count(F.lit(1)).alias("n"))
            .orderBy(F.desc("n"), F.asc("tok"))
            .limit(self.vocab_size)
            .collect()
        )
        if not top:
            raise ValueError("CooccurrenceEncoder.fit: empty corpus")
        self.vocab = {r["tok"]: i for i, r in enumerate(top)}
        vocab = self.vocab
        win = self.window

        def pair_counts(batches):
            from collections import Counter

            for pdf in batches:
                acc: Counter = Counter()
                for text in pdf["__t"]:
                    ids = [
                        vocab[t]
                        for t in (text or "").lower().split()
                        if t in vocab
                    ]
                    for i, a in enumerate(ids):
                        for b in ids[i + 1 : i + 1 + win]:
                            acc[(a, b)] += 1
                            acc[(b, a)] += 1
                if acc:
                    yield pd.DataFrame(
                        [(a, b, c) for (a, b), c in acc.items()],
                        columns=["w1", "w2", "c"],
                    )

        pairs = (
            df.select(F.col(text_col).alias("__t"))
            .mapInPandas(pair_counts, schema="w1 int, w2 int, c long")
            .groupBy("w1", "w2")
            .agg(F.sum("c").alias("c"))
            .collect()
        )  # ≤ V² rows (sparse), driver-bounded by vocab_size
        V = len(self.vocab)
        M = np.zeros((V, V))
        for r in pairs:
            M[r["w1"], r["w2"]] = r["c"]
        total = M.sum()
        if total == 0:
            # degenerate corpus (every doc one token): identity fallback
            self.vectors = np.eye(V, self.dim)
            return self
        row = M.sum(axis=1, keepdims=True)
        col = M.sum(axis=0, keepdims=True)
        with np.errstate(divide="ignore", invalid="ignore"):
            pmi = np.log((M * total) / (row @ col))
        ppmi = np.where(np.isfinite(pmi) & (pmi > 0), pmi, 0.0)
        u, s, _ = np.linalg.svd(ppmi, full_matrices=False)
        d = min(self.dim, len(s))
        vecs = u[:, :d] * np.sqrt(s[:d])[None, :]
        if d < self.dim:  # tiny vocab: pad so downstream dims are stable
            vecs = np.hstack([vecs, np.zeros((V, self.dim - d))])
        self.vectors = vecs
        return self

    # ------------------------------------------------------------ encode

    def _encode_np(self, text: str):
        import numpy as np

        ids = [
            self.vocab[t]
            for t in (text or "").lower().split()
            if t in self.vocab
        ]
        if not ids:
            return np.zeros(self.dim)
        v = self.vectors[ids].mean(axis=0)
        n = np.linalg.norm(v)
        return v / (n or 1.0)

    def encode(self, text: str) -> list[float]:
        self._check_fitted()
        return [float(x) for x in self._encode_np(text)]

    def encode_many(self, texts: Sequence[str]) -> list[list[float]]:
        return [self.encode(t) for t in texts]

    def encode_df(
        self, df: DataFrame, text_col: str = "text", out_col: str = "vector"
    ) -> DataFrame:
        """Arrow-batched encode; the word-vector matrix (V×dim floats,
        ~0.5 MB at defaults) ships in the closure — the same broadcast
        cost as any model's weights."""
        self._check_fitted()
        vocab, vectors, dim = self.vocab, self.vectors, self.dim

        @F.pandas_udf("array<float>")
        def enc(s: pd.Series) -> pd.Series:
            import numpy as np

            def one(text):
                ids = [
                    vocab[t]
                    for t in (text or "").lower().split()
                    if t in vocab
                ]
                if not ids:
                    return [0.0] * dim
                v = vectors[ids].mean(axis=0)
                n = np.linalg.norm(v)
                return [float(x) for x in v / (n or 1.0)]

            return s.map(one)

        return df.withColumn(out_col, enc(F.col(text_col)))

    def _check_fitted(self) -> None:
        if self.vectors is None:
            raise ValueError(
                "CooccurrenceEncoder: call fit(corpus_df) before encoding"
            )
