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
