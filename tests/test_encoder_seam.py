"""Encoder seam contract (VERDICT r1 item 4): any ``encode_df``-shaped
encoder — e.g. the sentence-transformers path the reference uses
(reference tests/ann/test_weaviate.py:37-44, pyproject.toml:20) — must
drive index → search → SQL end-to-end with NO change outside the encoder
object. The fixture below is a fake "model": deterministic per-text
vectors that are NOT feature-hashed, so nothing downstream can secretly
depend on HashingEncoder internals."""

import numpy as np
import pandas as pd
import pytest

from pyspark.sql import functions as F

from weaviate_txtai_spark.embeddings import Embeddings
from weaviate_txtai_spark.functions.encoders import HashingEncoder
from weaviate_txtai_spark.index import VectorIndex


def _fake_model_encode(text: str, dim: int) -> list:
    """Deterministic stand-in for a model forward pass: seeded-RNG unit
    vector keyed by the text (NOT feature-hashed). Self-contained so the
    pandas_udf closure ships to executors without the test module."""
    import hashlib

    import numpy as _np

    seed = int.from_bytes(hashlib.md5(text.encode()).digest()[:4], "big")
    rng = _np.random.default_rng(seed)
    v = rng.standard_normal(dim)
    return (v / _np.linalg.norm(v)).tolist()


class FakeModelEncoder:
    """Stands in for a real model — same call shape as HashingEncoder
    (the seam contract): encode / encode_many / encode_df (Arrow-batched
    pandas_udf)."""

    dim = 8

    def encode(self, text: str) -> list[float]:
        return _fake_model_encode(text, self.dim)

    def encode_many(self, texts):
        return [self.encode(t) for t in texts]

    def encode_df(self, df, text_col="text", out_col="vector"):
        dim = self.dim

        @F.pandas_udf("array<float>")
        def enc(s: pd.Series) -> pd.Series:
            # self-contained closure: executors can't import test modules,
            # so the model logic is re-stated inline (pickled by value)
            import hashlib

            import numpy as _np

            def one(text):
                seed = int.from_bytes(
                    hashlib.md5(text.encode()).digest()[:4], "big"
                )
                v = _np.random.default_rng(seed).standard_normal(dim)
                return (v / _np.linalg.norm(v)).tolist()

            return s.map(lambda t: one(t or ""))

        return df.withColumn(out_col, enc(F.col(text_col)))


@pytest.fixture()
def texts():
    return [f"document number {i} with unique content {i * 37}" for i in range(30)]


def test_fake_encoder_drives_vector_index(spark, tmp_path, texts):
    enc = FakeModelEncoder()
    idx = VectorIndex(spark, str(tmp_path / "seam_idx")).create()
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    idx.append(enc.encode_df(df))
    assert idx.count() == 30
    # search with the encoder's own vector for text 7: self-match top-1
    res = idx.search([enc.encode(texts[7])], limit=3)
    assert len(res[0]) == 3
    assert abs(res[0][0][1] - 1.0) < 1e-6  # exact vector → score 1


def test_fake_encoder_drives_embeddings_sql_surface(spark, tmp_path, texts):
    """The txtai-facade path: index(documents) → search + SQL similar()
    with the fake model plugged into the SAME constructor seam."""
    emb = Embeddings(spark, encoder=FakeModelEncoder(), config={"content": True})
    emb.index([(i, {"text": t, "n": i}, None) for i, t in enumerate(texts)])
    hits = emb.search(texts[11], limit=3)
    assert hits[0]["id"] == "11"  # txtai ids are strings; model vector wins
    assert hits[0]["score"] > 0.999
    sql_hits = emb.search(
        f"select id, text, score from txtai where similar('{texts[4]}') limit 2"
    )
    assert sql_hits[0]["id"] == "4"


def test_encoders_are_interchangeable(spark, tmp_path, texts):
    """Same pipeline, two encoders: results differ in scores (different
    models) but the contract — dense docids, top-k shape, self-match —
    holds for both. This is the drop-in guarantee for a real model."""
    for name, enc in (("hash", HashingEncoder()), ("fake", FakeModelEncoder())):
        idx = VectorIndex(spark, str(tmp_path / f"ix_{name}")).create()
        df = spark.createDataFrame([(t,) for t in texts], "text string")
        idx.append(enc.encode_df(df))
        docids = sorted(r["docid"] for r in idx.to_df().collect())
        assert docids == list(range(30))
        res = idx.search([enc.encode(texts[0]), enc.encode(texts[9])], limit=5)
        assert [len(r) for r in res] == [5, 5]
        assert res[0][0][0] == 0 and res[1][0][0] == 9
