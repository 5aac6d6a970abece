"""Multimodal plumbing: binary payloads, metadata, Arrow feature UDF."""

import math

import pytest

from weaviate_txtai_spark.multimodal.binary import (
    attach_fake_payload,
    decode_image,
    extract_features,
)
from weaviate_txtai_spark.sources.tables import load_table


def test_decode_stub_raises_without_fake():
    with pytest.raises(NotImplementedError):
        decode_image(b"abc")


def test_decode_fake_deterministic():
    a = decode_image(b"abc", fake=True)
    b = decode_image(b"abc", fake=True)
    assert a == b and len(a) == 64
    assert decode_image(b"xyz", fake=True) != a


def test_attach_and_extract(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(20)
    with_payload = attach_fake_payload(docs)
    rows = with_payload.select("doc_id", "payload", "payload_meta").collect()
    assert all(r["payload_meta"]["n_bytes"] == len(r["payload"]) for r in rows)
    assert all(r["payload_meta"]["media_type"] == "image/png" for r in rows)

    feats = extract_features(with_payload).collect()
    assert len(feats) == 20
    for r in feats:
        assert len(r["features"]) == 8
        norm = math.sqrt(sum(x * x for x in r["features"]))
        assert abs(norm - 1.0) < 1e-9  # normalized histogram

    # determinism: same payload -> same features on a second run
    feats2 = {r["doc_id"]: r["features"] for r in extract_features(with_payload).collect()}
    assert {r["doc_id"]: r["features"] for r in feats} == feats2
