"""Multimodal plumbing: binary payloads, metadata, Arrow feature UDF."""

import math

import pytest

from weaviate_txtai_spark.multimodal.binary import (
    attach_fake_payload,
    decode_image,
    extract_features,
    resize_images,
    sample_frames,
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


def test_resize_images_deterministic(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(20)
    with_payload = attach_fake_payload(docs)
    out = resize_images(with_payload, width=4, height=4)
    rows = out.collect()
    assert len(rows) == 20
    for r in rows:
        assert len(r["resized"]) == 16  # 4x4 uint8
        assert r["width"] == 4 and r["height"] == 4
    # deterministic: same input -> same bytes
    again = {r["doc_id"]: r["resized"] for r in
             resize_images(with_payload, width=4, height=4).collect()}
    assert all(again[r["doc_id"]] == r["resized"] for r in rows)


def test_sample_frames_shape(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(10)
    with_payload = attach_fake_payload(docs, media_type="video/mp4")
    out = sample_frames(with_payload, n_frames=4)
    rows = out.collect()
    assert len(rows) == 40  # one row per (doc, frame)
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r["frame_idx"])
    assert all(sorted(v) == [0, 1, 2, 3] for v in by_doc.values())
    assert all(1 <= len(r["frame"]) <= 8 for r in rows)


def test_load_media_dir(spark, tmp_path):
    from weaviate_txtai_spark.sources.media import load_media_dir

    for i in range(3):
        (tmp_path / f"img{i}.bin").write_bytes(bytes([i]) * (10 + i))
    df = load_media_dir(spark, str(tmp_path), glob="*.bin")
    rows = df.collect()
    assert len(rows) == 3
    assert {len(r["payload"]) for r in rows} == {10, 11, 12}
    for r in rows:
        assert r["payload_meta"]["n_bytes"] == len(r["payload"])
    # raw xxhash64 ids (signed; abs() would ANSI-overflow on MIN_VALUE):
    # unique per path, source_path stays the authoritative key
    assert len({r["doc_id"] for r in rows}) == 3
    assert len({r["source_path"] for r in rows}) == 3
    # payloads flow straight into the multimodal feature extractor
    feats = extract_features(df).collect()
    assert len(feats) == 3
