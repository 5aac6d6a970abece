"""Byte-level media dedup (multimodal/binary.py, r13 VERDICT task 4)."""

import pytest
from pyspark.sql import functions as F

from weaviate_txtai_spark.multimodal.binary import (
    binary_dup_pairs,
    binary_jaccard_pairs,
    byte_shingle_table,
)


def _media(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, payload binary")


@pytest.fixture(scope="module")
def corpus(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return (
        docs.select("doc_id", F.encode("text", "UTF-8").alias("payload"))
        .limit(400)
        .cache()
    )


def test_lsh_equals_exact_on_fixture(corpus):
    a = binary_dup_pairs(corpus, k=16, threshold=0.8).orderBy("d1", "d2")
    b = binary_jaccard_pairs(corpus, k=16, threshold=0.8).orderBy("d1", "d2")
    ra, rb = a.collect(), b.collect()
    assert ra == rb
    assert all(r["jaccard"] >= 0.8 for r in ra)


def test_exact_payload_dup_scores_one(spark):
    blob = bytes(range(64)) * 4
    out = binary_jaccard_pairs(
        _media(spark, [(1, blob), (2, blob), (3, b"\xff" * 256)])
    ).collect()
    assert [(r["d1"], r["d2"], r["jaccard"]) for r in out] == [(1, 2, 1.0)]


def test_shift_robust_sampling(spark):
    # an 11-byte prefix insertion shifts every downstream byte offset;
    # content-defined sampling still selects the SAME windows from the
    # shared run, so the pair stays a near-dup (a positional stride
    # would misalign and score ~0)
    shared = bytes([(i * 37) % 256 for i in range(400)])
    shifted = b"INSERTED:11" + shared
    out = binary_jaccard_pairs(
        _media(spark, [(1, shared), (2, shifted)]), threshold=0.5
    ).collect()
    assert len(out) == 1 and out[0]["jaccard"] > 0.8


def test_null_and_short_payloads_excluded(spark):
    blob = bytes(range(100))
    df = _media(
        spark,
        [(1, blob), (2, blob), (None, blob), (4, None), (5, b"short")],
    )
    sh = byte_shingle_table(df)
    ids = {r["__id"] for r in sh.select("__id").distinct().collect()}
    assert ids == {1, 2}
    pairs = binary_dup_pairs(df).collect()
    assert [(r["d1"], r["d2"]) for r in pairs] == [(1, 2)]


def test_sample_hex_validation(spark):
    with pytest.raises(ValueError, match="sample_hex"):
        byte_shingle_table(_media(spark, [(1, b"x" * 32)]), sample_hex=0)


def test_sampling_fraction_roughly_quarter(spark):
    import random

    rnd = random.Random(7)
    blob = bytes(rnd.randrange(256) for _ in range(4000))
    n_all = byte_shingle_table(
        _media(spark, [(1, blob)]), sample_hex=16
    ).count()
    n_kept = byte_shingle_table(_media(spark, [(1, blob)])).count()
    assert 0.15 < n_kept / n_all < 0.35


def test_shared_header_does_not_pair_and_cap_drops_it(spark):
    # the production reality: every media file shares its format's
    # magic-byte header. Headers alone must not create pairs (they are
    # a minority of each doc's windows), planted body-dups must still
    # pair, and max_doc_freq must drop the corpus-universal windows
    # from the exact path's candidate join
    header = b"FFD8FFE0JFIFHDR!" * 4
    rows = [
        (1, header + b"alpha-body-one|" * 8),
        (2, header + b"alpha-body-one|" * 8),   # near-dup of 1
        (3, header + b"totally-different-body|" * 8),
        (4, header + b"yet-another-payload-x|" * 8),
    ]
    df = _media(spark, rows)
    got = {(r["d1"], r["d2"]) for r in
           binary_dup_pairs(df, threshold=0.5).collect()}
    assert got == {(1, 2)}
    capped = {(r["d1"], r["d2"]) for r in
              binary_jaccard_pairs(df, threshold=0.5,
                                   max_doc_freq=2).collect()}
    assert capped == {(1, 2)}
