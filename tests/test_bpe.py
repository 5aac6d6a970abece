"""BPE trainer/encoder: merge order vs hand-run algorithm, encode
round-trip invariants, determinism under repartition."""

import pytest
from pyspark.sql import functions as F

from weaviate_txtai_spark.operators.bpe import (
    BPEModel,
    EOW,
    bpe_encode,
    train_bpe,
)
from weaviate_txtai_spark.sources.tables import load_table


def test_merges_match_hand_run(spark):
    """'low low low lower lowest' — the textbook example: frequent
    pairs merge first, ties break lexicographically."""
    df = spark.createDataFrame(
        [("low low low lower lowest",)], "text string"
    )
    m = train_bpe(df, num_merges=4)
    # pair counts round 1: (l,o)=5, (o,w)=5, (w,EOW)=3, (w,e)=2, ...
    # tie (l,o) vs (o,w) -> lexicographically smaller ('l','o') first
    assert m.merges[0] == ("l", "o")
    assert m.merges[1] == ("lo", "w")
    assert m.merges[2] == ("low", EOW)


def test_encode_word_reconstructs_text(spark):
    docs = spark.createDataFrame(
        [("the quick brown fox jumps over the lazy dog",),
         ("the lazy dog sleeps",)],
        "text string",
    )
    m = train_bpe(docs, num_merges=30)
    out = bpe_encode(docs, m).collect()
    for r in out:
        joined = "".join(r["bpe_tokens"])
        assert joined == (r["text"].lower().replace(" ", EOW) + EOW)


def test_no_merge_crosses_word_boundary(spark):
    docs = spark.createDataFrame([("ab ab ab ba",)], "text string")
    m = train_bpe(docs, num_merges=10)
    for a, b in m.merges:
        # EOW may END a merged token but never sit mid-pair-left
        assert not a.endswith(EOW) or b == ""


def test_training_deterministic_under_repartition(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(100)
    a = train_bpe(docs, num_merges=40)
    b = train_bpe(docs.repartition(7), num_merges=40)
    assert a.merges == b.merges
    assert len(a.merges) == 40


def test_encode_on_corpus_compresses(spark, sf_dir):
    """Trained subwords must beat characters: tokens per doc well below
    character count, above word count."""
    docs = load_table(spark, sf_dir, "documents").limit(200)
    m = train_bpe(docs, num_merges=150)
    enc = bpe_encode(docs, m)
    stats = enc.select(
        F.avg(F.size("bpe_tokens")).alias("toks"),
        F.avg(F.length("text")).alias("chars"),
        F.avg(F.size(F.split("text", r"\s+"))).alias("words"),
    ).head()
    assert stats["toks"] < stats["chars"] * 0.6
    assert stats["toks"] >= stats["words"]


def test_guards(spark):
    with pytest.raises(ValueError, match="ceiling"):
        train_bpe(
            spark.createDataFrame([("x",)], "text string"),
            max_words=10**7,
        )
    with pytest.raises(ValueError, match="empty"):
        train_bpe(spark.createDataFrame([("",)], "text string"))
    assert BPEModel(merges=[]).encode_word("") == []
