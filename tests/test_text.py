"""Text-analysis function tests on hand-computable fixtures."""

import pytest
from pyspark.sql import functions as F

from weaviate_txtai_spark.functions.text import (
    bpe_ish_tokens,
    fingerprint,
    lang_id,
    lexical_diversity,
    quality_score,
    shingles,
    stopword_ratio,
    token_count,
    tokens,
)


@pytest.fixture(scope="module")
def tdf(spark):
    return spark.createDataFrame(
        [
            (1, "the cat sat on the mat"),
            (2, "a a a a"),
            (3, "  spaced   out  text "),
            (4, "word"),
            (5, "der hund und die katze sind von den besten"),
            (6, "el perro y la casa de los gatos es grande"),
        ],
        ["id", "text"],
    )


def m(df, col):
    return {r["id"]: r["v"] for r in df.select("id", col.alias("v")).collect()}


def test_tokens_and_count(tdf):
    tc = m(tdf, token_count("text"))
    assert tc == {1: 6, 2: 4, 3: 3, 4: 1, 5: 9, 6: 10}
    toks = m(tdf, tokens("text"))
    assert toks[3] == ["spaced", "out", "text"]  # empties dropped


def test_bpe_ish_tokens(tdf):
    df = tdf.withColumn("text", F.lit("Hello, world! x42abc"))
    toks = df.select(bpe_ish_tokens("text").alias("v")).head()["v"]
    assert toks == ["hello", "world", "x42abc"]


def test_lexical_diversity(tdf):
    d = m(tdf, lexical_diversity("text"))
    assert d[2] == 0.25
    assert abs(d[1] - 5 / 6) < 1e-9
    assert d[4] == 1.0


def test_stopword_ratio_and_quality(tdf):
    s = m(tdf, stopword_ratio("text"))
    assert abs(s[1] - 3 / 6) < 1e-9  # "the" twice + "on" once of 6 tokens
    q = m(tdf, quality_score("text"))
    for v in q.values():
        assert 0.0 <= v <= 1.0
    assert q[1] > q[2]  # repetitive text scores lower


def test_fingerprint_normalizes_whitespace(tdf):
    f = m(tdf, fingerprint("text"))
    df2 = tdf.withColumn("text", F.regexp_replace("text", " ", "  "))
    f2 = m(df2, fingerprint("text"))
    assert f == f2


def test_shingles(tdf):
    sh = m(tdf, shingles("text", 3))
    assert sh[1] == [
        "the cat sat", "cat sat on", "sat on the", "on the mat",
    ]
    assert sh[4] == []  # fewer than n tokens
    assert sh[2] == ["a a a", "a a a"][:1]  # distinct


def test_lang_id(tdf):
    langs = m(tdf, lang_id("text"))
    assert langs[1] == "en"
    assert langs[5] == "de"
    assert langs[6] == "es"
    assert langs[4] == "und"  # no function words at all


def test_rolling_fingerprint_position_sensitive(spark):
    from weaviate_txtai_spark.functions.text import rolling_fingerprint

    df = spark.createDataFrame(
        [("a", "alpha beta gamma"), ("b", "beta alpha gamma"), ("c", "alpha beta gamma")],
        "id string, text string",
    )
    fps = {r["id"]: r["fp"] for r in
           df.select("id", rolling_fingerprint("text").alias("fp")).collect()}
    assert fps["a"] == fps["c"]       # identical text -> identical fp
    assert fps["a"] != fps["b"]       # token swap changes the hash
    assert all(0 <= v < 1_000_000_007 for v in fps.values())


def test_deterministic_split_stable_under_partitioning(spark, sf_dir):
    """assign_split must be a pure function of the id: identical labels
    no matter how the data is partitioned (the property randomSplit
    lacks), with roughly the requested fractions."""
    from pyspark.sql import functions as F

    from weaviate_txtai_spark.functions.sampling import assign_split
    from weaviate_txtai_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    a = {
        r["doc_id"]: r["split"]
        for r in docs.withColumn("split", assign_split("doc_id"))
        .select("doc_id", "split")
        .collect()
    }
    b = {
        r["doc_id"]: r["split"]
        for r in docs.repartition(13, "lang")
        .withColumn("split", assign_split("doc_id"))
        .select("doc_id", "split")
        .collect()
    }
    assert a == b
    n = len(a)
    train = sum(1 for v in a.values() if v == "train") / n
    assert 0.7 < train < 0.9
    assert set(a.values()) <= {"train", "valid", "test"}


def test_redact_pii_and_counts(spark):
    from pyspark.sql import functions as F

    from weaviate_txtai_spark.functions.text import pii_counts, redact_pii

    df = spark.createDataFrame(
        [
            (0, "mail me at jane.doe+x@example.co.uk or call +1 (555) 010-2030 now"),
            (1, "no pii here, just words and the number 7"),
        ],
        "id long, text string",
    )
    out = {
        r["id"]: (r["red"], r["c"]["n_emails"], r["c"]["n_phones"])
        for r in df.select(
            "id",
            redact_pii("text").alias("red"),
            pii_counts("text").alias("c"),
        ).collect()
    }
    red0, ne0, np0 = out[0]
    assert "[EMAIL]" in red0 and "[PHONE]" in red0
    assert "example.co.uk" not in red0 and "555" not in red0
    assert (ne0, np0) == (1, 1)
    red1, ne1, np1 = out[1]
    assert red1 == "no pii here, just words and the number 7"  # untouched
    assert (ne1, np1) == (0, 0)


def test_quality_functions_empty_text(spark):
    """Empty/whitespace-only docs score 0.0 instead of crashing with
    ANSI DIVIDE_BY_ZERO (review finding r3)."""
    from weaviate_txtai_spark.functions.text import (
        lexical_diversity,
        mean_token_len,
        quality_score,
        stopword_ratio,
    )

    df = spark.createDataFrame([("",), ("   ",), ("real text here",)], "text string")
    rows = df.select(
        lexical_diversity("text").alias("d"),
        stopword_ratio("text").alias("s"),
        mean_token_len("text").alias("m"),
        quality_score("text").alias("q"),
    ).collect()
    assert rows[0]["d"] == rows[0]["s"] == rows[0]["m"] == 0.0
    assert rows[1]["d"] == 0.0
    assert rows[2]["d"] > 0


def test_lang_id_chinese_containment(spark):
    """Unsegmented scripts: Chinese text must be detected via character
    containment, not labeled 'und' (review finding r3)."""
    from weaviate_txtai_spark.functions.text import lang_id

    df = spark.createDataFrame(
        [("我有一个苹果，他就在那里",), ("the cat sat on the mat and it is fine",)],
        "text string",
    )
    got = [r["l"] for r in df.select(lang_id("text").alias("l")).collect()]
    assert got == ["zh", "en"]


def test_normalize_text_semantics(spark):
    from weaviate_txtai_spark.functions.text import normalize_text

    df = spark.createDataFrame(
        [
            (1, "  Hello\t\tWorld  "),
            (2, "a​b‌c﻿d"),   # zero-width chars vanish
            (3, "MiXeD\x00Case\x1f!"),        # control chars vanish
            (4, None),
        ],
        "id long, t string",
    )
    got = {r["id"]: r["n"] for r in df.select("id", normalize_text("t").alias("n")).collect()}
    assert got[1] == "hello world"
    assert got[2] == "abcd"
    assert got[3] == "mixedcase!"
    assert got[4] is None


# ---------------------------------------------------------------- ngrams
def test_ngrams_keeps_repeats_in_order(spark):
    from weaviate_txtai_spark.functions.text import ngrams

    df = spark.createDataFrame([("a b a b",), ("x",)], ["t"])
    out = [r[0] for r in df.select(ngrams("t", 2)).collect()]
    assert out[0] == ["a b", "b a", "a b"]  # repeats kept, ordered
    assert out[1] == []  # shorter than n


def test_gopher_repetition_hand_computed(spark, sf_dir):
    """Pin the full definition on a handmade doc: 'a a a b' →
    2-grams {a a:2, a b:1}; total_chars=4; top2 = 2*2/4 = 1.0,
    dup2 = 2*2/4 = 1.0; 3-grams {a a a:1, a a b:1} all unique →
    dup3 = 0, top3 = 3/4."""
    import weaviate_txtai_spark.plans.queries  # noqa: F401 register
    from weaviate_txtai_spark.plans.base import REGISTRY
    from unittest import mock
    from weaviate_txtai_spark.sources import tables

    doc = spark.createDataFrame(
        [(0, "a a a b", "en", "s", 7)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    with mock.patch.object(
        tables, "load_table", lambda s, d, t: doc
    ), mock.patch(
        "weaviate_txtai_spark.plans.text.load_table",
        lambda s, d, t: doc,
    ):
        row = REGISTRY["docs_gopher_repetition"][0](spark, sf_dir).collect()[0]
    assert row["top2_char_frac"] == 1.0
    assert row["dup2_char_frac"] == 1.0
    assert row["top3_char_frac"] == 0.75
    assert row["dup3_char_frac"] == 0.0
