"""Binary (sign) quantization tier: packing vs numpy reference,
Hamming metric invariants, production shortlist recall."""

import pytest
from pyspark.sql import functions as F

from weaviate_txtai_spark.functions.vector import hamming_dist, sign_pack
from weaviate_txtai_spark.operators.topk import (
    hamming_topk,
    hamming_topk_rerank,
)
from weaviate_txtai_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings")


@pytest.fixture(scope="module")
def codes(emb):
    return emb.select(
        "vec_id", sign_pack(F.col("embedding")).alias("sign_code")
    )


def test_sign_pack_matches_numpy_reference(emb, codes):
    import numpy as np

    rows = {r["vec_id"]: r for r in codes.limit(50).collect()}
    vecs = {
        r["vec_id"]: np.asarray(list(r["embedding"]), dtype=np.float64)
        for r in emb.filter(F.col("vec_id").isin(list(rows))).collect()
    }
    for vid, r in rows.items():
        v = vecs[vid]
        want = []
        for w in range(-(-len(v) // 32)):
            word = 0
            for j in range(32):
                pos = w * 32 + j
                if pos < len(v) and v[pos] > 0:
                    word |= 1 << j
            want.append(word)
        assert list(r["sign_code"]) == want


def test_hamming_self_zero_and_symmetric(codes):
    a = codes.limit(8).select(
        F.col("vec_id").alias("ida"), F.col("sign_code").alias("ca")
    )
    b = codes.limit(8).select(
        F.col("vec_id").alias("idb"), F.col("sign_code").alias("cb")
    )
    pairs = a.crossJoin(b).select(
        "ida", "idb",
        hamming_dist("ca", "cb").alias("ab"),
        hamming_dist("cb", "ca").alias("ba"),
    ).collect()
    for r in pairs:
        assert r["ab"] == r["ba"]
        if r["ida"] == r["idb"]:
            assert r["ab"] == 0


def test_hamming_topk_self_first(codes):
    q = [int(w) for w in
         codes.filter(F.col("vec_id") == 7).head()["sign_code"]]
    top = hamming_topk(codes, q, 5).collect()
    assert top[0]["hamming"] == 0
    assert any(r["vec_id"] == 7 and r["hamming"] == 0 for r in top)
    assert [r["rank"] for r in top] == [1, 2, 3, 4, 5]


def test_rerank_production_recall(emb, codes):
    """10× shortlist on worst-case isotropic data: recall@5 vs exact
    cosine well above chance, self-match always found."""
    from weaviate_txtai_spark.functions.vector import cosine_sim

    hits = total = 0
    for qid in range(8):
        row = emb.filter(F.col("vec_id") == qid).head()
        q = list(row["embedding"])
        qcode = [int(w) for w in
                 codes.filter(F.col("vec_id") == qid).head()["sign_code"]]
        got = {r["vec_id"]
               for r in hamming_topk_rerank(codes, emb, q, qcode, 5,
                                            shortlist=10).collect()}
        assert qid in got
        qlit = F.array(*[F.lit(float(v)) for v in q])
        want = {r["vec_id"] for r in emb.select(
            "vec_id", cosine_sim("embedding", qlit).alias("s")
        ).orderBy(F.desc("s"), F.asc("vec_id")).limit(5).collect()}
        hits += len(got & want)
        total += len(want)
    assert hits / total >= 0.5


def test_sign_pack_word_bits_guard(emb):
    with pytest.raises(ValueError, match="word_bits"):
        sign_pack(F.col("embedding"), word_bits=63)
    # ragged dim (not a multiple of word_bits): tail bits stay zero
    spark = emb.sparkSession
    df = spark.createDataFrame([(0, [1.0] * 5)], "id long, v array<double>")
    code = df.select(sign_pack("v", word_bits=4).alias("c")).head()["c"]
    assert list(code) == [15, 1]


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    vec=st.lists(
        st.floats(min_value=-10, max_value=10, allow_nan=False,
                  allow_infinity=False, width=32),
        min_size=1, max_size=80,
    ),
    word_bits=st.integers(min_value=1, max_value=62),
)
def test_sign_pack_property(spark, vec, word_bits):
    """For ANY dim/word_bits: packing matches the pure-python spec —
    word count, bit values, and zero tail bits."""
    df = spark.createDataFrame([(0, vec)], "id long, v array<double>")
    code = list(
        df.select(sign_pack("v", word_bits=word_bits).alias("c"))
        .head()["c"]
    )
    nwords = -(-len(vec) // word_bits)
    want = [0] * nwords
    for pos, x in enumerate(vec):
        if x > 0:
            want[pos // word_bits] |= 1 << (pos % word_bits)
    assert code == want


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    a=st.lists(st.integers(min_value=0, max_value=2**62 - 1),
               min_size=1, max_size=4),
    b=st.lists(st.integers(min_value=0, max_value=2**62 - 1),
               min_size=1, max_size=4),
    c=st.lists(st.integers(min_value=0, max_value=2**62 - 1),
               min_size=1, max_size=4),
)
def test_hamming_metric_axioms(spark, a, b, c):
    """Identity, symmetry, triangle inequality on equal-length codes."""
    n = min(len(a), len(b), len(c))
    a, b, c = a[:n], b[:n], c[:n]
    df = spark.createDataFrame(
        [(a, b, c)],
        "a array<long>, b array<long>, c array<long>",
    )
    r = df.select(
        hamming_dist("a", "a").alias("aa"),
        hamming_dist("a", "b").alias("ab"),
        hamming_dist("b", "a").alias("ba"),
        hamming_dist("a", "c").alias("ac"),
        hamming_dist("c", "b").alias("cb"),
    ).head()
    assert r["aa"] == 0
    assert r["ab"] == r["ba"] >= 0
    assert r["ab"] <= r["ac"] + r["cb"]
