"""Unigram LM scoring (operators/lm.py) and deterministic mixture
sampling (functions/sampling.py): hand-computed probabilities, empty-doc
surfacing, unseen-token floor, quota arithmetic, nesting, determinism."""

import math

import pytest

from pyspark.sql import functions as F

from weaviate_txtai_spark.functions.sampling import (
    mixture_quotas,
    mixture_sample,
)
from weaviate_txtai_spark.operators.lm import (
    nll_quality_filter,
    train_unigram,
    unigram_nll,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_unigram_nll_hand_computed(spark):
    df = _docs(spark, [(1, "a a b"), (2, "a b")])
    # counts a:3 b:2, T=5, V=2, alpha=1 -> p(a)=4/7, p(b)=3/7
    la, lb = math.log(4 / 7), math.log(3 / 7)
    got = {r["doc_id"]: r for r in unigram_nll(df).collect()}
    assert got[1]["n_tokens"] == 3 and got[2]["n_tokens"] == 2
    assert got[1]["nll"] == pytest.approx(-(2 * la + lb) / 3)
    assert got[2]["nll"] == pytest.approx(-(la + lb) / 2)


def test_unigram_nll_empty_doc_surfaced(spark):
    df = _docs(spark, [(1, "a b"), (2, "   "), (3, "")])
    got = {r["doc_id"]: r for r in unigram_nll(df).collect()}
    assert set(got) == {1, 2, 3}
    assert got[2]["n_tokens"] == 0 and got[2]["nll"] is None
    assert got[3]["n_tokens"] == 0 and got[3]["nll"] is None


def test_unigram_cross_corpus_floor(spark):
    train = _docs(spark, [(1, "a a b")])  # T=3 V=2: p(a)=4/5 p(b)=2/5... alpha=1
    model = train_unigram(train)
    assert model.floor_logp == pytest.approx(math.log(1 / 5))
    score = _docs(spark, [(10, "a zzz")])  # zzz unseen -> floor
    row = unigram_nll(score, model=model).collect()[0]
    la = math.log((2 + 1) / 5)  # c(a)=2, T=3, V=2 -> (2+1)/(3+2)
    assert row["nll"] == pytest.approx(-(la + math.log(1 / 5)) / 2)


def test_train_unigram_rejects_empty(spark):
    with pytest.raises(ValueError, match="no tokens"):
        train_unigram(_docs(spark, [(1, " ")]))


def test_nll_quality_filter_mean_threshold(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = nll_quality_filter(docs, round_decimals=6)
    rows = out.collect()
    assert len(rows) == docs.count()
    nlls = [r["nll"] for r in rows if r["nll"] is not None]
    mean = round(sum(nlls) / len(nlls), 6)
    for r in rows:
        expect = r["nll"] is not None and r["nll"] <= mean
        assert r["keep"] == expect


def test_mixture_quotas_arithmetic():
    q = mixture_quotas({"a": 25, "b": 25}, {"a": 0.8, "b": 0.2})
    # lambda = min(25/0.8, 25/0.2) = 31.25 -> floor(25.0)=25, floor(6.25)=6
    assert q == {"a": 25, "b": 6}
    with pytest.raises(ValueError, match="empty weights"):
        mixture_quotas({"a": 1}, {})
    with pytest.raises(ValueError, match="non-positive"):
        mixture_quotas({"a": 1}, {"a": 0.0})
    with pytest.raises(ValueError, match="absent"):
        mixture_quotas({"a": 1}, {"a": 0.5, "zz": 0.5})


def test_mixture_sample_exact_counts_and_nesting(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    per = docs.groupBy("source").count().collect()
    n = {r["source"]: r["count"] for r in per}
    w_tight = {"src0": 0.8, "src1": 0.2}
    w_loose = {"src0": 0.6, "src1": 0.4}
    kept_tight = mixture_sample(docs, w_tight).select("doc_id", "source").collect()
    kept_loose = mixture_sample(docs, w_loose).select("doc_id", "source").collect()
    qt = mixture_quotas({s: n[s] for s in w_tight}, w_tight)
    ql = mixture_quotas({s: n[s] for s in w_loose}, w_loose)
    got_t = {}
    for r in kept_tight:
        got_t.setdefault(r["source"], set()).add(r["doc_id"])
    got_l = {}
    for r in kept_loose:
        got_l.setdefault(r["source"], set()).add(r["doc_id"])
    assert {s: len(v) for s, v in got_t.items()} == qt
    assert {s: len(v) for s, v in got_l.items()} == ql
    # nesting: src1's quota grew -> its tight sample is inside the loose one
    assert qt["src1"] < ql["src1"]
    assert got_t["src1"] <= got_l["src1"]


def test_mixture_sample_partitioning_invariant(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    w = {"src0": 0.7, "src2": 0.3}
    a = sorted(r["doc_id"] for r in mixture_sample(docs, w).collect())
    b = sorted(
        r["doc_id"] for r in mixture_sample(docs.repartition(7), w).collect()
    )
    assert a == b and len(a) > 0


def test_mixture_sample_approx_path(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    w = {"src0": 0.5, "src1": 0.5}
    out = mixture_sample(docs, w, exact=False)
    rows = out.collect()
    # map-only filter: deterministic and within the stratum's population
    assert sorted(r["doc_id"] for r in rows) == sorted(
        r["doc_id"] for r in mixture_sample(docs.repartition(5), w, exact=False).collect()
    )
    assert {r["source"] for r in rows} <= set(w)


def test_unigram_nll_null_text_surfaced(spark):
    df = _docs(spark, [(1, "a b"), (2, None)])
    got = {r["doc_id"]: r for r in unigram_nll(df).collect()}
    assert set(got) == {1, 2}
    assert got[2]["n_tokens"] == 0 and got[2]["nll"] is None
    flt = {r["doc_id"]: r for r in nll_quality_filter(df).collect()}
    assert flt[2]["keep"] is False


def test_bigram_nll_hand_computed(spark):
    from weaviate_txtai_spark.operators.lm import bigram_nll

    # corpus "a b a b" + "a b": bigrams (a,b):3 (b,a):1; c(a)=3 c(b)=3 V=2
    df = _docs(spark, [(1, "a b a b"), (2, "a b")])
    pab = math.log((3 + 1) / (3 + 2))  # c(a,b)+1 / (c(a)+V)
    pba = math.log((1 + 1) / (3 + 2))
    got = {r["doc_id"]: r for r in bigram_nll(df).collect()}
    assert got[1]["n_bigrams"] == 3 and got[2]["n_bigrams"] == 1
    assert got[1]["nll"] == pytest.approx(-(2 * pab + pba) / 3)
    assert got[2]["nll"] == pytest.approx(-pab)


def test_bigram_flags_scrambled_text(spark):
    from weaviate_txtai_spark.operators.lm import bigram_nll, unigram_nll

    # doc 99 reuses the corpus vocabulary with broken transitions: the
    # unigram score cannot tell it apart, the bigram score must
    sent = "the quick brown fox jumps over the lazy dog"
    corpus = [(i, sent) for i in range(10)]
    scrambled = "dog the over quick lazy fox the jumps brown"
    df = _docs(spark, corpus + [(99, scrambled)])
    uni = {r["doc_id"]: r["nll"] for r in unigram_nll(df).collect()}
    big = {r["doc_id"]: r["nll"] for r in bigram_nll(df).collect()}
    assert uni[99] == pytest.approx(uni[0], abs=1e-9)  # unigram is blind
    assert big[99] > big[0] + 0.5  # bigram sees the damage


def test_bigram_short_docs_surfaced(spark):
    from weaviate_txtai_spark.operators.lm import bigram_nll

    df = _docs(spark, [(1, "a b"), (2, "solo"), (3, ""), (4, None)])
    got = {r["doc_id"]: r for r in bigram_nll(df).collect()}
    assert set(got) == {1, 2, 3, 4}
    for i in (2, 3, 4):
        assert got[i]["n_bigrams"] == 0 and got[i]["nll"] is None


def test_mixture_quotas_properties():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=200, deadline=None)
    @given(
        counts=st.dictionaries(
            keys=st.sampled_from(list("abcdef")),
            values=st.integers(1, 10**6),
            min_size=1,
            max_size=6,
        ),
        data=st.data(),
    )
    def inner(counts, data):
        weights = {
            s: data.draw(
                st.floats(0.01, 10, allow_nan=False, allow_infinity=False)
            )
            for s in counts
        }
        q = mixture_quotas(counts, weights)
        assert set(q) == set(weights)
        # feasibility: never over-draw a stratum
        assert all(0 <= q[s] <= counts[s] for s in weights)
        # maximality: the binding stratum is exhausted up to one row of
        # float slack ((n_b / w_b) * w_b can land one ulp under n_b)
        lam = min(counts[s] / w for s, w in weights.items())
        binding = min(weights, key=lambda s: counts[s] / weights[s])
        assert q[binding] >= counts[binding] - 1
        # proportionality: each quota is within one row of lambda * w
        for s, w in weights.items():
            assert abs(q[s] - lam * w) <= 1.0

    inner()


def test_uniform_sample_k_nests_and_takeordered(spark, sf_dir):
    from weaviate_txtai_spark.functions.sampling import uniform_sample_k

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    s10 = {r["doc_id"] for r in uniform_sample_k(docs, 10).collect()}
    s30 = {r["doc_id"] for r in uniform_sample_k(docs, 30).collect()}
    assert len(s10) == 10 and len(s30) == 30 and s10 <= s30
    # same sample under repartitioning
    s10b = {r["doc_id"] for r in uniform_sample_k(docs.repartition(7), 10).collect()}
    assert s10 == s10b
    plan = uniform_sample_k(docs, 10)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan  # no global sort


def test_weighted_sample_k_prefers_heavy_and_excludes_nonpositive(spark):
    from weaviate_txtai_spark.functions.sampling import weighted_sample_k

    rows = [(i, 0.001) for i in range(1, 50)] + [(99, 1e9), (100, 0.0), (101, None)]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    top1 = weighted_sample_k(df, 1, "w").collect()
    assert top1[0]["doc_id"] == 99  # u^(1/1e9) ~ 1 dominates
    got = {r["doc_id"] for r in weighted_sample_k(df, 49, "w").collect()}
    assert 100 not in got and 101 not in got  # nonpositive/NULL never win
    # exact count + determinism under repartitioning
    a = sorted(r["doc_id"] for r in weighted_sample_k(df, 20, "w").collect())
    b = sorted(
        r["doc_id"] for r in weighted_sample_k(df.repartition(5), 20, "w").collect()
    )
    assert a == b and len(a) == 20


def test_weighted_sample_k_no_padding_below_k(spark):
    from weaviate_txtai_spark.functions.sampling import weighted_sample_k

    df = spark.createDataFrame(
        [(1, 2.0), (2, 3.0), (3, 0.0), (4, None)], "doc_id long, w double"
    )
    got = weighted_sample_k(df, 4, "w").collect()
    # only the positive-weight rows can appear — no padding to k
    assert sorted(r["doc_id"] for r in got) == [1, 2]
