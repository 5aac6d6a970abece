"""Round-9 batch 1: MMR diversified selection, Fellegi–Sunter record
linkage, Jelinek–Mercer trigram NLL, stratified ATE."""

import math
import random

import pytest

from pyspark.sql import functions as F


# ------------------------------------------------------------------ MMR


def _py_mmr(rows, k, lam, rd=6):
    """Plain-python greedy reference over (id, rel, vec) rows."""
    import numpy as np

    rows = sorted(rows)
    ids = [r[0] for r in rows]
    rel = np.array([r[1] for r in rows])
    mat = np.array([r[2] for r in rows], dtype=float)
    n = len(ids)
    red = np.zeros(n)
    taken = [False] * n
    out = []
    for _ in range(min(k, n)):
        obj = np.round(lam * rel - (1 - lam) * red, rd + 1)
        best = max(
            (o, -i) for i, o in enumerate(obj) if not taken[i]
        )
        i = -best[1]
        taken[i] = True
        out.append((ids[i], float(obj[i])))
        red = np.maximum(red, np.round(mat @ mat[i], rd))
    return out


def test_mmr_matches_reference_and_diversifies(spark):
    from weaviate_txtai_spark.operators.mmr import mmr_select

    rng = random.Random(3)
    vecs = []
    for i in range(20):
        v = [rng.gauss(0, 1) for _ in range(8)]
        n = math.sqrt(sum(x * x for x in v))
        vecs.append([x / n for x in v])
    # two near-identical top candidates: plain top-k keeps both, MMR
    # must skip the redundant twin
    vecs[1] = list(vecs[0])
    rows = [
        (0, i, round(1.0 - i * 0.01, 6), vecs[i]) for i in range(20)
    ]
    df = spark.createDataFrame(
        rows, "query_id long, doc_id long, score double, vector array<double>"
    )
    got = [
        (r["doc_id"], r["mmr"])
        for r in mmr_select(df, 5, lam=0.5).orderBy("rank").collect()
    ]
    want = _py_mmr([(i, r, v) for _, i, r, v in rows], 5, 0.5)
    assert got == want
    picked = [d for d, _ in got]
    assert 0 in picked and 1 not in picked, picked  # twin suppressed


def test_mmr_lam_one_is_pure_relevance(spark):
    from weaviate_txtai_spark.operators.mmr import mmr_select

    rows = [
        (0, i, round(0.9 - i * 0.1, 6), [1.0, 0.0]) for i in range(5)
    ]
    df = spark.createDataFrame(
        rows, "query_id long, doc_id long, score double, vector array<double>"
    )
    got = [r["doc_id"] for r in
           mmr_select(df, 3, lam=1.0).orderBy("rank").collect()]
    assert got == [0, 1, 2]


def test_mmr_validation(spark):
    from weaviate_txtai_spark.operators.mmr import mmr_select

    df = spark.createDataFrame(
        [(0, 1, 0.5, [1.0])],
        "query_id long, doc_id long, score double, vector array<double>",
    )
    with pytest.raises(ValueError, match="k"):
        mmr_select(df, 0)
    with pytest.raises(ValueError, match="lam"):
        mmr_select(df, 1, lam=1.5)


# ------------------------------------------------- Fellegi–Sunter


def test_fs_weights_hand_computed(spark):
    from weaviate_txtai_spark.operators.recordlinkage import (
        fs_score,
        fs_weights,
    )

    # 4 matches (3 agree), 8 non-matches (2 agree) on one field
    rows = [(True, i < 3) for i in range(4)] + [
        (False, i < 2) for i in range(8)
    ]
    df = spark.createDataFrame(rows, "is_match boolean, eq boolean")
    w = fs_weights(df, ["eq"], "is_match")
    m, u = 3 / 4, 2 / 8
    assert w["eq"][0] == round(math.log2(m / u), 9)
    assert w["eq"][1] == round(math.log2((1 - m) / (1 - u)), 9)
    scored = {
        (r["is_match"], r["eq"]): r["score"]
        for r in fs_score(df, w).collect()
    }
    assert scored[(True, True)] == round(w["eq"][0], 6)
    assert scored[(False, False)] == round(w["eq"][1], 6)


def test_fs_weights_clamp_and_validation(spark):
    from weaviate_txtai_spark.operators.recordlinkage import fs_weights

    # degenerate field: matches ALWAYS agree -> m clamps below 1
    rows = [(True, True)] * 3 + [(False, False)] * 3
    df = spark.createDataFrame(rows, "is_match boolean, eq boolean")
    w = fs_weights(df, ["eq"], "is_match")
    assert math.isfinite(w["eq"][0]) and math.isfinite(w["eq"][1])
    only = spark.createDataFrame(
        [(True, True)], "is_match boolean, eq boolean"
    )
    with pytest.raises(ValueError, match="matches"):
        fs_weights(only, ["eq"], "is_match")
    with pytest.raises(ValueError, match="agreement"):
        fs_weights(df, [], "is_match")


def test_fs_separates_true_pairs(spark, sf_dir):
    """On the gate fixture, true pairs must dominate the top scores."""
    from weaviate_txtai_spark.plans.relational import (
        customer_linkage_fs_q,
    )

    rows = customer_linkage_fs_q(spark, sf_dir).collect()
    assert len(rows) == 40
    frac_match = sum(1 for r in rows if r["is_match"]) / len(rows)
    assert frac_match >= 0.9, frac_match


# ---------------------------------------------- trigram JM NLL


def test_trigram_jm_hand_computed(spark):
    from weaviate_txtai_spark.operators.lm import trigram_jm_nll

    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "a b"), (3, None)],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: (r["n_trigrams"], r["nll"])
           for r in trigram_jm_nll(docs, round_decimals=6).collect()}
    # corpus: tokens a,b,c,a,b -> T=5; c(abc)=1, c(ab)=2, c(bc)=1,
    # c(b)=2, c(c)=1
    p = 0.6 * (1 / 2) + 0.3 * (1 / 2) + 0.1 * (1 / 5)
    assert out[1] == (1, round(-math.log(p), 6))
    assert out[2] == (0, None) and out[3] == (0, None)


def test_trigram_jm_catches_scrambled_bigram_text(spark):
    """A doc reusing corpus BIGRAMS in an unseen order scores worse
    than the canonical phrasing — what the bigram model cannot fully
    separate, the trigram term does."""
    from weaviate_txtai_spark.operators.lm import trigram_jm_nll

    base = [(i, "the quick brown fox jumps over the lazy dog")
            for i in range(20)]
    # "brown fox" and "the quick" are corpus bigrams; this order breaks
    # every trigram
    docs = base + [(100, "over the quick brown fox lazy dog jumps")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r["doc_id"]: r["nll"]
           for r in trigram_jm_nll(df, round_decimals=6).collect()}
    assert out[100] > out[0]


def test_trigram_jm_validation(spark):
    from weaviate_txtai_spark.operators.lm import trigram_jm_nll

    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError, match="lambdas"):
        trigram_jm_nll(df, lambdas=(0.5, 0.5, 0.5))


# ---------------------------------------------- stratified ATE


def test_stratified_ate_closed_form(spark):
    from weaviate_txtai_spark.operators.abtest import stratified_ate

    rows = []
    # stratum 0: treat mean 1.0 (3 units), control mean 0.0 (3 units)
    rows += [(0, True, 1.0)] * 3 + [(0, False, 0.0)] * 3
    # stratum 1: treat mean 0.5 (4), control mean 0.25 (4)
    rows += [(1, True, 1.0), (1, True, 0.0)] * 2
    rows += [(1, False, 1.0), (1, False, 0.0), (1, False, 0.0),
             (1, False, 0.0)]
    # stratum 2: only one control unit -> trimmed
    rows += [(2, True, 1.0)] * 2 + [(2, False, 1.0)]
    df = spark.createDataFrame(rows, "stratum int, t boolean, y double")
    out = {r["stratum"]: r for r in
           stratified_ate(df, "t", "y", "stratum").collect()}
    assert set(out) == {0, 1, -1}
    assert out[0]["diff"] == 1.0 and out[1]["diff"] == 0.25
    w0, w1 = 6 / 14, 8 / 14
    assert out[-1]["diff"] == round(w0 * 1.0 + w1 * 0.25, 6)
    assert out[-1]["se"] is not None and out[-1]["se"] > 0
    assert out[0]["se"] is None


def test_stratified_ate_single_stratum_equals_raw_diff(spark):
    from weaviate_txtai_spark.operators.abtest import stratified_ate

    rows = [(0, True, float(i % 2)) for i in range(10)] + [
        (0, False, float(i % 3 == 0)) for i in range(9)
    ]
    df = spark.createDataFrame(rows, "stratum int, t boolean, y double")
    out = {r["stratum"]: r for r in
           stratified_ate(df, "t", "y", "stratum").collect()}
    assert out[-1]["diff"] == round(5 / 10 - 3 / 9, 6)


# ---------------------------------------------- sequence triples


def test_sequence_triples_hand_fixture(spark):
    from weaviate_txtai_spark.operators.seqmine import sequence_triples

    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    # users 1, 2: a -> b -> c chain inside windows
    for u in (1, 2):
        rows += [(u, "a", t0), (u, "b", t0 + dt.timedelta(minutes=5)),
                 (u, "c", t0 + dt.timedelta(minutes=9))]
    # user 3: a -> b, but c beyond the second hop's window
    rows += [(3, "a", t0), (3, "b", t0 + dt.timedelta(minutes=5)),
             (3, "c", t0 + dt.timedelta(minutes=40))]
    df = spark.createDataFrame(rows, "user_id long, event_type string, ts timestamp")
    out = {(r["a"], r["b"], r["c"]): r["support"]
           for r in sequence_triples(df, window_seconds=600,
                                     min_support=2).collect()}
    assert out[("a", "b", "c")] == 2
    assert ("b", "c", "a") not in out


def test_sequence_triples_not_greedy(spark):
    """A later a-occurrence completes the chain when the earliest one
    cannot — greedy earliest-match would miss this pattern."""
    from weaviate_txtai_spark.operators.seqmine import sequence_triples

    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, "a", t0),                                  # early a: its b is too late
        (1, "a", t0 + dt.timedelta(minutes=20)),       # late a works
        (1, "b", t0 + dt.timedelta(minutes=25)),
        (1, "c", t0 + dt.timedelta(minutes=29)),
    ]
    df = spark.createDataFrame(rows, "user_id long, event_type string, ts timestamp")
    out = {(r["a"], r["b"], r["c"]) for r in
           sequence_triples(df, window_seconds=600, min_support=1).collect()}
    assert ("a", "b", "c") in out


# ---------------------------------------------- DP noisy counts


def test_dp_counts_noise_shape_and_floor(spark):
    import math

    from weaviate_txtai_spark.operators.privacy import dp_noisy_counts

    rows = [(i % 10,) for i in range(1000)]
    df = spark.createDataFrame(rows, "cohort long")
    out = {r["cohort"]: r["noisy_count"]
           for r in dp_noisy_counts(df, ["cohort"], epsilon=1.0).collect()}
    assert len(out) == 10
    # replicate the hash draw for cohort 3
    k = 3 % 2147483648
    u = ((k * 2654435761) % 4294967296 + 0.5) / 4294967296.0
    c = u - 0.5
    noise = -1.0 * math.copysign(1.0, c) * math.log(
        max(1.0 - 2.0 * abs(c), 2.0 ** -33)
    )
    assert out[3] == round(max(100 + noise, 0.0), 6)
    assert all(v >= 0 for v in out.values())


def test_dp_counts_epsilon_scales_noise_and_salt_varies(spark):
    from weaviate_txtai_spark.operators.privacy import dp_noisy_counts

    rows = [(7,)] * 100
    df = spark.createDataFrame(rows, "cohort long")
    tight = dp_noisy_counts(df, ["cohort"], epsilon=10.0).collect()[0][1]
    loose = dp_noisy_counts(df, ["cohort"], epsilon=0.1).collect()[0][1]
    assert abs(tight - 100) * 10 <= abs(loose - 100) + 1e-9
    s0 = dp_noisy_counts(df, ["cohort"], salt=0).collect()[0][1]
    s1 = dp_noisy_counts(df, ["cohort"], salt=12345).collect()[0][1]
    assert s0 != s1


def test_dp_counts_validation(spark):
    from weaviate_txtai_spark.operators.privacy import dp_noisy_counts

    df = spark.createDataFrame([(1,)], "cohort long")
    with pytest.raises(ValueError, match="epsilon"):
        dp_noisy_counts(df, ["cohort"], epsilon=0.0)
    with pytest.raises(ValueError, match="group"):
        dp_noisy_counts(df, [])


# ---------------------------------------------- Bradley–Terry


def test_bt_dominant_item_ranks_first(spark):
    from weaviate_txtai_spark.operators.btrank import bradley_terry_exact

    # 1 beats everyone; 2 beats 3; 3 beats nothing
    pairs = [(1, 2)] * 5 + [(1, 3)] * 5 + [(2, 3)] * 4 + [(3, 2)] * 1
    df = spark.createDataFrame(pairs, "winner long, loser long")
    out = {r["item"]: r["strength"]
           for r in bradley_terry_exact(df, n_iter=8).collect()}
    assert out[1] == 1.0
    assert out[1] > out[2] > out[3] > 0


def test_bt_symmetric_record_equal_strengths(spark):
    from weaviate_txtai_spark.operators.btrank import bradley_terry_exact

    pairs = [(1, 2)] * 3 + [(2, 1)] * 3
    df = spark.createDataFrame(pairs, "winner long, loser long")
    out = {r["item"]: r["strength"]
           for r in bradley_terry_exact(df).collect()}
    assert out[1] == out[2] == 1.0


def test_bt_never_winning_item_floors_not_crashes(spark):
    from weaviate_txtai_spark.operators.btrank import bradley_terry_exact

    pairs = [(1, 2)] * 10
    df = spark.createDataFrame(pairs, "winner long, loser long")
    out = {r["item"]: r["strength"]
           for r in bradley_terry_exact(df).collect()}
    assert out[1] == 1.0 and out[2] == 0.0


def test_bt_matches_scipy_free_reference(spark):
    """Fixed-point trajectory tracks a float MM reference on the final
    ordering (values differ by quantization; ORDER must agree)."""
    import random

    from weaviate_txtai_spark.operators.btrank import bradley_terry_exact

    rng = random.Random(13)
    true = {i: 2.0 ** i for i in range(4)}
    pairs = []
    for _ in range(800):
        i, j = rng.sample(range(4), 2)
        pi = true[i] / (true[i] + true[j])
        pairs.append((i, j) if rng.random() < pi else (j, i))
    df = spark.createDataFrame(pairs, "winner long, loser long")
    out = {r["item"]: r["strength"]
           for r in bradley_terry_exact(df, n_iter=12).collect()}
    ranked = sorted(out, key=lambda k: out[k])
    assert ranked == [0, 1, 2, 3], (ranked, out)


def test_bt_validation(spark):
    import pytest as _pytest

    from weaviate_txtai_spark.operators.btrank import bradley_terry_exact

    df = spark.createDataFrame([(1, 2)], "winner long, loser long")
    with _pytest.raises(ValueError, match="n_iter"):
        bradley_terry_exact(df, n_iter=0)
