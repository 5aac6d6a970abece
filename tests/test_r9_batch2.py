"""Round-9 batch 2: multinomial Naive Bayes, chi-square term
selection, ROC AUC."""

import math

import pytest

from pyspark.sql import functions as F


# ----------------------------------------------------------- Naive Bayes


def test_nb_classify_separable_vocab(spark):
    from weaviate_txtai_spark.operators.nbayes import nb_classify

    train = spark.createDataFrame(
        [
            (1, "ham", "meet for lunch today"),
            (2, "ham", "lunch again today ok"),
            (3, "spam", "win money now win"),
            (4, "spam", "free money win prize"),
        ],
        "doc_id long, lang string, text string",
    )
    test = spark.createDataFrame(
        [(10, "lunch today"), (11, "win free money")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["pred"]
        for r in nb_classify(train, test, label_col="lang").collect()
    }
    assert got == {10: "ham", 11: "spam"}


def test_nb_matches_closed_form(spark):
    """Hand-computed multinomial NB log-joint on a tiny corpus."""
    from weaviate_txtai_spark.operators.nbayes import nb_classify

    train = spark.createDataFrame(
        [(1, "a", "x x y"), (2, "b", "y z")],
        "doc_id long, lang string, text string",
    )
    test = spark.createDataFrame([(3, "x y")], "doc_id long, text string")
    row = nb_classify(train, test, label_col="lang").collect()[0]
    # V=3; class a: N=3, counts x=2,y=1; class b: N=2, counts y=1,z=1
    score_a = (
        math.log(0.5) + math.log(2 + 1) + math.log(1 + 1)
        - 2 * math.log(3 + 3)
    )
    score_b = (
        math.log(0.5) + math.log(0 + 1) + math.log(1 + 1)
        - 2 * math.log(2 + 3)
    )
    assert row["pred"] == "a"
    assert row["score"] == pytest.approx(round(score_a, 6), abs=1e-9)
    assert score_b < score_a


def test_nb_drops_oov_and_empty_docs(spark):
    from weaviate_txtai_spark.operators.nbayes import nb_classify

    train = spark.createDataFrame(
        [(1, "a", "x y"), (2, "b", "z w")],
        "doc_id long, lang string, text string",
    )
    test = spark.createDataFrame(
        [(3, "q q q"), (4, ""), (5, "x q")],
        "doc_id long, text string",
    )
    rows = nb_classify(train, test, label_col="lang").collect()
    # fully-OOV and empty docs carry no evidence and are omitted
    assert {r["doc_id"] for r in rows} == {5}
    assert rows[0]["pred"] == "a"


def test_nb_rejects_bad_alpha(spark):
    from weaviate_txtai_spark.operators.nbayes import nb_classify

    df = spark.createDataFrame(
        [(1, "a", "x")], "doc_id long, lang string, text string"
    )
    with pytest.raises(ValueError):
        nb_classify(df, df, label_col="lang", alpha=0.0)


# ------------------------------------------------------------ chi-square


def test_chi2_terms_flags_class_marker(spark):
    from weaviate_txtai_spark.operators.featsel import chi2_terms

    rows = []
    # 'alpha' appears in every class-a doc and nowhere else; 'common'
    # appears everywhere (must be excluded: df_t == N)
    for i in range(10):
        rows.append((i, "a", "alpha common filler%d" % (i % 3)))
    for i in range(10, 20):
        rows.append((i, "b", "beta common filler%d" % (i % 3)))
    docs = spark.createDataFrame(
        rows, "doc_id long, source string, text string"
    )
    got = chi2_terms(docs, class_col="source", top_k=3).collect()
    by_class = {}
    for r in got:
        by_class.setdefault(r["class"], []).append(r["term"])
    assert by_class["a"][0] == "alpha"
    assert by_class["b"][0] == "beta"
    all_terms = {r["term"] for r in got}
    assert "common" not in all_terms
    # perfect marker: chi2 == N for a 10/10 split
    top_a = [r for r in got if r["class"] == "a"][0]
    assert top_a["chi2"] == pytest.approx(20.0)
    assert top_a["n11"] == 10


def test_chi2_positive_association_only(spark):
    from weaviate_txtai_spark.operators.featsel import chi2_terms

    # 'beta' present in 1-of-10 class-a docs but 10-of-10 class-b docs:
    # strongly associated with b, NEGATIVELY with a -> must not rank for a
    rows = [(i, "a", "alpha" + (" beta" if i == 0 else "")) for i in range(10)]
    rows += [(i + 10, "b", "beta") for i in range(10)]
    docs = spark.createDataFrame(
        rows, "doc_id long, source string, text string"
    )
    got = chi2_terms(docs, class_col="source", top_k=5).collect()
    a_terms = [r["term"] for r in got if r["class"] == "a"]
    assert "beta" not in a_terms
    assert "alpha" in a_terms


def test_chi2_rejects_bad_k(spark):
    from weaviate_txtai_spark.operators.featsel import chi2_terms

    df = spark.createDataFrame(
        [(1, "a", "x")], "doc_id long, source string, text string"
    )
    with pytest.raises(ValueError):
        chi2_terms(df, top_k=0)


# -------------------------------------------------------------- ROC AUC


def _sklearn_free_auc(pairs):
    """Reference AUC via explicit pair counting (ties count 1/2)."""
    pos = [s for y, s in pairs if y]
    neg = [s for y, s in pairs if not y]
    if not pos or not neg:
        return None
    num = 0.0
    for p in pos:
        for n in neg:
            num += 1.0 if p > n else (0.5 if p == n else 0.0)
    return num / (len(pos) * len(neg))


def test_roc_auc_matches_pair_counting(spark):
    from weaviate_txtai_spark.operators.evalmetrics import roc_auc

    import random

    rng = random.Random(7)
    pairs = [
        (rng.random() < 0.4, float(rng.randint(0, 20)) / 4.0)
        for _ in range(200)
    ]
    df = spark.createDataFrame(pairs, "y boolean, s double")
    row = roc_auc(df, label_col="y", score_col="s").collect()[0]
    want = _sklearn_free_auc(pairs)
    assert row["auc"] == pytest.approx(want, abs=1e-6)
    assert row["n_pos"] + row["n_neg"] == 200


def test_roc_auc_perfect_and_degenerate(spark):
    from weaviate_txtai_spark.operators.evalmetrics import roc_auc

    perfect = spark.createDataFrame(
        [(True, 2.0), (True, 3.0), (False, 0.0), (False, 1.0)],
        "y boolean, s double",
    )
    assert roc_auc(perfect, label_col="y", score_col="s").collect()[0][
        "auc"
    ] == 1.0
    one_class = spark.createDataFrame(
        [(True, 1.0), (True, 2.0)], "y boolean, s double"
    )
    row = roc_auc(one_class, label_col="y", score_col="s").collect()[0]
    assert row["auc"] is None and row["n_neg"] == 0


def test_roc_auc_all_tied_is_half(spark):
    from weaviate_txtai_spark.operators.evalmetrics import roc_auc

    df = spark.createDataFrame(
        [(True, 1.0), (False, 1.0), (True, 1.0), (False, 1.0)],
        "y boolean, s double",
    )
    assert roc_auc(df, label_col="y", score_col="s").collect()[0][
        "auc"
    ] == 0.5
