"""Round-8 batch 6: l-diversity, Cohen's kappa, Dunning LLR keyness."""

import math

import pytest


def test_l_diversity_homogeneous_group_flagged(spark):
    from weaviate_txtai_spark.operators.profile import l_diversity_report

    # group q=1 has 3 rows all sensitive 'x' (weak at l=2);
    # group q=2 has 2 rows spanning {x, y} (diverse)
    rows = [(1, "x"), (1, "x"), (1, "x"), (2, "x"), (2, "y")]
    df = spark.createDataFrame(rows, "q int, s string")
    r = l_diversity_report(df, ["q"], "s", l=2).collect()[0]
    assert r["n_rows"] == 5 and r["n_groups"] == 2
    assert r["weak_groups"] == 1 and r["weak_rows"] == 3
    assert r["weak_frac"] == 0.6
    with pytest.raises(ValueError, match="quasi"):
        l_diversity_report(df, [], "s")
    with pytest.raises(ValueError, match="l must"):
        l_diversity_report(df, ["q"], "s", l=0)


def test_cohens_kappa_textbook(spark):
    from weaviate_txtai_spark.operators.evalmetrics import cohens_kappa

    # classic 2x2: a=yes/yes 20, yes/no 5, no/yes 10, no/no 15
    rows = (
        [("y", "y")] * 20 + [("y", "n")] * 5
        + [("n", "y")] * 10 + [("n", "n")] * 15
    )
    df = spark.createDataFrame(rows, "a string, b string")
    r = cohens_kappa(df, "a", "b").collect()[0]
    po = 35 / 50
    pe = (25 / 50) * (30 / 50) + (25 / 50) * (20 / 50)
    assert r["n"] == 50 and r["p_o"] == po
    assert math.isclose(r["p_e"], pe, abs_tol=1e-9)
    assert math.isclose(r["kappa"], (po - pe) / (1 - pe), abs_tol=1e-6)


def test_cohens_kappa_degenerate_constant_raters(spark):
    from weaviate_txtai_spark.operators.evalmetrics import cohens_kappa

    df = spark.createDataFrame([("y", "y")] * 4, "a string, b string")
    r = cohens_kappa(df, "a", "b").collect()[0]
    assert r["p_o"] == 1.0 and r["p_e"] == 1.0 and r["kappa"] is None


def test_llr_keyterms_salience(spark):
    from weaviate_txtai_spark.operators.infotheory import llr_keyterms

    fg = spark.createDataFrame(
        [("domain", 50), ("the", 100), ("rare", 1)], "term string, cnt long"
    )
    bg = spark.createDataFrame(
        [("the", 1000), ("noise", 400), ("rare", 5)], "term string, cnt long"
    )
    out = llr_keyterms(fg, bg, "term", "cnt", top_k=5).collect()
    terms = [r["term"] for r in out]
    # 'domain' is fg-only and frequent: the top key term
    assert terms[0] == "domain"
    # 'noise' is bg-only -> never over-represented in fg
    assert "noise" not in terms
    # g2 non-negative, sorted desc
    g2s = [r["g2"] for r in out]
    assert all(g >= 0 for g in g2s) and g2s == sorted(g2s, reverse=True)
    dom = out[0]
    assert dom["fg_count"] == 50 and dom["bg_count"] == 0
