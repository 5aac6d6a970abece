"""EM-fitted unsupervised Fellegi–Sunter (VERDICT r9 task 5):
pattern-count parity (blocked inclusion–exclusion == pair-frame
groupBy), EM convergence under the fixed-point discipline, recovery of
planted m/u on a synthetic mixture, and the gate's end-to-end behavior
(fitted p ≈ true match rate; top pairs are true matches)."""

import random

import pytest

from pyspark.sql import functions as F

from tests.test_fs_blocked import _tables, _pairs


FIELDS = {"eq_seg": ("aseg", "bseg"), "eq_name": ("aname", "bname")}


def test_pattern_counts_blocked_equals_pair_frame(spark):
    from weaviate_txtai_spark.operators.recordlinkage import (
        fs_pattern_counts,
        fs_pattern_counts_blocked,
    )

    a, b = _tables(spark)
    pairs = _pairs(a, b)
    direct = fs_pattern_counts(pairs, ["eq_seg", "eq_name"])
    blocked = fs_pattern_counts_blocked(
        a, b, a_block="an", b_block="bn", fields=FIELDS
    )
    for g in range(4):
        assert blocked[g] == direct.get(g, 0), f"pattern {g}"
    assert sum(blocked.values()) == pairs.count()


def test_pattern_counts_blocked_null_is_disagreement(spark):
    from weaviate_txtai_spark.operators.recordlinkage import (
        fs_pattern_counts_blocked,
    )

    a = spark.createDataFrame(
        [(1, 0, "s1", None), (2, 0, None, "x")],
        "ak long, an int, aseg string, aname string",
    )
    b = spark.createDataFrame(
        [(1, 0, "s1", None), (2, 0, None, "x")],
        "bk long, bn int, bseg string, bname string",
    )
    counts = fs_pattern_counts_blocked(
        a, b, a_block="an", b_block="bn", fields=FIELDS
    )
    # 4 blocked pairs; NULLs never agree: (1,1) agrees seg only,
    # (2,2) agrees name only, cross pairs agree nothing
    assert counts == {0: 2, 1: 1, 2: 1, 3: 0}


def test_em_fit_recovers_planted_mixture():
    from weaviate_txtai_spark.operators.recordlinkage import fs_em_fit

    # plant p=0.05, m=(0.9, 0.8, 0.85), u=(0.2, 0.05, 0.1) over 1M
    # pairs: exact expected pattern counts of the independence mixture.
    # K >= 3 fields needed — with K=2 the mixture has more parameters
    # (5) than degrees of freedom (3) and EM lands on a different
    # exact-fit solution.
    p, m, u = 0.05, (0.9, 0.8, 0.85), (0.2, 0.05, 0.1)
    n_total = 1_000_000
    counts = {}
    for g in range(8):
        pm = p
        pu = 1 - p
        for k in range(3):
            bit = bool(g & (1 << k))
            pm *= m[k] if bit else 1 - m[k]
            pu *= u[k] if bit else 1 - u[k]
        counts[g] = round(n_total * (pm + pu))
    fit = fs_em_fit(counts, 3, n_iter=60)
    sc = fit["scale"]
    assert abs(fit["p"] / sc - p) < 0.01
    for k in range(3):
        assert abs(fit["m"][k] / sc - m[k]) < 0.03
        assert abs(fit["u"][k] / sc - u[k]) < 0.03


def test_em_fit_converges_fixed_point():
    from weaviate_txtai_spark.operators.recordlinkage import fs_em_fit

    counts = {0: 69483, 1: 13065, 2: 6653, 3: 1412,
              4: 90, 5: 364, 6: 182, 7: 727}
    fit = fs_em_fit(counts, 3, n_iter=60)
    sc = fit["scale"]
    t = fit["trajectory"]

    def delta(i):
        return max(
            abs(t[i]["p"] - t[i - 1]["p"]),
            *[abs(a - b) for a, b in zip(t[i]["m"], t[i - 1]["m"])],
            *[abs(a - b) for a, b in zip(t[i]["u"], t[i - 1]["u"])],
        )

    # EM is linearly convergent: successive-iterate deltas contract
    # and are below 1e-3 probability units by iteration 60
    assert delta(59) < delta(10) / 5
    assert delta(59) <= sc // 10**3
    # determinism: same counts -> identical integer trajectory
    fit2 = fs_em_fit(counts, 3, n_iter=60)
    assert fit2["trajectory"] == t


def test_em_fit_validation():
    from weaviate_txtai_spark.operators.recordlinkage import fs_em_fit

    with pytest.raises(ValueError):
        fs_em_fit({}, 3)
    with pytest.raises(ValueError):
        fs_em_fit({0: 5}, 0)
    with pytest.raises(ValueError):
        fs_em_fit({0: -1}, 1)
    with pytest.raises(ValueError):
        fs_em_fit({0: 5}, 1, n_iter=0)


def test_em_weights_feed_scoring_kernel(spark):
    """fs_em_weights output plugs into fs_score / fs_topk_blocked
    unchanged, and top-k equals full-enumeration scoring."""
    from weaviate_txtai_spark.operators.recordlinkage import (
        fs_em_fit,
        fs_em_weights,
        fs_pattern_counts_blocked,
        fs_score,
        fs_topk_blocked,
    )

    a, b = _tables(spark, seed=11)
    counts = fs_pattern_counts_blocked(
        a, b, a_block="an", b_block="bn", fields=FIELDS
    )
    fit = fs_em_fit(counts, 2, n_iter=8)
    w = fs_em_weights(fit, list(FIELDS))
    assert set(w) == set(FIELDS)
    top = fs_topk_blocked(
        a, b, w, 15,
        a_key="ak", b_key="bk", a_block="an", b_block="bn",
        fields=FIELDS,
    ).orderBy(F.desc("score"), "ak", "bk").limit(15)
    full = (
        fs_score(
            _pairs(a, b).select(
                "ak", "bk",
                F.coalesce("eq_seg", F.lit(False)).alias("eq_seg"),
                F.coalesce("eq_name", F.lit(False)).alias("eq_name"),
            ),
            w,
        )
        .orderBy(F.desc("score"), "ak", "bk")
        .limit(15)
    )
    got = [(r.ak, r.bk, r.score) for r in top.collect()]
    want = [(r.ak, r.bk, r.score) for r in full.collect()]
    assert got == want


def test_em_gate_finds_true_matches(spark, sf_dir):
    """End-to-end gate: the unsupervised fit's match proportion lands
    near the true rate and the top-40 pairs are overwhelmingly true
    matches (rank assertions, not absolute scores)."""
    from weaviate_txtai_spark.plans.queries import REGISTRY

    fn = REGISTRY["customer_linkage_em"][0]
    rows = fn(spark, sf_dir).collect()
    assert len(rows) == 40
    assert sum(1 for r in rows if r.is_match) >= 35
