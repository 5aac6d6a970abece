"""operators/linkpred.py + drift.jsd_drift."""

import math

import pytest

from weaviate_txtai_spark.operators.drift import jsd_drift
from weaviate_txtai_spark.operators.linkpred import link_scores


@pytest.fixture(scope="module")
def edges(spark):
    # items: x deg 2 (u1,u2); y deg 3 (u1,u2,u3); z deg 1 (u3)
    rows = [
        (1, "x"), (1, "y"),
        (2, "x"), (2, "y"),
        (3, "y"), (3, "z"),
        (1, "x"),  # duplicate edge must not double-count
    ]
    return spark.createDataFrame(rows, ["user", "item"])


def test_scores_hand_computed(edges):
    got = {
        (r.e1, r.e2): r for r in link_scores(edges, "user", "item").collect()
    }
    # (1,2): share x(d2), y(d3); deg1=2, deg2=2 -> jacc 2/(2+2-2)=1
    r = got[(1, 2)]
    assert r.common == 2
    assert r.jaccard == 1.0
    assert r.adamic_adar == round(1 / math.log(2) + 1 / math.log(3), 6)
    # (1,3) and (2,3): share y only; union 2+2-1
    for pair in [(1, 3), (2, 3)]:
        r = got[pair]
        assert r.common == 1
        assert r.jaccard == round(1 / 3, 6)
        assert r.adamic_adar == round(1 / math.log(3), 6)
    assert len(got) == 3


def test_degree_cap_drops_hot_items(edges):
    # cap 2 removes item y (deg 3): only (1,2) via x remains, and
    # Jaccard degrees recompute on the CAPPED graph
    got = {
        (r.e1, r.e2): r
        for r in link_scores(edges, "user", "item", max_item_degree=2).collect()
    }
    assert set(got) == {(1, 2)}
    assert got[(1, 2)].common == 1
    assert got[(1, 2)].jaccard == 1.0  # both have capped degree 1


def test_min_common(edges):
    got = link_scores(edges, "user", "item", min_common=2).collect()
    assert [(r.e1, r.e2) for r in got] == [(1, 2)]


def test_degree_one_item_never_pairs(spark):
    df = spark.createDataFrame([(1, "solo"), (2, "other")], ["user", "item"])
    assert link_scores(df, "user", "item").count() == 0


def _py_jsd(group_counts, pool_counts):
    n = sum(group_counts.values())
    N = sum(pool_counts.values())
    out = 0.0
    for t, pc in pool_counts.items():
        p = group_counts.get(t, 0) / n
        q = pc / N
        m = (p + q) / 2
        if p > 0:
            out += 0.5 * p * math.log2(p / m)
        out += 0.5 * q * math.log2(q / m)
    return out


def test_jsd_identical_group_is_zero(spark):
    rows = [("a", t) for t in ["x", "y", "x", "z"]] + [
        ("b", t) for t in ["x", "y", "x", "z"]
    ]
    df = spark.createDataFrame(rows, ["src", "tok"])
    got = {r.src: r.jsd for r in jsd_drift(df, group_col="src", token_col="tok").collect()}
    assert got == {"a": 0.0, "b": 0.0}


def test_jsd_matches_reference(spark):
    rows = (
        [("a", t) for t in ["x"] * 6 + ["y"] * 2]
        + [("b", t) for t in ["y"] * 5 + ["z"] * 3]
    )
    df = spark.createDataFrame(rows, ["src", "tok"]).repartition(5)
    got = {
        r.src: (r.n_tokens, r.jsd)
        for r in jsd_drift(df, group_col="src", token_col="tok").collect()
    }
    pool = {"x": 6, "y": 7, "z": 3}
    ja = _py_jsd({"x": 6, "y": 2}, pool)
    jb = _py_jsd({"y": 5, "z": 3}, pool)
    assert got["a"] == (8, pytest.approx(round(ja, 6), abs=2e-6))
    assert got["b"] == (8, pytest.approx(round(jb, 6), abs=2e-6))


def test_jsd_bounded_by_one(spark):
    # disjoint vocabularies, two equal groups: JSD vs pool < 1 but
    # substantial; sanity-bound the statistic
    rows = [("a", "x")] * 10 + [("b", "y")] * 10
    df = spark.createDataFrame(rows, ["src", "tok"])
    got = {r.src: r.jsd for r in jsd_drift(df, group_col="src", token_col="tok").collect()}
    for v in got.values():
        assert 0.0 < v <= 1.0
    # symmetric setup -> symmetric statistic
    assert got["a"] == got["b"]
