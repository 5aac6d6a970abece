"""operators/itemsets.py: frequent pairs + association rules."""

import pytest

from weaviate_txtai_spark.operators.itemsets import (
    association_rules,
    basketize,
    frequent_pairs,
)


@pytest.fixture(scope="module")
def baskets(spark):
    # 5 baskets: {a,b,c} {a,b} {a,c} {b,c} {a}; duplicate (1,a) row must
    # not double-count
    rows = [
        (1, "a"), (1, "a"), (1, "b"), (1, "c"),
        (2, "a"), (2, "b"),
        (3, "a"), (3, "c"),
        (4, "b"), (4, "c"),
        (5, "a"),
    ]
    return spark.createDataFrame(rows, ["order_id", "item"])


def test_frequent_pairs_counts(baskets):
    got = {
        (r.p1, r.p2): r.pair_count
        for r in frequent_pairs(
            baskets, "order_id", "item", min_pair_count=1
        ).collect()
    }
    assert got == {("a", "b"): 2, ("a", "c"): 2, ("b", "c"): 2}


def test_min_pair_count_prunes(baskets):
    assert (
        frequent_pairs(baskets, "order_id", "item", min_pair_count=3).count()
        == 0
    )


def test_item_pruning_apriori(spark):
    # item z appears once -> pruned before pair generation at
    # min_item_count=2, so (a,z) never forms even though they co-occur
    df = spark.createDataFrame(
        [(1, "a"), (1, "z"), (2, "a"), (2, "b"), (3, "a"), (3, "b")],
        ["order_id", "item"],
    )
    pairs = frequent_pairs(
        df, "order_id", "item", min_pair_count=1, min_item_count=2
    ).collect()
    assert {(r.p1, r.p2) for r in pairs} == {("a", "b")}


def test_max_basket_size_drops(spark):
    big = [(1, f"i{i}") for i in range(10)] + [(2, "a"), (2, "b")]
    df = spark.createDataFrame(big, ["order_id", "item"])
    b = basketize(df, "order_id", "item", max_basket_size=5)
    assert [r.basket for r in b.collect()] == [2]


def test_association_rules_values(baskets):
    rules = {
        (r.antecedent, r.consequent): r
        for r in association_rules(
            baskets, "order_id", "item", min_pair_count=1
        ).collect()
    }
    # a in 4 baskets, b in 3, c in 3, n=5, pair (a,b)=2
    r = rules[("a", "b")]
    assert r.pair_count == 2
    assert r.support == round(2 / 5, 6)
    assert r.confidence == round(2 / 4, 6)
    assert r.lift == round((2 / 4) / (3 / 5), 6)
    r = rules[("b", "a")]
    assert r.confidence == round(2 / 3, 6)
    assert r.lift == round((2 / 3) / (4 / 5), 6)
    # both directions for every frequent pair
    assert len(rules) == 6


def test_min_confidence_filters(baskets):
    rules = association_rules(
        baskets, "order_id", "item", min_pair_count=1, min_confidence=0.6
    ).collect()
    assert all(r.confidence >= 0.6 for r in rules)
    assert {(r.antecedent, r.consequent) for r in rules} == {
        ("b", "a"), ("c", "a"), ("b", "c"), ("c", "b")
    }


def test_pair_generation_is_map_side(baskets):
    # plan shape: no self-join of the basket relation — pair fan-out is
    # a generator (explode) over the per-basket array
    plan = frequent_pairs(
        baskets, "order_id", "item", min_pair_count=1
    )._jdf.queryExecution().executedPlan().toString()
    assert "Generate explode" in plan
    assert "SortMergeJoin" not in plan


def test_frequent_triples(spark):
    from weaviate_txtai_spark.operators.itemsets import frequent_itemsets

    rows = [
        (1, "a"), (1, "b"), (1, "c"), (1, "d"),
        (2, "a"), (2, "b"), (2, "c"),
        (3, "a"), (3, "b"), (3, "d"),
        (4, "x"), (4, "y"),
    ]
    df = spark.createDataFrame(rows, ["o", "i"])
    got = {
        (r.p1, r.p2, r.p3): r.set_count
        for r in frequent_itemsets(df, "o", "i", size=3, min_count=2).collect()
    }
    assert got == {("a", "b", "c"): 2, ("a", "b", "d"): 2}


def test_frequent_quads_and_small_baskets_skip(spark):
    from weaviate_txtai_spark.operators.itemsets import frequent_itemsets

    rows = [(o, i) for o in (1, 2) for i in "abcd"] + [(3, "a"), (3, "b")]
    df = spark.createDataFrame(rows, ["o", "i"])
    got = frequent_itemsets(df, "o", "i", size=4, min_count=2).collect()
    assert [(r.p1, r.p2, r.p3, r.p4, r.set_count) for r in got] == [
        ("a", "b", "c", "d", 2)
    ]
    import pytest as _pytest
    with _pytest.raises(ValueError):
        frequent_itemsets(df, "o", "i", size=1)


def test_pmi_pairs_hand_computed(spark):
    import math

    from weaviate_txtai_spark.operators.itemsets import pmi_pairs

    docs = spark.createDataFrame(
        [
            (0, "cat dog"),
            (1, "cat dog"),
            (2, "cat fish"),
            (3, "bird bird fish"),  # dup token counts once (presence)
        ],
        ["doc_id", "text"],
    )
    got = {
        (r.t1, r.t2): (r.pair_count, r.pmi)
        for r in pmi_pairs(docs, min_pair_count=1).collect()
    }
    n = 4
    # cat df 3, dog df 2, pair (cat,dog) 2 -> pmi = log2(4*2/(3*2))
    assert got[("cat", "dog")][0] == 2
    assert got[("cat", "dog")][1] == round(math.log2(n * 2 / (3 * 2)), 6)
    assert got[("bird", "fish")][0] == 1
    assert got[("bird", "fish")][1] == round(math.log2(n * 1 / (1 * 2)), 6)


def test_pmi_df_cap_drops_stopword_grade_tokens(spark):
    from weaviate_txtai_spark.operators.itemsets import pmi_pairs

    docs = spark.createDataFrame(
        [(i, f"the w{i} w{i % 2}") for i in range(6)], ["doc_id", "text"]
    )
    got = pmi_pairs(docs, min_pair_count=1, max_doc_freq=4).collect()
    toks = {r.t1 for r in got} | {r.t2 for r in got}
    assert "the" not in toks  # df 6 > cap
