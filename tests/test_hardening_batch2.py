"""Second hostile-input hardening batch (r11): asof/interval joins,
itemsets, inequality, markov, isotonic, attribution, seqmine, rfm,
funnel. Findings fixed:

- asof_join silently "matched" NULL-ts right rows to NULL-ts left rows
  (NULLS-FIRST window order), and forward mode would attribute a real
  outcome to a NULL exposure time. Right NULL-ts rows now match
  nothing; left NULL-ts rows get a NULL payload.
- interval_overlap_join: an INVERTED interval (end < start) denotes
  the empty set but could still pair with a spanning right interval;
  now dropped with the NULL bounds.
- basketize/attribution/sequence_pairs/rfm_segments/funnel/
  cohort_retention: NULL basket/user keys LUMPED unrelated rows into
  one pseudo-entity (bogus pairs, corpus-level pseudo-customers,
  inflated lift denominators); now excluded.
- gini: negative values silently flipped the statistic's sign; now an
  in-plan raise_error.
- markov_stationary_exact: NULL src/dst minted a phantom dangling
  state silently absorbing uniform mass each iteration; now excluded.
- isotonic_fit: no guard on the B^2 bucket-domain self-join — a
  mis-called continuous x exploded quadratically; now a bounded
  limit(cap+1) probe raises with guidance.
"""

import pytest

from pyspark.sql import functions as F


def _ts(spark, rows, schema):
    df = spark.createDataFrame(rows, schema)
    for f in df.schema.fields:
        if f.name.endswith("ts"):
            df = df.withColumn(f.name, F.col(f.name).cast("timestamp"))
    return df


def test_asof_null_ts_right_never_matches(spark):
    from weaviate_txtai_spark.operators.asof import asof_join

    left = _ts(spark, [(1, "2024-01-01 10:00:00"), (1, None)], "k long, ts string")
    right = _ts(
        spark,
        [(1, "2024-01-01 09:00:00", 7.0), (1, None, 99.0)],
        "k long, ts string, sig string",
    ).withColumn("sig", F.col("sig").cast("double"))
    for direction in ("backward", "forward"):
        rows = {
            (r.ts is None): r
            for r in asof_join(
                left, right, on=["k"], direction=direction
            ).collect()
        }
        assert len(rows) == 2
        # NULL-ts left row: NULL payload, never sig=99
        assert rows[True].sig is None and rows[True].matched_ts is None
    # backward real row still matches the 09:00 signal
    out = asof_join(left, right, on=["k"]).collect()
    real = [r for r in out if r.ts is not None][0]
    assert real.sig == 7.0


def test_interval_overlap_inverted_interval_dropped(spark):
    from weaviate_txtai_spark.operators.asof import interval_overlap_join

    li = _ts(
        spark,
        [(1, "2024-01-01 10:00:00", "2024-01-01 09:00:00")],  # inverted
        "k long, l_start_ts string, l_end_ts string",
    )
    ri = _ts(
        spark,
        [(1, "2024-01-01 08:00:00", "2024-01-01 11:00:00", "X")],  # spans it
        "k long, r_start_ts string, r_end_ts string, tag string",
    )
    out = interval_overlap_join(
        li, ri, bucket_seconds=600, on=["k"],
        left_start="l_start_ts", left_end="l_end_ts",
        right_start="r_start_ts", right_end="r_end_ts",
    )
    assert out.count() == 0


def test_basketize_null_basket_not_lumped(spark):
    from weaviate_txtai_spark.operators.itemsets import frequent_pairs

    rows = [(None, "a"), (None, "b"), (None, "a"),
            (1, "a"), (1, "b"), (2, "a"), (2, "b")]
    df = spark.createDataFrame(rows, "basket long, item string")
    out = frequent_pairs(df, "basket", "item", min_pair_count=2).collect()
    assert len(out) == 1
    assert out[0].pair_count == 2  # baskets 1 and 2 only — no NULL basket


def test_gini_negative_value_raises(spark):
    from weaviate_txtai_spark.operators.inequality import gini

    df = spark.createDataFrame([(1.0,), (-2.0,), (3.0,)], "v double")
    with pytest.raises(Exception, match="non-negative"):
        gini(df, "v").collect()


def test_gini_clean_path(spark):
    from weaviate_txtai_spark.operators.inequality import gini

    df = spark.createDataFrame([(1.0,), (1.0,), (1.0,)], "v double")
    row = gini(df, "v").collect()[0]
    assert row.gini == 0.0 and row.n == 3


def test_markov_null_state_excluded(spark):
    from weaviate_txtai_spark.operators.markov import markov_stationary_exact

    t = spark.createDataFrame(
        [("a", "b", 5), ("b", "a", 5), (None, "a", 100), ("b", None, 100)],
        "src string, dst string, n long",
    )
    out = {r.state: r.pi for r in markov_stationary_exact(t).collect()}
    assert set(out) == {"a", "b"}  # no phantom NULL state
    assert abs(out["a"] - 0.5) < 1e-6 and abs(out["b"] - 0.5) < 1e-6


def test_isotonic_domain_cap_raises(spark):
    from weaviate_txtai_spark.operators.isotonic import isotonic_fit

    df = spark.createDataFrame(
        [(float(i), float(i)) for i in range(30)], "x double, y double"
    )
    with pytest.raises(ValueError, match="distinct x"):
        isotonic_fit(df, "x", "y", max_buckets=10)
    # under the cap: monotone input is its own fit
    out = {r.x: r.y_iso for r in isotonic_fit(
        df, "x", "y", max_buckets=100).collect()}
    assert out[0.0] == 0.0 and out[29.0] == 29.0


def test_attribution_null_user_excluded(spark):
    from weaviate_txtai_spark.operators.attribution import attribution

    rows = [
        (None, "ad", "2024-01-01 09:00:00", 0.0),
        (None, "purchase", "2024-01-01 10:00:00", 50.0),
        (7, "purchase", "2024-01-01 10:00:00", 10.0),
    ]
    ev = _ts(spark, rows, "user_id long, event_type string, ts string, value double")
    out = {r.touch_type: r for r in attribution(
        ev, touch_types=["ad"], conversion_type="purchase").collect()}
    # the NULL user's ad must not credit anything; user 7 converts cold
    assert set(out) == {"(none)"}
    assert out["(none)"].credited_value == 10.0


def test_sequence_pairs_null_user_not_in_denominator(spark):
    from weaviate_txtai_spark.operators.seqmine import sequence_pairs

    rows = [
        (1, "a", "2024-01-01 09:00:00"),
        (1, "b", "2024-01-01 09:10:00"),
        (2, "a", "2024-01-01 09:00:00"),
        (2, "b", "2024-01-01 09:10:00"),
        (None, "zz", "2024-01-01 09:00:00"),
    ]
    ev = _ts(spark, rows, "user_id long, event_type string, ts string")
    out = sequence_pairs(ev, min_support=2).collect()
    ab = [r for r in out if r.a == "a" and r.b == "b"][0]
    # lift denominator uses 2 users, not 3: lift = (2/2)/(2/2) = 1
    assert ab.lift == 1.0


def test_rfm_null_user_excluded(spark):
    from weaviate_txtai_spark.operators.rfm import rfm_segments

    rows = [(u, f"2024-01-0{d} 10:00:00", 10.0)
            for u in (1, 2, 3) for d in (1, 2)] + [
        (None, "2024-01-03 10:00:00", 9999.0)]
    ev = _ts(spark, rows, "user_id long, ts string, value double")
    out = rfm_segments(ev, n_buckets=2).collect()
    assert {r.user_id for r in out} == {1, 2, 3}


def test_funnel_null_user_excluded(spark):
    from weaviate_txtai_spark.operators.funnel import funnel

    rows = [
        (1, "view", "2024-01-01 09:00:00"),
        (1, "buy", "2024-01-01 09:30:00"),
        (None, "view", "2024-01-01 09:00:00"),
        (None, "buy", "2024-01-01 09:30:00"),
    ]
    ev = _ts(spark, rows, "user_id long, event_type string, ts string")
    out = {r.step: r.n_users for r in funnel(
        ev, steps=["view", "buy"]).collect()}
    assert out == {"view": 1, "buy": 1}


def test_table_diff_null_key_row_not_misreported(spark):
    from weaviate_txtai_spark.operators.diff import table_diff

    old = spark.createDataFrame(
        [(None, "x"), (1, "a")], "k long, v string"
    )
    # NULL-key row unchanged; row 1 changed
    new = spark.createDataFrame(
        [(None, "x"), (1, "b")], "k long, v string"
    )
    out = table_diff(old, new, key_cols=["k"]).collect()
    # the unchanged NULL-key row must NOT appear as 'added'
    assert len(out) == 1
    assert out[0].k == 1 and out[0].change == "changed"
    # and a genuinely new NULL-key row still reports
    new2 = spark.createDataFrame([(None, "y"), (1, "a")], "k long, v string")
    out2 = {r.change for r in table_diff(old, new2, key_cols=["k"]).collect()}
    assert out2 == {"changed"}


def test_set_cover_null_doc_id_excluded(spark):
    from weaviate_txtai_spark.operators.setcover import greedy_set_cover

    docs = spark.createDataFrame(
        [(None, "a b c d e f g h"), (1, "a b"), (2, "c d")],
        "doc_id long, text string",
    )
    out = greedy_set_cover(docs, 2).collect()
    # the NULL mega-doc must not win rank 1
    assert all(r.doc_id is not None for r in out)
    assert {r.doc_id for r in out} == {1, 2}


def test_bradley_terry_null_endpoint_excluded(spark):
    from weaviate_txtai_spark.operators.btrank import bradley_terry_exact

    pairs = spark.createDataFrame(
        [("a", "b"), ("a", "b"), ("b", "a"), (None, "b"), ("a", None)],
        "winner string, loser string",
    )
    out = {r.item: r.strength for r in bradley_terry_exact(pairs).collect()}
    assert set(out) == {"a", "b"}
    assert out["a"] == 1.0 and 0 < out["b"] < 1.0  # a won 2 of 3


def test_dp_counts_null_key_group_excluded(spark):
    from weaviate_txtai_spark.operators.privacy import dp_noisy_counts

    df = spark.createDataFrame(
        [(1,), (1,), (2,), (None,), (None,)], "g long"
    )
    out = dp_noisy_counts(df, ["g"], epsilon=1e9).collect()
    # with huge epsilon the noise is ~0: released counts match truth,
    # and the NULL group (whose noise seed is undefined) is excluded
    got = {r.g: r.noisy_count for r in out}
    assert set(got) == {1, 2}
    assert abs(got[1] - 2) < 0.01 and abs(got[2] - 1) < 0.01


def test_unigram_nll_null_doc_id_excluded(spark):
    from weaviate_txtai_spark.operators.lm import unigram_nll

    docs = spark.createDataFrame(
        [(1, "aa bb"), (None, "cc dd ee"), (None, "ff")],
        "doc_id long, text string",
    )
    out = unigram_nll(docs).collect()
    assert {r.doc_id for r in out} == {1}
    assert out[0].n_tokens == 2


def test_trigram_jm_nll_null_doc_id_excluded(spark):
    from weaviate_txtai_spark.operators.lm import trigram_jm_nll

    docs = spark.createDataFrame(
        [(1, "a b c d"), (None, "x y z w")], "doc_id long, text string"
    )
    out = trigram_jm_nll(docs).collect()
    assert {r.doc_id for r in out} == {1}


def test_exact_dedup_null_id_never_survivor(spark):
    from weaviate_txtai_spark.operators.dedup import exact_dedup

    docs = spark.createDataFrame(
        [(None, "same text"), (5, "same text"), (6, "same text"),
         (7, "other")],
        "doc_id long, text string",
    )
    out = {r.doc_id for r in exact_dedup(docs).collect()}
    # the NULL-id copy must not be crowned survivor (dropping 5 and 6)
    assert out == {5, 7}


def test_minhash_null_id_no_pseudo_doc(spark):
    from weaviate_txtai_spark.operators.dedup import jaccard_pairs

    text1 = "a b c d e f g h i j"
    docs = spark.createDataFrame(
        [(None, text1), (1, text1), (2, text1 + " k")],
        "doc_id long, text string",
    )
    pairs = jaccard_pairs(docs, threshold=0.5).collect()
    for r in pairs:
        assert r.d1 is not None and r.d2 is not None


def test_chi2_terms_null_class_excluded(spark):
    from weaviate_txtai_spark.operators.featsel import chi2_terms

    docs = spark.createDataFrame(
        [("x", "aa bb"), ("y", "cc dd"), (None, "ee ff")],
        "source string, text string",
    )
    out = chi2_terms(docs, top_k=5).collect()
    assert all(r["class"] is not None for r in out)
    assert {r["class"] for r in out} == {"x", "y"}


def test_nb_classify_null_label_and_id_excluded(spark):
    from weaviate_txtai_spark.operators.nbayes import nb_classify

    train = spark.createDataFrame(
        [("en", "the cat sat"), ("fr", "le chat assis"),
         (None, "zz zz zz")],
        "lang string, text string",
    )
    test = spark.createDataFrame(
        [(1, "the cat"), (None, "zz zz")], "doc_id long, text string"
    )
    out = nb_classify(train, test).collect()
    assert len(out) == 1
    assert out[0].doc_id == 1 and out[0].pred == "en"


def test_ranking_metrics_null_query_excluded(spark):
    from weaviate_txtai_spark.operators.evalmetrics import ranking_metrics

    results = spark.createDataFrame(
        [(1, 10, 1), (None, 11, 1)], "query_id long, doc_id long, rank long"
    )
    truth = spark.createDataFrame(
        [(1, 10), (None, 99)], "query_id long, doc_id long"
    )
    out = ranking_metrics(results, truth, 5).collect()
    assert len(out) == 1
    r = out[0]
    assert r.__dict__ if False else r[0] == 1  # only query 1 emitted
    assert r.recall_at_k == 1.0


def test_passages_null_doc_id_excluded(spark):
    from weaviate_txtai_spark.operators.passages import (
        repeated_passage_stats,
        winnow_fingerprints,
    )

    text = "one two three four five six seven eight nine ten"
    docs = spark.createDataFrame(
        [(1, text), (None, text)], "doc_id long, text string"
    )
    stats = repeated_passage_stats(docs).collect()
    assert {r.doc_id for r in stats} == {1}
    fps = winnow_fingerprints(docs).collect()
    assert all(r.doc_id is not None for r in fps)


def test_pack_sequences_null_keys_excluded(spark):
    from weaviate_txtai_spark.operators.chunking import pack_sequences

    docs = spark.createDataFrame(
        [("web", 1, "a b c"), ("web", 2, "d e"), (None, 3, "f"),
         ("web", None, "g h")],
        "source string, doc_id long, text string",
    )
    out = pack_sequences(
        docs, group_col="source", id_col="doc_id", budget=4
    ).collect()
    assert all(r.source is not None and r.doc_id is not None for r in out)
    assert len(out) == 2


def test_apportion_null_source_excluded(spark):
    from weaviate_txtai_spark.operators.sharding import (
        largest_remainder_apportion,
    )

    df = spark.createDataFrame(
        [("a", 60), ("b", 40), (None, 900)], "source string, tokens long"
    )
    res = largest_remainder_apportion(
        df, "source", "tokens", total=10
    ).collect()
    out = {r.source: r.alloc for r in res}
    assert set(out) == {"a", "b"}
    assert out["a"] + out["b"] == 10  # NULL got no share of the total
