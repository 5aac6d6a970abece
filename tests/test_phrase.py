"""operators/phrase.py: positional-postings exact phrase search."""

import pytest

from weaviate_txtai_spark.operators.phrase import (
    build_postings,
    phrase_doc_counts,
    phrase_match,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the cat sat on the mat"),
        (1, "the cat the cat sat"),
        (2, "cat sat cat"),
        (3, "on the mat the cat"),
        (4, ""),
        (5, "a a a a"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_basic_match(docs):
    got = {(r.doc_id, r.start) for r in phrase_match(docs, "the cat").collect()}
    assert got == {(0, 0), (1, 0), (1, 2), (3, 3)}


def test_three_token_phrase(docs):
    got = {(r.doc_id, r.start) for r in phrase_match(docs, "the cat sat").collect()}
    assert got == {(0, 0), (1, 2)}


def test_repeated_term_phrase_overlapping(docs):
    # "a a" in "a a a a": starts 0,1,2 (overlaps count)
    got = {(r.doc_id, r.start) for r in phrase_match(docs, "a a").collect()}
    assert got == {(5, 0), (5, 1), (5, 2)}
    # repeated-with-gap: "the cat the" only in doc 1
    got = {(r.doc_id, r.start) for r in phrase_match(docs, "the cat the").collect()}
    assert got == {(1, 0)}


def test_single_token(docs):
    got = {(r.doc_id, r.start) for r in phrase_match(docs, "mat").collect()}
    assert got == {(0, 5), (3, 2)}


def test_no_match_and_empty_phrase(docs):
    assert phrase_match(docs, "cat mat").count() == 0
    with pytest.raises(ValueError):
        phrase_match(docs, "  ")


def test_doc_counts(docs):
    got = {r.doc_id: r.n_matches for r in phrase_doc_counts(docs, "the cat").collect()}
    assert got == {0: 1, 1: 2, 3: 1}


def test_prebuilt_postings_path(docs):
    post = build_postings(docs)
    got = {
        (r.doc_id, r.start)
        for r in phrase_match(post, "cat sat", postings=True).collect()
    }
    assert got == {(0, 1), (1, 3), (2, 0)}


def test_postings_filtered_before_shuffle(docs):
    # plan shape: the phrase-vocabulary filter must sit under the
    # aggregate's exchange (applied map-side on the generate output),
    # and there must be no join in the plan at all
    plan = (
        phrase_match(docs, "the cat")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Join" not in plan
    head = plan.split("Exchange", 1)[1]  # below the first exchange
    assert "Filter" in head and "Generate posexplode" in head


def test_multi_phrase_one_pass(docs):
    from weaviate_txtai_spark.operators.phrase import multi_phrase_match

    got = {
        (r.doc_id, r.phrase, r.start)
        for r in multi_phrase_match(
            docs, ["the cat", "cat sat", "a a"]
        ).collect()
    }
    assert got == {
        (0, "the cat", 0), (1, "the cat", 0), (1, "the cat", 2),
        (3, "the cat", 3),
        (0, "cat sat", 1), (1, "cat sat", 3), (2, "cat sat", 0),
        (5, "a a", 0), (5, "a a", 1), (5, "a a", 2),
    }


def test_multi_phrase_shared_tokens_and_ids(docs):
    from weaviate_txtai_spark.operators.phrase import multi_phrase_match

    # dict ids + two phrases sharing the token 'cat' at different slots
    got = {
        (r.doc_id, r.phrase, r.start)
        for r in multi_phrase_match(
            docs, {"p1": "the cat the", "p2": "cat"}
        ).collect()
    }
    assert (1, "p1", 0) in got
    assert {(g[0]) for g in got if g[1] == "p2"} == {0, 1, 2, 3}


def test_multi_phrase_rejects_bad_input(docs):
    from weaviate_txtai_spark.operators.phrase import multi_phrase_match

    import pytest as _pytest

    with _pytest.raises(ValueError):
        multi_phrase_match(docs, [])
    with _pytest.raises(ValueError):
        multi_phrase_match(docs, {"x": "  "})
