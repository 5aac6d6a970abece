"""curation_run composition invariants (r13 VERDICT task 3).

The DuckDB oracle pins exact values; these pin the SEMANTIC funnel
invariants that must hold at any scale factor.
"""

import pytest

from weaviate_txtai_spark.plans import queries as Q


@pytest.fixture(scope="module")
def report(spark, sf_dir):
    return Q.queries()["curation_run"](spark, sf_dir).collect()


def test_funnel_is_monotone(report):
    assert len(report) >= 1
    for r in report:
        assert r["n_docs"] >= r["n_survivors"] >= r["n_clean"] >= 0
        assert r["n_clean"] >= r["n_sampled"] >= 0


def test_sampled_tokens_within_quota_and_alloc_within_cap(report):
    for r in report:
        assert r["sampled_tokens"] <= int(r["alloc"])  # quota = floor(alloc)
        assert r["alloc"] <= r["cap"] + 1e-6
        assert r["sampled_tokens"] <= r["clean_tokens"]


def test_budget_respected(report):
    total_clean = sum(r["clean_tokens"] for r in report)
    assert sum(r["alloc"] for r in report) <= total_clean // 2 + 1e-3


def test_packs_match_tokens(report):
    for r in report:
        if r["n_sampled"] == 0:
            assert r["n_packs"] == 0
        else:
            # concat-then-split doc assignment (pack_sequences rule): a
            # doc belongs to the 512-budget its FIRST token lands in,
            # so distinct pack ids are bounded by docs AND by budgets
            # spanned — never more than one pack per doc, never more
            # packs than 512-token budgets started
            assert 1 <= r["n_packs"] <= r["n_sampled"]
            assert r["n_packs"] <= r["sampled_tokens"] // 512 + 1


def test_eval_side_absent(report):
    # odd-numbered sources are the benchmark side, never in the report
    for r in report:
        assert int(r["source"][3:]) % 2 == 0
