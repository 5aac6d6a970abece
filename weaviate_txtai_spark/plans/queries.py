"""Gate registry hub (SURVEY §2 + pipeline families).

The gate queries (``len(REGISTRY)`` of them — count one with
``python -c "from weaviate_txtai_spark.plans.queries import queries;
print(len(queries()))"``) live in per-family modules (vector /
relational / dedup / text / streaming / pipeline), each registering into
``plans.base.REGISTRY`` on import; this module imports them all, re-
exports every gate function for direct `from plans.queries import x_q`
use, and defines the driver-facing ordered API: ``queries()`` /
``oracle_sql()`` emit the `_PRIORITY` window first (the correctness
driver samples the first 50 entries) then the remaining gates in
registration order.
"""

from __future__ import annotations

from typing import Optional

from weaviate_txtai_spark.plans.base import (  # noqa: F401
    QueryFn,
    REGISTRY,
    register,
    _emb,
)

# import order fixes the post-priority registration order; the star
# re-exports keep `from plans.queries import <gate>_q` working
from weaviate_txtai_spark.plans.vector import *  # noqa: F401,F403
from weaviate_txtai_spark.plans.relational import *  # noqa: F401,F403
from weaviate_txtai_spark.plans.dedup import *  # noqa: F401,F403
from weaviate_txtai_spark.plans.text import *  # noqa: F401,F403
from weaviate_txtai_spark.plans.streaming import *  # noqa: F401,F403
from weaviate_txtai_spark.plans.pipeline import *  # noqa: F401,F403

# --------------------------------------------------------------------------
# Registry ordering: the correctness driver samples the FIRST 50 entries of
# queries() in insertion order. Raw @register order is chronological (round-1
# gates first), which starved every later operator family of an independent
# driver-verified CORRECTNESS row (VERDICT r3 finding #2). _PRIORITY pins the
# sampled window explicitly: every SURVEY.md §2 reference-surface gate, then
# one gate per post-round-1 operator family (k-means, SemDeDup, LM scoring,
# PCA, centrality, heavy hitters, profiling, Z-order, exact-k sampling,
# containment, manifest composition, …). Everything else follows in original
# registration order — nothing is dropped, only rotated.
# --------------------------------------------------------------------------

_PRIORITY = [
    # ------------------------------------------------------------------
    # r11 rotation (VERDICT r10 task 1): the FINAL 49 never-sampled
    # oracled gates — exactly the list the r10 plan wrote here — plus
    # one §2 anchor (knn_topk, the flagship Q1) in the spare slot.
    # After CORRECTNESS_r11 lands green, every oracled gate in the
    # registry holds a driver CORRECTNESS row and the coverage ledger
    # closes to zero never-sampled. The r10 window's 50 entries all
    # hold fresh green r10 rows and cede their slots. The 7
    # rows-only-by-design gates (HLL/GK/CMS sketches, BPE, the SVD
    # encoder, the nprobe tuner) remain STRUCTURALLY excluded from the
    # sampled window by the oracle assert in _ordered_names().
    # ------------------------------------------------------------------
    # the 41 never-sampled pre-r10 gates (r10 plan order)
    "quality_weighted_sample",
    "source_quota_sample",
    "events_group_split",
    "customer_linkage_fs",
    "docs_trigram_jm_nll",
    "events_stratified_ate",
    "mmr_diversified",
    "events_sequence_triples",
    "events_dp_cohort_counts",
    "part_bt_ranking",
    "docs_nb_langid",
    "source_chi2_terms",
    "docs_textrank_terms",
    "part_supplier_bfs",
    "purchase_isotonic_fit",
    "token_good_turing",
    "event_type_stationary",
    "events_value_ols2",
    "events_srm_check",
    "embedding_intrinsic_dim",
    "seeded_expansion_ppr",
    "knn_label_modularity",
    "event_chain_entropy_rate",
    "purchase_cmh",
    "customer_rfm_segments",
    "user_burstiness",
    "revenue_theil",
    "coverage_set_cover",
    "events_daily_acf",
    "purchase_shapley_attribution",
    "part_abc_classes",
    "part_return_rate_eb",
    "purchase_rate_jackknife",
    "knn_label_loo_accuracy",
    "purchase_error_xcf",
    "events_daily_mann_kendall",
    "events_daily_haar",
    "purchase_pass_at_k",
    "part_return_wilson",
    "cohort_ltv_triangle",
    "purchase_odds_ratio",
    # the 8 gates newly oracled in r10 (NOTES.md r10 log)
    "lineitem_kendall_tau",
    "events_daily_changepoint",
    "docs_heaps_law",
    "events_sprt_decision",
    "part_pareto_frontier",
    "signup_survival_logrank",
    "purchase_permutation_test",
    "docs_quality_classifier",
    # spare slot: §2 anchor (Q1 kNN cosine top-k)
    "knn_topk",
]


_DRIVER_WINDOW = 50  # the correctness driver samples this many


def _ordered_names() -> list[str]:
    missing = [n for n in _PRIORITY if n not in REGISTRY]
    if missing:  # a rename must update _PRIORITY, loudly
        raise KeyError(f"_PRIORITY names not in REGISTRY: {missing}")
    rest = [n for n in REGISTRY if n not in set(_PRIORITY)]
    ordered = _PRIORITY + rest
    # Structural guard (VERDICT r9 task 4): a gate without an oracle in
    # the driver-sampled window earns a permanent `no_oracle` red row
    # (the bpe_train_encode / encoder_semantic_search r6 lesson) — the
    # rows-only-by-design gates must sort strictly after the window.
    no_oracle = [
        n for n in ordered[:_DRIVER_WINDOW] if REGISTRY[n][1] is None
    ]
    if no_oracle:
        raise AssertionError(
            f"rows-only gates inside the driver-sampled first "
            f"{_DRIVER_WINDOW}: {no_oracle}"
        )
    return ordered


def queries() -> dict[str, QueryFn]:
    return {name: REGISTRY[name][0] for name in _ordered_names()}


def oracle_sql() -> dict[str, str]:
    return {
        name: REGISTRY[name][1]
        for name in _ordered_names()
        if REGISTRY[name][1] is not None
    }
