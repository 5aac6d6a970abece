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
    # r12 rotation (VERDICT r11 task 1): the cross-round ledger closed
    # in r11 (311/311 oracled gates hold a green driver row), so window
    # slots now go to RE-verification on a rotation cadence — the 12
    # SURVEY §2 anchor gates, this round's 3 new end-product gates
    # (each new gate enters the window within one round of creation),
    # and 35 gates whose operator code changed in r11's hostile-input
    # hardening but which the r11 window did not sample (the other 32
    # r11-changed gates already hold fresh post-fix r11 rows). The 7
    # rows-only-by-design gates remain STRUCTURALLY excluded by the
    # oracle assert in _ordered_names().
    # ------------------------------------------------------------------
    # the 12 §2 anchors (VERDICT coverage table S3/S7, Q1, Q4-Q9, T1-T3)
    "knn_topk",
    "knn_batch",
    "streaming_ingest",
    "full_scan",
    "docid_lookup",
    "scan_limit",
    "vector_delete",
    "vector_count",
    "vector_upsert",
    "similarity_brute",
    "similar_sql",
    "agg_stats_txtai",
    # the 3 new r12 end-product gates (each enters the window in its
    # creation round)
    "decontamination_report",
    "mixture_weight_solver",
    "corpus_datasheet",
    # 35 r11-changed-but-unsampled gates, one-or-more per fix family:
    # bm25/textindex, lm, sampling, budget, apportionment, dedup,
    # passages, cusum/ewma/holt, pack_sequences, scd/diff, asof,
    # funnel, evalmetrics, stringjoin, attribution, itemsets,
    # inequality, seqmine, abtest, survival, seasonal, streaming
    # NULL-slot fixes, multimodal n_bytes widening
    "bm25_topk",
    "qlm_topk",
    "bm25_index_topk",
    "docs_unigram_nll",
    "docs_bigram_nll",
    "mixture_sample",
    "weighted_sample_k",
    "token_budget_waterfill",
    "source_shard_apportion",
    "dedup_minhash",
    "dedup_simhash",
    "dedup_incremental",
    "winnow_pairs",
    "eval_containment",
    "events_daily_cusum",
    "events_daily_ewma",
    "events_holt_forecast",
    "pack_sequences",
    "customer_scd2",
    "orders_snapshot_diff",
    "events_asof",
    "events_funnel_onepass",
    "retrieval_eval",
    "supplier_name_matches",
    "purchase_attribution",
    "token_pmi_pairs",
    "revenue_gini",
    "events_sequence_pairs",
    "ab_experiment_panel",
    "signup_to_purchase_survival",
    "events_volume_anomalies",
    "streaming_monitor",
    "streaming_funnel",
    "streaming_sessions",
    "multimodal_features",
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
