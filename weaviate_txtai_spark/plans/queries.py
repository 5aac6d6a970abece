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
    # SURVEY §2 reference-surface gates (S*/Q*/T* rows)
    "knn_topk",
    "knn_batch",
    "knn_batch_gemm",
    # knn_l2 / knn_dot (multi-metric variants of the same kernel) ceded
    # their slots to the round-4 PQ family — both remain judge-sweep and
    # pytest covered
    "pq_codes",
    "pq_knn",
    "vector_delete",
    "vector_upsert",
    "vector_count",
    "vector_compact",
    "docid_lookup",
    "full_scan",
    "scan_limit",
    "similar_sql",
    "agg_stats_txtai",
    "similarity_brute",
    "streaming_ingest",
    # round-2/3 family representatives (each family keeps one slot; every
    # member now has ≥1 driver row from r04/r05. docs_normalize,
    # repeated_passages, and ivfpq_knn ceded slots to the round-5 rotation
    # — all three hold r04/r05 driver rows and stay judge-sweep covered)
    # r7 rotation 3: kmeans_assign, semantic_dedup, docs_unigram_nll,
    # doc_centrality, lineitem_profile, hard_negatives, knn_filtered,
    # sim_join_ivfpq ceded (every one holds ≥1 green driver row from
    # r04–r06, several hold three; judge-sweep + pytest + the heavy
    # bench keep them covered) to eight session-2 round-7 families that
    # have never had a driver row — headlined by streaming_monitor, the
    # oracled STATEFUL streaming gate.
    # Earlier cedes (rotation 2): events_zorder, mixture_sample,
    # contamination_check, dedup_incremental, streaming_near_dedup.
    "pretraining_manifest",
    "bm25_topk",
    "ann_ivf_filtered",
    "streaming_monitor",
    "supplier_name_matches",
    "bm25_index_topk",
    "signup_to_purchase_survival",
    "events_type_hour_dependence",
    # r7 rotation 2: nation_market_share / global_sales_opportunity got
    # their de-vacuated r6 driver rows; opq_knn_rerank, ivfopq_knn,
    # binary_hamming_knn, events_resample, orders_snapshot_diff,
    # dsir_importance, docs_gopher_repetition, min_cost_supplier,
    # forecast_revenue, product_profit all hold r05/r06 rows — twelve
    # slots ceded to round-7 session-1/2 families that have never had a
    # driver row. binary_hamming_rerank and order_chain_components keep
    # theirs (heavy-bench trackers, fresh plans this round).
    "binary_hamming_rerank",
    "order_chain_components",
    # r8 rotation 2: winnow_fingerprints, order_clique_triangles,
    # source_drift_ks, phrase_match_positions, ab_conversion_ztest,
    # revenue_gini (each holds a green r07 driver row; judge-sweep +
    # pytest keep them covered) cede to six more never-sampled r8
    # families — the stateful-streaming showpiece, the bootstrap tier,
    # co-visitation, fixed-point HITS, Holt smoothing, FD discovery.
    "streaming_funnel",
    "lineitem_bootstrap_ci",
    "part_also_bought",
    "customer_supplier_hits",
    "events_holt_forecast",
    "orders_fd_profile",
    # r7 heavy trackers kept
    "events_funnel_windowed",
    "basket_rules",
    "lineitem_spearman",
    # r8 rotation (VERDICT r7 item 6): eleven slots ceded by gates that
    # each hold a green r07 driver row in a family that keeps ≥1 other
    # representative or heavy-bench/pytest coverage — shared_run_pairs,
    # qlm_topk, order_clique_kcore, source_drift_jsd,
    # events_cohort_retention, ab_value_mwu, nation_revenue_trend,
    # part_skyline, customer_affinity, events_daily_cusum,
    # orders_pit_segment — to the eleven still-never-sampled r7/r8
    # families (incl. the two gates newly oracled this round:
    # streaming_sessions, multimodal_features).
    "kcenter_coreset",
    "embedding_dbscan",
    "totalprice_benford",
    "orders_k_anonymity",
    "orders_log_time_travel",
    "activity_woe_iv",
    "events_funnel_ab",
    "ab_cuped_readout",
    "source_drift_psi",
    "streaming_sessions",
    "multimodal_features",
    # r7 rotation: parts_supplier_count / excess_suppliers ceded their
    # slots (both hold r06 driver hash-pass rows; judge-sweep + pytest
    # keep them covered) to two round-7 families that need their first
    # driver row: the distributed retrieval-metrics evaluator and the
    # saved-index incremental append→search composition
    "retrieval_eval",
    "ivfpq_append_search",
    # r7: bpe_train_encode / encoder_semantic_search moved BELOW the
    # window — the driver has no rows-only mode and records `err:
    # no_oracle` for unoracled entries (VERDICT r6 #2); both stay
    # pytest- and judge-sweep covered. knn_l2 / knn_dot (oracled,
    # never driver-verified) take the freed slots.
    "knn_l2",
    "knn_dot",
]


def _ordered_names() -> list[str]:
    missing = [n for n in _PRIORITY if n not in REGISTRY]
    if missing:  # a rename must update _PRIORITY, loudly
        raise KeyError(f"_PRIORITY names not in REGISTRY: {missing}")
    rest = [n for n in REGISTRY if n not in set(_PRIORITY)]
    return _PRIORITY + rest


def queries() -> dict[str, QueryFn]:
    return {name: REGISTRY[name][0] for name in _ordered_names()}


def oracle_sql() -> dict[str, str]:
    return {
        name: REGISTRY[name][1]
        for name in _ordered_names()
        if REGISTRY[name][1] is not None
    }
