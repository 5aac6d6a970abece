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
    # r13 rotation (VERDICT r12 task 1): the 12 SURVEY §2 anchors, this
    # round's 3 new gates (each new gate enters the window in its
    # creation round), 13 gates whose code changed in r13 (the four
    # ADVICE fixes: waterfill headroom/fractional-reject + 1e3 weight
    # scale, datasheet NULLS-LAST tie-break, decontamination threshold
    # validation; and the join-census NULL-id fixes in
    # adc_topk/hamming_topk/IVF/IVFPQ build+append), 9 r12-changed
    # gates whose latest DRIVER rows predate the r12 fixes (NOTES r13
    # item 1), and 13 r12-NULL-audit-family gates never re-sampled
    # post-fix (incl. the order_scc watch item); the third new gate
    # (dedup_span_removal) took part_return_wilson's slot. 38 of 50
    # slots sit on recently-changed gates. The rows-only-by-design gates remain
    # STRUCTURALLY excluded by the oracle assert in _ordered_names().
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
    # the 2 new r13 gates
    "curation_run",
    "multimodal_byte_dedup",
    # 13 r13-changed gates (ADVICE fixes + join-census ANN fixes)
    "mixture_weight_solver",
    "corpus_datasheet",
    "decontamination_report",
    "ann_ivf",
    "ann_ivf_filtered",
    "ivfpq_knn",
    "ivfpq_append_search",
    "sim_join_ivfpq",
    "pq_knn",
    "pq_knn_rerank",
    "pq_codes",
    "binary_hamming_knn",
    "binary_hamming_rerank",
    # 9 r12-changed gates whose latest driver rows predate the fixes
    "dedup_survivors",
    "dedup_survivors_longest",
    "semantic_dedup",
    "dedup_weights",
    "dedup_groups",
    "pretraining_manifest",
    "dedup_embedding_lsh",
    "streaming_hourly",
    "streaming_enrich",
    # 13 r12-NULL-audit-family gates never driver-re-sampled post-fix
    # (pagerank/knn-gemm/mmr/maxsim/resample/prefix-filter/dbscan/
    # dsir/abc/ate/shapley/pass@k/wilson) + the order_scc watch item
    "order_scc",
    "doc_centrality",
    "knn_batch_gemm",
    "mmr_diversified",
    "maxsim_topk",
    "events_resample",
    "dedup_prefix_jaccard",
    "embedding_dbscan",
    "dsir_importance",
    "part_abc_classes",
    "events_stratified_ate",
    "purchase_shapley_attribution",
    "purchase_pass_at_k",
    # new r13 gate (span removal) — entered in its creation round;
    # part_return_wilson ceded its slot (its abtest-module audit family
    # stays covered by events_stratified_ate + purchase_pass_at_k)
    "dedup_span_removal",
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
