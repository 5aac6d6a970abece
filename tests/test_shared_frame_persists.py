"""Shared internal frames are persisted (planned once), r13 opt wave 3.

Spark plans — and executes — a separate copy of a non-cached common
subtree per reference. The captured gate plans showed the cost:
supplier_name_matches re-scanned its source 8×, events_sequence_pairs
5×, part_also_bought 6×, because `edit_distance_join`'s base/gram
frames, `sequence_pairs`' deduped event frame, and
`also_bought_topk`'s count table (plus its two-orientation union of
the whole pair pipeline) were re-planned per consumer. These tests pin
the fix: the operators register their shared frames with
``cache_scope`` (so the subtree runs once and the lifecycle stays
caller-controlled), and `also_bought_topk` emits both orientations
map-side from ONE pair-pipeline pass. Value parity is covered by the
operators' own suites and the DuckDB-oracled gates; these tests pin
the STRUCTURE.
"""

from weaviate_txtai_spark.cache import cache_scope
from weaviate_txtai_spark.operators.itemsets import also_bought_topk
from weaviate_txtai_spark.operators.seqmine import sequence_pairs
from weaviate_txtai_spark.operators.stringjoin import edit_distance_join


def test_sequence_pairs_persists_shared_frames(spark):
    from datetime import datetime

    ev = spark.createDataFrame(
        [
            (1, "view", datetime(2024, 1, 1, 10, 0, 0)),
            (1, "buy", datetime(2024, 1, 1, 10, 10, 0)),
            (2, "view", datetime(2024, 1, 1, 11, 0, 0)),
            (2, "buy", datetime(2024, 1, 1, 11, 20, 0)),
        ],
        "user_id long, event_type string, ts timestamp",
    )
    with cache_scope() as caches:
        out = sequence_pairs(ev, window_seconds=3600, min_support=1)
        rows = {(r.a, r.b): r.support for r in out.collect()}
    # the deduped event frame + the type-support table
    assert len(caches) == 2
    assert rows[("view", "buy")] == 2


def test_also_bought_persists_counts_and_single_pipeline(spark):
    df = spark.createDataFrame(
        [(1, 10), (1, 11), (2, 10), (2, 11), (3, 10), (3, 12)],
        "basket long, item long",
    )
    with cache_scope() as caches:
        out = also_bought_topk(df, "basket", "item", 2, min_pair_count=1)
        rows = {(r.item, r.rank): r.neighbor for r in out.collect()}
    # the item-count table (the pair pipeline itself is single-pass:
    # both orientations explode map-side from one pair row)
    assert len(caches) == 1
    # orientation symmetry: 10's top neighbor is 11 and vice versa
    assert rows[(10, 1)] == 11
    assert rows[(11, 1)] == 10
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    # one pair-generation pass: the orientation fan-out is a Generate
    # over the pair rows, not a Union of two copies of the pipeline
    assert "Union" not in plan


def test_edit_distance_join_persists_base_and_grams(spark):
    names = [
        (1, "Supplier#000000001"),
        (2, "Supplier#000000002"),
        (3, "Supplier#000000003"),
        (4, "ab"),
        (5, "ac"),
    ]
    df = spark.createDataFrame(names, "id long, name string")
    with cache_scope() as caches:
        out = edit_distance_join(df, "id", "name", k=1)
        got = {(r.id1, r.id2) for r in out.collect()}
    # the compact (id, s, l) base projection only: the gram explode
    # recomputes map-side from it per consumer (persisting the explode
    # would pin an occurrence-sized table duplicating the string per
    # gram — measured slower at sf0.1, jaccard §7 rule)
    assert len(caches) == 1
    assert got == {(1, 2), (1, 3), (2, 3), (4, 5)}
