"""r12 end-product operators: decontamination_report (passages) and
capped_weighted_waterfill (budget)."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from weaviate_txtai_spark.operators.budget import capped_weighted_waterfill
from weaviate_txtai_spark.operators.passages import decontamination_report

DOCS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
    ]
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, DOCS_SCHEMA)


TRAIN_TEXT = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"


@pytest.fixture(scope="module")
def report(spark):
    train = _docs(spark, [(1, TRAIN_TEXT), (2, "one two three four five six seven eight nine ten")])
    ev = _docs(
        spark,
        [
            # verbatim copy of a training doc -> containment 1.0 -> drop
            (10, TRAIN_TEXT),
            # disjoint vocabulary -> containment 0 -> keep
            (11, "zz yy xx ww vv uu tt ss rr qq pp oo nn mm ll kk"),
            # too short for BOTH signals (< 5 tokens) -> short
            (12, "tiny doc here"),
            # NULL text -> short
            (13, None),
            # NULL id -> excluded entirely
            (None, TRAIN_TEXT),
        ],
    )
    return {
        r["doc_id"]: r.asDict()
        for r in decontamination_report(ev, train).collect()
    }


def test_report_covers_every_keyed_eval_doc(report):
    assert set(report) == {10, 11, 12, 13}  # NULL id excluded


def test_verbatim_copy_dropped(report):
    r = report[10]
    assert r["containment"] == 1.0
    assert r["fp_overlap"] == 1.0
    assert r["evidence"] == 1.0
    assert r["decision"] == "drop"


def test_disjoint_doc_kept(report):
    r = report[11]
    assert r["containment"] == 0.0
    assert r["fp_overlap"] == 0.0
    assert r["decision"] == "keep"


def test_short_docs_surfaced_not_judged(report):
    for did in (12, 13):
        r = report[did]
        assert r["n_windows"] == 0
        assert r["containment"] is None
        assert r["fp_overlap"] is None
        assert r["evidence"] is None
        assert r["decision"] == "short"


def test_one_signal_suffices(spark):
    # 6 tokens: enough for winnowing (k=5) but not 8-gram windows —
    # the doc is judged on fp_overlap alone, not forced to 'short'
    six = "alpha bravo charlie delta echo foxtrot"
    train = _docs(spark, [(1, six)])
    ev = _docs(spark, [(20, six)])
    r = decontamination_report(ev, train).collect()[0]
    assert r["n_windows"] == 0
    assert r["containment"] is None
    assert r["fp_overlap"] == 1.0
    assert r["decision"] == "drop"


def test_hash_modes_agree(spark, sf_dir):
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select(
            "doc_id",
            "text",
            (F.substring("source", 4, 10).cast("int") % 2).alias("side"),
        )
        .limit(300)
    )
    ev, tr = docs.filter("side = 1"), docs.filter("side = 0")
    a = decontamination_report(ev, tr, hash_mode="md5").orderBy("doc_id")
    b = decontamination_report(ev, tr, hash_mode="xxhash64").orderBy("doc_id")
    assert a.collect() == b.collect()


WCAP_SCHEMA = StructType(
    [
        StructField("source", StringType()),
        StructField("weight", LongType()),
        StructField("cap", LongType()),
    ]
)


def _alloc(spark, rows, budget):
    df = spark.createDataFrame(rows, WCAP_SCHEMA)
    return {
        r["source"]: r["alloc"]
        for r in capped_weighted_waterfill(df, budget).collect()
    }


def test_waterfill_exhausts_budget(spark):
    a = _alloc(
        spark,
        [("a", 1, 100), ("b", 1, 100), ("c", 2, 1000)],
        200,
    )
    assert sum(a.values()) == pytest.approx(200.0, abs=1e-6)
    # equal weights a,b get equal allocations; c gets 2x the rate
    assert a["a"] == a["b"]


def test_waterfill_caps_bind(spark):
    # a's cap (10) is far below its weighted share -> taken whole,
    # surplus re-levels between b and c by weight
    a = _alloc(spark, [("a", 5, 10), ("b", 1, 1000), ("c", 1, 1000)], 210)
    assert a["a"] == 10.0
    assert a["b"] == a["c"] == pytest.approx(100.0, abs=1e-6)


def test_waterfill_budget_exceeds_caps(spark):
    a = _alloc(spark, [("a", 3, 50), ("b", 1, 70)], 10_000)
    assert a == {"a": 50.0, "b": 70.0}


def test_waterfill_zero_weight_gets_nothing(spark):
    a = _alloc(spark, [("a", 0, 500), ("b", 1, 100), ("c", 1, 100)], 150)
    assert a["a"] == 0.0
    # the zero-weight source's cap must not absorb budget
    assert a["b"] + a["c"] == pytest.approx(150.0, abs=1e-6)


def test_waterfill_weight_scale_invariance(spark):
    rows = [("a", 2, 300), ("b", 5, 800), ("c", 1, 50)]
    scaled = [(s, w * 1000, c) for s, w, c in rows]
    assert _alloc(spark, rows, 600) == _alloc(spark, scaled, 600)


def test_waterfill_rejects_bad_inputs(spark):
    from py4j.protocol import Py4JJavaError
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    for rows in (
        [("a", None, 10)],
        [("a", -1, 10)],
        [("a", 1, None)],
        [("a", 1, -5)],
    ):
        with pytest.raises((Py4JJavaError, SparkRuntimeException)):
            capped_weighted_waterfill(
                spark.createDataFrame(rows, WCAP_SCHEMA), 100
            ).collect()

    with pytest.raises(ValueError):
        capped_weighted_waterfill(
            spark.createDataFrame([("a", 1, 10)], WCAP_SCHEMA), -1
        )
