"""Two-phase exact heavy hitters (operators/heavy_hitters.py)."""

from pyspark.sql import functions as F

from weaviate_txtai_spark.operators.heavy_hitters import exact_top_tokens


def _exact(docs, k):
    from weaviate_txtai_spark.functions.text import tokens

    return (
        docs.select(F.explode(tokens("text")).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("n_occ"))
        .orderBy(F.desc("n_occ"), F.asc("term"))
        .limit(k)
        .collect()
    )


def test_skewed_stream_fast_path(spark):
    # heavy terms dominate: MG keeps them through the decrements and the
    # guarantee check passes without the fallback aggregate
    rows = (
        [(i, "alpha " * 50) for i in range(20)]
        + [(100 + i, "beta " * 20) for i in range(20)]
        + [(200 + i, f"rare{i} one off") for i in range(50)]
    )
    docs = spark.createDataFrame(rows, "doc_id long, text string").repartition(8)
    got = exact_top_tokens(docs, 3, capacity=16).collect()
    assert [(r["term"], r["n_occ"]) for r in got] == [
        ("alpha", 1000),
        ("beta", 400),
        ("off", 50),  # ties with "one" at 50; term-asc tie-break
    ]


def test_flat_distribution_falls_back_exact(spark):
    # every term distinct: no capacity can certify the top-k, so the
    # operator must fall back — and still return the exact answer
    rows = [(i, f"t{i:04d}") for i in range(300)]
    docs = spark.createDataFrame(rows, "doc_id long, text string").repartition(8)
    got = exact_top_tokens(docs, 5, capacity=4)
    assert [tuple(r) for r in got.collect()] == [tuple(r) for r in _exact(docs, 5)]


def test_matches_plain_aggregate_any_capacity(spark, sf_dir):
    from weaviate_txtai_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    want = [tuple(r) for r in _exact(docs, 20)]
    for cap in (8, 4096):  # heavy decrementing vs hold-everything
        got = [tuple(r) for r in exact_top_tokens(docs, 20, capacity=cap).collect()]
        assert got == want, f"capacity={cap}"
