"""Driver-contract query registry: Spark plan + DuckDB oracle per operator.

Every operator from SURVEY.md §2 (and the north-star extensions) registers
here as ``name -> (spark_fn, oracle_sql | None)``. The driver runs both at
sf0.01 and hash-compares row count + schema + order-insensitive values, so:

- every computed column is aliased identically on both sides;
- floats are rounded in-query (scores: 6 dp; money sums: 2 dp) — Spark and
  DuckDB agree to ~1e-16 on double math but not bit-for-bit on sum order;
- DuckDB ``sum(int)`` returns HUGEINT → oracle casts to BIGINT;
- top-k ties break deterministically (score DESC, id ASC).

Oracle SQL is ANSI-ish DuckDB SQL over the pre-registered views
(region nation customer supplier part orders lineitem events documents
embeddings) — it is the *specification*; the Spark side is the *engine*.
"""

from __future__ import annotations

from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from weaviate_txtai_spark.functions.vector import cosine_sim
from weaviate_txtai_spark.sources.tables import load_table

QueryFn = Callable[[SparkSession, str], DataFrame]

REGISTRY: dict[str, tuple[QueryFn, Optional[str]]] = {}


def register(name: str, oracle: Optional[str]):
    def deco(fn: QueryFn) -> QueryFn:
        REGISTRY[name] = (fn, oracle)
        return fn

    return deco


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "embeddings")


# --------------------------------------------------------------------------
# Q1/Q2/Q3/Q5: kNN cosine top-k (reference search path, weaviate.py:175-201)
# --------------------------------------------------------------------------

_KNN_TOPK_SQL = """
SELECT e.vec_id,
       round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
             (SELECT CAST(embedding AS DOUBLE[]) FROM embeddings WHERE vec_id = 0)),
             6) AS score
FROM embeddings e
ORDER BY score DESC, e.vec_id ASC
LIMIT 10
"""


@register("knn_topk", _KNN_TOPK_SQL)
def knn_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-query top-10 by cosine — plans as TakeOrderedAndProject:
    map-only scan + per-partition heaps, no shuffle."""
    emb = _emb(spark, sf_dir)
    q = F.broadcast(
        emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))
    )
    return (
        emb.crossJoin(q)
        .select(
            "vec_id",
            F.round(cosine_sim("embedding", "qv"), 6).alias("score"),
        )
        .orderBy(F.desc("score"), F.asc("vec_id"))
        .limit(10)
    )


_KNN_BATCH_SQL = """
SELECT query_id, vec_id, score, rank FROM (
  SELECT q.vec_id AS query_id, e.vec_id,
         round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                      CAST(q.embedding AS DOUBLE[])), 6) AS score,
         CAST(row_number() OVER (
             PARTITION BY q.vec_id
             ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                             CAST(q.embedding AS DOUBLE[])) DESC,
                      e.vec_id ASC) AS INT) AS rank
  FROM embeddings e
  CROSS JOIN (SELECT vec_id, embedding FROM embeddings WHERE vec_id IN (0, 1, 2)) q
) WHERE rank <= 5
"""


@register("knn_batch", _KNN_BATCH_SQL)
def knn_batch_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch kNN: 3 query vectors answered in ONE plan — the reference
    drops all but queries[0] (weaviate.py:177); we broadcast the query
    side and shuffle only k×Q×partitions rows for the final window."""
    emb = _emb(spark, sf_dir)
    qdf = emb.filter(F.col("vec_id").isin(0, 1, 2)).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vector")
    )
    from weaviate_txtai_spark.operators.topk import knn_topk

    res = knn_topk(
        emb, qdf, 5, vector_col="embedding", id_col="vec_id", score_round=None
    )
    return res.select(
        "query_id", "vec_id", F.round("score", 6).alias("score"), "rank"
    )


_VECTOR_COUNT_SQL = "SELECT CAST(count(*) AS BIGINT) AS n FROM embeddings"


@register("vector_count", _VECTOR_COUNT_SQL)
def vector_count_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7: Aggregate meta count (weaviate.py:203-206) — row-group
    metadata count, no data read."""
    return _emb(spark, sf_dir).agg(F.count(F.lit(1)).alias("n"))


# --------------------------------------------------------------------------
# T1-T4: txtai SQL surface — similar() + metadata predicates + aggregates
# (examples/01_simple.ipynb cells 25-29)
# --------------------------------------------------------------------------

_SIMILAR_SQL = """
SELECT d.doc_id, d.text, d.n_chars,
       round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
             (SELECT CAST(embedding AS DOUBLE[]) FROM embeddings WHERE vec_id = 42)),
             6) AS score
FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
WHERE d.n_chars >= 100
ORDER BY score DESC, d.doc_id ASC
LIMIT 10
"""


@register("similar_sql", _SIMILAR_SQL)
def similar_sql_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T1+T2+T4 parity: `select text, score from txtai where similar(q)
    and n_chars >= 100 order by score desc limit 10`. The metadata
    predicate is pushed to the parquet scan; the doc<->vector join
    broadcasts nothing big (both sides pruned to 2-3 columns)."""
    docs = load_table(spark, sf_dir, "documents")
    emb = _emb(spark, sf_dir)
    q = F.broadcast(
        emb.filter(F.col("vec_id") == 42).select(F.col("embedding").alias("qv"))
    )
    return (
        docs.filter(F.col("n_chars") >= 100)
        .join(emb, docs.doc_id == emb.vec_id)
        .crossJoin(q)
        .select(
            "doc_id",
            "text",
            "n_chars",
            F.round(cosine_sim("embedding", "qv"), 6).alias("score"),
        )
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(10)
    )


_AGG_STATS_SQL = """
SELECT CAST(count(*) AS BIGINT) AS cnt,
       CAST(min(n_chars) AS BIGINT) AS min_chars,
       CAST(max(n_chars) AS BIGINT) AS max_chars,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars
FROM documents
"""


@register("agg_stats_txtai", _AGG_STATS_SQL)
def agg_stats_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T3 parity: `select count(*), min(length), max(length), sum(length)
    from txtai` (notebook cell 27) — partial-agg map-side, one exchange."""
    return load_table(spark, sf_dir, "documents").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
        F.sum("n_chars").alias("sum_chars"),
    )


# --------------------------------------------------------------------------
# Relational SQL surface over the star schema (free in Spark — SURVEY §2.4)
# --------------------------------------------------------------------------

_TPCH_Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
       round(avg(l_quantity), 6) AS avg_qty,
       round(avg(l_extendedprice), 4) AS avg_price,
       round(avg(l_discount), 6) AS avg_disc,
       CAST(count(*) AS BIGINT) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


@register("pricing_summary", _TPCH_Q1_SQL)
def pricing_summary_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan -> partial hash agg -> exchange(2 keys) ->
    final agg. Filter pushed to parquet; only 7 columns read."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(
                F.sum(
                    F.col("l_extendedprice")
                    * (1 - F.col("l_discount"))
                    * (1 + F.col("l_tax"))
                ),
                2,
            ).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


_TOP_CUSTOMER_SQL = """
SELECT n_name, c_custkey, c_name, round(c_acctbal, 2) AS acctbal
FROM (
  SELECT c.*, n.n_name,
         row_number() OVER (PARTITION BY c.c_nationkey
                            ORDER BY c.c_acctbal DESC, c.c_custkey ASC) AS rn
  FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
) WHERE rn = 1
ORDER BY n_name
"""


@register("top_customer_per_nation", _TOP_CUSTOMER_SQL)
def top_customer_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window top-1 per group + broadcast dim join (nation is 25 rows —
    always broadcast, never shuffled)."""
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.desc("c_acctbal"), F.asc("c_custkey")
    )
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "n_name",
            "c_custkey",
            "c_name",
            F.round("c_acctbal", 2).alias("acctbal"),
        )
        .orderBy("n_name")
    )


_REVENUE_BY_NATION_SQL = """
SELECT n.n_name,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
       CAST(count(*) AS BIGINT) AS n_items
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE o.o_orderstatus = 'F'
GROUP BY n.n_name
ORDER BY revenue DESC, n_name
"""


@register("revenue_by_nation", _REVENUE_BY_NATION_SQL)
def revenue_by_nation_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-way join pipeline: fact->fact shuffle join on orderkey, then
    dims broadcast. At 100 TB lineitem/orders would be co-bucketed on
    orderkey to eliminate the big shuffle."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    )
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy(F.desc("revenue"), "n_name")
    )


_ORDERS_ROLLUP_SQL = """
SELECT o_orderstatus, o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_orders,
       round(sum(o_totalprice), 2) AS total
FROM orders
GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
"""


@register("orders_rollup", _ORDERS_ROLLUP_SQL)
def orders_rollup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouping-sets rollup (reference has no grouping sets at all —
    SURVEY §2.4 gap list)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
        .orderBy(
            F.col("o_orderstatus").asc_nulls_first(),
            F.col("o_orderpriority").asc_nulls_first(),
        )
    )


# --------------------------------------------------------------------------
# Events: timestamped table — windowed aggregation + JSON extraction
# --------------------------------------------------------------------------

_EVENTS_HOURLY_SQL = """
SELECT CAST(EXTRACT(year FROM ts) AS INT) AS y,
       CAST(EXTRACT(month FROM ts) AS INT) AS m,
       CAST(EXTRACT(day FROM ts) AS INT) AS d,
       CAST(EXTRACT(hour FROM ts) AS INT) AS h,
       event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       round(sum(value), 4) AS sum_value
FROM events
GROUP BY 1, 2, 3, 4, 5
ORDER BY 1, 2, 3, 4, 5
"""


@register("events_hourly", _EVENTS_HOURLY_SQL)
def events_hourly_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch tumbling-window agg (streaming variant in streaming/events.py
    computes the identical result via Structured Streaming)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.year("ts").alias("y"),
            F.month("ts").alias("m"),
            F.dayofmonth("ts").alias("d"),
            F.hour("ts").alias("h"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .orderBy("y", "m", "d", "h", "event_type")
    )


_EVENTS_JSON_SQL = """
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       round(avg(CAST(json_extract_string(props, '$.k') AS INT)), 6) AS avg_k,
       CAST(max(CAST(json_extract_string(props, '$.k') AS INT)) AS INT) AS max_k
FROM events
GROUP BY event_type
ORDER BY event_type
"""


@register("events_json", _EVENTS_JSON_SQL)
def events_json_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured props column: get_json_object + agg (the
    reference's metadata documents are JSON-ish dicts — SURVEY §1.2)."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg(k), 6).alias("avg_k"),
            F.max(k).alias("max_k"),
        )
        .orderBy("event_type")
    )


_LANG_DIST_SQL = """
SELECT lang, source,
       CAST(count(*) AS BIGINT) AS n_docs,
       round(avg(n_chars), 6) AS avg_chars
FROM documents
GROUP BY lang, source
ORDER BY lang, source
"""


@register("lang_distribution", _LANG_DIST_SQL)
def lang_distribution_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    ds = load_table(spark, sf_dir, "documents")
    return (
        ds.groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("n_chars"), 6).alias("avg_chars"),
        )
        .orderBy("lang", "source")
    )


def queries() -> dict[str, QueryFn]:
    return {name: fn for name, (fn, _) in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: sql for name, (_, sql) in REGISTRY.items() if sql is not None
    }
