"""Relational gates over the star schema: TPC-H-shaped join/agg/window/setop coverage, events-table analytics, sketches.

Split out of plans/queries.py (round 4); registration order inside a module is
unchanged, and queries.py remains the single registry hub.
"""

from __future__ import annotations

import math
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from weaviate_txtai_spark.functions.vector import cosine_sim
from weaviate_txtai_spark.sources.tables import load_table
from weaviate_txtai_spark.plans.base import QueryFn, _emb, register

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


_SUPPLIER_REGION_SQL = """
SELECT r.r_name,
       CAST(count(*) AS BIGINT) AS n_suppliers,
       round(sum(s.s_acctbal), 2) AS total_balance,
       round(avg(s.s_acctbal), 2) AS avg_balance
FROM supplier s
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name
ORDER BY r.r_name
"""


@register("supplier_region_balance", _SUPPLIER_REGION_SQL)
def supplier_region_balance_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure dimension snowflake (supplier->nation->region): every join
    broadcasts, so the whole plan is map-side + one tiny agg shuffle —
    the shape survives any scale-up of the supplier table."""
    sup = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        sup.join(F.broadcast(nation), sup.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            F.round(F.sum("s_acctbal"), 2).alias("total_balance"),
            F.round(F.avg("s_acctbal"), 2).alias("avg_balance"),
        )
        .orderBy("r_name")
    )


_PART_BRAND_SQL = """
SELECT p.p_brand,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
       round(sum(l.l_quantity), 1) AS total_qty
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
GROUP BY p.p_brand
ORDER BY revenue DESC, p.p_brand
"""


@register("part_brand_revenue", _PART_BRAND_SQL)
def part_brand_revenue_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact x small-dim: part broadcasts (it's 1/30th of lineitem and
    only p_brand survives pruning), so lineitem never shuffles before
    the partial aggregate."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.round(F.sum("l_quantity"), 1).alias("total_qty"),
        )
        .orderBy(F.desc("revenue"), "p_brand")
    )


_SUPPLIER_SHARE_SQL = """
WITH sup_rev AS (
  SELECT n.n_name, s.s_name,
         sum(l.l_extendedprice * (1 - l.l_discount)) AS rev
  FROM lineitem l
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  GROUP BY 1, 2
)
SELECT n_name, s_name,
       round(rev, 2) AS revenue,
       round(rev / sum(rev) OVER (PARTITION BY n_name), 6) AS share
FROM sup_rev
ORDER BY n_name, revenue DESC, s_name
"""


@register("supplier_share", _SUPPLIER_SHARE_SQL)
def supplier_share_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate-then-window: revenue per (nation, supplier), then each
    supplier's share of its nation via a window sum. The window runs
    over the aggregated table (one row per supplier), never the fact."""
    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    rev = (
        li.join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(nation), sup.s_nationkey == nation.n_nationkey)
        .groupBy("n_name", "s_name")
        .agg(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "rev"
            )
        )
    )
    w = Window.partitionBy("n_name")
    return (
        rev.select(
            "n_name",
            "s_name",
            F.round("rev", 2).alias("revenue"),
            F.round(F.col("rev") / F.sum("rev").over(w), 6).alias("share"),
        )
        .orderBy("n_name", F.desc("revenue"), "s_name")
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


_SEGMENT_SETOPS_SQL = """
SELECT CAST(count(*) AS BIGINT) AS n_both FROM (
  SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
  INTERSECT
  SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
)
"""


@register("segment_setops", _SEGMENT_SETOPS_SQL)
def segment_setops_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operations (INTERSECT) — absent from the reference entirely
    (SURVEY §2.4)."""
    orders = load_table(spark, sf_dir, "orders")
    f = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    o = orders.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    return f.intersect(o).agg(F.count(F.lit(1)).alias("n_both"))


_CUSTOMER_LIFETIME_SQL = """
SELECT o_custkey, n_orders, total, first_date, last_date FROM (
  SELECT o_custkey,
         CAST(count(*) AS BIGINT) AS n_orders,
         round(sum(o_totalprice), 2) AS total,
         CAST(CAST(min(o_orderdate) AS DATE) AS VARCHAR) AS first_date,
         CAST(CAST(max(o_orderdate) AS DATE) AS VARCHAR) AS last_date
  FROM orders GROUP BY o_custkey
) ORDER BY total DESC, o_custkey LIMIT 20
"""


@register("customer_lifetime", _CUSTOMER_LIFETIME_SQL)
def customer_lifetime_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
            F.min("o_orderdate").cast("date").cast("string").alias("first_date"),
            F.max("o_orderdate").cast("date").cast("string").alias("last_date"),
        )
        .orderBy(F.desc("total"), "o_custkey")
        .limit(20)
    )


_RUNNING_REVENUE_SQL = """
SELECT y, m, monthly, round(sum(monthly) OVER (ORDER BY y, m
       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running
FROM (
  SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS y,
         CAST(EXTRACT(month FROM o_orderdate) AS INT) AS m,
         round(sum(o_totalprice), 2) AS monthly
  FROM orders GROUP BY 1, 2
) ORDER BY y, m
"""


@register("running_revenue", _RUNNING_REVENUE_SQL)
def running_revenue_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running-total window over a pre-aggregated frame (two-level agg:
    the window input is tiny, so the unpartitioned window is safe)."""
    orders = load_table(spark, sf_dir, "orders")
    monthly = (
        orders.groupBy(
            F.year("o_orderdate").alias("y"), F.month("o_orderdate").alias("m")
        )
        .agg(F.round(F.sum("o_totalprice"), 2).alias("monthly"))
    )
    w = Window.orderBy("y", "m").rowsBetween(Window.unboundedPreceding, 0)
    return (
        monthly.withColumn("running", F.round(F.sum("monthly").over(w), 2))
        .orderBy("y", "m")
    )


_PRICE_QUANTILES_SQL = """
SELECT o_orderpriority,
       round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
       round(quantile_cont(o_totalprice, 0.9), 4) AS p90,
       round(quantile_cont(o_totalprice, 0.99), 4) AS p99
FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


@register("price_quantiles", _PRICE_QUANTILES_SQL)
def price_quantiles_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (Spark `percentile` == DuckDB
    quantile_cont). At 100 TB you'd swap in approx_percentile and accept
    the error bound; the exact form is the spec."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .agg(
            F.round(F.expr("percentile(o_totalprice, 0.5)"), 4).alias("p50"),
            F.round(F.expr("percentile(o_totalprice, 0.9)"), 4).alias("p90"),
            F.round(F.expr("percentile(o_totalprice, 0.99)"), 4).alias("p99"),
        )
        .orderBy("o_orderpriority")
    )


# --------------------------------------------------------------------------
# Events: timestamped table — windowed aggregation + JSON extraction
# --------------------------------------------------------------------------

_SESSIONIZE_SQL = """
WITH ordered AS (
  SELECT user_id, ts,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > INTERVAL 30 MINUTE OR
                   lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events
), sessions AS (
  SELECT user_id,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS session_id
  FROM ordered
)
SELECT user_id, CAST(count(DISTINCT session_id) AS BIGINT) AS n_sessions,
       CAST(count(*) AS BIGINT) AS n_events
FROM sessions GROUP BY user_id ORDER BY user_id
"""


@register("events_sessionize", _SESSIONIZE_SQL)
def events_sessionize_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization: lag-gap detection + running-sum session ids — the
    canonical event-pipeline window composition. Partitioned by user_id,
    so the window shuffles once on the natural key."""
    ev = load_table(spark, sf_dir, "events")
    wo = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # microsecond gap: the oracle compares the exact INTERVAL, and
    # whole-second truncation flips gap detection on sub-second data
    # (the events_rolling_avg lesson, NOTES.md)
    gap = F.unix_micros(F.col("ts")) - F.lag(F.unix_micros(F.col("ts"))).over(wo)
    new_session = F.when(
        gap.isNull() | (gap > 30 * 60 * 1_000_000), F.lit(1)
    ).otherwise(F.lit(0))
    # same (ts, event_id) tiebreak as the lag window: an orderBy("ts")
    # prefix sum breaks duplicate-ts ties arbitrarily and can flip
    # session ids vs the flag assignment
    wrun = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    sessions = ev.withColumn("new_session", new_session).withColumn(
        "session_id", F.sum("new_session").over(wrun)
    )
    return (
        sessions.groupBy("user_id")
        .agg(
            F.count_distinct("session_id").alias("n_sessions"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("user_id")
    )

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


_RETURNS_CUBE_SQL = """
SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
       coalesce(l_linestatus, 'ALL') AS linestatus,
       CAST(count(*) AS BIGINT) AS n,
       round(sum(l_extendedprice), 2) AS total_price
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
ORDER BY returnflag, linestatus
"""


@register("returns_cube", _RETURNS_CUBE_SQL)
def returns_cube_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping sets (rollup is covered by orders_rollup): all four
    grouping combinations in ONE aggregate pass — Spark expands the
    grouping sets map-side, so the fact table is still read once."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("l_extendedprice"), 2).alias("total_price"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "n",
            "total_price",
        )
        .orderBy("returnflag", "linestatus")
    )


_EVENTS_PIVOT_SQL = """
SELECT user_id,
       CAST(count(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS clicks,
       CAST(count(*) FILTER (WHERE event_type = 'view') AS BIGINT) AS views,
       CAST(count(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS purchases,
       round(coalesce(sum(value) FILTER (WHERE event_type = 'purchase'), 0), 2)
         AS purchase_value
FROM events
WHERE user_id < 50
GROUP BY user_id
ORDER BY user_id
"""


@register("events_pivot", _EVENTS_PIVOT_SQL)
def events_pivot_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot event_type into wide per-user columns. Spark's
    groupBy().pivot(values=...) with explicit values stays a single
    hash aggregate (no extra pass to discover the pivot domain)."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 50)
    wide = (
        ev.groupBy("user_id")
        .pivot("event_type", ["click", "view", "purchase"])
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.coalesce(F.sum("value"), F.lit(0.0)), 2).alias("val"),
        )
    )
    return (
        wide.select(
            "user_id",
            F.coalesce("click_n", F.lit(0)).alias("clicks"),
            F.coalesce("view_n", F.lit(0)).alias("views"),
            F.coalesce("purchase_n", F.lit(0)).alias("purchases"),
            F.coalesce("purchase_val", F.lit(0.0)).alias("purchase_value"),
        )
        .orderBy("user_id")
    )


_ANTI_JOIN_SQL = """
SELECT c.c_mktsegment,
       CAST(count(*) AS BIGINT) AS n_inactive
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 150000)
GROUP BY c.c_mktsegment
ORDER BY c.c_mktsegment
"""


@register("inactive_customer_segments", _ANTI_JOIN_SQL)
def inactive_customer_segments_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS as a left-anti join — the same shape VectorIndex.delete
    uses for set-oriented deletion (reference does this as N+1 HTTP
    round-trips, weaviate.py:167-173)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_totalprice") > 150000
    )
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_inactive"))
        .orderBy("c_mktsegment")
    )


_SEMI_JOIN_SQL = """
SELECT c.c_mktsegment,
       CAST(count(*) AS BIGINT) AS n_active,
       round(avg(c.c_acctbal), 2) AS avg_balance
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 100000)
GROUP BY c.c_mktsegment
ORDER BY c.c_mktsegment
"""


@register("active_customer_segments", _SEMI_JOIN_SQL)
def active_customer_segments_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS-subquery shape as a left-semi join: the orders side is
    filtered + deduped by the semi join itself, customers never
    duplicate. Semi joins broadcast their right side when small."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_totalprice") > 100000
    )
    return (
        cust.join(
            orders, cust.c_custkey == orders.o_custkey, "left_semi"
        )
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_active"),
            F.round(F.avg("c_acctbal"), 2).alias("avg_balance"),
        )
        .orderBy("c_mktsegment")
    )


# --------------------------------------------------------------------------
# Temporal joins (north-star; reference has no joins at all — SURVEY §2.4)
# --------------------------------------------------------------------------

_ASOF_SQL = """
WITH p AS (SELECT event_id, user_id, ts, value FROM events
           WHERE event_type = 'purchase'),
     c AS (SELECT user_id, ts, value AS click_value FROM events
           WHERE event_type = 'click')
SELECT p.event_id, p.user_id,
       round(p.value, 4) AS purchase_value,
       round(coalesce(c.click_value, 0), 4) AS click_value,
       coalesce(c.ts, TIMESTAMP '1970-01-01 00:00:00') AS click_ts,
       coalesce(epoch_us(p.ts) - epoch_us(c.ts), -1) AS gap_us
FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts
ORDER BY p.event_id
"""


@register("events_asof", _ASOF_SQL)
def events_asof_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Click attribution: for every purchase, the latest click of the same
    user at-or-before the purchase (backward as-of LEFT join). One shuffle
    on user_id, no range explosion — operators/asof.py."""
    from weaviate_txtai_spark.operators.asof import asof_join

    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("value").alias("click_value")
    )
    res = asof_join(
        purchases, clicks, on=["user_id"], matched_ts_col="click_ts"
    )
    # NULL-free gate projection: the driver's row-sort comparator chokes
    # on None mixed into a typed column, so unmatched rows carry sentinels
    # (epoch-0 ts, 0 value, -1 gap) on BOTH engines.
    return res.select(
        "event_id",
        "user_id",
        F.round("value", 4).alias("purchase_value"),
        F.round(F.coalesce("click_value", F.lit(0.0)), 4).alias("click_value"),
        F.coalesce(
            "click_ts", F.lit("1970-01-01 00:00:00").cast("timestamp")
        ).alias("click_ts"),
        F.coalesce(
            F.unix_micros("ts") - F.unix_micros("click_ts"), F.lit(-1)
        ).alias("gap_us"),
    ).orderBy("event_id")


_RANGE_JOIN_SQL = """
WITH e AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'error')
SELECT e.event_id, e.user_id,
       CAST(count(r.event_id) AS BIGINT) AS n_follow,
       round(coalesce(sum(r.value), 0), 4) AS sum_follow
FROM e LEFT JOIN events r
  ON r.user_id = e.user_id
 AND epoch_us(r.ts) > epoch_us(e.ts)
 AND epoch_us(r.ts) <= epoch_us(e.ts) + 600000000
GROUP BY e.event_id, e.user_id
ORDER BY e.event_id
"""


@register("events_range_join", _RANGE_JOIN_SQL)
def events_range_join_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-window follow-up: per error event, count/sum of the same
    user's events in the next 10 minutes. Epoch-bucketed equi-join
    (operators/asof.range_join) — linear shuffle, never the quadratic
    inequality cross-join Catalyst would plan."""
    from weaviate_txtai_spark.cache import scoped_persist
    from weaviate_txtai_spark.operators.asof import range_join

    ev = load_table(spark, sf_dir, "events")
    # persisted: the filtered 3-column frame feeds range_join's left
    # side AND the final NULL-restoring join-back — without the persist
    # each consumer re-scanned events (r13 opt)
    # eager: both consumers fan out as concurrent stages of one
    # action and raced the lazy fill (r14 opt)
    errors = scoped_persist(
        ev.filter(F.col("event_type") == "error").select(
            "event_id", "user_id", "ts"
        ),
        eager=True,
    )
    follow = ev.select(
        "user_id",
        F.col("ts").alias("r_ts"),
        F.col("event_id").alias("r_event_id"),
        F.col("value").alias("r_value"),
    )
    pairs = range_join(
        errors,
        follow,
        window_seconds=600,
        on=["user_id"],
        left_ts="ts",
        right_ts="r_ts",
    )
    counts = pairs.groupBy("event_id", "user_id").agg(
        F.count("r_event_id").alias("n_follow"),
        F.round(F.sum("r_value"), 4).alias("sum_follow"),
    )
    return (
        errors.select("event_id", "user_id")
        .join(counts, ["event_id", "user_id"], "left")
        .select(
            "event_id",
            "user_id",
            F.coalesce("n_follow", F.lit(0)).alias("n_follow"),
            F.coalesce("sum_follow", F.lit(0.0)).alias("sum_follow"),
        )
        .orderBy("event_id")
    )


_RETURNED_ITEMS_SQL = """
SELECT c.c_custkey, c.c_name,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
       round(c.c_acctbal, 2) AS c_acctbal, n.n_name
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE o.o_orderdate >= DATE '1995-10-01'
  AND o.o_orderdate < DATE '1996-01-01'
  AND l.l_returnflag = 'R'
GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
ORDER BY revenue DESC, c.c_custkey
LIMIT 20
"""


@register("returned_items", _RETURNED_ITEMS_SQL)
def returned_items_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: quarter-sliced orders ⋈ returned lineitems, with
    customer and nation dims broadcast onto the aggregated fact join;
    top-20 by lost revenue via TakeOrderedAndProject."""
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-10-01").cast("date"))
        & (F.col("o_orderdate") < F.lit("1996-01-01").cast("date"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select(
            "c_custkey",
            "c_name",
            "revenue",
            F.round("c_acctbal", 2).alias("c_acctbal"),
            "n_name",
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


# --------------------------------------------------------------------------
# TPC-H-shaped relational coverage: Q3 shipping priority, Q14 promo share
# --------------------------------------------------------------------------

_SHIPPING_PRIORITY_SQL = """
SELECT l.l_orderkey,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
       o.o_orderdate, o.o_orderpriority
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < DATE '1995-03-15'
  AND l.l_shipdate > DATE '1995-03-15'
GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
ORDER BY revenue DESC, l.l_orderkey
LIMIT 10
"""


@register("shipping_priority", _SHIPPING_PRIORITY_SQL)
def shipping_priority_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter broadcast into a fact⋈fact
    join, grouped revenue, top-10. customer (dim) broadcasts; the
    lineitem⋈orders shuffle is the co-bucketing candidate
    (sources/bucketed.py)."""
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1995-03-15").cast("date")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1995-03-15").cast("date")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(
            F.broadcast(cust.select("c_custkey")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


_PROMO_REVENUE_SQL = """
SELECT round(100.00 * sum(CASE WHEN p.p_type LIKE 'PROMO%'
                               THEN l.l_extendedprice * (1 - l.l_discount)
                               ELSE 0 END)
              / sum(l.l_extendedprice * (1 - l.l_discount)), 6)
         AS promo_revenue
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_shipdate >= DATE '1995-09-01'
  AND l.l_shipdate < DATE '1995-10-01'
"""


@register("promo_revenue", _PROMO_REVENUE_SQL)
def promo_revenue_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: month-sliced fact scan, broadcast part dim,
    conditional aggregate ratio — the date filter pushes into the
    parquet scan."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1995-09-01").cast("date"))
        & (F.col("l_shipdate") < F.lit("1995-10-01").cast("date"))
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    net = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type").like("PROMO%"), net).otherwise(F.lit(0.0))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            F.round(100.0 * F.sum(promo) / F.sum(net), 6).alias(
                "promo_revenue"
            )
        )
    )


# --------------------------------------------------------------------------
# Classic decision-support join/agg shapes (TPC-H Q4/Q7/Q11/Q15/Q17/Q18/
# Q19/Q22 analogues on the driver's star schema) — breadth of the SQL
# surface the reference's txtai dialect can never express (SURVEY §2.4).
# --------------------------------------------------------------------------

_NATION_TRADE_SQL = """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l.l_shipdate) AS INT) AS l_year,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
FROM lineitem l
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
WHERE n1.n_name <> n2.n_name
  AND l.l_shipdate < TIMESTAMP '1997-01-01'
GROUP BY 1, 2, 3
"""
# revenue sums land exactly on the 2dp rounding boundary for a few of the
# 1200 groups, so double accumulation order flips the last cent: sum in
# DECIMAL (exact, order-independent) on both engines, round, cast back.
_NATION_TRADE_SQL = _NATION_TRADE_SQL.replace(
    "round(sum(l.l_extendedprice * (1 - l.l_discount)), 2)",
    "CAST(round(sum(CAST(l.l_extendedprice * (1 - l.l_discount)"
    " AS DECIMAL(28,8))), 2) AS DOUBLE)",
)


@register("nation_trade_volume", _NATION_TRADE_SQL)
def nation_trade_volume_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: cross-nation trade volume. Two fact-side shuffle
    joins (lineitem⋈orders, +customer); supplier and both nation roles
    broadcast. The nation inequality filters post-join on broadcast
    columns — no extra shuffle."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp")
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = load_table(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(cust, F.col("o_custkey") == cust.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(
            F.round(
                F.sum(
                    (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                        "decimal(28,8)"
                    )
                ),
                2,
            )
            .cast("double")
            .alias("revenue")
        )
    )


_LARGE_ORDERS_SQL = """
WITH big AS (
  SELECT l_orderkey, sum(l_quantity) AS total_qty
  FROM lineitem GROUP BY 1 HAVING sum(l_quantity) > 300
)
SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
       round(o.o_totalprice, 2) AS o_totalprice,
       round(big.total_qty, 1) AS total_qty
FROM big
JOIN orders o ON o.o_orderkey = big.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 20
"""


@register("large_orders", _LARGE_ORDERS_SQL)
def large_orders_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: large-volume orders. The HAVING aggregate runs
    first (partial map-side sums), shrinking the fact to a handful of
    orderkeys; AQE then broadcasts that survivor set onto orders —
    order of magnitude less shuffle than joining before aggregating."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("__qty"))
        .filter(F.col("__qty") > 300)
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            F.round("o_totalprice", 2).alias("o_totalprice"),
            F.round("__qty", 1).alias("total_qty"),
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(20)
    )


_DISJUNCTIVE_SQL = """
SELECT round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
       count(*) AS n_items
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15 AND l.l_quantity <= 15)
   OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 25
       AND l.l_quantity BETWEEN 10 AND 25)
   OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 35 AND l.l_quantity >= 25)
"""


@register("disjunctive_selection", _DISJUNCTIVE_SQL)
def disjunctive_selection_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR-of-conjuncts selection. The brand IN-list (the
    disjunction's common factor) is applied to part BEFORE the join, so
    it pushes into the part scan and shrinks the broadcast; the mixed
    part/lineitem disjunction evaluates post-join in codegen."""
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_brand").isin("Brand#12", "Brand#23", "Brand#34")
    )
    li = load_table(spark, sf_dir, "lineitem")
    q = F.col("l_quantity")
    branch = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 15) & (q <= 15))
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 25)
            & q.between(10, 25)
        )
        | ((F.col("p_brand") == "Brand#34") & F.col("p_size").between(1, 35) & (q >= 25))
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .filter(branch)
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


_LAPSED_SQL = """
WITH avg_bal AS (SELECT avg(c_acctbal) AS ab FROM customer WHERE c_acctbal > 0)
SELECT c.c_nationkey, count(*) AS numcust, round(sum(c.c_acctbal), 2) AS totacctbal
FROM customer c, avg_bal
WHERE c.c_acctbal > avg_bal.ab
  AND NOT EXISTS (
    SELECT 1 FROM orders o
    WHERE o.o_custkey = c.c_custkey
      AND o.o_orderdate >= TIMESTAMP '2001-01-01'
  )
GROUP BY 1
"""


@register("lapsed_high_value_customers", _LAPSED_SQL)
def lapsed_high_value_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: above-average-balance customers with no recent
    orders. The global-average scalar broadcasts as a 1-row crossJoin;
    the NOT EXISTS is a left_anti join against the date-filtered orders
    (filter pushed to the orders scan, shrinking the anti side)."""
    cust = load_table(spark, sf_dir, "customer")
    avg_bal = cust.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("__ab")
    )
    recent = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2001-01-01").cast("timestamp"))
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("__ab"))
        .join(recent, "c_custkey", "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
    )


_PART_SHARE_SQL = """
WITH pr AS (
  SELECT l_partkey, sum(l_extendedprice * (1 - l_discount)) AS val
  FROM lineitem GROUP BY 1
), tot AS (SELECT sum(val) AS t, count(*) AS np FROM pr)
SELECT pr.l_partkey, round(pr.val, 2) AS val
FROM pr, tot
WHERE pr.val > 1.5 * tot.t / tot.np
ORDER BY val DESC, l_partkey
"""


@register("part_revenue_share", _PART_SHARE_SQL)
def part_revenue_share_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: parts earning more than 1.5x the average part
    revenue — a scale-invariant threshold (a fixed share-of-total goes
    degenerate as the part count grows). One shuffle (groupBy partkey);
    the total re-aggregates the already-small per-part table and
    broadcasts back as a 1-row crossJoin — the fact is scanned once."""
    li = load_table(spark, sf_dir, "lineitem")
    pr = li.groupBy("l_partkey").agg(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("__val")
    )
    tot = pr.agg(F.sum("__val").alias("__t"), F.count(F.lit(1)).alias("__np"))
    return (
        pr.crossJoin(F.broadcast(tot))
        .filter(F.col("__val") > 1.5 * F.col("__t") / F.col("__np"))
        .select("l_partkey", F.round("__val", 2).alias("val"))
        .orderBy(F.desc("val"), F.asc("l_partkey"))
    )


_TOP_SUPPLIER_SQL = """
WITH rev AS (
  SELECT l_suppkey, round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_rev
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY 1
)
SELECT s.s_suppkey, s.s_name, rev.total_rev
FROM supplier s
JOIN rev ON s.s_suppkey = rev.l_suppkey
WHERE rev.total_rev = (SELECT max(total_rev) FROM rev)
ORDER BY s_suppkey
"""


@register("top_revenue_supplier", _TOP_SUPPLIER_SQL)
def top_revenue_supplier_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: supplier(s) with max quarter revenue. The scalar
    max re-aggregates the per-supplier table (already shuffled once) and
    broadcasts; revenue is rounded BEFORE the max-equality so Spark and
    the oracle compare identical doubles."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    rev = li.groupBy("l_suppkey").agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("total_rev")
    )
    mx = rev.agg(F.max("total_rev").alias("__mx"))
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_rev") == F.col("__mx"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_rev")
        .orderBy("s_suppkey")
    )


_SMALL_QTY_SQL = """
WITH pa AS (
  SELECT l.l_partkey, 0.2 * avg(l.l_quantity) AS lim
  FROM lineitem l
  JOIN part p ON p.p_partkey = l.l_partkey
  WHERE p.p_brand = 'Brand#23'
  GROUP BY 1
)
SELECT round(sum(l.l_extendedprice) / 7.0, 2) AS avg_yearly
FROM lineitem l
JOIN pa ON l.l_partkey = pa.l_partkey
WHERE l.l_quantity < pa.lim
"""


@register("small_quantity_revenue", _SMALL_QTY_SQL)
def small_quantity_revenue_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue from below-avg-quantity lineitems of one
    brand. The correlated avg subquery decorrelates into a per-part
    aggregate over the brand-restricted fact (brand filter broadcast
    onto lineitem first), then broadcasts back onto the same restricted
    fact — the full lineitem is never shuffled."""
    brand_parts = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_brand") == "Brand#23")
        .select("p_partkey")
    )
    li = load_table(spark, sf_dir, "lineitem")
    brand_li = li.join(
        F.broadcast(brand_parts), li.l_partkey == F.col("p_partkey")
    ).select("l_partkey", "l_quantity", "l_extendedprice")
    pa = brand_li.groupBy(F.col("l_partkey").alias("__pk")).agg(
        (0.2 * F.avg("l_quantity")).alias("__lim")
    )
    return (
        brand_li.join(F.broadcast(pa), F.col("l_partkey") == F.col("__pk"))
        .filter(F.col("l_quantity") < F.col("__lim"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


_LATE_SHIP_SQL = """
SELECT o.o_orderpriority, count(*) AS order_count
FROM orders o
WHERE EXISTS (
  SELECT 1 FROM lineitem l
  WHERE l.l_orderkey = o.o_orderkey
    AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
)
GROUP BY 1
ORDER BY 1
"""


@register("late_shipment_priority", _LATE_SHIP_SQL)
def late_shipment_priority_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: orders with at least one late-shipped line, counted
    by priority. The correlated EXISTS is a left_semi join whose
    non-equi part (l_shipdate > o_orderdate + 60 days) evaluates inside
    the join; semi-join semantics dedupe multi-line matches for free."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    cond = (orders.o_orderkey == li.l_orderkey) & (
        li.l_shipdate > orders.o_orderdate + F.expr("INTERVAL 60 DAYS")
    )
    return (
        orders.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


# --------------------------------------------------------------------------
# Sketch / approximate aggregates (training-pipeline corpus profiling):
# exact versions are oracle-gated; the sketch versions are rows-only with
# pytest error-bound tests (tests/test_sketches.py) because HLL /
# KLL implementations differ across engines by design.
# --------------------------------------------------------------------------

_DISTINCT_USERS_SQL = """
SELECT event_type, count(DISTINCT user_id) AS n_users, count(*) AS n_events
FROM events GROUP BY 1 ORDER BY 1
"""


@register("events_distinct_users", _DISTINCT_USERS_SQL)
def events_distinct_users_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct cardinality per group — Spark expands
    count_distinct into a two-phase aggregate (partial dedupe map-side,
    then count), the pattern the HLL sketch below replaces at scale."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.count_distinct("user_id").alias("n_users"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("event_type")
    )


@register("approx_distinct_users", None)  # sketch: engine-specific → rows-only
def approx_distinct_users_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct cardinality per group. At 100 TB this is
    THE distinct-count: fixed ~1.5 KB of state per group instead of a
    shuffle of every distinct key; mergeable across partitions.
    Bounded-error contract pinned in tests/test_sketches.py."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(F.approx_count_distinct("user_id", rsd=0.02).alias("n_users_approx"))
        .orderBy("event_type")
    )


@register("approx_price_quantiles", None)  # sketch: engine-specific → rows-only
def approx_price_quantiles_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate quantiles of l_extendedprice via Greenwald-Khanna
    (percentile_approx). Mergeable fixed-size sketch vs. the exact
    percentile's full sort; accuracy contract in tests/test_sketches.py
    against the exact `price_quantiles` query."""
    li = load_table(spark, sf_dir, "lineitem")
    qs = F.percentile_approx(
        "l_extendedprice", [0.25, 0.5, 0.75, 0.95], 10000
    ).alias("__qs")
    return (
        li.agg(qs)
        .select(
            F.posexplode("__qs").alias("q_idx", "price_approx")
        )
    )


# --------------------------------------------------------------------------
# Window-frame / bucketing / grouping-set breadth + streaming dedup
# --------------------------------------------------------------------------

_ROLLING_AVG_SQL = """
SELECT event_id, user_id,
       round(avg(value) OVER (
         PARTITION BY user_id ORDER BY ts
         RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW
       ), 6) AS rolling_avg
FROM events
"""


@register("events_rolling_avg", _ROLLING_AVG_SQL)
def events_rolling_avg_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-RANGE window frame (vs. the ROWS frame in running_revenue):
    per-user 1-hour trailing average. Spark's rangeBetween needs a
    numeric ordering key, so ts maps to epoch MICROSECONDS — full
    timestamp precision; truncating to seconds silently moves events
    across the frame boundary (caught at sf0.1, where sub-second
    spacing appears). One shuffle on user_id, then a sorted
    in-partition frame scan."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3600 * 1_000_000, 0)
    )
    return ev.select(
        "event_id", "user_id", F.round(F.avg("value").over(w), 6).alias("rolling_avg")
    )


_DECILES_SQL = """
WITH ranked AS (
  SELECT c_acctbal, ntile(10) OVER (ORDER BY c_acctbal DESC, c_custkey) AS decile
  FROM customer
)
SELECT decile, CAST(count(*) AS BIGINT) AS n_cust,
       round(min(c_acctbal), 2) AS min_bal, round(max(c_acctbal), 2) AS max_bal
FROM ranked GROUP BY 1 ORDER BY 1
"""


@register("customer_value_deciles", _DECILES_SQL)
def customer_value_deciles_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile bucketing (equi-depth histogram of customer value). Routed
    through the exact_ntile guardrail (VERDICT r2 item 6): ntile needs a
    global order — a single-partition sort, the one window shape that
    does NOT scale by partitioning alone — so the helper warns above a
    row threshold and points to quantile_buckets / approx_value_deciles,
    the same histogram without the global sort."""
    from weaviate_txtai_spark.functions.sampling import exact_ntile

    cust = load_table(spark, sf_dir, "customer")
    return (
        exact_ntile(
            cust.select("c_acctbal", "c_custkey"),
            10,
            F.desc("c_acctbal"),
            F.asc("c_custkey"),
            bucket_col="decile",
            # the input is one row per customer of a fixed sf table —
            # known far below the threshold, so skip the probe job
            warn_rows=None,
        )
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_cust"),
            F.round(F.min("c_acctbal"), 2).alias("min_bal"),
            F.round(F.max("c_acctbal"), 2).alias("max_bal"),
        )
        .orderBy("decile")
    )


_DOCS_GROUPING_SETS_SQL = """
SELECT coalesce(lang, 'ALL') AS lang, coalesce(source, 'ALL') AS source,
       CAST(count(*) AS BIGINT) AS n_docs,
       round(avg(n_chars), 4) AS avg_chars
FROM documents
GROUP BY GROUPING SETS ((lang), (lang, source), ())
ORDER BY lang, source
"""


@register("docs_grouping_sets", _DOCS_GROUPING_SETS_SQL)
def docs_grouping_sets_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (the general form behind orders_rollup's
    ROLLUP and returns_cube's CUBE): three chosen granularities in one
    aggregate pass over a single scan of the table."""
    docs = load_table(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("__docs_gs")
    return spark.sql(
        """
        SELECT coalesce(lang, 'ALL') AS lang, coalesce(source, 'ALL') AS source,
               count(*) AS n_docs, round(avg(n_chars), 4) AS avg_chars
        FROM __docs_gs
        GROUP BY GROUPING SETS ((lang), (lang, source), ())
        ORDER BY lang, source
        """
    )


@register("approx_value_deciles", None)  # sketch boundaries: rows-only
def approx_value_deciles_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The scale path customer_value_deciles' docstring promises: an
    equi-depth histogram WITHOUT a global sort. Decile boundaries come
    from the GK quantile sketch (one partial-agg pass, mergeable);
    bucket assignment is a broadcast of 9 doubles + a codegen'd count
    of boundaries below each value — map-only. Error is bounded by the
    sketch accuracy (bucket sizes within ~±1% of n/10 at accuracy 1e4,
    pinned in tests/test_sketches.py) vs ntile's exact single-partition
    sort."""
    from weaviate_txtai_spark.functions.sampling import quantile_buckets

    cust = load_table(spark, sf_dir, "customer")
    return (
        quantile_buckets(
            cust.select("c_acctbal"), "c_acctbal", n_buckets=10,
            bucket_col="decile",
        )
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_cust"),
            F.round(F.min("c_acctbal"), 2).alias("min_bal"),
            F.round(F.max("c_acctbal"), 2).alias("max_bal"),
        )
        .orderBy("decile")
    )


_REVENUE_PERCENTILE_SQL = """
WITH rev AS (
  SELECT o_custkey, sum(o_totalprice) AS total
  FROM orders GROUP BY 1
)
SELECT o_custkey,
       round(total, 2) AS total,
       round(percent_rank() OVER (ORDER BY total, o_custkey), 6) AS pct_rank,
       round(cume_dist() OVER (ORDER BY total, o_custkey), 6) AS cume
FROM rev
ORDER BY total DESC, o_custkey
LIMIT 25
"""


@register("revenue_percentile", _REVENUE_PERCENTILE_SQL)
def revenue_percentile_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank/cume_dist window shapes (the remaining rank-family
    functions). They need a total order over the aggregated per-customer
    table — already 100x smaller than the fact after the groupBy; at
    larger cardinalities the sketch-histogram path (approx_value_deciles)
    replaces the exact global sort. Tie-break on the key keeps both
    engines' ranks identical."""
    orders = load_table(spark, sf_dir, "orders")
    rev = orders.groupBy("o_custkey").agg(F.sum("o_totalprice").alias("__total"))
    w = Window.orderBy(F.asc("__total"), F.asc("o_custkey"))
    return (
        rev.select(
            "o_custkey",
            F.round("__total", 2).alias("total"),
            F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
            F.round(F.cume_dist().over(w), 6).alias("cume"),
        )
        .orderBy(F.desc("total"), F.asc("o_custkey"))
        .limit(25)
    )


_FUZZY_MATCH_SQL = """
SELECT a.source AS s1, b.source AS s2,
       CAST(levenshtein(a.source, b.source) AS INT) AS edit_dist
FROM (SELECT DISTINCT source FROM documents) a
JOIN (SELECT DISTINCT source FROM documents) b
  ON a.source < b.source AND levenshtein(a.source, b.source) <= 1
ORDER BY s1, s2
"""


@register("fuzzy_source_match", _FUZZY_MATCH_SQL)
def fuzzy_source_match_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Record linkage by edit distance: near-identical source names
    (levenshtein <= 1) — the dedup move for entity/metadata columns
    rather than content. The DISTINCT shrinks each side to unique keys
    BEFORE the quadratic comparison, so the crossJoin is over the key
    dictionary (tiny), never the corpus; at larger dictionaries the
    blocking trick is the SimHash/MinHash banding already in
    operators/dedup.py."""
    docs = load_table(spark, sf_dir, "documents")
    src = docs.select("source").distinct()
    a = src.select(F.col("source").alias("s1"))
    b = src.select(F.col("source").alias("s2"))
    return (
        a.crossJoin(b)
        .filter(F.col("s1") < F.col("s2"))
        .withColumn("edit_dist", F.levenshtein("s1", "s2").cast("int"))
        .filter(F.col("edit_dist") <= 1)
        .orderBy("s1", "s2")
    )


_MULTISET_SETOPS_SQL = """
WITH h1 AS (SELECT o_custkey FROM orders
            WHERE o_orderdate < TIMESTAMP '1998-01-01'),
     h2 AS (SELECT o_custkey FROM orders
            WHERE o_orderdate >= TIMESTAMP '1998-01-01')
SELECT
  (SELECT CAST(count(*) AS BIGINT) FROM (SELECT * FROM h1 EXCEPT ALL SELECT * FROM h2))
    AS n_except_all,
  (SELECT CAST(count(*) AS BIGINT) FROM (SELECT * FROM h1 INTERSECT ALL SELECT * FROM h2))
    AS n_intersect_all
"""


@register("multiset_setops", _MULTISET_SETOPS_SQL)
def multiset_setops_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL / INTERSECT ALL — multiset semantics (each occurrence
    counts), vs segment_setops' distinct INTERSECT. Spark plans both as
    a single aggregate of signed counts per key, not a join per
    duplicate — one shuffle each."""
    orders = load_table(spark, sf_dir, "orders")
    cut = F.lit("1998-01-01").cast("timestamp")
    h1 = orders.filter(F.col("o_orderdate") < cut).select("o_custkey")
    h2 = orders.filter(F.col("o_orderdate") >= cut).select("o_custkey")
    ex = h1.exceptAll(h2).count()
    inter = h1.intersectAll(h2).count()
    return spark.createDataFrame(
        [(ex, inter)], "n_except_all long, n_intersect_all long"
    )


_FK_INTEGRITY_SQL = """
SELECT
  (SELECT CAST(count(*) AS BIGINT) FROM lineitem l
   WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))
    AS orphan_lineitems,
  (SELECT CAST(count(*) AS BIGINT) FROM orders o
   WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
    AS orphan_orders,
  (SELECT CAST(count(*) AS BIGINT) FROM customer c
   WHERE NOT EXISTS (SELECT 1 FROM nation n WHERE n.n_nationkey = c.c_nationkey))
    AS orphan_customers,
  (SELECT CAST(count(*) AS BIGINT) FROM lineitem
   WHERE l_quantity IS NULL OR l_extendedprice IS NULL OR l_discount IS NULL)
    AS null_measures
"""


@register("fk_integrity", _FK_INTEGRITY_SQL)
def fk_integrity_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit (the dbt-test shape a pipeline runs
    before trusting a drop of data): each orphan count is a left_anti
    join — at scale the dim side broadcasts or co-partitions, and a
    non-zero count is the alarm, so the query stays cheap precisely
    when the data is healthy."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    orphan_li = li.join(
        orders.select(F.col("o_orderkey").alias("l_orderkey")), "l_orderkey",
        "left_anti",
    ).count()
    orphan_o = orders.join(
        cust.select(F.col("c_custkey").alias("o_custkey")), "o_custkey",
        "left_anti",
    ).count()
    orphan_c = cust.join(
        F.broadcast(nation.select(F.col("n_nationkey").alias("c_nationkey"))),
        "c_nationkey", "left_anti",
    ).count()
    nulls = li.filter(
        F.col("l_quantity").isNull()
        | F.col("l_extendedprice").isNull()
        | F.col("l_discount").isNull()
    ).count()
    return spark.createDataFrame(
        [(orphan_li, orphan_o, orphan_c, nulls)],
        "orphan_lineitems long, orphan_orders long, "
        "orphan_customers long, null_measures long",
    )


_EVENTS_OUTLIERS_SQL = """
WITH stats AS (
  SELECT event_type, avg(value) AS mu, stddev_samp(value) AS sigma
  FROM events GROUP BY 1
)
SELECT e.event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CASE WHEN round((e.value - s.mu) / s.sigma, 6) > 3.0
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
       round(max((e.value - s.mu) / s.sigma), 6) AS max_zscore
FROM events e JOIN stats s ON e.event_type = s.event_type
GROUP BY 1 ORDER BY 1
"""


@register("events_outliers", _EVENTS_OUTLIERS_SQL)
def events_outliers_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-score outlier monitoring per event type (stddev_samp — the
    variance family's gate). Two passes over events: per-type moments
    (partial-agg shuffle on ~5 groups), broadcast back, then a map-side
    z-score + one more tiny aggregate. The z-score rounds to 6dp before
    the 3-sigma comparison so the kept set is engine-identical."""
    ev = load_table(spark, sf_dir, "events")
    stats = ev.groupBy("event_type").agg(
        F.avg("value").alias("__mu"), F.stddev_samp("value").alias("__sigma")
    )
    z = (F.col("value") - F.col("__mu")) / F.col("__sigma")
    return (
        ev.join(F.broadcast(stats), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(
                F.when(F.round(z, 6) > 3.0, 1).otherwise(0)
            ).cast("long").alias("n_outliers"),
            F.round(F.max(z), 6).alias("max_zscore"),
        )
        .orderBy("event_type")
    )


_RANK_TIES_SQL = """
WITH daily AS (
  SELECT l_returnflag, CAST(l_quantity AS INT) AS qty, count(*) AS n
  FROM lineitem GROUP BY 1, 2
), ranked AS (
  SELECT l_returnflag, qty, n,
         CAST(rank() OVER (PARTITION BY l_returnflag ORDER BY n DESC) AS INT)
           AS rnk,
         CAST(dense_rank() OVER (PARTITION BY l_returnflag ORDER BY n DESC) AS INT)
           AS drnk
  FROM daily
)
SELECT l_returnflag, qty, n, rnk, drnk
FROM ranked WHERE drnk <= 3
ORDER BY l_returnflag, drnk, qty
"""


@register("quantity_rank_ties", _RANK_TIES_SQL)
def quantity_rank_ties_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank vs dense_rank under ties (the remaining rank-family pair:
    equal counts share a rank, rank leaves gaps, dense_rank doesn't).
    Ordering by the non-unique count makes ties real; the output key
    set is still deterministic because the filter is on dense_rank and
    the final sort includes qty."""
    li = load_table(spark, sf_dir, "lineitem")
    daily = li.groupBy(
        "l_returnflag", F.col("l_quantity").cast("int").alias("qty")
    ).agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("l_returnflag").orderBy(F.desc("n"))
    return (
        daily.withColumn("rnk", F.rank().over(w).cast("int"))
        .withColumn("drnk", F.dense_rank().over(w).cast("int"))
        .filter(F.col("drnk") <= 3)
        .orderBy("l_returnflag", "drnk", "qty")
    )


# --------------------------------------------------------------------------
# (The former *_exhaustive / *_exact / *_md5 exactness twins are folded
# into the canonical gate names above — VERDICT r2 item 1: the sampled
# names themselves now run exactness-mode parameterizations under full
# oracles, and the production approximate parameterizations are pinned by
# recall tests in tests/test_ann.py and tests/test_dedup.py.)
# --------------------------------------------------------------------------
# Skew-mitigation + maintenance gates (VERDICT r1 items 5-6)
# --------------------------------------------------------------------------

_COHORT_SALTED_SQL = """
SELECT CAST(user_id % 10 AS INT) AS cohort,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(round(sum(CAST(value AS DECIMAL(28,8))), 2) AS DOUBLE) AS total_value
FROM events GROUP BY 1 ORDER BY 1
"""


@register("events_cohort_salted", _COHORT_SALTED_SQL)
def events_cohort_salted_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted-join correctness gate: the events fact joins its per-user
    dim through `salted_join` (skewed side salted over 8 buckets, dim
    side exploded ×8), then aggregates per cohort. Salting must be
    result-invariant — the oracle computes the same aggregate with no
    join at all, so any row lost/duplicated by the salt machinery
    hash-fails. Decimal-cast before the float sum: group sums land on
    the 2dp boundary otherwise (NOTES.md)."""
    from weaviate_txtai_spark.operators.skew import salted_join

    ev = load_table(spark, sf_dir, "events")
    dim = (
        ev.select("user_id")
        .distinct()
        .withColumn("cohort", F.pmod("user_id", F.lit(10)).cast("int"))
    )
    joined = salted_join(ev.select("user_id", "value"), dim, "user_id",
                         salt_factor=8, seed=7)
    return (
        joined.groupBy("cohort")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(28,8)")), 2)
            .cast("double")
            .alias("total_value"),
        )
        .orderBy("cohort")
    )


# --------------------------------------------------------------------------
# TPC-H Q21 analogue: sole-fault supplier (EXISTS + NOT EXISTS pair)
# --------------------------------------------------------------------------

_SOLE_FAULT_SQL = """
SELECT s.s_name, CAST(count(*) AS BIGINT) AS n_sole_fault
FROM supplier s
JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
JOIN orders o ON o.o_orderkey = l1.l_orderkey
WHERE o.o_orderstatus = 'F'
  AND l1.l_returnflag = 'R'
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_returnflag = 'R')
GROUP BY s.s_name
ORDER BY n_sole_fault DESC, s.s_name
LIMIT 20
"""


@register("sole_fault_supplier", _SOLE_FAULT_SQL)
def sole_fault_supplier_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers who were the SOLE return-flagged
    supplier in multi-supplier finished orders — the classic correlated
    EXISTS + NOT EXISTS pair against the same fact table.

    The oracle keeps the textbook subquery form (the spec); the engine
    runs the aggregate DECORRELATION: one pass over lineitem computes
    both subqueries at once per order (distinct suppliers ≥ 2 ⇔ the
    EXISTS; distinct R-flagged suppliers == 1 ⇔ the NOT EXISTS, given
    l1 itself is R-flagged) — two correlated scans of the fact table
    collapse into one groupBy(orderkey) partial agg plus one equi-join
    back, the rewrite that matters when lineitem is the 100 TB table."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supplier = load_table(spark, sf_dir, "supplier")
    per_order = li.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(
            F.when(F.col("l_returnflag") == "R", F.col("l_suppkey"))
        ).alias("n_r_supp"),
    )
    faulted = (
        li.filter(F.col("l_returnflag") == "R")
        .join(
            orders.filter(F.col("o_orderstatus") == "F").select("o_orderkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(per_order, "l_orderkey")
        .filter((F.col("n_supp") >= 2) & (F.col("n_r_supp") == 1))
    )
    return (
        faulted.join(
            F.broadcast(supplier.select("s_suppkey", "s_name")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("n_sole_fault"))
        .orderBy(F.desc("n_sole_fault"), F.asc("s_name"))
        .limit(20)
    )


# --------------------------------------------------------------------------
# TPC-H Q13/Q22 analogues: custdist double-agg, scalar-subquery anti-join
# --------------------------------------------------------------------------

_CUSTDIST_SQL = """
SELECT c_count, CAST(count(*) AS BIGINT) AS custdist FROM (
  SELECT c.c_custkey, CAST(count(o.o_orderkey) AS BIGINT) AS c_count
  FROM customer c LEFT JOIN orders o
    ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
  GROUP BY c.c_custkey
) GROUP BY c_count ORDER BY custdist DESC, c_count DESC
"""


@register("customer_order_counts", _CUSTDIST_SQL)
def customer_order_counts_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape (o_comment predicate adapted to the testdata's
    o_orderpriority): LEFT join with an ON-clause predicate on the
    right side (NOT a WHERE filter — that would turn the join inner and
    drop zero-order customers), then two stacked aggregations. Both
    aggs partial map-side; the join shuffles on custkey once."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


_SALES_OPPORTUNITY_SQL = """
WITH pos AS (
  SELECT avg(c_acctbal) AS a FROM customer
  WHERE c_acctbal > 0.0 AND c_nationkey % 5 IN (0, 1, 2)
)
SELECT c_nationkey % 5 AS cntrycode,
       CAST(count(*) AS BIGINT) AS numcust,
       round(sum(c_acctbal), 2) AS totacctbal
FROM customer c, pos
WHERE c_nationkey % 5 IN (0, 1, 2)
  AND c_acctbal > pos.a
  AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                  AND o.o_orderdate >= TIMESTAMP '1999-01-01')
GROUP BY 1 ORDER BY 1
"""


@register("global_sales_opportunity", _SALES_OPPORTUNITY_SQL)
def global_sales_opportunity_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (cntrycode adapted to nationkey buckets,
    "never ordered" adapted to "no order since 1999" — the testdata
    generator gives EVERY customer at least one order, so the literal
    Q22 anti-join was empty at every SF and the gate vacuous,
    VERDICT r5 guard): scalar-subquery threshold (one broadcast scalar,
    not a per-row correlated subquery), anti-join against the
    date-filtered orders (never a NOT IN — null-hostile and
    unplannable as a hash join; the filter prunes the anti side BEFORE
    the shuffle), final small agg."""
    c = load_table(spark, sf_dir, "customer").withColumn(
        "cntrycode", F.col("c_nationkey") % 5
    ).filter(F.col("cntrycode").isin(0, 1, 2))
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp")
    )
    avg_bal = c.filter(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("a")
    )
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("a"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("cntrycode")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )


# --------------------------------------------------------------------------
# Event-sequence analytics: conversion funnel + retention matrix
# --------------------------------------------------------------------------

_FUNNEL_SQL = """
WITH v AS (
  SELECT user_id, min(ts) AS t1 FROM events WHERE event_type = 'view'
  GROUP BY 1
),
c AS (
  SELECT e.user_id, min(e.ts) AS t2
  FROM events e JOIN v ON e.user_id = v.user_id
  WHERE e.event_type = 'click' AND e.ts > v.t1 GROUP BY 1
),
p AS (
  SELECT e.user_id, min(e.ts) AS t3
  FROM events e JOIN c ON e.user_id = c.user_id
  WHERE e.event_type = 'purchase' AND e.ts > c.t2 GROUP BY 1
)
SELECT stage, users FROM (
  SELECT 1 AS ord, 'view' AS stage, CAST(count(*) AS BIGINT) AS users FROM v
  UNION ALL
  SELECT 2, 'click', CAST(count(*) AS BIGINT) FROM c
  UNION ALL
  SELECT 3, 'purchase', CAST(count(*) AS BIGINT) FROM p
) ORDER BY ord
"""


@register("events_funnel", _FUNNEL_SQL)
def events_funnel_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel (view → click → purchase, strictly
    increasing timestamps): stage k's cohort is users whose earliest
    stage-k event follows their stage-(k-1) anchor time. Three
    filtered min-aggs chained by equi-joins on user_id — each stage's
    frame shrinks, every agg is map-side partial; no window over the
    raw event stream, no per-user sort."""
    ev = load_table(spark, sf_dir, "events")
    v = ev.filter(F.col("event_type") == "view").groupBy("user_id").agg(
        F.min("ts").alias("t1")
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    spark_ = v.sparkSession
    rows = []
    for ord_, stage, df in ((1, "view", v), (2, "click", c), (3, "purchase", p)):
        rows.append(
            df.agg(
                F.lit(ord_).alias("ord"),
                F.lit(stage).alias("stage"),
                F.count(F.lit(1)).cast("long").alias("users"),
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out.orderBy("ord").select("stage", "users")


_RETENTION_SQL = """
WITH first AS (
  SELECT user_id, CAST(date_trunc('week', min(ts)) AS DATE) AS cohort_week
  FROM events GROUP BY 1
)
SELECT f.cohort_week,
       CAST(date_diff('day', f.cohort_week,
                      CAST(date_trunc('week', e.ts) AS DATE)) / 7 AS INT)
         AS week_offset,
       CAST(count(DISTINCT e.user_id) AS BIGINT) AS active_users
FROM events e JOIN first f ON e.user_id = f.user_id
GROUP BY 1, 2 ORDER BY 1, 2
"""


@register("events_retention", _RETENTION_SQL)
def events_retention_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-activity week,
    counted distinct in each subsequent week offset. One agg for the
    cohort anchor, one fact join on user_id, one count-distinct agg —
    the join shuffles on user_id (the natural key); week arithmetic is
    date_trunc/datediff, identical across engines when both truncate
    to Monday."""
    ev = load_table(spark, sf_dir, "events")
    first = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).cast("date").alias("cohort_week")
    )
    return (
        ev.join(first, "user_id")
        .select(
            "cohort_week",
            (
                F.datediff(
                    F.date_trunc("week", F.col("ts")).cast("date"),
                    F.col("cohort_week"),
                )
                / 7
            ).cast("int").alias("week_offset"),
            "user_id",
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.count_distinct("user_id").cast("long").alias("active_users"))
        .orderBy("cohort_week", "week_offset")
    )


# --------------------------------------------------------------------------
# TPC-H Q5/Q8 analogues: local-supplier volume, nation market share
# --------------------------------------------------------------------------

_LOCAL_SUPPLIER_SQL = """
SELECT n.n_name,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
               AND c.c_nationkey = s.s_nationkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
  AND o.o_orderdate >= DATE '1996-01-01'
  AND o.o_orderdate < DATE '1998-01-01'
GROUP BY n.n_name ORDER BY revenue DESC, n.n_name
"""


@register("local_supplier_volume", _LOCAL_SUPPLIER_SQL)
def local_supplier_volume_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5: the six-table star join with the extra
    customer-nation == supplier-nation constraint (revenue served by
    LOCAL suppliers). The nation/region dims broadcast; the
    c_nationkey = s_nationkey predicate rides the supplier join (an
    extra equi-condition, not a post-filter), so the join output never
    carries cross-nation pairs."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1998-01-01")
    )
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            s,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("n_name"))
    )


_MARKET_SHARE_SQL = """
WITH all_orders AS (
  SELECT CAST(year(o.o_orderdate) AS INT) AS o_year,
         l.l_extendedprice * (1 - l.l_discount) AS volume,
         s.s_nationkey
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN part p ON l.l_partkey = p.p_partkey
  WHERE p.p_type = 'STANDARD'
)
SELECT o_year,
       round(sum(CASE WHEN s_nationkey = 7 THEN volume ELSE 0 END)
             / sum(volume), 6) AS mkt_share
FROM all_orders GROUP BY o_year ORDER BY o_year
"""


@register("nation_market_share", _MARKET_SHARE_SQL)
def nation_market_share_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's share of yearly trade volume in a
    part segment — conditional-sum / total-sum per group, one
    aggregation after the restricted fact join (the part filter prunes
    the fact FIRST; nation never joins at all, the share condition is a
    key comparison)."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    s = load_table(spark, sf_dir, "supplier")
    # p_type = 'STANDARD' — a value the generator actually produces
    # (VERDICT r5 #2: the TPC-H-literal '%BRASS%' matched 0 parts at every
    # scale factor, so the gate verified nothing)
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_type") == "STANDARD"
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .select(
            F.year("o_orderdate").cast("int").alias("o_year"),
            vol.alias("volume"),
            "s_nationkey",
        )
        .groupBy("o_year")
        .agg(
            F.round(
                F.sum(
                    F.when(F.col("s_nationkey") == 7, F.col("volume"))
                    .otherwise(F.lit(0.0))
                )
                / F.sum("volume"),
                6,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


# --------------------------------------------------------------------------
# SCD2 dimension merge (operators/scd.py)
# --------------------------------------------------------------------------

_SCD2_SQL = """
WITH hist AS (
  SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment,
         DATE '1995-01-01' AS valid_from, CAST(NULL AS DATE) AS valid_to
  FROM customer
),
ch AS (
  SELECT c_custkey, 'DELINQUENT' AS new_seg, DATE '2000-01-01' AS eff
  FROM customer WHERE c_acctbal < 0
)
SELECT * FROM (
  SELECT h.c_custkey, h.c_name, h.c_nationkey, h.c_acctbal,
         h.c_mktsegment, h.valid_from, h.valid_to
  FROM hist h LEFT JOIN ch ON h.c_custkey = ch.c_custkey
  WHERE ch.c_custkey IS NULL OR h.c_mktsegment = ch.new_seg
  UNION ALL
  SELECT h.c_custkey, h.c_name, h.c_nationkey, h.c_acctbal,
         h.c_mktsegment, h.valid_from, ch.eff
  FROM hist h JOIN ch ON h.c_custkey = ch.c_custkey
  WHERE h.c_mktsegment <> ch.new_seg
  UNION ALL
  SELECT h.c_custkey, h.c_name, h.c_nationkey, h.c_acctbal,
         ch.new_seg, ch.eff, CAST(NULL AS DATE)
  FROM hist h JOIN ch ON h.c_custkey = ch.c_custkey
  WHERE h.c_mktsegment <> ch.new_seg
) ORDER BY c_custkey, valid_from
"""


@register("customer_scd2", _SCD2_SQL)
def customer_scd2_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type-2 merge (operators/scd.py): the
    MERGE INTO semantics a lakehouse format would run, as set ops —
    negative-balance customers move to a DELINQUENT segment effective
    2000-01-01; their open versions close, new open versions append,
    everyone else passes through untouched. One equi-join of the open
    slice against the (broadcastable) change batch + one union."""
    from weaviate_txtai_spark.operators.scd import scd2_apply

    cust = load_table(spark, sf_dir, "customer")
    history = cust.withColumn(
        "valid_from", F.lit("1995-01-01").cast("date")
    ).withColumn("valid_to", F.lit(None).cast("date"))
    changes = cust.filter(F.col("c_acctbal") < 0).select(
        "c_custkey",
        F.lit("DELINQUENT").alias("c_mktsegment"),
        F.lit("2000-01-01").cast("date").alias("effective_date"),
    )
    return scd2_apply(
        history,
        changes,
        key_cols=["c_custkey"],
        compare_cols=["c_mktsegment"],
    ).orderBy("c_custkey", "valid_from")


@register("events_hourly_incremental", _EVENTS_HOURLY_SQL)
def events_hourly_incremental_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-aggregate maintenance: the hourly rollup
    computed as OLD-partition partials merged with NEW-batch partials
    (union + one re-agg over the partial rows — never a rescan of the
    old raw events), gated equal to the full recompute. This is the
    batch form of what the streaming hourly agg's state store does, and
    the 100 TB refresh pattern: the merged agg's input is O(groups),
    not O(events). Partial sums stay unrounded until the final merge so
    the result is bit-stable against the one-shot aggregation."""
    from weaviate_txtai_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    split = F.lit("2024-01-15 00:00:00").cast("timestamp")

    def partial(df: DataFrame) -> DataFrame:
        return (
            df.groupBy(
                F.year("ts").alias("y"),
                F.month("ts").alias("m"),
                F.dayofmonth("ts").alias("d"),
                F.hour("ts").alias("h"),
                "event_type",
            )
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.sum("value").alias("__sum_raw"),
            )
        )

    old_part = partial(ev.filter(F.col("ts") < split))
    new_part = partial(ev.filter(F.col("ts") >= split))
    return (
        old_part.unionByName(new_part)
        .groupBy("y", "m", "d", "h", "event_type")
        .agg(
            F.sum("n_events").cast("long").alias("n_events"),
            F.round(F.sum("__sum_raw"), 4).alias("sum_value"),
        )
    )


_TRANSITIONS_SQL = """
WITH seq AS (
  SELECT user_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev_type
  FROM events
),
pairs AS (
  SELECT prev_type, event_type, CAST(count(*) AS BIGINT) AS n
  FROM seq WHERE prev_type IS NOT NULL GROUP BY 1, 2
),
tot AS (SELECT prev_type, sum(n) AS t FROM pairs GROUP BY 1)
SELECT p.prev_type, p.event_type, p.n,
       round(p.n * 1.0 / tot.t, 6) AS prob
FROM pairs p JOIN tot USING (prev_type)
ORDER BY p.prev_type, p.event_type
"""


@register("event_transitions", _TRANSITIONS_SQL)
def event_transitions_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: lag() within (user, time) order, pair counts, row-
    normalized probabilities. One window shuffle on user_id + two small
    aggs — the journey-analysis primitive behind funnel diagnostics and
    synthetic-session generators. Ties at identical timestamps break on
    event_id so the sequence (and the matrix) is deterministic."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        "event_type",
        F.lag("event_type").over(w).alias("prev_type"),
    ).filter(F.col("prev_type").isNotNull())
    pairs = seq.groupBy("prev_type", "event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    tot = pairs.groupBy("prev_type").agg(F.sum("n").alias("t"))
    return (
        pairs.join(tot, "prev_type")
        .select(
            "prev_type",
            "event_type",
            "n",
            F.round(F.col("n") / F.col("t"), 6).alias("prob"),
        )
        .orderBy("prev_type", "event_type")
    )


_SESSION_WINDOW_SQL = """
WITH ordered AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   IS NULL OR
                   ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   >= INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_session
  FROM events
), sessions AS (
  SELECT user_id, ts,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS session_id
  FROM ordered
)
SELECT user_id, CAST(epoch_us(min(ts)) AS BIGINT) AS session_start_us,
       CAST(count(*) AS BIGINT) AS n_events
FROM sessions GROUP BY user_id, session_id ORDER BY 1, 2
"""


@register("events_session_window", _SESSION_WINDOW_SQL)
def events_session_window_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native `session_window` sessions (one row PER SESSION, vs
    events_sessionize's per-user rollup of the lag-gap composition).
    The built-in operator matters because the SAME expression runs
    under Structured Streaming with state-store merging — the lag-gap
    window cannot. Boundary semantics pinned against the oracle: Spark
    session windows are [start, last+gap), so an event exactly `gap`
    after its predecessor STARTS A NEW session (the oracle splits on
    `>= INTERVAL`, not `>` — a boundary an equality-blind test would
    never catch). Start emitted as unix micros (engine-neutral)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            "user_id", F.session_window("ts", "30 minutes").alias("w")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_events"))
        .select(
            "user_id",
            F.unix_micros(F.col("w.start")).alias("session_start_us"),
            "n_events",
        )
        .orderBy("user_id", "session_start_us")
    )


_CORRELATIONS_SQL = """
SELECT round(corr(l_quantity, l_extendedprice), 6) AS qty_price,
       round(corr(l_extendedprice, l_discount), 6) AS price_discount,
       round(corr(l_quantity, l_tax), 6) AS qty_tax,
       round(covar_pop(l_quantity, l_extendedprice), 4) AS qty_price_cov
FROM lineitem
"""


@register("lineitem_correlations", _CORRELATIONS_SQL)
def lineitem_correlations_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise correlation / population covariance over the fact's
    numeric columns — the statistical-profiling companion to
    lineitem_profile (schema-shape vs relationship-shape). One partial
    aggregation pass; corr/covar are mergeable moments, so the plan is
    the same map-side-combine shuffle as any sum."""
    l = load_table(spark, sf_dir, "lineitem")
    return l.agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("qty_price"),
        F.round(F.corr("l_extendedprice", "l_discount"), 6).alias(
            "price_discount"
        ),
        F.round(F.corr("l_quantity", "l_tax"), 6).alias("qty_tax"),
        F.round(F.covar_pop("l_quantity", "l_extendedprice"), 4).alias(
            "qty_price_cov"
        ),
    )


_ASOF_FORWARD_SQL = """
WITH c AS (SELECT event_id, user_id, ts FROM events
           WHERE event_type = 'click'),
     p AS (SELECT user_id, ts, value AS purchase_value FROM events
           WHERE event_type = 'purchase')
SELECT c.event_id, c.user_id,
       round(coalesce(p.purchase_value, 0), 4) AS purchase_value,
       coalesce(epoch_us(p.ts) - epoch_us(c.ts), -1) AS gap_us
FROM c ASOF LEFT JOIN p ON c.user_id = p.user_id AND c.ts <= p.ts
ORDER BY c.event_id
"""


@register("events_asof_forward", _ASOF_FORWARD_SQL)
def events_asof_forward_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join (next-outcome attribution): for every click,
    the user's first purchase at-or-after it. Same union+window plan as
    the backward gate with the frame flipped to [current, following];
    DuckDB's ASOF with `<=` is the oracle."""
    from weaviate_txtai_spark.operators.asof import asof_join

    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("value").alias("purchase_value")
    )
    joined = asof_join(
        clicks, purchases, on=["user_id"], direction="forward"
    )
    return (
        joined.select(
            "event_id",
            "user_id",
            F.round(F.coalesce("purchase_value", F.lit(0.0)), 4).alias(
                "purchase_value"
            ),
            F.coalesce(
                F.unix_micros("matched_ts") - F.unix_micros("ts"),
                F.lit(-1),
            ).alias("gap_us"),
        )
        .orderBy("event_id")
    )


_SEASONAL_OUTLIERS_SQL = """
WITH coh AS (
  SELECT dayofweek(ts) AS dow, hour(ts) AS hod,
         avg(value) AS mu, stddev_samp(value) AS sd
  FROM events GROUP BY 1, 2
)
SELECT e.event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CASE WHEN abs(e.value - coh.mu) > 3 * coh.sd
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
FROM events e
JOIN coh ON dayofweek(e.ts) = coh.dow AND hour(e.ts) = coh.hod
GROUP BY 1 ORDER BY 1
"""


@register("events_seasonal_outliers", _SEASONAL_OUTLIERS_SQL)
def events_seasonal_outliers_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-baseline anomaly counts: each event scored against its
    (day-of-week, hour) cohort's mean/stddev instead of the global
    moments (events_outliers) — the shape that catches a value normal
    at peak hours but anomalous at 3am. One tiny cohort agg (≤ 168
    rows, broadcast back) + one pass over the fact. dayofweek parity:
    Spark and DuckDB both number Sunday=1."""
    ev = load_table(spark, sf_dir, "events")
    coh = ev.groupBy(
        F.dayofweek("ts").alias("dow"), F.hour("ts").alias("hod")
    ).agg(
        F.avg("value").alias("mu"), F.stddev_samp("value").alias("sd")
    )
    return (
        ev.withColumn("dow", F.dayofweek("ts"))
        .withColumn("hod", F.hour("ts"))
        .join(F.broadcast(coh), ["dow", "hod"])
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum(
                F.when(
                    F.abs(F.col("value") - F.col("mu")) > 3 * F.col("sd"),
                    F.lit(1),
                ).otherwise(F.lit(0))
            ).cast("long").alias("n_outliers"),
        )
        .orderBy("event_type")
    )


_UNPIVOT_SQL = """
SELECT measure, round(sum(val), 2) AS total, CAST(count(*) AS BIGINT) AS n
FROM (
  SELECT l_quantity AS quantity, l_extendedprice AS extendedprice,
         l_discount AS discount, l_tax AS tax
  FROM lineitem
) UNPIVOT (val FOR measure IN (quantity, extendedprice, discount, tax))
GROUP BY measure ORDER BY measure
"""


@register("lineitem_unpivot", _UNPIVOT_SQL)
def lineitem_unpivot_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long reshape (unpivot/melt) + per-measure rollup: the
    inverse of events_pivot, the missing reshape direction. Spark's
    native unpivot keeps it map-only before the single agg shuffle."""
    l = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_quantity").alias("quantity"),
        F.col("l_extendedprice").alias("extendedprice"),
        F.col("l_discount").alias("discount"),
        F.col("l_tax").alias("tax"),
    )
    return (
        l.unpivot(
            [], ["quantity", "extendedprice", "discount", "tax"],
            "measure", "val",
        )
        .groupBy("measure")
        .agg(
            F.round(F.sum("val"), 2).alias("total"),
            F.count(F.lit(1)).cast("long").alias("n"),
        )
        .orderBy("measure")
    )


_WOW_RETENTION_SQL = """
WITH uw AS (
  SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS wk
  FROM events
)
SELECT a.wk,
       CAST(count(*) AS BIGINT) AS active_users,
       CAST(count(b.user_id) AS BIGINT) AS retained_next_week,
       round(count(b.user_id) * 1.0 / count(*), 6) AS retention
FROM uw a
LEFT JOIN uw b ON b.user_id = a.user_id AND b.wk = a.wk + INTERVAL 7 DAY
GROUP BY a.wk ORDER BY a.wk
"""


@register("events_wow_retention", _WOW_RETENTION_SQL)
def events_wow_retention_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-over-week retention: of each week's active users, the share
    also active the NEXT week (churn's complement — the consecutive-
    activity shape, vs events_retention's full cohort matrix). One
    distinct user-week set self-joined on (user, week+7d); both sides
    shuffle once on user_id."""
    ev = load_table(spark, sf_dir, "events")
    uw = ev.select(
        "user_id", F.date_trunc("week", "ts").cast("date").alias("wk")
    ).distinct()
    nxt = uw.select(
        F.col("user_id"),
        F.date_sub(F.col("wk"), 7).alias("wk"),
        F.lit(1).alias("__next"),
    )
    return (
        uw.join(nxt, ["user_id", "wk"], "left")
        .groupBy("wk")
        .agg(
            F.count(F.lit(1)).cast("long").alias("active_users"),
            F.sum(F.coalesce(F.col("__next"), F.lit(0)))
            .cast("long").alias("retained_next_week"),
            F.round(
                F.sum(F.coalesce(F.col("__next"), F.lit(0)))
                / F.count(F.lit(1)),
                6,
            ).alias("retention"),
        )
        .orderBy("wk")
    )


_EVENTS_RESAMPLE_SQL = """
WITH agg AS (
  SELECT event_type, date_trunc('hour', ts) AS bucket_ts,
         CAST(count(*) AS BIGINT) AS n_events,
         round(avg(CAST(round(value * 100) AS BIGINT)), 6) AS avg_value
  FROM events GROUP BY 1, 2),
spans AS (
  SELECT event_type, min(bucket_ts) AS lo, max(bucket_ts) AS hi
  FROM agg GROUP BY 1),
grid AS (
  SELECT event_type,
         unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bucket_ts
  FROM spans)
SELECT g.event_type, g.bucket_ts,
       CAST(COALESCE(a.n_events, 0) AS BIGINT) AS n_events,
       round(last_value(a.avg_value IGNORE NULLS) OVER (
         PARTITION BY g.event_type ORDER BY g.bucket_ts
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) / 100, 6)
         AS filled_value,
       (a.n_events IS NULL) AS is_gap
FROM grid g
LEFT JOIN agg a ON a.event_type = g.event_type AND a.bucket_ts = g.bucket_ts
ORDER BY 1, 2
"""


@register("events_resample", _EVENTS_RESAMPLE_SQL)
def events_resample_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-grid resample + forward fill (operators/resample.py): each
    event_type's irregular events land on its own dense hourly grid —
    gap buckets carry n_events=0, a NULL hourly average, and the last
    known average forward-filled. One aggregation shuffle over the
    events; the grid is sequence/explode over per-key span rows, never
    a driver loop. The feature-regularization step before any
    sequence model."""
    from weaviate_txtai_spark.operators.resample import resample_ffill

    ev = load_table(spark, sf_dir, "events").withColumn(
        # aggregate EXACT integer cents, not raw doubles: avg(double) is
        # accumulation-order-dependent, and at sf0.1 one bucket's mean
        # landed within 1 ulp of a round-6 boundary — Spark and DuckDB
        # rounded opposite ways. Integer cents make the mean an exact
        # rational, so both engines compute the identical double (the
        # standard money-column discipline; the source values are
        # 2-decimal by construction).
        "value_cents", F.round(F.col("value") * 100).cast("long")
    )
    out = resample_ffill(
        ev, keys=["event_type"], ts_col="ts", value_col="value_cents",
        unit="hour",
    )
    # NULL-free projection for the hash compare: filled_value is never
    # NULL (each key's grid starts at its first event) and is_gap
    # carries exactly the information of avg_value's gap-NULL
    return out.drop("avg_value").withColumn(
        "filled_value", F.round(F.col("filled_value") / 100, 6)
    )


_ORDERS_DIFF_SQL = """
WITH old AS (
  SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority
  FROM orders WHERE o_orderkey % 11 <> 3),
new AS (
  SELECT o_orderkey, o_orderstatus,
         CASE WHEN o_orderkey % 5 = 0 THEN round(o_totalprice * 1.1, 2)
              ELSE o_totalprice END AS o_totalprice,
         CASE WHEN o_orderkey % 13 = 0 THEN '0-RUSH' ELSE o_orderpriority
              END AS o_orderpriority
  FROM orders WHERE o_orderkey % 11 <> 7)
SELECT COALESCE(n.o_orderkey, o.o_orderkey) AS o_orderkey,
       CASE WHEN o.o_orderkey IS NULL THEN 'added'
            WHEN n.o_orderkey IS NULL THEN 'removed'
            ELSE 'changed' END AS change,
       CASE WHEN o.o_orderkey IS NULL OR n.o_orderkey IS NULL THEN ''
            ELSE array_to_string(list_sort([c FOR c IN [
              CASE WHEN o.o_orderpriority IS DISTINCT FROM n.o_orderpriority
                   THEN 'o_orderpriority' END,
              CASE WHEN o.o_orderstatus IS DISTINCT FROM n.o_orderstatus
                   THEN 'o_orderstatus' END,
              CASE WHEN o.o_totalprice IS DISTINCT FROM n.o_totalprice
                   THEN 'o_totalprice' END] IF c IS NOT NULL]), ',')
       END AS changed_cols
FROM old o FULL OUTER JOIN new n ON o.o_orderkey = n.o_orderkey
WHERE o.o_orderkey IS NULL OR n.o_orderkey IS NULL
   OR o.o_orderstatus IS DISTINCT FROM n.o_orderstatus
   OR o.o_totalprice IS DISTINCT FROM n.o_totalprice
   OR o.o_orderpriority IS DISTINCT FROM n.o_orderpriority
ORDER BY 1
"""


@register("orders_snapshot_diff", _ORDERS_DIFF_SQL)
def orders_snapshot_diff_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot reconciliation (operators/diff.py table_diff): two
    deterministic full extracts of orders (old drops keys ≡3 mod 11;
    new drops ≡7 mod 11, bumps totalprice on ≡0 mod 5, rewrites
    priority on ≡0 mod 13) diffed into the typed delta that would feed
    scd2_apply — added/removed/changed with the changed column names.
    One full-outer join, all change logic codegen; unchanged rows never
    leave the join.

    Gate boundary projects the typed ``array<string>`` to a
    comma-joined scalar: the driver's pandas canonicalizer cannot hash
    list cells (VERDICT r6 #1); ``table_diff`` itself keeps the typed
    API."""
    from weaviate_txtai_spark.operators.diff import table_diff

    orders = load_table(spark, sf_dir, "orders")
    base = orders.select(
        "o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority"
    )
    old = base.filter(F.col("o_orderkey") % 11 != 3)
    new = base.filter(F.col("o_orderkey") % 11 != 7).select(
        "o_orderkey",
        "o_orderstatus",
        F.when(
            F.col("o_orderkey") % 5 == 0,
            F.round(F.col("o_totalprice") * 1.1, 2),
        ).otherwise(F.col("o_totalprice")).alias("o_totalprice"),
        F.when(F.col("o_orderkey") % 13 == 0, F.lit("0-RUSH"))
        .otherwise(F.col("o_orderpriority")).alias("o_orderpriority"),
    )
    return table_diff(old, new, key_cols=["o_orderkey"]).withColumn(
        "changed_cols", F.array_join(F.col("changed_cols"), ",")
    )


_ORDER_COMPONENTS_SQL = """
SELECT CAST(o_orderkey AS BIGINT) AS node,
       CAST(min(o_orderkey) OVER (PARTITION BY o_custkey) AS BIGINT)
         AS component
FROM orders
ORDER BY node
"""


@register("order_chain_components", _ORDER_COMPONENTS_SQL)
def order_chain_components_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components via alternating large-star/small-star
    (operators/graph.py connected_components — O(log² n) rounds on ANY
    graph, vs label propagation's diameter-bounded rounds). Gate shape:
    each customer's orders are chained into a PATH graph (lead() over
    orderkey; the last order self-loops so single-order customers stay
    as singletons) — the components are then exactly the per-customer
    order sets, so the truth is closed-form in SQL (min orderkey per
    customer) while the Spark side runs the real iterative machinery
    over deep paths (the case one-hop label propagation cannot finish
    in bounded rounds; pinned in tests/test_components.py)."""
    from weaviate_txtai_spark.operators.graph import connected_components

    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
    edges = orders.select(
        F.col("o_orderkey").alias("src"),
        F.coalesce(
            F.lead("o_orderkey").over(w), F.col("o_orderkey")
        ).alias("dst"),
    )
    return connected_components(edges, max_iter=25).orderBy("node")


_ORDER_SCC_SQL = """
WITH p AS (
  SELECT o_orderkey, o_custkey,
         row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderkey)
           AS rn
  FROM orders
),
b AS (
  SELECT o_orderkey,
         count(*) OVER (PARTITION BY o_custkey, (rn - 1) // 4) AS bn,
         min(o_orderkey) OVER (PARTITION BY o_custkey, (rn - 1) // 4)
           AS bmin
  FROM p
)
SELECT CAST(o_orderkey AS BIGINT) AS node,
       CAST(CASE WHEN bn = 4 THEN bmin ELSE o_orderkey END AS BIGINT)
         AS scc
FROM b ORDER BY node
"""


@register("order_scc", _ORDER_SCC_SQL)
def order_scc_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strongly connected components via the coloring algorithm
    (operators/graph.py strongly_connected_components: trim → min-color
    → backward mark, Tarjan local finish — VERDICT r8 item 6). Gate
    shape: each customer's orders form a DIRECTED chain (lead() over
    orderkey; the last order self-loops so single-order customers stay
    as nodes), plus a back-edge from every 4th position to the order
    three positions earlier — so consecutive blocks of four orders are
    4-cycles (one SCC each, labeled by the block-min orderkey) while
    trailing partial blocks remain singletons. The truth is therefore
    closed-form in SQL (window arithmetic over positions) while the
    Spark side runs the real iterative machinery; the distributed path
    is parity-pinned against Tarjan in tests/test_components.py."""
    from weaviate_txtai_spark.operators.graph import (
        strongly_connected_components,
    )

    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
    pos = orders.select(
        F.col("o_orderkey").alias("k"),
        F.lead("o_orderkey").over(w).alias("nxt"),
        F.row_number().over(w).alias("rn"),
        F.lag("o_orderkey", 3).over(w).alias("back"),
    )
    # chain and cycle edges are emitted MAP-SIDE from each window row
    # (explode of two structs, NULL dst marking "no cycle edge here"):
    # the previous union of two `pos` selects re-planned — and re-ran —
    # the window twice (two source scans in the captured plan; r13
    # opt). Same edge multiset: chain dst is never NULL (coalesce to
    # k), the cycle struct's dst is non-NULL exactly when rn%4==0 and
    # a back-edge target exists.
    edges = pos.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("k").alias("src"),
                    F.coalesce(F.col("nxt"), F.col("k")).alias("dst"),
                ),
                F.struct(
                    F.col("k").alias("src"),
                    F.when(F.col("rn") % 4 == 0, F.col("back")).alias(
                        "dst"
                    ),
                ),
            )
        ).alias("__e")
    ).select("__e.*").filter(F.col("dst").isNotNull())
    return strongly_connected_components(edges).orderBy("node")


# --------------------------------------------------------------------------
# TPC-H Q2/Q6/Q9/Q16/Q20 analogues — the remaining decision-support shapes
# (the testdata has no partsupp/commitdate/shipmode, so Q2/Q16/Q20 derive
# the part↔supplier relation from lineitem; the SHAPES are the point:
# correlated min, filter-only agg, 5-way profit join, distinct-count with
# an exclusion list, semi-join chain).
# --------------------------------------------------------------------------

_FORECAST_REVENUE_SQL = """
SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
       CAST(count(*) AS BIGINT) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


@register("forecast_revenue", _FORECAST_REVENUE_SQL)
def forecast_revenue_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: the pure filter-and-aggregate scan. All four
    predicates push to the parquet reader (PushedFilters: shipdate
    range as min/max stats pruning, quantity/discount as row-group
    stats); only 4 columns read; no shuffle at all — the single-stage
    partial→final agg. At 100 TB this is the query that proves the
    scan path is not the bottleneck."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1997-01-01")
            & (F.col("l_shipdate") < "1998-01-01")
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


_PRODUCT_PROFIT_SQL = """
SELECT n.n_name AS nation,
       CAST(year(o.o_orderdate) AS INT) AS o_year,
       CAST(round(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                 - 0.1 * p.p_retailprice * l.l_quantity
                 AS DECIMAL(28,8))), 2) AS DOUBLE) AS profit
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN part p ON l.l_partkey = p.p_partkey
WHERE p.p_name LIKE '%gear%'
GROUP BY 1, 2
ORDER BY nation, o_year DESC
"""


@register("product_profit", _PRODUCT_PROFIT_SQL)
def product_profit_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: the widest join in the suite — fact table against
    four dimensions (orders/supplier/nation/part), profit per supplier
    nation per order year. Cost is proxied by 10% of p_retailprice
    (no partsupp.ps_supplycost in the testdata). Plan: the p_name
    filter prunes part FIRST, then part/supplier/nation broadcast (all
    small dims) so lineitem shuffles exactly once — on l_orderkey for
    the orders join; at 1000 executors that is one fact shuffle, not
    four."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    part = load_table(spark, sf_dir, "part")
    pf = part.filter(F.col("p_name").like("%gear%")).select(
        "p_partkey", "p_retailprice"
    )
    sn = supplier.join(
        F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey
    ).select("s_suppkey", "n_name")
    return (
        li.join(F.broadcast(pf), li.l_partkey == pf.p_partkey)
        .join(F.broadcast(sn), li.l_suppkey == sn.s_suppkey)
        .join(
            orders.select("o_orderkey", "o_orderdate"),
            li.l_orderkey == F.col("o_orderkey"),
        )
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(
            # decimal-cast the per-row double summand before summing:
            # a float sum's addition order differs across engines, and
            # the r10 sf0.1 sweep caught a .005 money midpoint here
            # (the nation_trade_volume lesson)
            F.round(
                F.sum(
                    (
                        F.col("l_extendedprice") * (1 - F.col("l_discount"))
                        - 0.1 * F.col("p_retailprice") * F.col("l_quantity")
                    ).cast("decimal(28,8)")
                ),
                2,
            ).cast("double").alias("profit")
        )
        .orderBy(F.asc("nation"), F.desc("o_year"))
    )


_MIN_COST_SUPPLIER_SQL = """
WITH offers AS (
  SELECT l_partkey, l_suppkey,
         min(l_extendedprice / l_quantity) AS unit_price
  FROM lineitem GROUP BY 1, 2
), best AS (
  SELECT l_partkey, min(unit_price) AS best_price FROM offers GROUP BY 1
)
SELECT p.p_partkey, p.p_brand, s.s_name, s.s_acctbal,
       round(o.unit_price, 6) AS unit_price
FROM offers o
JOIN best b ON o.l_partkey = b.l_partkey AND o.unit_price = b.best_price
JOIN part p ON o.l_partkey = p.p_partkey
JOIN supplier s ON o.l_suppkey = s.s_suppkey
WHERE p.p_size <= 5
ORDER BY s.s_acctbal DESC, p.p_partkey, s.s_name
LIMIT 15
"""


@register("min_cost_supplier", _MIN_COST_SUPPLIER_SQL)
def min_cost_supplier_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: for each (small) part, the supplier(s) offering
    the minimum observed unit price — the correlated scalar-MIN
    subquery, decorrelated into agg + self-equi-join (the rewrite
    Catalyst also applies to the textbook form). The min-price join key
    is a DOUBLE produced by the same min() on both sides, so equality
    is exact, and ties (co-best suppliers) are all kept, as in the
    spec. part/supplier broadcast; the only fact shuffle is the
    groupBy(l_partkey, l_suppkey)."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supplier = load_table(spark, sf_dir, "supplier")
    offers = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias(
            "unit_price"
        )
    )
    # best must be re-aliased: both frames share lineage, and a
    # same-lineage equi-condition silently resolves to the SAME column
    # (trivially true), leaving only the price-equality condition —
    # wrong pairs whenever two parts share a unit price.
    best = (
        offers.groupBy("l_partkey")
        .agg(F.min("unit_price").alias("best_price"))
        .withColumnRenamed("l_partkey", "b_partkey")
    )
    return (
        offers.join(
            best,
            (F.col("l_partkey") == F.col("b_partkey"))
            & (F.col("unit_price") == F.col("best_price")),
        )
        .drop("b_partkey")
        .join(
            F.broadcast(
                part.filter(F.col("p_size") <= 5).select(
                    "p_partkey", "p_brand"
                )
            ),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(
            F.broadcast(supplier.select("s_suppkey", "s_name", "s_acctbal")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .select(
            "p_partkey",
            "p_brand",
            "s_name",
            "s_acctbal",
            F.round("unit_price", 6).alias("unit_price"),
        )
        .orderBy(F.desc("s_acctbal"), F.asc("p_partkey"), F.asc("s_name"))
        .limit(15)
    )


_SUPPLIER_CNT_SQL = """
SELECT p.p_brand, p.p_type, p.p_size,
       CAST(count(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE p.p_brand <> 'Brand#1'
  AND p.p_size IN (1, 4, 9, 16, 25, 36, 49)
  AND l.l_suppkey NOT IN (
    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY 1, 2, 3
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
LIMIT 25
"""


@register("parts_supplier_count", _SUPPLIER_CNT_SQL)
def parts_supplier_count_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct-supplier count per part attribute
    triple, minus an excluded supplier list (NOT IN subquery → a
    broadcast anti-join on the fact side BEFORE the expensive distinct
    agg, so excluded rows never reach the shuffle). countDistinct
    expands to a two-phase agg (partial distinct on (keys, suppkey),
    then final count) — the scalable plan for high-cardinality
    distinct at 100 TB."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supplier = load_table(spark, sf_dir, "supplier")
    bad = supplier.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    pf = part.filter(
        (F.col("p_brand") != "Brand#1")
        & F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    return (
        li.join(
            F.broadcast(bad),
            li.l_suppkey == bad.s_suppkey,
            "left_anti",
        )
        .join(F.broadcast(pf), li.l_partkey == pf.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(
            F.desc("supplier_cnt"),
            F.asc("p_brand"),
            F.asc("p_type"),
            F.asc("p_size"),
        )
        .limit(25)
    )


_EXCESS_SUPPLIER_SQL = """
WITH pp AS (
  SELECT p_partkey FROM part WHERE p_name LIKE 'small%'
), agg AS (
  SELECT l.l_suppkey,
         sum(CASE WHEN l.l_shipdate >= TIMESTAMP '1997-01-01'
                   AND l.l_shipdate < TIMESTAMP '1999-01-01'
                  THEN l.l_quantity ELSE 0 END) AS q_win,
         sum(l.l_quantity) AS q_all
  FROM lineitem l JOIN pp ON l.l_partkey = pp.p_partkey
  GROUP BY 1
)
SELECT s.s_name, round(s.s_acctbal, 2) AS s_acctbal
FROM supplier s
WHERE s.s_suppkey IN (SELECT l_suppkey FROM agg WHERE q_win > 0.33 * q_all)
ORDER BY s.s_name
"""


@register("excess_suppliers", _EXCESS_SUPPLIER_SQL)
def excess_suppliers_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: the semi-join chain — part filter → fact
    aggregate with a threshold (suppliers shipping >33% of their
    all-time 'small%'-part quantity inside 1997-98) → LEFT SEMI into
    the supplier dimension. The IN-subquery becomes one broadcast
    semi-join (the qualifying-supplier set is ≤|supplier|); the part
    filter broadcasts into the fact scan so lineitem is pruned before
    its single groupBy shuffle. q_win/q_all come from ONE conditional
    aggregate pass, not two scans."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supplier = load_table(spark, sf_dir, "supplier")
    pp = part.filter(F.col("p_name").like("small%")).select("p_partkey")
    in_win = (F.col("l_shipdate") >= "1997-01-01") & (
        F.col("l_shipdate") < "1999-01-01"
    )
    agg = (
        li.join(F.broadcast(pp), li.l_partkey == pp.p_partkey)
        .groupBy("l_suppkey")
        .agg(
            F.sum(F.when(in_win, F.col("l_quantity")).otherwise(0.0)).alias(
                "q_win"
            ),
            F.sum("l_quantity").alias("q_all"),
        )
        .filter(F.col("q_win") > 0.33 * F.col("q_all"))
        .select("l_suppkey")
    )
    return (
        supplier.join(
            F.broadcast(agg),
            supplier.s_suppkey == agg.l_suppkey,
            "left_semi",
        )
        .select("s_name", F.round("s_acctbal", 2).alias("s_acctbal"))
        .orderBy("s_name")
    )


_ORDER_TRIANGLES_SQL = """
WITH sz AS (
  SELECT o_custkey, count(*) AS n FROM orders GROUP BY 1
)
SELECT o.o_orderkey AS node,
       CAST((sz.n - 1) * (sz.n - 2) / 2 AS BIGINT) AS triangles
FROM orders o JOIN sz ON o.o_custkey = sz.o_custkey
WHERE sz.n >= 3
ORDER BY node
"""


@register("order_clique_triangles", _ORDER_TRIANGLES_SQL)
def order_clique_triangles_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed triangle counting with degree orientation
    (operators/graph.py triangle_count — Suri & Vassilvitskii 2011):
    per-customer order CLIQUES give a closed-form truth (each order in
    an n-order clique sits in C(n−1, 2) triangles) while the engine
    runs the real orientation + wedge-join machinery with no knowledge
    of the clique structure. The wedge fan-out cap (out-degree ≤ O(√E)
    after orientation) is what makes this survive celebrity nodes at
    corpus scale."""
    from weaviate_txtai_spark.operators.graph import triangle_count

    orders = load_table(spark, sf_dir, "orders")
    a = orders.select("o_custkey", F.col("o_orderkey").alias("k1"))
    b = orders.select("o_custkey", F.col("o_orderkey").alias("k2"))
    edges = (
        a.join(b, "o_custkey")
        .filter(F.col("k1") < F.col("k2"))
        .select(F.col("k1").alias("src"), F.col("k2").alias("dst"))
    )
    return (
        triangle_count(edges)
        .select("node", "triangles")
        .orderBy("node")
    )


# --------------------------------------------------------------------------
# Round 7: behavioral-sequence analytics over the event log
# (operators/funnel.py) — ordered funnels and cohort retention
# --------------------------------------------------------------------------

# Oracle is the k-way sequential-join formulation; the Spark operator is
# the ONE-shuffle pivot + array-recurrence plan. Different formulations,
# same semantics — the hash match cross-checks the recurrence.
_EVENTS_FUNNEL_SQL = """
WITH e AS (SELECT * FROM events WHERE event_id % 3 = 0),
s0 AS (SELECT user_id, min(ts) AS t FROM e WHERE event_type = 'signup' GROUP BY 1),
s1 AS (SELECT e.user_id, min(e.ts) AS t FROM e JOIN s0 USING (user_id)
       WHERE e.event_type = 'view' AND e.ts > s0.t GROUP BY 1),
s2 AS (SELECT e.user_id, min(e.ts) AS t FROM e JOIN s1 USING (user_id)
       WHERE e.event_type = 'click' AND e.ts > s1.t GROUP BY 1),
s3 AS (SELECT e.user_id, min(e.ts) AS t FROM e JOIN s2 USING (user_id)
       WHERE e.event_type = 'purchase' AND e.ts > s2.t GROUP BY 1),
counts AS (
  SELECT 0 AS step_idx, 'signup' AS step, (SELECT count(*) FROM s0) AS n_users
  UNION ALL SELECT 1, 'view', (SELECT count(*) FROM s1)
  UNION ALL SELECT 2, 'click', (SELECT count(*) FROM s2)
  UNION ALL SELECT 3, 'purchase', (SELECT count(*) FROM s3))
SELECT step_idx, step, CAST(n_users AS BIGINT) AS n_users,
       CASE WHEN (SELECT n_users FROM counts WHERE step_idx = 0) > 0
            THEN round(n_users / (SELECT n_users FROM counts WHERE step_idx = 0), 6)
       END AS conversion
FROM counts ORDER BY step_idx
"""


@register("events_funnel_onepass", _EVENTS_FUNNEL_SQL)
def events_funnel_onepass_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strict-order funnel signup -> view -> click -> purchase
    (operators/funnel.py funnel): ONE user-keyed shuffle — per-user
    per-step sorted timestamp arrays via pivot, then the greedy
    first-event-strictly-after recurrence as pure array expressions.
    Complements `events_funnel` (the inline chained-join formulation,
    k shuffles of the event table, 3 steps): same semantics family,
    different physical plan — this one also reports conversion rates
    and takes the step list as data. The oracle twin is the k-join
    formulation, so the hash match proves the one-shuffle plan
    equivalent. The event_id % 3 slice thins sequences so strict
    ordering actually gates conversion (un-sliced, every sf0.01 user
    completes every step — a vacuous 100% funnel)."""
    from weaviate_txtai_spark.operators.funnel import funnel

    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") % 3 == 0)
    return funnel(ev, ["signup", "view", "click", "purchase"]).orderBy(
        "step_idx"
    )


_EVENTS_COHORT_SQL = """
WITH wk AS (SELECT user_id, CAST(date_trunc('week', ts) AS DATE) AS w
            FROM events WHERE value > 150),
first AS (SELECT user_id, min(w) AS cohort_week FROM wk GROUP BY 1),
act AS (SELECT DISTINCT user_id, w FROM wk)
SELECT cohort_week, CAST(datediff('day', cohort_week, w) / 7 AS INT) AS week_offset,
       CAST(count(*) AS BIGINT) AS n_users
FROM act JOIN first USING (user_id)
GROUP BY 1, 2 ORDER BY 1, 2
"""


@register("events_cohort_retention", _EVENTS_COHORT_SQL)
def events_cohort_retention_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention over high-value activity
    (operators/funnel.py cohort_retention): cohort = ISO week of the
    user's first value>150 event; rows are (cohort_week, week_offset,
    active users). Two map-side-combined shuffles; the cohort join is
    user-keyed. The value slice makes weekly activity sparse enough
    that the matrix actually decays (the raw stream retains ~100% of
    users every week at sf0.01)."""
    from weaviate_txtai_spark.operators.funnel import cohort_retention

    ev = load_table(spark, sf_dir, "events").filter(F.col("value") > 150)
    return cohort_retention(ev).orderBy("cohort_week", "week_offset")


# --------------------------------------------------------------------------
# Round 7: market-basket association rules (operators/itemsets.py) and
# Pareto skyline (operators/skyline.py)
# --------------------------------------------------------------------------

_BASKET_RULES_SQL = """
WITH b AS (SELECT DISTINCT l_orderkey AS basket, l_partkey AS item FROM lineitem),
n AS (SELECT count(DISTINCT basket) AS n_baskets FROM b),
ic AS (SELECT item, count(*) AS c FROM b GROUP BY 1),
p AS (SELECT a.item AS p1, c.item AS p2, count(*) AS cnt
      FROM b a JOIN b c ON a.basket = c.basket AND a.item < c.item
      GROUP BY 1, 2 HAVING count(*) >= 3),
r AS (SELECT p1 AS antecedent, p2 AS consequent, cnt FROM p
      UNION ALL SELECT p2, p1, cnt FROM p)
SELECT r.antecedent, r.consequent, CAST(r.cnt AS BIGINT) AS pair_count,
       round(r.cnt * 1.0 / n.n_baskets, 6) AS support,
       round(r.cnt * 1.0 / ia.c, 6) AS confidence,
       round((r.cnt * 1.0 / ia.c) / (ib.c * 1.0 / n.n_baskets), 6) AS lift
FROM r
JOIN ic ia ON r.antecedent = ia.item
JOIN ic ib ON r.consequent = ib.item
CROSS JOIN n
ORDER BY antecedent, consequent
"""


@register("basket_rules", _BASKET_RULES_SQL)
def basket_rules_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Size-2 association rules over order baskets (order = basket,
    part = item), pair support >= 3: which parts sell together, with
    support / confidence / lift (operators/itemsets.py). The Spark
    plan generates pairs map-side from per-basket sorted arrays (no
    basket self-join) with apriori item pruning available; the oracle
    IS the textbook self-join, so the hash match proves the map-side
    fan-out equivalent to the quadratic formulation."""
    from weaviate_txtai_spark.operators.itemsets import association_rules

    li = load_table(spark, sf_dir, "lineitem")
    return association_rules(
        li, "l_orderkey", "l_partkey", min_pair_count=3
    ).orderBy("antecedent", "consequent")


_PART_SKYLINE_SQL = """
WITH p AS (SELECT p_partkey, p_retailprice, CAST(p_size AS INT) AS p_size,
                  CAST(len(p_name) AS INT) AS name_len
           FROM part)
SELECT p_partkey, p_retailprice, p_size, name_len
FROM p a
WHERE NOT EXISTS (
  SELECT 1 FROM p b
  WHERE b.p_retailprice <= a.p_retailprice
    AND b.p_size >= a.p_size AND b.name_len >= a.name_len
    AND (b.p_retailprice < a.p_retailprice
         OR b.p_size > a.p_size OR b.name_len > a.name_len))
ORDER BY p_partkey
"""


@register("part_skyline", _PART_SKYLINE_SQL)
def part_skyline_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto frontier of parts: minimize retail price, maximize size
    and name length — no part is cheaper AND bigger AND longer-named
    (operators/skyline.py). The Spark plan is the two-phase
    distributed skyline (per-partition mapInPandas prune, then an
    O(survivors²) broadcast anti-join); the oracle is the quadratic
    NOT EXISTS truth, so the hash match proves the local prune loses
    nothing."""
    from weaviate_txtai_spark.operators.skyline import skyline

    p = load_table(spark, sf_dir, "part").select(
        "p_partkey",
        "p_retailprice",
        F.col("p_size").cast("int").alias("p_size"),
        F.length("p_name").cast("int").alias("name_len"),
    )
    return skyline(
        p, minimize=["p_retailprice"], maximize=["p_size", "name_len"]
    ).orderBy("p_partkey")


_SPEARMAN_SQL = """
WITH r AS (
  SELECT rank() OVER (ORDER BY l_quantity)
           + (count(*) OVER (PARTITION BY l_quantity) - 1) / 2.0 AS rq,
         rank() OVER (ORDER BY l_extendedprice)
           + (count(*) OVER (PARTITION BY l_extendedprice) - 1) / 2.0 AS rp,
         rank() OVER (ORDER BY l_discount)
           + (count(*) OVER (PARTITION BY l_discount) - 1) / 2.0 AS rd,
         rank() OVER (ORDER BY l_tax)
           + (count(*) OVER (PARTITION BY l_tax) - 1) / 2.0 AS rt
  FROM lineitem)
SELECT 'l_quantity' AS col_x, 'l_extendedprice' AS col_y,
       round(corr(rq, rp), 6) AS spearman FROM r
UNION ALL
SELECT 'l_discount', 'l_tax', round(corr(rd, rt), 6) FROM r
UNION ALL
SELECT 'l_quantity', 'l_discount', round(corr(rq, rd), 6) FROM r
ORDER BY col_x, col_y
"""


@register("lineitem_spearman", _SPEARMAN_SQL)
def lineitem_spearman_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation over fact numerics — the robust,
    monotone companion to `lineitem_correlations`' Pearson profile
    (operators/rankstats.py). The oracle ranks with the textbook
    global-order window (fine at oracle scale, ONE task at corpus
    scale); the Spark plan assigns tie-averaged ranks from a
    value-grouped prefix sum with no unpartitioned window — the hash
    match proves the two rankings identical, ties included."""
    from weaviate_txtai_spark.operators.rankstats import spearman

    li = load_table(spark, sf_dir, "lineitem")
    return spearman(
        li,
        [
            ("l_quantity", "l_extendedprice"),
            ("l_discount", "l_tax"),
            ("l_quantity", "l_discount"),
        ],
        # TPC-H fact columns are null-free, so listwise == pairwise;
        # the moments path computes every correlation from domain-sized
        # tables (no row-level rank join), and the hint pins the known
        # dimension-like columns so the cardinality probe is skipped
        dropna="listwise",
        small_cols=["l_quantity", "l_discount", "l_tax"],
    ).orderBy("col_x", "col_y")


# --------------------------------------------------------------------------
# Round 7: experiment readouts (operators/abtest.py) + anchored-window
# funnel (operators/funnel.py)
# --------------------------------------------------------------------------

_AB_ZTEST_SQL = """
WITH u AS (
  SELECT user_id,
         CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS variant,
         max(CASE WHEN event_type = 'purchase' AND value > 180 THEN 1 ELSE 0 END) AS s
  FROM events GROUP BY 1),
agg AS (
  SELECT count(*) FILTER (variant = 'A') AS n_a,
         count(*) FILTER (variant = 'B') AS n_b,
         coalesce(sum(s) FILTER (variant = 'A'), 0) AS sa,
         coalesce(sum(s) FILTER (variant = 'B'), 0) AS sb
  FROM u)
SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
       CAST(sa AS BIGINT) AS successes_a, CAST(sb AS BIGINT) AS successes_b,
       round(sa * 1.0 / n_a, 6) AS rate_a,
       round(sb * 1.0 / n_b, 6) AS rate_b,
       round(sa * 1.0 / n_a - sb * 1.0 / n_b, 6) AS abs_lift,
       round((sa * 1.0 / n_a - sb * 1.0 / n_b)
             / sqrt(((sa + sb) * 1.0 / (n_a + n_b)) * (1 - (sa + sb) * 1.0 / (n_a + n_b))
                    * (1.0 / n_a + 1.0 / n_b)), 6) AS z
FROM agg
"""


@register("ab_conversion_ztest", _AB_ZTEST_SQL)
def ab_conversion_ztest_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test between even/odd user-id cohorts on
    high-value purchase conversion (operators/abtest.py): per-user
    outcomes from ONE map-side-combined groupBy, then a 1-row pooled-z
    aggregate — the experiment readout as a single distributed job."""
    from weaviate_txtai_spark.operators.abtest import two_proportion_ztest

    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.max(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("value") > 180), 1
            ).otherwise(0)
        ).alias("converted")
    ).select(
        F.when(F.col("user_id") % 2 == 0, "A").otherwise("B").alias("variant"),
        "converted",
    )
    return two_proportion_ztest(
        per_user, "variant", "converted", group_a="A", group_b="B"
    )


_AB_WELCH_SQL = """
WITH u AS (
  SELECT user_id,
         CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS variant,
         sum(value) AS tot
  FROM events GROUP BY 1),
agg AS (
  SELECT count(*) FILTER (variant = 'A') AS n_a,
         count(*) FILTER (variant = 'B') AS n_b,
         avg(tot) FILTER (variant = 'A') AS ma,
         avg(tot) FILTER (variant = 'B') AS mb,
         var_samp(tot) FILTER (variant = 'A') AS va,
         var_samp(tot) FILTER (variant = 'B') AS vb
  FROM u)
SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
       round(ma, 6) AS mean_a, round(mb, 6) AS mean_b,
       round((ma - mb) / sqrt(va / n_a + vb / n_b), 6) AS t,
       round(pow(va / n_a + vb / n_b, 2)
             / (pow(va / n_a, 2) / (n_a - 1) + pow(vb / n_b, 2) / (n_b - 1)),
             6) AS welch_df
FROM agg
"""


@register("ab_value_welch", _AB_WELCH_SQL)
def ab_value_welch_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch unequal-variance t-test on per-user total event value
    between even/odd user-id cohorts (operators/abtest.py) — the
    continuous-metric companion to `ab_conversion_ztest`, with the
    Welch–Satterthwaite degrees of freedom."""
    from weaviate_txtai_spark.operators.abtest import welch_ttest

    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(F.sum("value").alias("tot")).select(
        F.when(F.col("user_id") % 2 == 0, "A").otherwise("B").alias("variant"),
        "tot",
    )
    return welch_ttest(per_user, "variant", "tot", group_a="A", group_b="B")


# Oracle: the explicit chain-join EXISTS enumeration (every anchor ×
# every chain), an independent formulation of the anchored-window
# semantics — the hash match proves max-over-anchors greedy exact.
_FUNNEL_WINDOWED_SQL = """
WITH e AS (SELECT * FROM events WHERE event_id % 3 = 0),
lvl AS (
  SELECT e0.user_id,
         max(CASE WHEN e2.ts IS NOT NULL THEN 3
                  WHEN e1.ts IS NOT NULL THEN 2 ELSE 1 END) AS level
  FROM e e0
  LEFT JOIN e e1 ON e1.user_id = e0.user_id AND e1.event_type = 'view'
        AND e1.ts > e0.ts AND epoch(e1.ts) <= epoch(e0.ts) + 86400
  LEFT JOIN e e2 ON e2.user_id = e0.user_id AND e2.event_type = 'click'
        AND e2.ts > e1.ts AND epoch(e2.ts) <= epoch(e0.ts) + 86400
  WHERE e0.event_type = 'signup'
  GROUP BY 1),
counts AS (
  SELECT 0 AS step_idx, 'signup' AS step,
         (SELECT count(*) FROM lvl WHERE level >= 1) AS n_users
  UNION ALL SELECT 1, 'view', (SELECT count(*) FROM lvl WHERE level >= 2)
  UNION ALL SELECT 2, 'click', (SELECT count(*) FROM lvl WHERE level >= 3))
SELECT step_idx, step, CAST(n_users AS BIGINT) AS n_users,
       CASE WHEN (SELECT n_users FROM counts WHERE step_idx = 0) > 0
            THEN round(n_users / (SELECT n_users FROM counts WHERE step_idx = 0), 6)
       END AS conversion
FROM counts ORDER BY step_idx
"""


@register("events_funnel_windowed", _FUNNEL_WINDOWED_SQL)
def events_funnel_windowed_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anchored conversion-window funnel signup -> view -> click within
    24 h of the anchoring signup (ClickHouse windowFunnel semantics;
    operators/funnel.py `window=`). Greedy-from-first-anchor is wrong
    under a window, so every signup is tried as an anchor inside the
    same one-shuffle array plan; the oracle enumerates all chains with
    explicit joins, so the hash match proves max-over-anchors exact.
    At sf0.01 the 24 h window converts 146 -> 58 -> 5 users — real
    decay, not a vacuous 100% funnel."""
    from weaviate_txtai_spark.operators.funnel import funnel

    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") % 3 == 0)
    return funnel(
        ev, ["signup", "view", "click"], window=86400
    ).orderBy("step_idx")


_CUSTOMER_AFFINITY_SQL = """
WITH cp AS (SELECT DISTINCT o.o_custkey AS c, l.l_partkey AS p
            FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
pd AS (SELECT p, count(*) AS d FROM cp GROUP BY 1 HAVING count(*) <= 20),
g AS (SELECT cp.c, cp.p, pd.d FROM cp JOIN pd USING (p)),
ed AS (SELECT c, count(*) AS ed FROM g GROUP BY 1),
pr AS (SELECT a.c AS e1, b.c AS e2, CAST(count(*) AS BIGINT) AS common,
              sum(1.0 / ln(a.d)) AS aa
       FROM g a JOIN g b ON a.p = b.p AND a.c < b.c
       GROUP BY 1, 2 HAVING count(*) >= 2)
SELECT pr.e1, pr.e2, pr.common,
       round(pr.common * 1.0 / (d1.ed + d2.ed - pr.common), 6) AS jaccard,
       round(pr.aa, 6) AS adamic_adar
FROM pr JOIN ed d1 ON pr.e1 = d1.c JOIN ed d2 ON pr.e2 = d2.c
ORDER BY e1, e2
"""


@register("customer_affinity", _CUSTOMER_AFFINITY_SQL)
def customer_affinity_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link prediction on the customer–part bipartite graph
    (operators/linkpred.py): common-neighbors / neighborhood-Jaccard /
    Adamic–Adar for customer pairs sharing ≥2 parts of item-degree ≤20.
    The degree cap bounds the wedge join's per-item fan-out at C(20,2)
    — the hottest shuffle key a 100 TB run ever sees is cap² rows —
    and Adamic–Adar already discounts exactly the items the cap
    drops."""
    from weaviate_txtai_spark.operators.linkpred import link_scores

    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    cp = o.join(li, o.o_orderkey == li.l_orderkey).select(
        F.col("o_custkey").alias("cust"), F.col("l_partkey").alias("part")
    )
    return (
        link_scores(
            cp, "cust", "part", max_item_degree=20, min_common=2
        )
        .orderBy("e1", "e2")
    )


# --------------------------------------------------------------------------
# Round 7: distributed statistics — OLS trend, Gini concentration,
# Mann–Whitney U (operators/regression.py, inequality.py, abtest.py)
# --------------------------------------------------------------------------

# Oracle uses DuckDB's NATIVE regr_slope/regr_intercept/regr_r2 — an
# independent implementation of the estimator (centered running stats
# vs raw moments). x is re-based to months-since-1992 to keep the
# moment cancellation far inside round-4 agreement.
_NATION_TREND_SQL = """
WITH m AS (
  SELECT c.c_nationkey AS nationkey,
         (year(o.o_orderdate) - 1992) * 12 + month(o.o_orderdate) AS x,
         sum(o.o_totalprice) AS y
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY 1, 2)
SELECT nationkey, CAST(count(*) AS BIGINT) AS n,
       round(regr_slope(y, x), 4) AS slope,
       round(regr_intercept(y, x), 4) AS intercept,
       round(regr_r2(y, x), 4) AS r2
FROM m GROUP BY nationkey ORDER BY nationkey
"""


@register("nation_revenue_trend", _NATION_TREND_SQL)
def nation_revenue_trend_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation OLS trend of monthly order revenue
    (operators/regression.py): slope/intercept/R² from the five raw
    moments in ONE map-side-combined aggregate — no per-group fitting
    loop, no collect. The oracle is DuckDB's native regr_* family, an
    independent implementation of the same estimator."""
    from weaviate_txtai_spark.operators.regression import ols_trend

    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    monthly = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(
            F.col("c_nationkey").alias("nationkey"),
            (
                (F.year("o_orderdate") - 1992) * 12 + F.month("o_orderdate")
            ).alias("x"),
        )
        .agg(F.sum("o_totalprice").alias("y"))
    )
    return (
        ols_trend(monthly, "x", "y", group_col="nationkey", round_decimals=4)
        .orderBy("nationkey")
    )


_REVENUE_GINI_SQL = """
WITH cr AS (
  SELECT c.c_nationkey AS nationkey, o.o_custkey, sum(o.o_totalprice) AS v
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY 1, 2),
r AS (
  SELECT nationkey, v,
         rank() OVER (PARTITION BY nationkey ORDER BY v)
           + (count(*) OVER (PARTITION BY nationkey, v) - 1) / 2.0 AS rr
  FROM cr)
SELECT nationkey, CAST(count(*) AS BIGINT) AS n,
       round(sum(v), 2) AS total,
       round((2 * sum(rr * v) - (count(*) + 1) * sum(v))
             / (count(*) * sum(v)), 6) AS gini
FROM r GROUP BY nationkey ORDER BY nationkey
"""


@register("revenue_gini", _REVENUE_GINI_SQL)
def revenue_gini_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini concentration of customer revenue within each nation
    (operators/inequality.py): how unevenly is spend distributed over
    customers. Tie-averaged ranks come from a prefix sum over the
    per-(nation, value) count table — a window PARTITIONED by nation
    over its value domain, never over rows. Oracle ranks with the
    rank()/count() window formulation — independent."""
    from weaviate_txtai_spark.operators.inequality import gini

    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    cr = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(F.col("c_nationkey").alias("nationkey"), "o_custkey")
        .agg(F.sum("o_totalprice").alias("v"))
    )
    out = gini(cr, "v", group_col="nationkey")
    return out.select(
        "nationkey", "n", F.round("total", 2).alias("total"), "gini"
    ).orderBy("nationkey")


_AB_MWU_SQL = """
WITH u AS (
  SELECT user_id,
         CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS g,
         sum(value) AS v
  FROM events GROUP BY 1),
r AS (
  SELECT g, v,
         rank() OVER (ORDER BY v)
           + (count(*) OVER (PARTITION BY v) - 1) / 2.0 AS rr
  FROM u),
t AS (SELECT coalesce(sum(c*c*c - c), 0) AS tie
      FROM (SELECT count(*) AS c FROM u GROUP BY v)),
a AS (
  SELECT count(*) FILTER (g = 'A') AS na,
         count(*) FILTER (g = 'B') AS nb,
         sum(rr) FILTER (g = 'A') AS ra
  FROM r)
SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
       round(ra - na * (na + 1) / 2, 6) AS u_a,
       round(na * nb - (ra - na * (na + 1) / 2), 6) AS u_b,
       round((ra - na * (na + 1) / 2 - na * nb / 2.0)
             / sqrt(na * nb / 12.0
                    * ((na + nb + 1)
                       - tie * 1.0 / ((na + nb) * (na + nb - 1)))), 6) AS z
FROM a, t
"""


@register("ab_value_mwu", _AB_MWU_SQL)
def ab_value_mwu_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann–Whitney U on per-user total event value between even/odd
    user-id cohorts (operators/abtest.py) — the rank-based,
    outlier-proof companion to `ab_value_welch`, with the tie-corrected
    normal approximation. Ranks via the no-global-window prefix-sum
    scheme (operators/rankstats.py); the oracle ranks with the textbook
    window."""
    from weaviate_txtai_spark.operators.abtest import mann_whitney_u

    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(F.sum("value").alias("v")).select(
        F.when(F.col("user_id") % 2 == 0, "A").otherwise("B").alias("g"),
        "v",
    )
    return mann_whitney_u(per_user, "g", "v", group_a="A", group_b="B")


# --------------------------------------------------------------------------
# Round 7: q-gram edit-distance join, CUSUM change points, Benford
# (operators/stringjoin.py, changepoint.py, profile.py)
# --------------------------------------------------------------------------

# Oracle: the quadratic levenshtein self-join — independent of the
# q-gram count-filter plan, so the hash match proves the filter loses
# no pair (the filter can only over-generate; the verify is exact).
_SUPPLIER_MATCH_SQL = """
SELECT a.s_suppkey AS id1, b.s_suppkey AS id2,
       a.s_name AS s1, b.s_name AS s2,
       CAST(levenshtein(a.s_name, b.s_name) AS INT) AS dist
FROM supplier a JOIN supplier b
  ON a.s_suppkey < b.s_suppkey
 AND levenshtein(a.s_name, b.s_name) <= 1
ORDER BY id1, id2
"""


@register("supplier_name_matches", _SUPPLIER_MATCH_SQL)
def supplier_name_matches_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution at scale: all supplier-name pairs within edit
    distance 1 via positional q-gram filtering + exact verify
    (operators/stringjoin.py, Gravano 2001). The inverted-index join
    keys on (gram, position bucket) so hot grams stay bounded; the
    count filter prunes below-threshold pairs before any levenshtein
    runs. fuzzy_source_match keeps the quadratic plan for tiny
    domains; this is the corpus path."""
    from weaviate_txtai_spark.operators.stringjoin import edit_distance_join

    s = load_table(spark, sf_dir, "supplier")
    return edit_distance_join(s, "s_suppkey", "s_name", k=1).orderBy(
        "id1", "id2"
    )


# Oracle: the LITERAL Page recursion in a RECURSIVE CTE — the Spark
# plan uses the running-extremum closed form (S⁺=P−min P), so the hash
# match PROVES the closed form, not just replays it.
_EVENTS_CUSUM_SQL = """
WITH RECURSIVE d AS (
  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
         CAST(count(*) AS DOUBLE) AS x
  FROM events GROUP BY 1, 2),
o AS (SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY day) AS rn
      FROM d),
r AS (
  SELECT event_type, day, x, rn,
         greatest(0, x - 66 - 2) AS sp,
         greatest(0, -(x - 66 + 2)) AS sn
  FROM o WHERE rn = 1
  UNION ALL
  SELECT o.event_type, o.day, o.x, o.rn,
         greatest(0, r.sp + (o.x - 66 - 2)),
         greatest(0, r.sn - (o.x - 66 + 2))
  FROM r JOIN o ON o.event_type = r.event_type AND o.rn = r.rn + 1)
SELECT event_type, day, x, round(sp, 6) AS s_pos, round(sn, 6) AS s_neg,
       (round(sp, 6) > 20 OR round(sn, 6) > 20) AS alarm
FROM r ORDER BY event_type, day
"""


@register("events_daily_cusum", _EVENTS_CUSUM_SQL)
def events_daily_cusum_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type CUSUM trajectory over daily volumes
    (operators/changepoint.py): Page's non-associative recursion
    re-expressed as the running-extremum closed form — two cumulative
    windows PARTITIONED by type, one shuffle, no recursion. The oracle
    runs the literal recursion in a recursive CTE, so the hash match
    proves the algebraic identity."""
    from weaviate_txtai_spark.operators.changepoint import cusum

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).cast("double").alias("x"))
    return cusum(
        daily, "event_type", "day", "x", target=66.0, drift=2.0, threshold=20.0
    ).orderBy("event_type", "day")


_BENFORD_SQL = """
WITH d AS (
  SELECT CAST(floor(o_totalprice / pow(10, floor(log10(o_totalprice))))
              AS INT) AS digit
  FROM orders WHERE o_totalprice > 0),
c AS (SELECT digit, CAST(count(*) AS BIGINT) AS n FROM d GROUP BY 1),
t AS (SELECT CAST(sum(n) AS DOUBLE) AS tot FROM c)
SELECT digit, n,
       round(n / tot, 6) AS observed,
       round(log10(1 + 1.0 / digit), 6) AS expected,
       round(tot * pow(n / tot - log10(1 + 1.0 / digit), 2)
             / log10(1 + 1.0 / digit), 6) AS chi2_term
FROM c, t ORDER BY digit
"""


@register("totalprice_benford", _BENFORD_SQL)
def totalprice_benford_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit conformance of order totals
    (operators/profile.py benford) — the fabricated-data smell test as
    one 9-group aggregate; digit extraction is pure codegen arithmetic
    (no string formatting)."""
    from weaviate_txtai_spark.operators.profile import benford

    o = load_table(spark, sf_dir, "orders")
    return benford(o, "o_totalprice").orderBy("digit")


# --------------------------------------------------------------------------
# Round 7: attribution, point-in-time dimension read, funnel latency
# (operators/attribution.py, scd.py pit_join, funnel.py funnel_latency)
# --------------------------------------------------------------------------

# Oracle: correlated last-preceding-touch subquery per conversion —
# independent of the Spark plan's co-grouped array assignment. Tie-break
# on equal timestamps: (ts, event_type) DESC, matching sort_array's
# struct order.
_ATTRIBUTION_SQL = """
WITH t AS (SELECT user_id, ts, event_type FROM events
           WHERE event_type IN ('view', 'click')),
c AS (SELECT user_id, ts, value FROM events WHERE event_type = 'purchase'),
credit AS (
  SELECT c.value,
         coalesce(
           (SELECT t.event_type FROM t
            WHERE t.user_id = c.user_id AND t.ts < c.ts
            ORDER BY t.ts DESC, t.event_type DESC LIMIT 1),
           '(none)') AS touch_type
  FROM c)
SELECT touch_type, round(count(*) * 1.0, 6) AS conversions,
       round(sum(value), 6) AS credited_value
FROM credit GROUP BY touch_type ORDER BY touch_type
"""


@register("purchase_attribution", _ATTRIBUTION_SQL)
def purchase_attribution_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: every purchase's value credited to the
    user's most recent preceding view/click
    (operators/attribution.py). ONE user-keyed shuffle co-groups
    touches and conversions; per-conversion credit is array work over
    the user's own touches. The oracle is the correlated
    last-preceding-touch subquery — independent formulation."""
    from weaviate_txtai_spark.operators.attribution import attribution

    ev = load_table(spark, sf_dir, "events")
    return attribution(
        ev, touch_types=["view", "click"], conversion_type="purchase"
    ).orderBy("touch_type")


_PIT_SQL = """
WITH dim AS (
  SELECT c_custkey AS k, 'EARLY' AS segment,
         TIMESTAMP '1992-01-01' AS valid_from,
         TIMESTAMP '1996-01-01' AS valid_to
  FROM customer
  UNION ALL
  SELECT c_custkey, 'LATE', TIMESTAMP '1996-01-01', NULL
  FROM customer WHERE c_acctbal < 0),
j AS (
  SELECT coalesce(d.segment, '(no-version)') AS segment, o.o_totalprice
  FROM orders o LEFT JOIN dim d
    ON o.o_custkey = d.k
   AND CAST(o.o_orderdate AS TIMESTAMP) >= d.valid_from
   AND (d.valid_to IS NULL OR CAST(o.o_orderdate AS TIMESTAMP) < d.valid_to))
SELECT segment, CAST(count(*) AS BIGINT) AS n_orders,
       round(sum(o_totalprice), 2) AS revenue
FROM j GROUP BY segment ORDER BY segment
"""


@register("orders_pit_segment", _PIT_SQL)
def orders_pit_segment_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time SCD2 read (operators/scd.py pit_join): every order
    picks the customer-segment VERSION valid at its order date — the
    leakage-free temporal join. The dim: all customers EARLY
    1992→1996; negative-balance customers gain an open LATE version at
    1996 — so a positive-balance customer's 1997 order has NO valid
    version ('(no-version)'), proving interval semantics rather than
    latest-wins. Equi-join on the key with the interval as residual —
    no range cross-join."""
    from weaviate_txtai_spark.operators.scd import pit_join

    c = load_table(spark, sf_dir, "customer")
    dim = c.select(
        F.col("c_custkey").alias("k"),
        F.lit("EARLY").alias("segment"),
        F.lit("1992-01-01").cast("timestamp").alias("valid_from"),
        F.lit("1996-01-01").cast("timestamp").alias("valid_to"),
    ).unionByName(
        c.filter(F.col("c_acctbal") < 0).select(
            F.col("c_custkey").alias("k"),
            F.lit("LATE").alias("segment"),
            F.lit("1996-01-01").cast("timestamp").alias("valid_from"),
            F.lit(None).cast("timestamp").alias("valid_to"),
        )
    )
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("k"),
        F.col("o_orderdate").cast("timestamp").alias("ts"),
        "o_totalprice",
    )
    j = pit_join(o, dim, key_cols=["k"], ts_col="ts")
    return (
        j.groupBy(
            F.coalesce("segment", F.lit("(no-version)")).alias("segment")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
        .orderBy("segment")
    )


# Oracle: the k-join greedy times + quantile_cont — DuckDB's
# interpolated quantile is the same estimator as Spark's percentile().
_FUNNEL_LATENCY_SQL = """
WITH e AS (SELECT * FROM events WHERE event_id % 3 = 0),
s0 AS (SELECT user_id, min(ts) AS t FROM e WHERE event_type = 'signup' GROUP BY 1),
s1 AS (SELECT e.user_id, min(e.ts) AS t FROM e JOIN s0 USING (user_id)
       WHERE e.event_type = 'view' AND e.ts > s0.t GROUP BY 1),
s2 AS (SELECT e.user_id, min(e.ts) AS t FROM e JOIN s1 USING (user_id)
       WHERE e.event_type = 'click' AND e.ts > s1.t GROUP BY 1),
g1 AS (SELECT (epoch_us(s1.t) - epoch_us(s0.t)) / 1000000.0 AS gap
       FROM s1 JOIN s0 USING (user_id)),
g2 AS (SELECT (epoch_us(s2.t) - epoch_us(s1.t)) / 1000000.0 AS gap
       FROM s2 JOIN s1 USING (user_id))
SELECT 1 AS step_idx, 'view' AS step, CAST(count(*) AS BIGINT) AS n_users,
       round(quantile_cont(gap, 0.5), 6) AS p50,
       round(quantile_cont(gap, 0.9), 6) AS p90
FROM g1
UNION ALL
SELECT 2, 'click', CAST(count(*) AS BIGINT),
       round(quantile_cont(gap, 0.5), 6), round(quantile_cont(gap, 0.9), 6)
FROM g2
ORDER BY step_idx
"""


@register("events_funnel_latency", _FUNNEL_LATENCY_SQL)
def events_funnel_latency_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transition-time percentiles between funnel steps
    (operators/funnel.py funnel_latency): p50/p90 seconds from each
    step's greedy completion to the next, over the same cohort
    `events_funnel_onepass` counts. Gaps are exact microsecond diffs
    (unix_micros first, divide second — casting each timestamp to
    double loses ~4e-7 s at epoch magnitude)."""
    from weaviate_txtai_spark.operators.funnel import funnel_latency

    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") % 3 == 0)
    return funnel_latency(ev, ["signup", "view", "click"]).orderBy("step_idx")


_ORDER_KCORE_SQL = """
WITH sz AS (SELECT o_custkey, count(*) AS n FROM orders GROUP BY 1)
SELECT o.o_orderkey AS node, CAST(sz.n - 1 AS BIGINT) AS degree
FROM orders o JOIN sz ON o.o_custkey = sz.o_custkey
WHERE sz.n >= 16
ORDER BY node
"""


@register("order_clique_kcore", _ORDER_KCORE_SQL)
def order_clique_kcore_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-core decomposition by iterative peeling (operators/graph.py
    k_core, k=15): per-customer order CLIQUES give a closed-form truth
    (a K_n clique survives the k-core iff n ≥ k+1, every member at
    degree n−1) while the engine runs the real degree-peel fixpoint
    loop with no knowledge of the clique structure — the same
    truth-vs-machinery split as `order_clique_triangles` and
    `order_chain_components`. Cascading peel depth is pinned separately
    in tests/test_batch7_ops.py (cycle + tail path)."""
    from weaviate_txtai_spark.operators.graph import k_core

    orders = load_table(spark, sf_dir, "orders")
    a = orders.select("o_custkey", F.col("o_orderkey").alias("k1"))
    b = orders.select("o_custkey", F.col("o_orderkey").alias("k2"))
    edges = (
        a.join(b, "o_custkey")
        .filter(F.col("k1") < F.col("k2"))
        .select(F.col("k1").alias("src"), F.col("k2").alias("dst"))
    )
    return k_core(edges, 15).orderBy("node")


# Oracle: the literal EWMA recursion in a recursive CTE (the cusum
# pattern) — the Spark side is a one-shuffle array fold, so the hash
# match proves the fold implements the recursion exactly.
_EVENTS_EWMA_SQL = """
WITH RECURSIVE d AS (
  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
         CAST(count(*) AS DOUBLE) AS x
  FROM events GROUP BY 1, 2),
o AS (SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY day) AS rn
      FROM d),
r AS (
  SELECT event_type, day, x, rn, x AS s FROM o WHERE rn = 1
  UNION ALL
  SELECT o.event_type, o.day, o.x, o.rn, 0.3 * o.x + 0.7 * r.s
  FROM r JOIN o ON o.event_type = r.event_type AND o.rn = r.rn + 1)
SELECT event_type, day, x, round(s, 6) AS ewma
FROM r ORDER BY event_type, day
"""


@register("events_daily_ewma", _EVENTS_EWMA_SQL)
def events_daily_ewma_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially weighted moving average of daily event volume per
    type (operators/changepoint.py ewma, α=0.3): the non-associative
    recursion as ONE group-keyed shuffle + an O(n) array fold — no
    per-row window, no driver loop. Oracle = the literal recursion in
    a recursive CTE."""
    from weaviate_txtai_spark.operators.changepoint import ewma

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).cast("double").alias("x"))
    return ewma(daily, "event_type", "day", "x", alpha=0.3).orderBy(
        "event_type", "day"
    )


# --------------------------------------------------------------------------
# Round 7: robust means, k-anonymity, CDC-log time travel
# (operators/profile.py, scd.py log_state_as_of)
# --------------------------------------------------------------------------

_TRIMMED_MEANS_SQL = """
WITH band AS (
  SELECT l_returnflag,
         quantile_cont(l_extendedprice, 0.05) AS lo,
         quantile_cont(l_extendedprice, 0.95) AS hi
  FROM lineitem GROUP BY 1)
SELECT l.l_returnflag, CAST(count(*) AS BIGINT) AS n,
       round(avg(l_extendedprice)
               FILTER (l_extendedprice >= lo AND l_extendedprice <= hi),
             6) AS trimmed_mean,
       round(avg(least(greatest(l_extendedprice, lo), hi)), 6) AS winsor_mean
FROM lineitem l JOIN band b ON l.l_returnflag = b.l_returnflag
GROUP BY l.l_returnflag ORDER BY l.l_returnflag
"""


@register("lineitem_trimmed_means", _TRIMMED_MEANS_SQL)
def lineitem_trimmed_means_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5–95% trimmed and winsorized price means per return flag
    (operators/profile.py trimmed_means) — the robust-location tier
    between the raw mean and the median: one exact percentile
    aggregate for the band, one join back, one aggregate."""
    from weaviate_txtai_spark.operators.profile import trimmed_means

    li = load_table(spark, sf_dir, "lineitem").withColumnRenamed(
        "l_extendedprice", "price"
    )
    return (
        trimmed_means(li, "price", group_col="l_returnflag")
        .orderBy("l_returnflag")
    )


_K_ANON_SQL = """
WITH g AS (
  SELECT o_orderstatus, year(o_orderdate) AS y, month(o_orderdate) AS m,
         o_orderpriority, count(*) AS c
  FROM orders GROUP BY 1, 2, 3, 4)
SELECT CAST(5 AS INT) AS k,
       CAST(sum(c) AS BIGINT) AS n_rows,
       CAST(count(*) AS BIGINT) AS n_groups,
       CAST(count(*) FILTER (c < 5) AS BIGINT) AS risky_groups,
       CAST(coalesce(sum(c) FILTER (c < 5), 0) AS BIGINT) AS risky_rows,
       round(coalesce(sum(c) FILTER (c < 5), 0) * 1.0 / sum(c), 6)
         AS risky_frac
FROM g
"""


@register("orders_k_anonymity", _K_ANON_SQL)
def orders_k_anonymity_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity release gate over (status, year, month, priority)
    quasi-identifiers (operators/profile.py k_anonymity_report, k=5):
    the fraction of rows re-identifiable because their quasi-identifier
    combination is shared by < k rows. One groupBy + a 1-row
    aggregate — the governance check a corpus export runs before
    shipping."""
    from weaviate_txtai_spark.operators.profile import k_anonymity_report

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderstatus",
        F.year("o_orderdate").alias("y"),
        F.month("o_orderdate").alias("m"),
        "o_orderpriority",
    )
    return k_anonymity_report(
        o, ["o_orderstatus", "y", "m", "o_orderpriority"], k=5
    )


# Oracle: per-key argmax via max_by over the version-filtered log —
# replayed directly; the time-travel semantics live in the version
# filter + delete handling.
_LOG_TIME_TRAVEL_SQL = """
WITH log AS (
  SELECT o_custkey AS k, o_totalprice AS payload, o_orderkey AS version,
         CASE WHEN o_orderstatus = 'F' THEN 'delete' ELSE 'upsert' END AS op
  FROM orders),
cut AS (SELECT CAST(quantile_disc(version, 0.5) AS BIGINT) AS v FROM log),
last AS (
  SELECT k, max_by(payload, version) AS payload, max_by(op, version) AS op
  FROM log, cut WHERE version <= cut.v GROUP BY k)
SELECT k AS custkey, round(payload, 2) AS last_totalprice
FROM last WHERE op <> 'delete'
ORDER BY custkey
"""


@register("orders_log_time_travel", _LOG_TIME_TRAVEL_SQL)
def orders_log_time_travel_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC-log time travel (operators/scd.py log_state_as_of): orders
    as an append log (key = customer, version = orderkey, 'F' status =
    delete), materialized AS OF the median version — per key one
    associative max_by, no window over the log. The lakehouse
    time-travel read as plain DataFrame algebra."""
    from weaviate_txtai_spark.operators.scd import log_state_as_of

    o = load_table(spark, sf_dir, "orders")
    log = o.select(
        F.col("o_custkey").alias("k"),
        F.col("o_totalprice").alias("payload"),
        F.col("o_orderkey").alias("version"),
        F.when(F.col("o_orderstatus") == "F", "delete")
        .otherwise("upsert")
        .alias("op"),
    )
    cut = log.agg(
        F.percentile_approx("version", 0.5, 2147483647).alias("v")
    ).collect()[0]["v"]
    state = log_state_as_of(log, key_cols=["k"], as_of=int(cut))
    return state.select(
        F.col("k").alias("custkey"),
        F.round("payload", 2).alias("last_totalprice"),
    ).orderBy("custkey")


# Closed-form truths again (the order-clique trick): every node of a
# K_n clique has degree n−1, edges = ΣC(n,2), and du = dv EXACTLY on
# every edge, so assortativity is 1 whenever two clique sizes differ
# (NULL when degree-regular). The Spark side builds real edges and
# runs the real machinery.
_ORDER_GRAPH_SUMMARY_SQL = """
WITH sz AS (SELECT o_custkey, count(*) AS n FROM orders
            GROUP BY 1 HAVING count(*) >= 2),
d AS (SELECT o.o_orderkey, sz.n - 1 AS deg
      FROM orders o JOIN sz USING (o_custkey))
SELECT CAST(count(*) AS BIGINT) AS n_nodes,
       CAST(sum(deg) / 2 AS BIGINT) AS n_edges,
       round(sum(deg) * 1.0 / count(*), 6) AS avg_degree,
       CAST(max(deg) AS BIGINT) AS max_degree,
       round(sum(deg) / (count(*) * (count(*) - 1.0)), 6) AS density,
       CASE WHEN count(DISTINCT deg) > 1 THEN 1.0 END AS assortativity
FROM d
"""


@register("order_graph_summary", _ORDER_GRAPH_SUMMARY_SQL)
def order_graph_summary_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structural summary panel (operators/graph.py graph_summary) of
    the per-customer order-clique graph: node/edge counts, degree
    stats, density, degree assortativity (raw-moment Pearson,
    try_divide-nulled for regular graphs). Clique structure gives
    every statistic a closed form the oracle states directly."""
    from weaviate_txtai_spark.operators.graph import graph_summary

    orders = load_table(spark, sf_dir, "orders")
    a = orders.select("o_custkey", F.col("o_orderkey").alias("k1"))
    b = orders.select("o_custkey", F.col("o_orderkey").alias("k2"))
    edges = (
        a.join(b, "o_custkey")
        .filter(F.col("k1") < F.col("k2"))
        .select(F.col("k1").alias("src"), F.col("k2").alias("dst"))
    )
    return graph_summary(edges)


_ORDER_POWERLAW_SQL = """
WITH sz AS (SELECT o_custkey, count(*) AS n FROM orders
            GROUP BY 1 HAVING count(*) >= 2),
d AS (SELECT sz.n - 1 AS deg, o.o_orderkey
      FROM orders o JOIN sz USING (o_custkey))
SELECT CAST(count(*) AS BIGINT) AS n_tail, CAST(1 AS INT) AS d_min,
       round(1 + count(*) * 1.0 / sum(ln(deg / 0.5)), 6) AS alpha
FROM d
"""


@register("order_degree_powerlaw", _ORDER_POWERLAW_SQL)
def order_degree_powerlaw_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Power-law exponent MLE of the degree distribution
    (operators/graph.py degree_powerlaw, Clauset 2009) — the
    heavy-tail gauge that decides whether degree caps / orientation
    are load-bearing on a corpus. Clique degrees give the oracle a
    construction-free closed form."""
    from weaviate_txtai_spark.operators.graph import degree_powerlaw

    orders = load_table(spark, sf_dir, "orders")
    a = orders.select("o_custkey", F.col("o_orderkey").alias("k1"))
    b = orders.select("o_custkey", F.col("o_orderkey").alias("k2"))
    edges = (
        a.join(b, "o_custkey")
        .filter(F.col("k1") < F.col("k2"))
        .select(F.col("k1").alias("src"), F.col("k2").alias("dst"))
    )
    return degree_powerlaw(edges, d_min=1)


# Oracle: FULL |X|×|Y| grid (cross join + left join, absent cells o=0)
# and marginal-table entropies — independent of the Spark side's
# present-cells-only decomposition with the n−Σe missing-cell χ²
# correction, so the hash match proves that correction exact.
_EVENTS_DEPENDENCE_SQL = """
WITH b AS (SELECT event_type AS x, hour(ts) AS y FROM events),
j AS (SELECT x, y, count(*) * 1.0 AS c FROM b GROUP BY 1, 2),
rx AS (SELECT x, sum(c) AS cx FROM j GROUP BY 1),
ry AS (SELECT y, sum(c) AS cy FROM j GROUP BY 1),
t AS (SELECT sum(c) AS n FROM j),
grid AS (
  SELECT rx.cx, ry.cy, coalesce(jj.c, 0) AS o, t.n
  FROM rx CROSS JOIN ry CROSS JOIN t
  LEFT JOIN j jj ON jj.x = rx.x AND jj.y = ry.y),
hx AS (SELECT -sum(cx / t.n * log2(cx / t.n)) AS v FROM rx, t),
hy AS (SELECT -sum(cy / t.n * log2(cy / t.n)) AS v FROM ry, t),
hxy AS (SELECT -sum(c / t.n * log2(c / t.n)) AS v FROM j, t),
chi AS (SELECT sum(pow(o - cx * cy / n, 2) / (cx * cy / n)) AS v FROM grid),
k AS (SELECT (SELECT count(*) FROM rx) AS kx, (SELECT count(*) FROM ry) AS ky)
SELECT CAST(t.n AS BIGINT) AS n,
       round(hx.v, 6) AS h_x, round(hy.v, 6) AS h_y,
       round(hxy.v, 6) AS h_xy,
       round(hx.v + hy.v - hxy.v, 6) AS mi,
       round((hx.v + hy.v - hxy.v) / sqrt(hx.v * hy.v), 6) AS nmi,
       round(chi.v, 6) AS chi2,
       CAST((k.kx - 1) * (k.ky - 1) AS BIGINT) AS dof,
       round(sqrt(chi.v / (t.n * least(k.kx - 1, k.ky - 1))), 6) AS cramers_v
FROM t, hx, hy, hxy, chi, k
"""


@register("events_type_hour_dependence", _EVENTS_DEPENDENCE_SQL)
def events_type_hour_dependence_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Categorical dependence panel between event type and hour of day
    (operators/infotheory.py): entropies, mutual information, χ²
    independence, Cramér's V — all from ONE joint-count shuffle;
    marginals/totals are aggregates over the |X|·|Y| joint table, and
    absent cells' χ² mass is folded algebraically (n − Σ_present e)
    instead of materializing the grid."""
    from weaviate_txtai_spark.operators.infotheory import (
        categorical_dependence,
    )

    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.hour("ts").alias("hr")
    )
    return categorical_dependence(ev, "event_type", "hr")


# Oracle: literal product() window (DuckDB has a true product
# aggregate) — the Spark side folds exp(Σ ln) with a zero guard, so
# the hash match checks genuinely different arithmetic.
_SURVIVAL_SQL = """
WITH mx AS (SELECT max(ts) AS m FROM events),
s AS (SELECT user_id, min(ts) AS t0 FROM events
      WHERE event_type = 'signup' GROUP BY 1),
p AS (SELECT e.user_id, min(e.ts) AS t1 FROM events e JOIN s USING (user_id)
      WHERE e.event_type = 'purchase' AND e.ts > s.t0 GROUP BY 1),
subj AS (
  SELECT CASE WHEN s.user_id % 2 = 0 THEN 'A' ELSE 'B' END AS variant,
         CASE WHEN p.t1 IS NOT NULL
              THEN CAST(floor(epoch(p.t1 - s.t0) / 86400) AS INT)
              ELSE CAST(floor(epoch(mx.m - s.t0) / 86400) AS INT) END AS t,
         CASE WHEN p.t1 IS NOT NULL THEN 1 ELSE 0 END AS e
  FROM s LEFT JOIN p USING (user_id), mx),
c AS (SELECT variant, t, CAST(sum(e) AS BIGINT) AS n_events,
             CAST(sum(1 - e) AS BIGINT) AS n_censored
      FROM subj GROUP BY 1, 2),
k AS (SELECT *, sum(n_events + n_censored)
               OVER (PARTITION BY variant ORDER BY t
                     ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
               AS n_risk
      FROM c)
SELECT variant, t, CAST(n_risk AS BIGINT) AS n_risk, n_events, n_censored,
       round(product(1 - n_events * 1.0 / n_risk)
               OVER (PARTITION BY variant ORDER BY t
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             6) AS survival
FROM k ORDER BY variant, t
"""


@register("signup_to_purchase_survival", _SURVIVAL_SQL)
def signup_to_purchase_survival_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan–Meier time-to-first-purchase curves per even/odd user
    cohort (operators/survival.py): users who never purchase are
    right-censored at the end of observation instead of dropped — the
    unbiased way to compare conversion LATENCY between variants. Windows
    run over each cohort's distinct-duration table, never per subject."""
    from weaviate_txtai_spark.operators.survival import kaplan_meier

    ev = load_table(spark, sf_dir, "events")
    mx = ev.agg(F.max("ts").alias("m"))
    s = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t0"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s, "user_id")
        .filter(F.col("ts") > F.col("t0"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    subj = (
        s.join(p, "user_id", "left")
        .join(F.broadcast(mx))
        .select(
            F.when(F.col("user_id") % 2 == 0, "A").otherwise("B").alias(
                "variant"
            ),
            F.floor(
                (
                    F.unix_micros(F.coalesce("t1", "m"))
                    - F.unix_micros("t0")
                )
                / F.lit(86400e6)
            ).cast("int").alias("t"),
            F.when(F.col("t1").isNotNull(), 1).otherwise(0).alias("e"),
        )
    )
    return kaplan_meier(subj, "t", "e", group_col="variant").orderBy(
        "variant", "t"
    )


# Oracle: the day×activity range join — independent of the
# cover-explode plan (each formulation "slides" differently).
_ROLLING_WAU_SQL = """
WITH kd AS (SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS d
            FROM events),
bounds AS (SELECT min(d) AS mn, max(d) AS mx FROM kd),
days AS (SELECT CAST(unnest(generate_series(mn, mx, INTERVAL 1 DAY)) AS DATE)
           AS d FROM bounds)
SELECT days.d AS day, CAST(count(DISTINCT kd.user_id) AS BIGINT) AS n_distinct
FROM days JOIN kd ON kd.d <= days.d AND kd.d >= days.d - 6
GROUP BY days.d
HAVING count(DISTINCT kd.user_id) > 0
ORDER BY day
"""


@register("events_rolling_wau", _ROLLING_WAU_SQL)
def events_rolling_wau_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day distinct active users per day
    (operators/resample.py rolling_distinct): sliding DISTINCT doesn't
    decompose into per-day partials, so the exact plan cover-explodes
    each (user, day) pair into the ≤7 window ends it serves and runs
    ONE countDistinct per end — ×7 linear fan-out instead of the
    oracle's day×activity range join."""
    from weaviate_txtai_spark.operators.resample import rolling_distinct

    ev = load_table(spark, sf_dir, "events")
    out = rolling_distinct(ev, ts_col="ts", key_col="user_id", window_days=7)
    return out.orderBy("day")


_BASKET_TRIPLES_SQL = """
WITH b AS (SELECT DISTINCT l_orderkey AS o, l_partkey % 512 AS p
           FROM lineitem)
SELECT a.p AS p1, c.p AS p2, d.p AS p3,
       CAST(count(*) AS BIGINT) AS set_count
FROM b a JOIN b c ON a.o = c.o AND a.p < c.p
         JOIN b d ON a.o = d.o AND c.p < d.p
GROUP BY 1, 2, 3 HAVING count(*) >= 2
ORDER BY p1, p2, p3
"""


@register("basket_triples", _BASKET_TRIPLES_SQL)
def basket_triples_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent 3-itemsets over order baskets (operators/itemsets.py
    frequent_itemsets, size=3): candidate trios come from a map-side
    C(|basket|, 3) combination explode + one aggregate; the oracle is
    the 3-way basket self-join (two shuffling joins of the relation),
    so the hash match proves the generator equivalent. Items are part
    BUCKETS (l_partkey % 512): with raw part keys the trip-repeat
    probability collapses as the catalog grows and the r10 sf0.1
    sweep found the gate VACUOUS (0 rows both sides) — buckets keep
    the itemset space dense at every SF."""
    from weaviate_txtai_spark.operators.itemsets import frequent_itemsets

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", (F.col("l_partkey") % 512).alias("item")
    )
    return frequent_itemsets(
        li, "l_orderkey", "item", size=3, min_count=2
    ).orderBy("p1", "p2", "p3")


_COUNTED_PCTL_SQL = """
WITH q AS (
  SELECT o_orderpriority AS grp, CAST(p AS DOUBLE) AS p,
         round(CASE p WHEN 0.5 THEN quantile_cont(o_totalprice, 0.5)
                      WHEN 0.9 THEN quantile_cont(o_totalprice, 0.9)
                      ELSE quantile_cont(o_totalprice, 0.99) END, 6) AS value
  FROM orders CROSS JOIN (VALUES (0.5), (0.9), (0.99)) AS ps(p)
  GROUP BY o_orderpriority, ps.p)
SELECT grp, p, value FROM q ORDER BY grp, p
"""


@register("price_percentiles_counted", _COUNTED_PCTL_SQL)
def price_percentiles_counted_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles WITHOUT per-group buffering
    (operators/rankstats.py group_percentiles): `price_quantiles`' own
    docstring concedes that exact `percentile()` buffers every group
    value and a 100 TB run must downgrade to approx — this third tier
    keeps exactness by resolving ⌊h⌋/⌈h⌉ positions against the
    (group, value) COUNT table with a backward as-of and interpolating.
    The oracle is quantile_cont, i.e. the buffering implementation —
    the hash match proves the counted form equals it."""
    from weaviate_txtai_spark.operators.rankstats import group_percentiles

    orders = load_table(spark, sf_dir, "orders")
    return (
        group_percentiles(
            orders, "o_totalprice", [0.5, 0.9, 0.99],
            group_col="o_orderpriority",
        )
        .withColumnRenamed("o_orderpriority", "grp")
        .orderBy("grp", "p")
    )


# p-values via the Zelen–Severo Φ polynomial (|ε|<7.5e-8) computed on
# the ROUNDED statistic in BOTH engines — deterministic arithmetic, so
# the oracle replays it exactly.
_AB_PANEL_SQL = """
WITH u AS (
  SELECT user_id,
         CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS g,
         max(CASE WHEN event_type = 'purchase' AND value > 180 THEN 1 ELSE 0 END) AS s,
         sum(value) AS v
  FROM events GROUP BY 1),
zt AS (
  SELECT round((sum(s) FILTER (g='A') * 1.0 / count(*) FILTER (g='A')
                - sum(s) FILTER (g='B') * 1.0 / count(*) FILTER (g='B'))
               / sqrt((sum(s) * 1.0 / count(*)) * (1 - sum(s) * 1.0 / count(*))
                      * (1.0 / count(*) FILTER (g='A')
                         + 1.0 / count(*) FILTER (g='B'))), 6) AS stat
  FROM u),
r AS (SELECT g, rank() OVER (ORDER BY v)
               + (count(*) OVER (PARTITION BY v) - 1) / 2.0 AS rr,
             v FROM u),
tie AS (SELECT coalesce(sum(c*c*c - c), 0) AS tie
        FROM (SELECT count(*) AS c FROM u GROUP BY v)),
mw AS (
  SELECT round((sum(rr) FILTER (g='A')
                - count(*) FILTER (g='A') * (count(*) FILTER (g='A') + 1) / 2
                - count(*) FILTER (g='A') * count(*) FILTER (g='B') / 2.0)
               / sqrt(count(*) FILTER (g='A') * count(*) FILTER (g='B') / 12.0
                      * ((count(*) + 1)
                         - max(tie.tie) * 1.0 / (count(*) * (count(*) - 1)))),
               6) AS stat
  FROM r, tie),
panel AS (
  SELECT 'conversion_z' AS test, stat FROM zt
  UNION ALL SELECT 'value_mwu_z', stat FROM mw)
SELECT test, stat,
       round(2.0 * (exp(-abs(stat) * abs(stat) / 2.0) / 2.5066282746310002)
             * ((1.0 / (1.0 + 0.2316419 * abs(stat)))
                * (0.319381530
                   + (1.0 / (1.0 + 0.2316419 * abs(stat)))
                     * (-0.356563782
                        + (1.0 / (1.0 + 0.2316419 * abs(stat)))
                          * (1.781477937
                             + (1.0 / (1.0 + 0.2316419 * abs(stat)))
                               * (-1.821255978
                                  + (1.0 / (1.0 + 0.2316419 * abs(stat)))
                                    * 1.330274429))))), 6) AS p_value
FROM panel ORDER BY test
"""


@register("ab_experiment_panel", _AB_PANEL_SQL)
def ab_experiment_panel_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The experiment readout PANEL: conversion z and Mann–Whitney z
    side by side with two-sided p-values (operators/abtest.py
    normal_two_sided_p — the Zelen–Severo Φ polynomial as pure codegen;
    Spark has no erf, and a Python UDF would leave codegen). p is
    computed on the rounded statistic in both engines so the hash
    match is exact."""
    from weaviate_txtai_spark.operators.abtest import (
        mann_whitney_u,
        normal_two_sided_p,
        two_proportion_ztest,
    )

    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.max(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("value") > 180), 1
            ).otherwise(0)
        ).alias("converted"),
        F.sum("value").alias("v"),
    ).select(
        F.when(F.col("user_id") % 2 == 0, "A").otherwise("B").alias("g"),
        "converted",
        "v",
    )
    zt = two_proportion_ztest(
        per_user, "g", "converted", group_a="A", group_b="B"
    ).select(F.lit("conversion_z").alias("test"), F.col("z").alias("stat"))
    mw = mann_whitney_u(
        per_user, "g", "v", group_a="A", group_b="B"
    ).select(F.lit("value_mwu_z").alias("test"), F.col("z").alias("stat"))
    return (
        zt.unionByName(mw)
        .select(
            "test",
            "stat",
            F.round(normal_two_sided_p(F.col("stat")), 6).alias("p_value"),
        )
        .orderBy("test")
    )


_TWA_SQL = """
WITH o AS (
  SELECT event_type, ts, value,
         (epoch_us(lead(ts) OVER (PARTITION BY event_type
                                  ORDER BY ts, value))
          - epoch_us(ts)) / 1000000.0 AS w
  FROM events)
SELECT event_type, CAST(count(*) AS BIGINT) AS n_samples,
       round(sum(value * w) / sum(w), 6) AS twa
FROM o GROUP BY event_type ORDER BY event_type
"""


@register("events_time_weighted_avg", _TWA_SQL)
def events_time_weighted_avg_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted mean event value per type
    (operators/resample.py time_weighted_avg): each sample weighted by
    how long it HELD (seconds to the next sample), the honest mean for
    irregular series where the arithmetic mean over-weights bursts.
    One group-partitioned lead window + one aggregate; exact
    unix_micros arithmetic (the funnel-latency precision discipline)."""
    from weaviate_txtai_spark.operators.resample import time_weighted_avg

    ev = load_table(spark, sf_dir, "events")
    return time_weighted_avg(
        ev, group_col="event_type", ts_col="ts", value_col="value"
    ).orderBy("event_type")


_WOE_IV_SQL = """
WITH u AS (
  SELECT user_id,
         max(CASE WHEN event_type = 'purchase' AND value > 180
                  THEN 1 ELSE 0 END) AS y,
         count(*) AS n_ev
  FROM events GROUP BY 1),
f AS (SELECT CASE WHEN n_ev < 50 THEN 'low'
                  WHEN n_ev < 80 THEN 'mid' ELSE 'high' END AS activity,
             y FROM u),
lv AS (SELECT activity, CAST(count(*) AS BIGINT) AS n,
              sum(y) * 1.0 AS g, sum(1 - y) * 1.0 AS b
       FROM f GROUP BY 1),
t AS (SELECT sum(g) AS tg, sum(b) AS tb FROM lv)
SELECT activity, n,
       CAST(g AS BIGINT) AS n_good, CAST(b AS BIGINT) AS n_bad,
       round(ln((greatest(g, 0.5) / t.tg) / (greatest(b, 0.5) / t.tb)), 6)
         AS woe,
       round((greatest(g, 0.5) / t.tg - greatest(b, 0.5) / t.tb)
             * ln((greatest(g, 0.5) / t.tg) / (greatest(b, 0.5) / t.tb)),
             6) AS iv_term
FROM lv, t ORDER BY activity
"""


@register("activity_woe_iv", _WOE_IV_SQL)
def activity_woe_iv_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight of Evidence / Information Value of a bucketed
    activity-level feature against high-value conversion
    (operators/regression.py woe_iv) — the credit-scoring feature
    triage: per level, how the converter/non-converter mass separates,
    Laplace-floored on zero cells; Σ iv_term is the feature's IV."""
    from weaviate_txtai_spark.operators.regression import woe_iv

    ev = load_table(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.max(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("value") > 180), 1
            ).otherwise(0)
        ).alias("y"),
        F.count(F.lit(1)).alias("n_ev"),
    )
    feat = u.select(
        F.when(F.col("n_ev") < 50, "low")
        .when(F.col("n_ev") < 80, "mid")
        .otherwise("high")
        .alias("activity"),
        "y",
    )
    return woe_iv(feat, "activity", "y").orderBy("activity")


# Oracle: the k-join funnel run per cohort + the pooled-z formula.
_FUNNEL_AB_SQL = """
WITH e AS (SELECT *, CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS v
           FROM events WHERE event_id % 3 = 0),
s0 AS (SELECT v, user_id, min(ts) AS t FROM e
       WHERE event_type = 'signup' GROUP BY 1, 2),
s1 AS (SELECT e.v, e.user_id, min(e.ts) AS t
       FROM e JOIN s0 ON e.user_id = s0.user_id AND e.v = s0.v
       WHERE e.event_type = 'view' AND e.ts > s0.t GROUP BY 1, 2),
s2 AS (SELECT e.v, e.user_id, min(e.ts) AS t
       FROM e JOIN s1 ON e.user_id = s1.user_id AND e.v = s1.v
       WHERE e.event_type = 'click' AND e.ts > s1.t GROUP BY 1, 2),
c AS (
  SELECT 0 AS step_idx, 'signup' AS step,
         count(*) FILTER (v = 'A') AS n_a,
         count(*) FILTER (v = 'B') AS n_b FROM s0
  UNION ALL SELECT 1, 'view', count(*) FILTER (v = 'A'),
         count(*) FILTER (v = 'B') FROM s1
  UNION ALL SELECT 2, 'click', count(*) FILTER (v = 'A'),
         count(*) FILTER (v = 'B') FROM s2),
d AS (SELECT n_a AS da, n_b AS db FROM c WHERE step_idx = 0)
SELECT step_idx, step, CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
       round(n_a * 1.0 / d.da, 6) AS rate_a,
       round(n_b * 1.0 / d.db, 6) AS rate_b,
       CASE WHEN step_idx > 0
             AND (n_a + n_b) * 1.0 / (d.da + d.db) > 0
             AND (n_a + n_b) * 1.0 / (d.da + d.db) < 1
            THEN round((n_a * 1.0 / d.da - n_b * 1.0 / d.db)
                       / sqrt(((n_a + n_b) * 1.0 / (d.da + d.db))
                              * (1 - (n_a + n_b) * 1.0 / (d.da + d.db))
                              * (1.0 / d.da + 1.0 / d.db)), 6)
       END AS z
FROM c, d ORDER BY step_idx
"""


@register("events_funnel_ab", _FUNNEL_AB_SQL)
def events_funnel_ab_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel comparison between even/odd user cohorts
    (operators/funnel.py funnel_ab): per step, each cohort's reach
    rate and the pooled two-proportion z — the "did the variant move
    step-2 conversion?" readout, still two one-shuffle funnels + a
    3-row join."""
    from weaviate_txtai_spark.operators.funnel import funnel_ab

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_id") % 3 == 0
    ).withColumn(
        "variant", F.when(F.col("user_id") % 2 == 0, "A").otherwise("B")
    )
    return funnel_ab(
        ev, ["signup", "view", "click"], variant_col="variant",
        group_a="A", group_b="B",
    )


# Oracle: the identical θ/x̄ aggregates + adjustment + Welch formulas
# replayed; pre/post split at day 15 of the 30-day stream.
_CUPED_SQL = """
WITH u AS (
  SELECT user_id,
         CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS v,
         sum(CASE WHEN ts <  TIMESTAMP '2024-01-16' THEN value END) AS x,
         sum(CASE WHEN ts >= TIMESTAMP '2024-01-16' THEN value END) AS y
  FROM events GROUP BY 1),
uu AS (SELECT v, coalesce(x, 0) AS x, y FROM u WHERE y IS NOT NULL),
s AS (SELECT covar_samp(x, y) / var_samp(x) AS theta, avg(x) AS mx FROM uu),
adj AS (SELECT v, y, y - s.theta * (x - s.mx) AS ya FROM uu, s),
w AS (
  SELECT count(*) FILTER (v = 'A') AS na, count(*) FILTER (v = 'B') AS nb,
         avg(y) FILTER (v = 'A') AS mya, avg(y) FILTER (v = 'B') AS myb,
         var_samp(y) FILTER (v = 'A') AS vya,
         var_samp(y) FILTER (v = 'B') AS vyb,
         avg(ya) FILTER (v = 'A') AS maa, avg(ya) FILTER (v = 'B') AS mab,
         var_samp(ya) FILTER (v = 'A') AS vaa,
         var_samp(ya) FILTER (v = 'B') AS vab
  FROM adj)
SELECT round(s.theta, 6) AS theta,
       round((SELECT var_samp(y) FROM uu), 6) AS var_y,
       round((SELECT var_samp(ya) FROM adj), 6) AS var_adj,
       round((mya - myb) / sqrt(vya / na + vyb / nb), 6) AS t_raw,
       round((maa - mab) / sqrt(vaa / na + vab / nb), 6) AS t_cuped
FROM w, s
"""


@register("ab_cuped_readout", _CUPED_SQL)
def ab_cuped_readout_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance-reduced experiment readout
    (operators/abtest.py cuped_adjust, Deng 2013): per-user POST-period
    value adjusted by the PRE-period covariate (θ from one pooled
    aggregate, broadcast back), then Welch t on raw vs adjusted —
    the before/after panel showing how much experiment sensitivity the
    covariate buys. Users with no post-period activity drop; missing
    pre-period covariates default to 0 activity."""
    from weaviate_txtai_spark.operators.abtest import cuped_adjust

    ev = load_table(spark, sf_dir, "events")
    cut = F.lit("2024-01-16").cast("timestamp")
    u = (
        ev.groupBy("user_id")
        .agg(
            F.sum(F.when(F.col("ts") < cut, F.col("value"))).alias("x"),
            F.sum(F.when(F.col("ts") >= cut, F.col("value"))).alias("y"),
        )
        .filter(F.col("y").isNotNull())
        .select(
            F.when(F.col("user_id") % 2 == 0, "A").otherwise("B").alias("v"),
            F.coalesce("x", F.lit(0.0)).alias("x"),
            "y",
        )
    )
    adj = cuped_adjust(u, "y", "x")
    theta = u.agg(
        F.round(
            F.try_divide(
                F.covar_samp(F.col("x"), F.col("y")), F.var_samp("x")
            ),
            6,
        ).alias("theta")
    )
    stats = adj.agg(
        F.count(F.when(F.col("v") == "A", 1)).alias("__na"),
        F.count(F.when(F.col("v") == "B", 1)).alias("__nb"),
        F.avg(F.when(F.col("v") == "A", F.col("y"))).alias("__mya"),
        F.avg(F.when(F.col("v") == "B", F.col("y"))).alias("__myb"),
        F.var_samp(F.when(F.col("v") == "A", F.col("y"))).alias("__vya"),
        F.var_samp(F.when(F.col("v") == "B", F.col("y"))).alias("__vyb"),
        F.avg(F.when(F.col("v") == "A", F.col("adjusted"))).alias("__maa"),
        F.avg(F.when(F.col("v") == "B", F.col("adjusted"))).alias("__mab"),
        F.var_samp(F.when(F.col("v") == "A", F.col("adjusted"))).alias("__vaa"),
        F.var_samp(F.when(F.col("v") == "B", F.col("adjusted"))).alias("__vab"),
        F.round(F.var_samp("y"), 6).alias("var_y"),
        F.round(F.var_samp("adjusted"), 6).alias("var_adj"),
    )
    return stats.join(F.broadcast(theta)).select(
        "theta",
        "var_y",
        "var_adj",
        F.round(
            (F.col("__mya") - F.col("__myb"))
            / F.sqrt(F.col("__vya") / F.col("__na") + F.col("__vyb") / F.col("__nb")),
            6,
        ).alias("t_raw"),
        F.round(
            (F.col("__maa") - F.col("__mab"))
            / F.sqrt(F.col("__vaa") / F.col("__na") + F.col("__vab") / F.col("__nb")),
            6,
        ).alias("t_cuped"),
    )


_WEIGHTED_PCTL_SQL = """
WITH ws AS (SELECT l_returnflag AS grp, l_extendedprice AS v,
                   sum(l_quantity) AS w
            FROM lineitem GROUP BY 1, 2),
cum AS (SELECT grp, v, sum(w) OVER (PARTITION BY grp ORDER BY v) AS cw
        FROM ws),
t AS (SELECT grp, sum(w) AS tw FROM ws GROUP BY 1),
q AS (SELECT grp, tw, CAST(p AS DOUBLE) AS p
      FROM t CROSS JOIN (VALUES (0.5), (0.9)) AS ps(p))
SELECT q.grp, q.p, round(min(cum.v), 6) AS value
FROM q JOIN cum ON q.grp = cum.grp AND cum.cw >= q.p * q.tw
GROUP BY q.grp, q.p ORDER BY q.grp, q.p
"""


@register("quantity_weighted_price_pctl", _WEIGHTED_PCTL_SQL)
def quantity_weighted_price_pctl_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QUANTITY-weighted price percentiles per return flag
    (operators/rankstats.py weighted_percentiles): the cutoff below
    which half the UNITS (not half the line items) ship — the same
    knob a token-budgeted quality filter needs ("keep the best 60% of
    tokens, not documents"). Count-table discipline: weight sums per
    value, a group-partitioned prefix sum, one threshold pick — no
    buffering."""
    from weaviate_txtai_spark.operators.rankstats import weighted_percentiles

    li = load_table(spark, sf_dir, "lineitem")
    return (
        weighted_percentiles(
            li, "l_extendedprice", "l_quantity", [0.5, 0.9],
            group_col="l_returnflag",
        )
        .withColumnRenamed("l_returnflag", "grp")
        .orderBy("grp", "p")
    )


# --------------------------------------------------------------------------
# Round 8: leakage-safe feature encoding, calibration eval, FD discovery,
# sequential pattern mining, HITS (operators/encoding.py, calibration.py,
# fd.py, seqmine.py, graph.py hits)
# --------------------------------------------------------------------------

_TARGET_ENC_SQL = """
WITH b AS (
  SELECT o_orderpriority AS cat, CAST(o_orderkey % 5 AS INTEGER) AS fold,
         CASE WHEN o_totalprice > 150000 THEN 1.0 ELSE 0.0 END AS y
  FROM orders),
cf AS (SELECT cat, fold, count(*) AS n, sum(y) AS s FROM b GROUP BY 1, 2),
t AS (SELECT sum(n) AS tn, sum(s) AS ts FROM cf),
ft AS (SELECT fold, sum(n) AS fn, sum(s) AS fs FROM cf GROUP BY 1),
gm AS (SELECT fold, (t.ts - ft.fs) / (t.tn - ft.fn) AS g FROM ft, t),
ct AS (SELECT cat, sum(n) AS cn, sum(s) AS cs FROM cf GROUP BY 1)
SELECT cf.cat AS o_orderpriority, cf.fold,
       CAST(ct.cn - cf.n AS BIGINT) AS n_oof,
       round((ct.cs - cf.s + 20.0 * gm.g) / (ct.cn - cf.n + 20.0), 6) AS enc
FROM cf JOIN ct USING (cat) JOIN gm USING (fold)
ORDER BY 1, 2
"""


@register("orders_priority_target_enc", _TARGET_ENC_SQL)
def orders_priority_target_enc_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-fold out-of-fold target encoding of order priority against
    high-value conversion (operators/encoding.py) — the leakage-safe
    category→mean-target mapping: each (category, fold) cell's encoding
    is built from every fold EXCEPT its own, shrunk toward the global
    OOF mean by a pseudo-count of 20 (Micci-Barreca smoothing). The
    fold key is o_orderkey % 5 so the DuckDB twin can replay it."""
    from weaviate_txtai_spark.operators.encoding import target_encoding_map

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderpriority",
        (F.col("o_totalprice") > 150000).cast("double").alias("y"),
        (F.col("o_orderkey") % 5).cast("int").alias("fold"),
    )
    return target_encoding_map(
        orders, "o_orderpriority", "y", fold_col="fold", n_folds=5,
        smoothing=20.0,
    ).orderBy("o_orderpriority", "fold")


_CALIB_BINS_SQL = """
WITH b AS (
  SELECT least(greatest(value / 200.0, 0.0), 1.0) AS p,
         CASE WHEN event_type = 'purchase' THEN 1.0 ELSE 0.0 END AS y
  FROM events WHERE value IS NOT NULL),
g AS (
  SELECT least(CAST(floor(p * 10) AS INTEGER), 9) AS bin,
         count(*) AS n, sum(p) AS sp, sum(y) AS sy
  FROM b GROUP BY 1)
SELECT bin, CAST(n AS BIGINT) AS n,
       round(sp / n, 6) AS avg_prob,
       round(sy / n, 6) AS frac_pos,
       round((sp - sy) / n, 6) AS gap
FROM g ORDER BY bin
"""


@register("events_calibration_bins", _CALIB_BINS_SQL)
def events_calibration_bins_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability diagram of a value-derived pseudo-probability
    against purchase conversion (operators/calibration.py
    reliability_bins): per equal-width bin, mean predicted probability
    vs empirical positive rate — the gap column is the per-bin
    over/under-confidence a score-thresholded data filter inherits."""
    from weaviate_txtai_spark.operators.calibration import reliability_bins

    ev = load_table(spark, sf_dir, "events")
    scored = ev.filter(F.col("value").isNotNull()).select(
        (F.col("value") / 200.0).alias("p"),
        (F.col("event_type") == "purchase").cast("double").alias("y"),
    )
    return reliability_bins(scored, "p", "y", n_bins=10).orderBy("bin")


_CALIB_SUMMARY_SQL = """
WITH b AS (
  SELECT least(greatest(value / 200.0, 0.0), 1.0) AS p,
         CASE WHEN event_type = 'purchase' THEN 1.0 ELSE 0.0 END AS y
  FROM events WHERE value IS NOT NULL),
g AS (
  SELECT least(CAST(floor(p * 10) AS INTEGER), 9) AS bin, count(*) AS n,
         sum(p) AS sp, sum(y) AS sy, sum((p - y) * (p - y)) AS sq
  FROM b GROUP BY 1)
SELECT CAST(sum(n) AS BIGINT) AS n,
       round(sum(sq) / sum(n), 6) AS brier,
       round(sum(abs(sp - sy)) / sum(n), 6) AS ece
FROM g
"""


@register("events_calibration_summary", _CALIB_SUMMARY_SQL)
def events_calibration_summary_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brier score + expected calibration error of the same
    pseudo-probability (operators/calibration.py calibration_summary):
    the one-row readout a filter-threshold review starts from."""
    from weaviate_txtai_spark.operators.calibration import calibration_summary

    ev = load_table(spark, sf_dir, "events")
    scored = ev.filter(F.col("value").isNotNull()).select(
        (F.col("value") / 200.0).alias("p"),
        (F.col("event_type") == "purchase").cast("double").alias("y"),
    )
    return calibration_summary(scored, "p", "y", n_bins=10)


_FD_PROFILE_SQL = """
WITH c1 AS (
  SELECT o_orderkey AS x, o_custkey AS y FROM orders),
g1 AS (SELECT x, max(c) AS keep, sum(c) AS n, count(*) AS ny
       FROM (SELECT x, y, count(*) AS c FROM c1 GROUP BY 1, 2) GROUP BY x),
r1 AS (SELECT 'o_orderkey' AS determinant, 'o_custkey' AS dependent,
              CAST(sum(n) AS BIGINT) AS n_rows,
              CAST(count(*) AS BIGINT) AS n_groups,
              CAST(sum(CASE WHEN ny > 1 THEN 1 ELSE 0 END) AS BIGINT)
                AS n_violating_groups,
              round(1 - sum(keep) * 1.0 / sum(n), 6) AS g3_error
       FROM g1),
c2 AS (
  SELECT o_custkey AS x, o_orderpriority AS y FROM orders),
g2 AS (SELECT x, max(c) AS keep, sum(c) AS n, count(*) AS ny
       FROM (SELECT x, y, count(*) AS c FROM c2 GROUP BY 1, 2) GROUP BY x),
r2 AS (SELECT 'o_custkey', 'o_orderpriority', CAST(sum(n) AS BIGINT),
              CAST(count(*) AS BIGINT),
              CAST(sum(CASE WHEN ny > 1 THEN 1 ELSE 0 END) AS BIGINT),
              round(1 - sum(keep) * 1.0 / sum(n), 6)
       FROM g2),
c3 AS (
  SELECT o_orderstatus AS x, o_orderpriority AS y FROM orders),
g3 AS (SELECT x, max(c) AS keep, sum(c) AS n, count(*) AS ny
       FROM (SELECT x, y, count(*) AS c FROM c3 GROUP BY 1, 2) GROUP BY x),
r3 AS (SELECT 'o_orderstatus', 'o_orderpriority', CAST(sum(n) AS BIGINT),
              CAST(count(*) AS BIGINT),
              CAST(sum(CASE WHEN ny > 1 THEN 1 ELSE 0 END) AS BIGINT),
              round(1 - sum(keep) * 1.0 / sum(n), 6)
       FROM g3)
SELECT * FROM r1 UNION ALL SELECT * FROM r2 UNION ALL SELECT * FROM r3
ORDER BY determinant
"""


@register("orders_fd_profile", _FD_PROFILE_SQL)
def orders_fd_profile_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate functional-dependency discovery (operators/fd.py):
    g3 error — the fraction of rows to delete for X → Y to hold
    exactly — for three candidates over orders: the true key FD
    (orderkey → custkey, g3 = 0), a non-dependency (custkey →
    priority), and a low-cardinality non-dependency (status →
    priority). The profile a pipeline runs before trusting a dedup or
    join key."""
    from weaviate_txtai_spark.operators.fd import fd_profile

    orders = load_table(spark, sf_dir, "orders")
    return fd_profile(
        orders,
        [
            ("o_orderkey", "o_custkey"),
            ("o_custkey", "o_orderpriority"),
            ("o_orderstatus", "o_orderpriority"),
        ],
    ).orderBy("determinant")


_KEY_UNIQ_SQL = """
WITH g AS (
  SELECT l_orderkey, l_linenumber, count(*) AS c
  FROM lineitem GROUP BY 1, 2)
SELECT 'l_orderkey+l_linenumber' AS key,
       CAST(sum(c) AS BIGINT) AS n_rows,
       CAST(count(*) AS BIGINT) AS n_keys,
       CAST(sum(c) - count(*) AS BIGINT) AS n_dup_rows,
       round((sum(c) - count(*)) * 1.0 / sum(c), 6) AS dup_fraction
FROM g
"""


@register("lineitem_key_uniqueness", _KEY_UNIQ_SQL)
def lineitem_key_uniqueness_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-uniqueness profile (operators/fd.py key_uniqueness): is
    (orderkey, linenumber) actually a key of lineitem? n_dup_rows is
    exactly what an exact dedup on that key would drop."""
    from weaviate_txtai_spark.operators.fd import key_uniqueness

    li = load_table(spark, sf_dir, "lineitem")
    return key_uniqueness(li, ["l_orderkey", "l_linenumber"])


_SEQ_PAIRS_SQL = """
WITH e AS (
  SELECT DISTINCT user_id AS u, event_type AS t, epoch_us(ts) AS us
  FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL),
p AS (
  SELECT DISTINCT a.u, a.t AS a, b.t AS b
  FROM e a JOIN e b ON a.u = b.u
  WHERE b.us > a.us AND b.us - a.us <= 1800000000),
nu AS (SELECT count(DISTINCT u) * 1.0 AS nu FROM e),
tsup AS (SELECT t, count(DISTINCT u) AS su FROM e GROUP BY 1),
s AS (SELECT a, b, count(*) AS support FROM p GROUP BY 1, 2)
SELECT s.a, s.b, CAST(s.support AS BIGINT) AS support,
       CAST(ta.su AS BIGINT) AS support_a,
       round(s.support * 1.0 / ta.su, 6) AS confidence,
       round((s.support * 1.0 / ta.su) / (tb.su / nu.nu), 6) AS lift
FROM s JOIN tsup ta ON s.a = ta.t JOIN tsup tb ON s.b = tb.t, nu
WHERE s.support >= 2
ORDER BY s.a, s.b
"""


@register("events_sequence_pairs", _SEQ_PAIRS_SQL)
def events_sequence_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent ORDERED event-type pairs within a 30-minute window
    (operators/seqmine.py) — the 2-sequence core of PrefixSpan/GSP,
    with user-level support/confidence/lift so hyperactive users can't
    dominate. The ordered complement to basket_rules' unordered
    co-occurrence."""
    from weaviate_txtai_spark.operators.seqmine import sequence_pairs

    ev = load_table(spark, sf_dir, "events")
    return sequence_pairs(
        ev, window_seconds=1800, min_support=2
    ).orderBy("a", "b")


_HITS_SQL = """
WITH e AS MATERIALIZED (
  SELECT DISTINCT o_custkey AS s, l_suppkey + 50000000 AS d
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
h0r AS MATERIALIZED (SELECT DISTINCT s AS node FROM e),
h0 AS MATERIALIZED (
  SELECT node, 1000000000000 // (SELECT count(*) FROM h0r) AS h
  FROM h0r),
a1r AS MATERIALIZED (SELECT d AS node, sum(h) AS v
        FROM e JOIN h0 ON e.s = h0.node GROUP BY 1),
a1t AS MATERIALIZED (SELECT sum(v) AS t FROM a1r),
a1 AS MATERIALIZED (SELECT node,
        ((v // (t // 1000000)) * 1000000000000)
          // (t // (t // 1000000)) AS a
        FROM a1r, a1t),
h1r AS MATERIALIZED (SELECT s AS node, sum(a) AS v
        FROM e JOIN a1 ON e.d = a1.node GROUP BY 1),
h1t AS MATERIALIZED (SELECT sum(v) AS t FROM h1r),
h1 AS MATERIALIZED (SELECT node,
        ((v // (t // 1000000)) * 1000000000000)
          // (t // (t // 1000000)) AS h
        FROM h1r, h1t),
a2r AS MATERIALIZED (SELECT d AS node, sum(h) AS v
        FROM e JOIN h1 ON e.s = h1.node GROUP BY 1),
a2t AS MATERIALIZED (SELECT sum(v) AS t FROM a2r),
a2 AS MATERIALIZED (SELECT node,
        ((v // (t // 1000000)) * 1000000000000)
          // (t // (t // 1000000)) AS a
        FROM a2r, a2t),
h2r AS MATERIALIZED (SELECT s AS node, sum(a) AS v
        FROM e JOIN a2 ON e.d = a2.node GROUP BY 1),
h2t AS MATERIALIZED (SELECT sum(v) AS t FROM h2r),
h2 AS MATERIALIZED (SELECT node,
        ((v // (t // 1000000)) * 1000000000000)
          // (t // (t // 1000000)) AS h
        FROM h2r, h2t),
a3r AS MATERIALIZED (SELECT d AS node, sum(h) AS v
        FROM e JOIN h2 ON e.s = h2.node GROUP BY 1),
a3t AS MATERIALIZED (SELECT sum(v) AS t FROM a3r),
a3 AS MATERIALIZED (SELECT node,
        ((v // (t // 1000000)) * 1000000000000)
          // (t // (t // 1000000)) AS a
        FROM a3r, a3t),
h3r AS MATERIALIZED (SELECT s AS node, sum(a) AS v
        FROM e JOIN a3 ON e.d = a3.node GROUP BY 1),
h3t AS MATERIALIZED (SELECT sum(v) AS t FROM h3r),
h3 AS MATERIALIZED (SELECT node,
        ((v // (t // 1000000)) * 1000000000000)
          // (t // (t // 1000000)) AS h
        FROM h3r, h3t),
a4r AS MATERIALIZED (SELECT d AS node, sum(h) AS v
        FROM e JOIN h3 ON e.s = h3.node GROUP BY 1),
a4t AS MATERIALIZED (SELECT sum(v) AS t FROM a4r),
a4 AS MATERIALIZED (SELECT node,
        ((v // (t // 1000000)) * 1000000000000)
          // (t // (t // 1000000)) AS a
        FROM a4r, a4t),
h4r AS MATERIALIZED (SELECT s AS node, sum(a) AS v
        FROM e JOIN a4 ON e.d = a4.node GROUP BY 1),
h4t AS MATERIALIZED (SELECT sum(v) AS t FROM h4r),
h4 AS MATERIALIZED (SELECT node,
        ((v // (t // 1000000)) * 1000000000000)
          // (t // (t // 1000000)) AS h
        FROM h4r, h4t),
nodes AS MATERIALIZED (SELECT DISTINCT node
          FROM (SELECT s AS node FROM e UNION ALL SELECT d FROM e)),
mx AS MATERIALIZED (
  SELECT (SELECT max(h) FROM h4) AS mh, (SELECT max(a) FROM a4) AS ma)
SELECT n.node,
       round(coalesce(h4.h, 0) / mx.mh, 6) AS hub,
       round(coalesce(a4.a, 0) / mx.ma, 6) AS authority
FROM nodes n LEFT JOIN h4 ON n.node = h4.node
             LEFT JOIN a4 ON n.node = a4.node, mx
ORDER BY n.node
"""


@register("customer_supplier_hits", _HITS_SQL)
def customer_supplier_hits_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS hubs & authorities over the customer→supplier purchase
    graph (operators/graph.py hits_exact — the fixed-point,
    local-finish variant; the float `hits` stays for API breadth):
    hub = a customer whose orders concentrate on authoritative
    suppliers, authority = a supplier bought by strong hubs —
    PageRank's bipartite companion. Four power iterations with the
    quantized pure-integer L1 normalization, so the DuckDB twin — the
    same iterations UNROLLED as MATERIALIZED chained CTEs (recursive
    CTEs can't re-aggregate per step; inlining re-evaluates the
    doubly-referenced chain exponentially) — replays the trajectory to
    the bit (DuckDB's sum promotes to HUGEINT, numerically identical).
    Supplier node ids are offset by 5e7 so the two entity spaces can't
    collide at ANY scale factor (custkey max is 150k·SF — the previous
    1e6 offset collided from SF≈7; the scale harness always used 5e7)."""
    from weaviate_txtai_spark.operators.graph import hits_exact

    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    edges = orders.join(
        li, orders.o_orderkey == li.l_orderkey
    ).select(
        F.col("o_custkey").alias("src"),
        (F.col("l_suppkey") + 50000000).alias("dst"),
    )
    return hits_exact(edges, n_iter=4).orderBy("node")


# --------------------------------------------------------------------------
# Round 8 batch 2: item-item co-visitation, join-skew diagnostics,
# seasonality profile + MA trend, Holt double smoothing
# --------------------------------------------------------------------------

_ALSO_BOUGHT_SQL = """
WITH b AS (SELECT DISTINCT l_orderkey AS basket, l_partkey AS item
           FROM lineitem),
n AS (SELECT item, count(*) AS n FROM b GROUP BY 1),
co AS (SELECT a.item AS p1, c.item AS p2, count(*) AS pc
       FROM b a JOIN b c ON a.basket = c.basket AND a.item < c.item
       GROUP BY 1, 2 HAVING count(*) >= 2),
bo AS (SELECT p1 AS item, p2 AS neighbor, pc FROM co
       UNION ALL SELECT p2, p1, pc FROM co),
s AS (SELECT bo.item, bo.neighbor, bo.pc,
             round(bo.pc / sqrt(ni.n * nn.n), 6) AS cosine
      FROM bo JOIN n ni ON bo.item = ni.item
              JOIN n nn ON bo.neighbor = nn.item),
r AS (SELECT item, neighbor, cosine,
             row_number() OVER (PARTITION BY item
                                ORDER BY cosine DESC, pc DESC,
                                         neighbor ASC) AS rank
      FROM s)
SELECT item, CAST(rank AS INTEGER) AS rank, neighbor, cosine
FROM r WHERE rank <= 3 ORDER BY item, rank
"""


@register("part_also_bought", _ALSO_BOUGHT_SQL)
def part_also_bought_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-item co-visitation top-k (operators/itemsets.py
    item_similarity / also_bought_topk — Sarwar 2001 item-based CF):
    per part, the 3 parts most often co-ordered, cosine over basket
    sets. Spark side generates pairs MAP-SIDE from per-order sorted
    arrays (never an item self-join); the oracle IS the self-join
    formulation, so the hash match proves the generator."""
    from weaviate_txtai_spark.operators.itemsets import also_bought_topk

    li = load_table(spark, sf_dir, "lineitem")
    return also_bought_topk(
        li, "l_orderkey", "l_partkey", 3, min_pair_count=2
    ).orderBy("item", "rank")


_JOIN_SIZE_SQL = """
WITH lh AS (SELECT o_orderkey AS key, count(*) AS nl FROM orders GROUP BY 1),
rh AS (SELECT l_orderkey AS key, count(*) AS nr FROM lineitem GROUP BY 1),
h AS (SELECT lh.key, nl * nr AS out_rows FROM lh JOIN rh USING (key))
SELECT CAST(count(*) AS BIGINT) AS n_keys_both,
       CAST(sum(out_rows) AS BIGINT) AS out_rows,
       CAST(max(out_rows) AS BIGINT) AS max_key_rows,
       round(max(out_rows) * 1.0 / sum(out_rows), 6) AS max_share,
       round(max(out_rows) * 1.0 / avg(out_rows), 6) AS skew_ratio
FROM h
"""


@register("orderkey_join_size", _JOIN_SIZE_SQL)
def orderkey_join_size_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-size / skew pre-flight (operators/skew.py
    join_size_estimate): the EXACT inner-join output cardinality of
    orders⋈lineitem on orderkey plus the hottest key's share and the
    skew ratio vs uniform — the measurement that picks between salting,
    AQE skew split, and broadcast BEFORE the join runs. Two
    map-side-combined key histograms, one key-domain join, a 1-row
    combine."""
    from weaviate_txtai_spark.operators.skew import join_size_estimate

    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("key")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("key")
    )
    return join_size_estimate(orders, li, "key")


_SKEW_TOPK_SQL = """
WITH lh AS (SELECT o_custkey AS key, count(*) AS n_left
            FROM orders GROUP BY 1),
rh AS (SELECT o_custkey AS key, count(*) AS n_right
       FROM orders GROUP BY 1)
SELECT lh.key, CAST(n_left AS BIGINT) AS n_left,
       CAST(n_right AS BIGINT) AS n_right,
       CAST(n_left * n_right AS BIGINT) AS out_rows
FROM lh JOIN rh USING (key)
ORDER BY out_rows DESC, key ASC LIMIT 10
"""


@register("custkey_join_skew_topk", _SKEW_TOPK_SQL)
def custkey_join_skew_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The keys to salt (operators/skew.py join_skew_topk): top-10
    custkeys by SELF-join output contribution — the shape of a
    sessionization or same-entity pairing blowup. Deterministic tie-break
    by key."""
    from weaviate_txtai_spark.operators.skew import join_skew_topk

    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("key")
    )
    return join_skew_topk(orders, orders, "key", 10)


_WEEKDAY_SQL = """
WITH g AS (SELECT event_type AS grp, CAST(ts AS DATE) AS day,
                  count(*) AS n
           FROM events WHERE ts IS NOT NULL GROUP BY 1, 2),
wd AS (SELECT grp, dayofweek(day) + 1 AS weekday, count(*) AS n_days,
              avg(n) AS a
       FROM g GROUP BY 1, 2),
o AS (SELECT grp, avg(n) AS ov FROM g GROUP BY 1)
SELECT wd.grp, CAST(wd.weekday AS INTEGER) AS weekday,
       CAST(wd.n_days AS BIGINT) AS n_days,
       round(wd.a, 6) AS avg_n, round(wd.a / o.ov, 6) AS index
FROM wd JOIN o ON wd.grp = o.grp
ORDER BY wd.grp, weekday
"""


@register("events_weekday_profile", _WEEKDAY_SQL)
def events_weekday_profile_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekday seasonality indices per event type
    (operators/seasonal.py weekday_profile): weekday mean daily volume
    over the group's overall daily mean — the baseline that separates
    a Saturday dip from an incident. Runs entirely on the daily grid
    (one raw-event shuffle). DuckDB numbers Sunday 0, Spark 1 — the
    oracle shifts."""
    from weaviate_txtai_spark.operators.seasonal import weekday_profile

    ev = load_table(spark, sf_dir, "events")
    return weekday_profile(ev).orderBy("grp", "weekday")


_TREND_MA_SQL = """
WITH g AS (SELECT event_type AS grp, CAST(ts AS DATE) AS day,
                  count(*) AS n
           FROM events WHERE ts IS NOT NULL GROUP BY 1, 2)
SELECT grp, day, CAST(n AS BIGINT) AS n,
       round(avg(n) OVER (PARTITION BY grp
                          ORDER BY datediff('day', DATE '1970-01-01', day)
                          RANGE BETWEEN 3 PRECEDING AND 3 FOLLOWING),
             6) AS trend
FROM g ORDER BY grp, day
"""


@register("events_trend_ma", _TREND_MA_SQL)
def events_trend_ma_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Centered 7-day moving-average trend per event type
    (operators/seasonal.py trend_ma): a CALENDAR range window over the
    daily grid (gap days neither invented nor double-counted), the
    trend component the weekday indices divide out."""
    from weaviate_txtai_spark.operators.seasonal import trend_ma

    ev = load_table(spark, sf_dir, "events")
    return trend_ma(ev, window_days=7).orderBy("grp", "day")


_HOLT_SQL = """
WITH RECURSIVE g AS (
  SELECT event_type AS grp, CAST(ts AS DATE) AS day,
         CAST(count(*) AS DOUBLE) AS v
  FROM events WHERE ts IS NOT NULL GROUP BY 1, 2),
e AS (SELECT grp, day, v,
             CAST(round(v * 1000000, 0) AS BIGINT) AS x,
             row_number() OVER (PARTITION BY grp ORDER BY day) AS rn
      FROM g),
r AS (
  SELECT grp, day, v, rn, x AS l, CAST(0 AS BIGINT) AS b
  FROM e WHERE rn = 1
  UNION ALL
  SELECT e.grp, e.day, e.v, e.rn,
         (((3 * e.x + 7 * (r.l + r.b)) - (((3 * e.x + 7 * (r.l + r.b)) % 10) + 10) % 10) // 10),
         (((2 * ((((3 * e.x + 7 * (r.l + r.b)) - (((3 * e.x + 7 * (r.l + r.b)) % 10) + 10) % 10) // 10) - r.l) + 8 * r.b) - (((2 * ((((3 * e.x + 7 * (r.l + r.b)) - (((3 * e.x + 7 * (r.l + r.b)) % 10) + 10) % 10) // 10) - r.l) + 8 * r.b) % 10) + 10) % 10) // 10)
  FROM r JOIN e ON e.grp = r.grp AND e.rn = r.rn + 1)
SELECT grp, day, v, round(l / 1000000.0, 6) AS level,
       round(b / 1000000.0, 6) AS trend,
       round((l + b) / 1000000.0, 6) AS forecast
FROM r ORDER BY grp, day
"""


@register("events_holt_forecast", _HOLT_SQL)
def events_holt_forecast_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt double exponential smoothing of daily volumes per event
    type (operators/changepoint.py holt_linear_exact): level + trend +
    one-step forecast, the trend-aware baseline a volume monitor
    compares tomorrow against. Spark folds the recursion over each
    group's sorted series in ONE shuffle; the oracle runs the literal
    recursion in a recursive CTE. FIXED-POINT (the pagerank_exact
    discipline): per-step float rounding was observed to flip at a
    1e-15 boundary between engines and the recursion re-feeds the
    flip, so state is scaled LONGs with an exact floor division —
    bit-identical everywhere."""
    from weaviate_txtai_spark.operators.changepoint import holt_linear_exact
    from weaviate_txtai_spark.operators.seasonal import daily_counts

    ev = load_table(spark, sf_dir, "events")
    grid = daily_counts(ev).select(
        "grp", "day", F.col("n").cast("double").alias("v")
    )
    return holt_linear_exact(
        grid, "grp", "day", "v", alpha_num=3, beta_num=2, den=10
    ).orderBy("grp", "day")


# --------------------------------------------------------------------------
# Round 8 batch 3: referential integrity, FDR correction, ordinal effect
# size, dense-grid gap fill
# --------------------------------------------------------------------------

_REF_INTEGRITY_SQL = """
WITH c AS (
  SELECT l_orderkey AS k,
         CASE WHEN l_orderkey IS NULL THEN 0 ELSE 1 END AS ok
  FROM lineitem),
t AS (SELECT count(*) AS n, sum(1 - ok) AS nn FROM c),
h AS (SELECT k, count(*) AS cnt FROM c WHERE ok = 1 GROUP BY 1),
o AS (
  SELECT coalesce(sum(cnt), 0) AS orr, count(*) AS ok_keys
  FROM h LEFT JOIN (SELECT DISTINCT o_orderkey AS k FROM orders) p
       USING (k)
  WHERE p.k IS NULL)
SELECT CAST(t.n AS BIGINT) AS n_child, CAST(t.nn AS BIGINT) AS n_null_fk,
       CAST(o.orr AS BIGINT) AS n_orphan_rows,
       CAST(o.ok_keys AS BIGINT) AS n_orphan_keys,
       round(o.orr * 1.0 / (t.n - t.nn), 6) AS orphan_fraction
FROM t, o
"""


@register("lineitem_orders_integrity", _REF_INTEGRITY_SQL)
def lineitem_orders_integrity_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orphan-FK audit (operators/fd.py referential_integrity):
    lineitem rows whose orderkey has no orders parent — the referential
    check an ingest runs where a database would have a constraint. The
    anti-join runs on the child's KEY HISTOGRAM, never child rows."""
    from weaviate_txtai_spark.operators.fd import referential_integrity

    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    return referential_integrity(
        li, orders, child_keys="l_orderkey", parent_keys="o_orderkey"
    )


_BH_SQL = """
WITH t AS (
  SELECT event_type AS test_id,
         round(least(greatest(avg(value) - 99.0, 0.001), 0.999), 6) AS p
  FROM events WHERE value IS NOT NULL GROUP BY 1),
n AS (SELECT count(*) AS n FROM t),
r AS (SELECT test_id, p, row_number() OVER (ORDER BY p, test_id) AS i
      FROM t),
q AS (SELECT test_id, p, round(least(min(p * n.n / i)
               OVER (ORDER BY p, test_id
                     ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING),
             1.0), 6) AS q
      FROM r, n)
SELECT test_id, p, q FROM q ORDER BY p, test_id
"""


@register("events_bh_fdr", _BH_SQL)
def events_bh_fdr_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benjamini–Hochberg FDR adjustment (operators/abtest.py
    bh_adjust) over a per-event-type battery of derived pseudo
    p-values: q_i = min suffix of p·n/rank, capped at 1 — the
    multiple-testing correction a metrics readout applies before
    calling anything significant. Battery is test-domain-sized, so the
    one unpartitioned window is bounded by construction."""
    from weaviate_txtai_spark.operators.abtest import bh_adjust

    ev = load_table(spark, sf_dir, "events")
    battery = ev.filter(F.col("value").isNotNull()).groupBy(
        F.col("event_type").alias("test_id")
    ).agg(
        F.round(
            F.least(
                F.greatest(F.avg("value") - 99.0, F.lit(0.001)),
                F.lit(0.999),
            ),
            6,
        ).alias("p")
    )
    return bh_adjust(battery, "p", id_cols=["test_id"]).orderBy(
        "p", "test_id"
    )


_CLIFFS_SQL = """
WITH b AS (
  SELECT CASE WHEN user_id % 2 = 0 THEN 'a' ELSE 'b' END AS g, value AS v
  FROM events WHERE value IS NOT NULL AND event_type = 'purchase'),
pairs AS (
  SELECT sum(CASE WHEN a.v > bb.v THEN 1 WHEN a.v < bb.v THEN -1
                  ELSE 0 END) AS s
  FROM b a JOIN b bb ON a.g = 'a' AND bb.g = 'b'),
n AS (SELECT count(*) FILTER (g = 'a') AS na,
             count(*) FILTER (g = 'b') AS nb FROM b)
SELECT CAST(n.na AS BIGINT) AS n_a, CAST(n.nb AS BIGINT) AS n_b,
       round(pairs.s * 1.0 / (n.na * n.nb), 6) AS delta
FROM pairs, n
"""


@register("purchase_value_cliffs_delta", _CLIFFS_SQL)
def purchase_value_cliffs_delta_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cliff's delta ordinal effect size between the A/B cohorts'
    purchase values (operators/abtest.py cliffs_delta): P(a>b) − P(a<b)
    computed from VALUE-DOMAIN count tables with prefix sums — the
    oracle is the literal quadratic pair comparison, so the hash match
    proves the domain identity. Companion to ab_value_mwu (δ =
    2U/(n_a·n_b) − 1)."""
    from weaviate_txtai_spark.operators.abtest import cliffs_delta

    ev = load_table(spark, sf_dir, "events")
    purch = ev.filter(
        F.col("value").isNotNull() & (F.col("event_type") == "purchase")
    ).select(
        F.when(F.col("user_id") % 2 == 0, "a").otherwise("b").alias("g"),
        "value",
    )
    return cliffs_delta(purch, "g", "value", group_a="a", group_b="b")


_GAPFILL_SQL = """
WITH g AS (SELECT event_type AS grp, CAST(ts AS DATE) AS day,
                  count(*) AS n
           FROM events WHERE ts IS NOT NULL GROUP BY 1, 2),
s AS (SELECT grp, min(day) AS d0, max(day) AS d1 FROM g GROUP BY 1),
dense AS (SELECT grp, CAST(u.d AS DATE) AS day
          FROM s, unnest(generate_series(s.d0, s.d1,
                                         INTERVAL 1 DAY)) AS u(d))
SELECT dense.grp, dense.day,
       CAST(coalesce(g.n, 0) AS BIGINT) AS n,
       g.n IS NOT NULL AS observed
FROM dense LEFT JOIN g ON dense.grp = g.grp AND dense.day = g.day
ORDER BY dense.grp, dense.day
"""


@register("events_daily_gapfill", _GAPFILL_SQL)
def events_daily_gapfill_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense daily grid with zero fill (operators/seasonal.py
    fill_daily_gaps): every calendar day in each group's span gets a
    row — the precondition the smoothing/trend operators assume (a
    skipped gap day silently biases every window spanning it). Grid
    explodes from per-group [min,max] — output-sized."""
    from weaviate_txtai_spark.operators.seasonal import fill_daily_gaps

    ev = load_table(spark, sf_dir, "events")
    return fill_daily_gaps(ev, fill="zero").orderBy("grp", "day")


_BOOTSTRAP_SQL = """
WITH base AS (
  SELECT CAST(l_orderkey * 10 + l_linenumber AS BIGINT) AS id,
         CAST(l_extendedprice AS DOUBLE) AS x
  FROM lineitem WHERE l_extendedprice IS NOT NULL),
rep AS (SELECT id, x, s.b FROM base,
        unnest(generate_series(0, 49)) AS s(b)),
u AS (SELECT x, b,
             ((((((id + b * 999983) % 2147483648) + 2147483648)
                 % 2147483648) * 2654435761) % 4294967296)
               / 4294967296.0 AS u
      FROM rep),
w AS (SELECT x, b,
             CASE WHEN u < 0.36787944117144233 THEN 0
                  WHEN u < 0.7357588823428847 THEN 1
                  WHEN u < 0.9196986029286058 THEN 2
                  WHEN u < 0.9810118431238462 THEN 3
                  WHEN u < 0.9963401531726563 THEN 4
                  WHEN u < 0.9994058151824183 THEN 5
                  WHEN u < 0.999916758850712 THEN 6
                  WHEN u < 0.9999897508033253 THEN 7
                  ELSE 8 END AS w
      FROM u),
m AS (SELECT b, round(sum(w * x) / sum(w), 9) AS m FROM w GROUP BY b),
ci AS (SELECT round(quantile_cont(m, 0.025), 6) AS lo,
              round(quantile_cont(m, 0.975), 6) AS hi,
              CAST(count(*) AS BIGINT) AS n_replicates
       FROM m),
st AS (SELECT CAST(count(*) AS BIGINT) AS n, round(avg(x), 6) AS mean
       FROM base)
SELECT st.n, st.mean, ci.lo, ci.hi, ci.n_replicates FROM st, ci
"""


@register("lineitem_bootstrap_ci", _BOOTSTRAP_SQL)
def lineitem_bootstrap_ci_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson-bootstrap percentile CI for mean extended price
    (operators/bootstrap.py — Hanley & MacGibbon 2006, the large-scale
    A/B platform standard): each row contributes Poisson(1) copies per
    replicate from a hash-inverted uniform, so 50 replicates cost ONE
    map-side pass + a replicate-domain aggregate — no resample shuffle.
    The draw inverts the engine's SQL-replicable Knuth hash, so the
    oracle replays the exact resample."""
    from weaviate_txtai_spark.operators.bootstrap import (
        poisson_bootstrap_mean_ci,
    )

    li = load_table(spark, sf_dir, "lineitem").select(
        (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("rid"),
        "l_extendedprice",
    )
    return poisson_bootstrap_mean_ci(
        li, "l_extendedprice", id_col="rid", n_replicates=50
    )


# --------------------------------------------------------------------------
# Round 8 batch 5: conformal intervals, diff-in-diff, composed
# seasonally-adjusted anomaly flags
# --------------------------------------------------------------------------

_CONFORMAL_SQL = """
WITH base AS (
  SELECT l_quantity * 3800.0 AS pred,
         CAST(l_extendedprice AS DOUBLE) AS actual,
         l_orderkey % 2 = 0 AS cal
  FROM lineitem
  WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL),
r AS (SELECT round(abs(pred - actual), 6) AS r, cal FROM base),
vc AS (SELECT r AS v, count(*) AS c FROM r WHERE cal GROUP BY 1),
cum AS (SELECT v, sum(c) OVER (ORDER BY v
                               ROWS UNBOUNDED PRECEDING) AS cum
        FROM vc),
t AS (SELECT sum(c) AS n FROM vc),
kk AS (SELECT CAST(ceil((n + 1) * 0.9) AS BIGINT) AS k, n FROM t),
q AS (SELECT kk.n AS n_cal, kk.k,
             min(CASE WHEN cum.cum >= kk.k THEN cum.v END) AS qhat
      FROM cum, kk GROUP BY kk.n, kk.k)
SELECT CAST(q.n_cal AS BIGINT) AS n_cal, q.k, round(q.qhat, 6) AS qhat,
       CAST(count(*) AS BIGINT) AS n_eval,
       round(avg(CASE WHEN r.r <= q.qhat THEN 1.0 ELSE 0.0 END), 6)
         AS coverage
FROM r, q WHERE NOT r.cal
GROUP BY q.n_cal, q.k, q.qhat
"""


@register("price_conformal_interval", _CONFORMAL_SQL)
def price_conformal_interval_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split conformal prediction readout (operators/conformal.py):
    a deliberately crude price predictor (quantity × 3800) gets a
    distribution-free interval — qhat = the ⌈(n+1)(1−α)⌉-th smallest
    calibration |residual| from the residual VALUE DOMAIN (no sort of
    the rows), and the held-out coverage demonstrates the ≥ 1−α
    guarantee the wrapper provides REGARDLESS of the model's quality."""
    from weaviate_txtai_spark.operators.conformal import conformal_report

    li = load_table(spark, sf_dir, "lineitem")
    scored = li.filter(
        F.col("l_quantity").isNotNull() & F.col("l_extendedprice").isNotNull()
    ).select(
        (F.col("l_quantity") * 3800.0).alias("pred"),
        F.col("l_extendedprice").cast("double").alias("actual"),
        (F.col("l_orderkey") % 2 == 0).alias("cal"),
    )
    return conformal_report(scored, "pred", "actual", cal_col="cal", alpha=0.1)


_DID_SQL = """
WITH mid AS (
  SELECT min(epoch_us(ts))
         + (max(epoch_us(ts)) - min(epoch_us(ts))) // 2 AS m
  FROM events),
b AS (
  SELECT CASE WHEN user_id % 2 = 0 THEN 'treat' ELSE 'ctrl' END AS g,
         CASE WHEN epoch_us(ts) >= mid.m THEN 'post' ELSE 'pre' END AS p,
         CAST(value AS DOUBLE) AS y
  FROM events, mid WHERE value IS NOT NULL),
a AS (
  SELECT count(CASE WHEN g = 'treat' AND p = 'pre' THEN 1 END) AS n_tpre,
         count(CASE WHEN g = 'treat' AND p = 'post' THEN 1 END) AS n_tpost,
         count(CASE WHEN g = 'ctrl' AND p = 'pre' THEN 1 END) AS n_cpre,
         count(CASE WHEN g = 'ctrl' AND p = 'post' THEN 1 END) AS n_cpost,
         avg(CASE WHEN g = 'treat' AND p = 'pre' THEN y END) AS m_tpre,
         avg(CASE WHEN g = 'treat' AND p = 'post' THEN y END) AS m_tpost,
         avg(CASE WHEN g = 'ctrl' AND p = 'pre' THEN y END) AS m_cpre,
         avg(CASE WHEN g = 'ctrl' AND p = 'post' THEN y END) AS m_cpost,
         var_samp(CASE WHEN g = 'treat' AND p = 'pre' THEN y END) AS v_tpre,
         var_samp(CASE WHEN g = 'treat' AND p = 'post' THEN y END) AS v_tpost,
         var_samp(CASE WHEN g = 'ctrl' AND p = 'pre' THEN y END) AS v_cpre,
         var_samp(CASE WHEN g = 'ctrl' AND p = 'post' THEN y END) AS v_cpost
  FROM b)
SELECT CAST(n_tpre AS BIGINT) AS n_tpre,
       CAST(n_tpost AS BIGINT) AS n_tpost,
       CAST(n_cpre AS BIGINT) AS n_cpre,
       CAST(n_cpost AS BIGINT) AS n_cpost,
       round((m_tpost - m_tpre) - (m_cpost - m_cpre), 6) AS did,
       round(sqrt(v_tpre / n_tpre + v_tpost / n_tpost
                  + v_cpre / n_cpre + v_cpost / n_cpost), 6) AS se
FROM a
"""


@register("events_diff_in_diff", _DID_SQL)
def events_diff_in_diff_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences readout (operators/abtest.py
    diff_in_diff): user-parity cohorts around the stream's midpoint
    timestamp — the rollout-review estimator when randomization wasn't
    available but a parallel-trends control is. Four cells, one
    map-side pass."""
    from weaviate_txtai_spark.operators.abtest import diff_in_diff

    ev = load_table(spark, sf_dir, "events")
    # integer epoch-micros midpoint: timestamp-typed arithmetic differs
    # in precision between engines (seconds vs micros) and the boundary
    # rows flip cells
    mid = ev.agg(
        (
            F.min(F.unix_micros("ts"))
            + F.floor(
                (F.max(F.unix_micros("ts")) - F.min(F.unix_micros("ts"))) / 2
            )
        ).cast("long").alias("m")
    )
    b = ev.filter(F.col("value").isNotNull()).join(F.broadcast(mid)).select(
        F.when(F.col("user_id") % 2 == 0, "treat").otherwise("ctrl").alias(
            "g"
        ),
        F.when(F.unix_micros("ts") >= F.col("m"), "post")
        .otherwise("pre")
        .alias("p"),
        "value",
    )
    return diff_in_diff(
        b, "g", "p", "value", treat_value="treat", post_value="post"
    )


_VOL_ANOM_SQL = """
WITH g AS (SELECT event_type AS grp, CAST(ts AS DATE) AS day,
                  count(*) AS n
           FROM events WHERE ts IS NOT NULL GROUP BY 1, 2),
tr AS (SELECT grp, day, n, dayofweek(day) + 1 AS wd,
              round(avg(n) OVER (PARTITION BY grp
                     ORDER BY datediff('day', DATE '1970-01-01', day)
                     RANGE BETWEEN 3 PRECEDING AND 3 FOLLOWING), 6)
                AS trend
       FROM g),
wd AS (SELECT grp, dayofweek(day) + 1 AS wd, avg(n) AS a
       FROM g GROUP BY 1, 2),
o AS (SELECT grp, avg(n) AS ov FROM g GROUP BY 1),
idx AS (SELECT wd.grp, wd.wd, round(wd.a / o.ov, 6) AS idx
        FROM wd JOIN o ON wd.grp = o.grp),
e AS (SELECT tr.grp, tr.day, tr.n,
             round(tr.trend * idx.idx, 6) AS expected
      FROM tr JOIN idx ON tr.grp = idx.grp AND tr.wd = idx.wd)
SELECT grp, day, CAST(n AS BIGINT) AS n, expected,
       round(ln(n / expected), 6) AS log_ratio,
       abs(round(ln(n / expected), 6)) > 0.15 AS anomaly
FROM e ORDER BY grp, day
"""


@register("events_volume_anomalies", _VOL_ANOM_SQL)
def events_volume_anomalies_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed telemetry end-product (operators/seasonal.py
    volume_anomalies): expected volume = centered-MA trend × weekday
    index; a day alarms when |ln(actual/expected)| exceeds the
    threshold — seasonality-aware where a raw z-score calls every
    weekend an incident. One daily-count shuffle; trend/index/flags
    all run on the grid."""
    from weaviate_txtai_spark.operators.seasonal import volume_anomalies

    ev = load_table(spark, sf_dir, "events")
    return volume_anomalies(ev, threshold=0.15).orderBy("grp", "day")


# --------------------------------------------------------------------------
# Round 8 batch 6: l-diversity, judge agreement, LLR keyness
# --------------------------------------------------------------------------

_L_DIVERSITY_SQL = """
WITH gs AS (
  SELECT o_orderstatus AS s, year(o_orderdate) AS y,
         month(o_orderdate) AS m, o_orderpriority AS pr,
         CAST(floor(o_totalprice / 50000) AS INTEGER) AS band,
         count(*) AS c
  FROM orders GROUP BY 1, 2, 3, 4, 5),
g AS (SELECT s, y, m, pr, sum(c) AS n, count(*) AS d
      FROM gs GROUP BY 1, 2, 3, 4)
SELECT CAST(3 AS INTEGER) AS l,
       CAST(sum(n) AS BIGINT) AS n_rows,
       CAST(count(*) AS BIGINT) AS n_groups,
       CAST(count(CASE WHEN d < 3 THEN 1 END) AS BIGINT) AS weak_groups,
       CAST(coalesce(sum(CASE WHEN d < 3 THEN n END), 0) AS BIGINT)
         AS weak_rows,
       round(coalesce(sum(CASE WHEN d < 3 THEN n END), 0) * 1.0
             / sum(n), 6) AS weak_frac
FROM g
"""


@register("orders_l_diversity", _L_DIVERSITY_SQL)
def orders_l_diversity_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ℓ-diversity release gate (operators/profile.py
    l_diversity_report, ℓ=3) over the same quasi-identifiers as the
    k-anonymity gate, with the price BAND as the sensitive attribute —
    k-anonymity's blind spot is a quasi-group whose rows all share one
    sensitive value (the homogeneity attack); this reports the groups
    spanning < ℓ distinct bands."""
    from weaviate_txtai_spark.operators.profile import l_diversity_report

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderstatus",
        F.year("o_orderdate").alias("y"),
        F.month("o_orderdate").alias("m"),
        "o_orderpriority",
        F.floor(F.col("o_totalprice") / 50000).cast("int").alias("band"),
    )
    return l_diversity_report(
        o, ["o_orderstatus", "y", "m", "o_orderpriority"], "band", l=3
    )


_KAPPA_SQL = """
WITH r AS (
  SELECT CASE WHEN value > 100 THEN 'keep' ELSE 'drop' END AS a,
         CASE WHEN value + (event_id % 7) - 3 > 100
              THEN 'keep' ELSE 'drop' END AS b
  FROM events WHERE value IS NOT NULL),
j AS (SELECT a, b, count(*) AS c FROM r GROUP BY 1, 2),
t AS (SELECT sum(c) AS n FROM j),
po AS (SELECT coalesce(sum(c), 0) AS agree FROM j WHERE a = b),
ma AS (SELECT a, sum(c) AS ca FROM j GROUP BY 1),
mb AS (SELECT b, sum(c) AS cb FROM j GROUP BY 1),
pe AS (SELECT sum((ca * 1.0 / t.n) * (cb * 1.0 / t.n)) AS pe
       FROM ma JOIN mb ON ma.a = mb.b, t)
SELECT CAST(t.n AS BIGINT) AS n,
       round(po.agree * 1.0 / t.n, 6) AS p_o,
       round(pe.pe, 6) AS p_e,
       round((po.agree * 1.0 / t.n - pe.pe) / (1 - pe.pe), 6) AS kappa
FROM t, po, pe
"""


@register("judge_agreement_kappa", _KAPPA_SQL)
def judge_agreement_kappa_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa between two deterministic keep/drop 'judges' over
    event values (operators/evalmetrics.py cohens_kappa) — the
    chance-corrected agreement an LLM-judge pipeline reports before
    trusting a judge as a filter; raw agreement is inflated whenever
    one class dominates. One joint-count shuffle; marginals fold from
    the label-domain table."""
    from weaviate_txtai_spark.operators.evalmetrics import cohens_kappa

    ev = load_table(spark, sf_dir, "events")
    rated = ev.filter(F.col("value").isNotNull()).select(
        F.when(F.col("value") > 100, "keep").otherwise("drop").alias("a"),
        F.when(
            F.col("value") + (F.col("event_id") % 7) - 3 > 100, "keep"
        ).otherwise("drop").alias("b"),
    )
    return cohens_kappa(rated, "a", "b")


_LLR_SQL = """
WITH tok AS (
  SELECT source,
         unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS term
  FROM documents),
f AS (SELECT term, CAST(count(*) AS DOUBLE) AS a FROM tok
      WHERE source = 'src0' GROUP BY 1),
b AS (SELECT term, CAST(count(*) AS DOUBLE) AS bb FROM tok
      WHERE source <> 'src0' GROUP BY 1),
m AS (SELECT coalesce(f.term, b.term) AS term,
             coalesce(a, 0) AS a, coalesce(bb, 0) AS bb
      FROM f FULL OUTER JOIN b ON f.term = b.term),
t AS (SELECT sum(a) AS ta, sum(bb) AS tb FROM m),
s AS (
  SELECT term, a, bb,
         2 * ((CASE WHEN a > 0
                    THEN a * ln(a / ((a + bb) * t.ta / (t.ta + t.tb)))
                    ELSE 0 END)
            + (CASE WHEN bb > 0
                    THEN bb * ln(bb / ((a + bb) * t.tb / (t.ta + t.tb)))
                    ELSE 0 END)
            + (CASE WHEN t.ta - a > 0 THEN (t.ta - a)
                    * ln((t.ta - a) / ((t.ta - a + t.tb - bb)
                                       * t.ta / (t.ta + t.tb)))
                    ELSE 0 END)
            + (CASE WHEN t.tb - bb > 0 THEN (t.tb - bb)
                    * ln((t.tb - bb) / ((t.ta - a + t.tb - bb)
                                        * t.tb / (t.ta + t.tb)))
                    ELSE 0 END)) AS g2,
         a / t.ta > bb / t.tb AS over
  FROM m, t)
SELECT term, CAST(a AS BIGINT) AS fg_count, CAST(bb AS BIGINT) AS bg_count,
       round(g2, 6) AS g2
FROM s WHERE over ORDER BY g2 DESC, term ASC LIMIT 20
"""


@register("source_llr_keyterms", _LLR_SQL)
def source_llr_keyterms_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dunning log-likelihood keyness (operators/infotheory.py
    llr_keyterms): the 20 terms most over-represented in source src0
    vs the rest of the corpus — "what makes this source different",
    robust where raw frequency ratios explode on rare terms. Term-
    domain join + broadcast totals + TakeOrdered top-k."""
    from weaviate_txtai_spark.functions.text import tokens
    from weaviate_txtai_spark.operators.infotheory import llr_keyterms

    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "source", F.explode(tokens("text")).alias("term")
    )
    fg = tok.filter(F.col("source") == "src0").groupBy("term").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    bg = tok.filter(F.col("source") != "src0").groupBy("term").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    return llr_keyterms(fg, bg, "term", "cnt", top_k=20)


# --------------------------------------------------------------------------
# Round 8 batch 7: interval-overlap join, cluster/ratio bootstrap
# --------------------------------------------------------------------------

_OVERLAP_SQL = """
WITH l AS (
  SELECT user_id, min(ts) AS start, max(ts) AS "end"
  FROM events WHERE ts IS NOT NULL
  GROUP BY user_id, CAST(ts AS DATE)),
r AS (
  SELECT CAST(ts AS DATE) AS day,
         min(ts) AS istart, max(ts) AS iend
  FROM events WHERE event_type = 'purchase' AND ts IS NOT NULL
  GROUP BY 1)
SELECT l.user_id, l.start, l."end", r.istart, r.iend
FROM l JOIN r ON epoch_us(l.start) <= epoch_us(r.iend)
             AND epoch_us(r.istart) <= epoch_us(l."end")
ORDER BY l.user_id, l.start, r.istart
"""


@register("session_incident_overlap", _OVERLAP_SQL)
def session_incident_overlap_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval×interval overlap join (operators/asof.py
    interval_overlap_join): per-user daily activity spans × daily
    purchase-burst windows — "whose session overlapped the incident".
    Both sides explode to covered epoch buckets and equi-join (two
    overlapping intervals must share a bucket), the overlap predicate
    is a residual, and pair dedup is the meet-bucket trick (a pair
    survives only in the first bucket both cover) — never a quadratic
    inequality join, never a distinct over payload. The oracle IS the
    quadratic formulation."""
    from weaviate_txtai_spark.operators.asof import interval_overlap_join

    ev = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    left = ev.groupBy("user_id", F.to_date("ts").alias("__d")).agg(
        F.min("ts").alias("start"), F.max("ts").alias("end")
    ).drop("__d")
    right = ev.filter(F.col("event_type") == "purchase").groupBy(
        F.to_date("ts").alias("day")
    ).agg(F.min("ts").alias("istart"), F.max("ts").alias("iend")).drop(
        "day"
    )
    return interval_overlap_join(
        left,
        right,
        bucket_seconds=21600,
        left_start="start",
        left_end="end",
        right_start="istart",
        right_end="iend",
    ).orderBy("user_id", "start", "istart")


_RATIO_BOOT_SQL = """
WITH base AS (
  SELECT CAST(user_id AS BIGINT) AS id,
         CASE WHEN event_type = 'purchase' THEN 1.0 ELSE 0.0 END AS n,
         1.0 AS d
  FROM events WHERE user_id IS NOT NULL),
rep AS (SELECT id, n, d, s.b FROM base,
        unnest(generate_series(0, 49)) AS s(b)),
u AS (SELECT n, d, b,
             ((((((id + b * 999983) % 2147483648) + 2147483648)
                 % 2147483648) * 2654435761) % 4294967296)
               / 4294967296.0 AS u
      FROM rep),
w AS (SELECT n, d, b,
             CASE WHEN u < 0.36787944117144233 THEN 0
                  WHEN u < 0.7357588823428847 THEN 1
                  WHEN u < 0.9196986029286058 THEN 2
                  WHEN u < 0.9810118431238462 THEN 3
                  WHEN u < 0.9963401531726563 THEN 4
                  WHEN u < 0.9994058151824183 THEN 5
                  WHEN u < 0.999916758850712 THEN 6
                  WHEN u < 0.9999897508033253 THEN 7
                  ELSE 8 END AS w
      FROM u),
m AS (SELECT b, round(sum(w * n) / sum(w * d), 9) AS r FROM w GROUP BY b),
ci AS (SELECT round(quantile_cont(r, 0.025), 6) AS lo,
              round(quantile_cont(r, 0.975), 6) AS hi,
              CAST(count(*) AS BIGINT) AS n_replicates
       FROM m),
st AS (SELECT CAST(count(*) AS BIGINT) AS n,
              round(sum(n) / sum(d), 6) AS ratio
       FROM base)
SELECT st.n, st.ratio, ci.lo, ci.hi, ci.n_replicates FROM st, ci
"""


@register("purchase_rate_bootstrap", _RATIO_BOOT_SQL)
def purchase_rate_bootstrap_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CLUSTER bootstrap CI for a ratio-of-sums metric
    (operators/bootstrap.py poisson_bootstrap_ratio_ci): the purchase
    RATE (purchases / events) resampled BY USER — the unit key as
    id_col gives every row of a user the user's own Poisson draw per
    replicate, the correct procedure when rows within a unit are
    correlated (a per-row resample understates the variance). Same
    one-map-side-pass shape as the mean CI."""
    from weaviate_txtai_spark.operators.bootstrap import (
        poisson_bootstrap_ratio_ci,
    )

    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        (F.col("event_type") == "purchase").cast("double").alias("n"),
        F.lit(1.0).alias("d"),
    )
    return poisson_bootstrap_ratio_ci(
        ev, "n", "d", id_col="user_id", n_replicates=50
    )


_FS_LINKAGE_SQL = """
WITH a AS MATERIALIZED (
  SELECT c_custkey AS ak, c_nationkey AS an, c_mktsegment AS aseg,
         floor(c_acctbal / 1000) AS abucket,
         substr(c_name, 1, 8) AS aname
  FROM customer),
b AS MATERIALIZED (
  SELECT c_custkey AS bk, c_nationkey AS bn,
         CASE WHEN c_custkey % 5 = 0 THEN 'PERTURBED'
              ELSE c_mktsegment END AS bseg,
         CASE WHEN c_custkey % 3 = 0 THEN floor(c_acctbal / 1000) + 1
              ELSE floor(c_acctbal / 1000) END AS bbucket,
         CASE WHEN c_custkey % 11 = 0 THEN 'XXXXXXXX'
              ELSE substr(c_name, 1, 8) END AS bname
  FROM customer),
p AS MATERIALIZED (
  SELECT ak, bk, (ak = bk) AS is_match,
         (aseg = bseg) AS eq_seg,
         (abucket = bbucket) AS eq_bucket,
         (aname = bname) AS eq_name
  FROM a JOIN b ON an = bn),
cnt AS MATERIALIZED (SELECT
  CAST(sum(CASE WHEN is_match THEN 1 ELSE 0 END) AS BIGINT) AS nm,
  CAST(sum(CASE WHEN is_match THEN 0 ELSE 1 END) AS BIGINT) AS nu,
  CAST(sum(CASE WHEN is_match AND eq_seg THEN 1 ELSE 0 END) AS BIGINT) AS am_seg,
  CAST(sum(CASE WHEN NOT is_match AND eq_seg THEN 1 ELSE 0 END) AS BIGINT) AS au_seg,
  CAST(sum(CASE WHEN is_match AND eq_bucket THEN 1 ELSE 0 END) AS BIGINT) AS am_bucket,
  CAST(sum(CASE WHEN NOT is_match AND eq_bucket THEN 1 ELSE 0 END) AS BIGINT) AS au_bucket,
  CAST(sum(CASE WHEN is_match AND eq_name THEN 1 ELSE 0 END) AS BIGINT) AS am_name,
  CAST(sum(CASE WHEN NOT is_match AND eq_name THEN 1 ELSE 0 END) AS BIGINT) AS au_name
  FROM p),
w AS MATERIALIZED (SELECT
  round(log2(LEAST(GREATEST(am_seg / nm, 1e-6), 1 - 1e-6)
           / LEAST(GREATEST(au_seg / nu, 1e-6), 1 - 1e-6)), 9) AS wa_seg,
  round(log2((1 - LEAST(GREATEST(am_seg / nm, 1e-6), 1 - 1e-6))
           / (1 - LEAST(GREATEST(au_seg / nu, 1e-6), 1 - 1e-6))), 9) AS wd_seg,
  round(log2(LEAST(GREATEST(am_bucket / nm, 1e-6), 1 - 1e-6)
           / LEAST(GREATEST(au_bucket / nu, 1e-6), 1 - 1e-6)), 9) AS wa_bucket,
  round(log2((1 - LEAST(GREATEST(am_bucket / nm, 1e-6), 1 - 1e-6))
           / (1 - LEAST(GREATEST(au_bucket / nu, 1e-6), 1 - 1e-6))), 9) AS wd_bucket,
  round(log2(LEAST(GREATEST(am_name / nm, 1e-6), 1 - 1e-6)
           / LEAST(GREATEST(au_name / nu, 1e-6), 1 - 1e-6)), 9) AS wa_name,
  round(log2((1 - LEAST(GREATEST(am_name / nm, 1e-6), 1 - 1e-6))
           / (1 - LEAST(GREATEST(au_name / nu, 1e-6), 1 - 1e-6))), 9) AS wd_name
  FROM cnt)
SELECT ak AS a_key, bk AS b_key, is_match,
       round((CASE WHEN eq_seg THEN wa_seg ELSE wd_seg END)
           + (CASE WHEN eq_bucket THEN wa_bucket ELSE wd_bucket END)
           + (CASE WHEN eq_name THEN wa_name ELSE wd_name END), 6) AS score
FROM p, w
QUALIFY row_number() OVER (
    ORDER BY round((CASE WHEN eq_seg THEN wa_seg ELSE wd_seg END)
        + (CASE WHEN eq_bucket THEN wa_bucket ELSE wd_bucket END)
        + (CASE WHEN eq_name THEN wa_name ELSE wd_name END), 6) DESC,
    ak, bk) <= 40
ORDER BY a_key, b_key
"""


@register("customer_linkage_fs", _FS_LINKAGE_SQL)
def customer_linkage_fs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fellegi–Sunter record linkage (operators/recordlinkage.py): the
    customer table re-linked against a deterministically perturbed copy
    (segment rewritten on keys ≡0 mod 5, balance bucket shifted on ≡0
    mod 3, name prefix destroyed on ≡0 mod 11 — the orders_snapshot_diff
    fixture style). Blocking on nationkey bounds candidates; m/u
    probabilities are estimated from the truth labels (same custkey) in
    ONE 1-row aggregate; scoring is a pure map over literal weights
    (rounded 9 dp so a last-ulp libm log2 difference cannot reach the
    6-dp score). Output: the 40 highest-scoring pairs — the supervised
    half of FS; the EM-fitted variant shares the scoring kernel."""
    from weaviate_txtai_spark.operators.recordlinkage import (
        fs_topk_blocked,
        fs_weights_blocked,
    )

    cust = load_table(spark, sf_dir, "customer")
    a = cust.select(
        F.col("c_custkey").alias("ak"),
        F.col("c_nationkey").alias("an"),
        F.col("c_mktsegment").alias("aseg"),
        F.floor(F.col("c_acctbal") / 1000).alias("abucket"),
        F.substring("c_name", 1, 8).alias("aname"),
    )
    b = cust.select(
        F.col("c_custkey").alias("bk"),
        F.col("c_nationkey").alias("bn"),
        F.when(F.col("c_custkey") % 5 == 0, F.lit("PERTURBED"))
        .otherwise(F.col("c_mktsegment")).alias("bseg"),
        F.when(
            F.col("c_custkey") % 3 == 0,
            F.floor(F.col("c_acctbal") / 1000) + 1,
        ).otherwise(F.floor(F.col("c_acctbal") / 1000)).alias("bbucket"),
        F.when(F.col("c_custkey") % 11 == 0, F.lit("XXXXXXXX"))
        .otherwise(F.substring("c_name", 1, 8)).alias("bname"),
    )
    # the blocked ~9M-pair expansion is NEVER enumerated: weights come
    # from marginal count products (fs_weights_blocked — identical
    # integer counts at dimension-table cost) and the top-40 comes from
    # pattern-ordered agree-field equijoins (fs_topk_blocked — the FS
    # score is a pure function of the agreement pattern, so the best
    # pairs live in the best patterns; 12.2 s -> ~2 s at sf0.1 under
    # bench's cleared-cache discipline)
    fields = {
        "eq_seg": ("aseg", "bseg"),
        "eq_bucket": ("abucket", "bbucket"),
        "eq_name": ("aname", "bname"),
    }
    w = fs_weights_blocked(
        a, b,
        a_key="ak", b_key="bk", a_block="an", b_block="bn",
        fields=fields,
    )
    top = fs_topk_blocked(
        a, b, w, 40,
        a_key="ak", b_key="bk", a_block="an", b_block="bn",
        fields=fields,
    )
    return (
        top.orderBy(F.desc("score"), "ak", "bk")
        .limit(40)
        .select(
            F.col("ak").alias("a_key"),
            F.col("bk").alias("b_key"),
            (F.col("ak") == F.col("bk")).alias("is_match"),
            "score",
        )
        .orderBy("a_key", "b_key")
    )


def _fs_em_sql(n_iter: int = 8, sc: int = 10**12) -> str:
    """DuckDB twin of the EM-fitted Fellegi–Sunter gate: the EM loop is
    UNROLLED as one CTE triple (E-step, pattern weights, M-step sums)
    per iteration over the 8-row pattern-count table, in the SAME
    scaled-integer arithmetic as operators/recordlinkage.fs_em_fit
    (HUGEINT multiply + truncating ``//``, clamp to [1, sc−1]) — so the
    fitted m/u are bit-identical integers on both engines and only the
    final 9-dp-rounded log2 touches floats (the pca_power_fit_exact
    oracle pattern)."""
    header = f"""
WITH a AS MATERIALIZED (
  SELECT c_custkey AS ak, c_nationkey AS an, c_mktsegment AS aseg,
         floor(c_acctbal / 1000) AS abucket,
         substr(c_name, 10, 9) AS aname
  FROM customer),
b AS MATERIALIZED (
  SELECT c_custkey AS bk, c_nationkey AS bn,
         CASE WHEN c_custkey % 5 = 0 THEN 'PERTURBED'
              ELSE c_mktsegment END AS bseg,
         CASE WHEN c_custkey % 3 = 0 THEN floor(c_acctbal / 1000) + 1
              ELSE floor(c_acctbal / 1000) END AS bbucket,
         CASE WHEN c_custkey % 11 = 0 THEN 'XXXXXXXXX'
              ELSE substr(c_name, 10, 9) END AS bname
  FROM customer),
p AS MATERIALIZED (
  SELECT ak, bk,
         COALESCE(aseg = bseg, FALSE) AS g1,
         COALESCE(abucket = bbucket, FALSE) AS g2,
         COALESCE(aname = bname, FALSE) AS g3
  FROM a JOIN b ON an = bn),
pc AS MATERIALIZED (
  SELECT g1, g2, g3, CAST(count(*) AS HUGEINT) AS n
  FROM p GROUP BY 1, 2, 3),
it0 AS (SELECT CAST({sc // 10} AS HUGEINT) AS p,
               CAST({9 * sc // 10} AS HUGEINT) AS m1,
               CAST({9 * sc // 10} AS HUGEINT) AS m2,
               CAST({9 * sc // 10} AS HUGEINT) AS m3,
               CAST({sc // 10} AS HUGEINT) AS u1,
               CAST({sc // 10} AS HUGEINT) AS u2,
               CAST({sc // 10} AS HUGEINT) AS u3)"""
    parts = [header]
    for i in range(1, n_iter + 1):
        prev = f"it{i - 1}"
        parts.append(f""",
e{i} AS (SELECT n, g1, g2, g3,
  (((((p
    * (CASE WHEN g1 THEN m1 ELSE {sc} - m1 END)) // {sc})
    * (CASE WHEN g2 THEN m2 ELSE {sc} - m2 END)) // {sc})
    * (CASE WHEN g3 THEN m3 ELSE {sc} - m3 END)) // {sc} AS A,
  ((((({sc} - p)
    * (CASE WHEN g1 THEN u1 ELSE {sc} - u1 END) // {sc})
    * (CASE WHEN g2 THEN u2 ELSE {sc} - u2 END)) // {sc})
    * (CASE WHEN g3 THEN u3 ELSE {sc} - u3 END)) // {sc} AS B
  FROM pc, {prev}),
w{i} AS (SELECT n, g1, g2, g3,
  (A * {sc}) // GREATEST(A + B, 1) AS w FROM e{i}),
s{i} AS (SELECT sum(n * w) AS S, sum(n) AS N,
  sum(CASE WHEN g1 THEN n * w ELSE 0 END) AS sm1,
  sum(CASE WHEN g2 THEN n * w ELSE 0 END) AS sm2,
  sum(CASE WHEN g3 THEN n * w ELSE 0 END) AS sm3,
  sum(CASE WHEN g1 THEN n * ({sc} - w) ELSE 0 END) AS su1,
  sum(CASE WHEN g2 THEN n * ({sc} - w) ELSE 0 END) AS su2,
  sum(CASE WHEN g3 THEN n * ({sc} - w) ELSE 0 END) AS su3
  FROM w{i}),
it{i} AS (SELECT
  LEAST(GREATEST(S // N, 1), {sc} - 1) AS p,
  LEAST(GREATEST((sm1 * {sc}) // GREATEST(S, 1), 1), {sc} - 1) AS m1,
  LEAST(GREATEST((sm2 * {sc}) // GREATEST(S, 1), 1), {sc} - 1) AS m2,
  LEAST(GREATEST((sm3 * {sc}) // GREATEST(S, 1), 1), {sc} - 1) AS m3,
  LEAST(GREATEST((su1 * {sc}) // GREATEST(N * {sc} - S, 1), 1),
        {sc} - 1) AS u1,
  LEAST(GREATEST((su2 * {sc}) // GREATEST(N * {sc} - S, 1), 1),
        {sc} - 1) AS u2,
  LEAST(GREATEST((su3 * {sc}) // GREATEST(N * {sc} - S, 1), 1),
        {sc} - 1) AS u3
  FROM s{i})""")
    parts.append(f""",
fw AS (SELECT
  round(log2(CAST(m1 AS DOUBLE) / CAST(u1 AS DOUBLE)), 9) AS wa1,
  round(log2(CAST({sc} - m1 AS DOUBLE) / CAST({sc} - u1 AS DOUBLE)), 9)
    AS wd1,
  round(log2(CAST(m2 AS DOUBLE) / CAST(u2 AS DOUBLE)), 9) AS wa2,
  round(log2(CAST({sc} - m2 AS DOUBLE) / CAST({sc} - u2 AS DOUBLE)), 9)
    AS wd2,
  round(log2(CAST(m3 AS DOUBLE) / CAST(u3 AS DOUBLE)), 9) AS wa3,
  round(log2(CAST({sc} - m3 AS DOUBLE) / CAST({sc} - u3 AS DOUBLE)), 9)
    AS wd3
  FROM it{n_iter})
SELECT ak AS a_key, bk AS b_key, (ak = bk) AS is_match,
       round((CASE WHEN g1 THEN wa1 ELSE wd1 END)
           + (CASE WHEN g2 THEN wa2 ELSE wd2 END)
           + (CASE WHEN g3 THEN wa3 ELSE wd3 END), 6) AS score
FROM p, fw
QUALIFY row_number() OVER (
    ORDER BY round((CASE WHEN g1 THEN wa1 ELSE wd1 END)
        + (CASE WHEN g2 THEN wa2 ELSE wd2 END)
        + (CASE WHEN g3 THEN wa3 ELSE wd3 END), 6) DESC,
    ak, bk) <= 40
ORDER BY a_key, b_key""")
    return "".join(parts)


_FS_EM_SQL = _fs_em_sql()


@register("customer_linkage_em", _FS_EM_SQL)
def customer_linkage_em_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EM-fitted UNSUPERVISED Fellegi–Sunter linkage (Winkler 1988;
    operators/recordlinkage.py fs_em_fit): the same perturbed-copy
    customer fixture as customer_linkage_fs, but with no truth labels —
    m/u/p are fitted by 8 EM iterations over the 2^K agreement-pattern
    table. The pattern counts come from inclusion–exclusion over
    marginal count-products (fs_pattern_counts_blocked — the blocked
    cross product is never enumerated), the EM loop is driver-side
    scaled-integer fixed-point (bit-identical to the oracle's unrolled
    CTEs), and the top-40 pairs come from the pattern-ordered equijoin
    path (fs_topk_blocked) exactly like the supervised gate. The name
    field uses the DISCRIMINATIVE c_name suffix so the EM's dominant
    mixture component is the true-match cluster (fitted p ≈ the real
    match rate; pinned in tests)."""
    from weaviate_txtai_spark.operators.recordlinkage import (
        fs_em_fit,
        fs_em_weights,
        fs_pattern_counts_blocked,
        fs_topk_blocked,
    )

    cust = load_table(spark, sf_dir, "customer")
    a = cust.select(
        F.col("c_custkey").alias("ak"),
        F.col("c_nationkey").alias("an"),
        F.col("c_mktsegment").alias("aseg"),
        F.floor(F.col("c_acctbal") / 1000).alias("abucket"),
        F.substring("c_name", 10, 9).alias("aname"),
    )
    b = cust.select(
        F.col("c_custkey").alias("bk"),
        F.col("c_nationkey").alias("bn"),
        F.when(F.col("c_custkey") % 5 == 0, F.lit("PERTURBED"))
        .otherwise(F.col("c_mktsegment")).alias("bseg"),
        F.when(
            F.col("c_custkey") % 3 == 0,
            F.floor(F.col("c_acctbal") / 1000) + 1,
        ).otherwise(F.floor(F.col("c_acctbal") / 1000)).alias("bbucket"),
        F.when(F.col("c_custkey") % 11 == 0, F.lit("XXXXXXXXX"))
        .otherwise(F.substring("c_name", 10, 9)).alias("bname"),
    )
    fields = {
        "eq_seg": ("aseg", "bseg"),
        "eq_bucket": ("abucket", "bbucket"),
        "eq_name": ("aname", "bname"),
    }
    counts = fs_pattern_counts_blocked(
        a, b, a_block="an", b_block="bn", fields=fields
    )
    fit = fs_em_fit(counts, len(fields), n_iter=8)
    w = fs_em_weights(fit, list(fields))
    top = fs_topk_blocked(
        a, b, w, 40,
        a_key="ak", b_key="bk", a_block="an", b_block="bn",
        fields=fields,
    )
    return (
        top.orderBy(F.desc("score"), "ak", "bk")
        .limit(40)
        .select(
            F.col("ak").alias("a_key"),
            F.col("bk").alias("b_key"),
            (F.col("ak") == F.col("bk")).alias("is_match"),
            "score",
        )
        .orderBy("a_key", "b_key")
    )


_STRAT_ATE_SQL = """
WITH u AS MATERIALIZED (
  SELECT user_id,
         ((user_id * 2654435761) % 4294967296) % 2 = 0 AS treat,
         CAST(max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS DOUBLE) AS y,
         CAST(hour(min(ts)) // 6 AS INT) AS stratum
  FROM events GROUP BY user_id
),
wide AS MATERIALIZED (
  SELECT stratum,
         CAST(sum(CASE WHEN treat THEN 1 ELSE 0 END) AS BIGINT) AS n1,
         CAST(sum(CASE WHEN NOT treat THEN 1 ELSE 0 END) AS BIGINT) AS n0,
         sum(CASE WHEN treat THEN y END) AS s1,
         sum(CASE WHEN NOT treat THEN y END) AS s0,
         var_samp(CASE WHEN treat THEN y END) AS v1,
         var_samp(CASE WHEN NOT treat THEN y END) AS v0
  FROM u GROUP BY stratum
  HAVING n1 >= 2 AND n0 >= 2
),
kept AS MATERIALIZED (
  SELECT stratum, n1, n0, n1 + n0 AS ns,
         s1 / n1 - s0 / n0 AS d,
         v1 / n1 + v0 / n0 AS vw
  FROM wide),
tot AS MATERIALIZED (SELECT CAST(sum(ns) AS BIGINT) AS n FROM kept)
SELECT * FROM (
  SELECT CAST(stratum AS BIGINT) AS stratum, n1, n0,
         round(d, 6) AS diff,
         round(ns / CAST(n AS DOUBLE), 6) AS weight,
         CAST(NULL AS DOUBLE) AS se
  FROM kept, tot
  UNION ALL
  SELECT CAST(-1 AS BIGINT), CAST(sum(n1) AS BIGINT),
         CAST(sum(n0) AS BIGINT),
         round(sum(ns / CAST(n AS DOUBLE) * d), 6),
         round(1.0, 6),
         round(sqrt(sum(pow(ns / CAST(n AS DOUBLE), 2) * vw)), 6)
  FROM kept, tot GROUP BY n
) ORDER BY stratum
"""


@register("events_stratified_ate", _STRAT_ATE_SQL)
def events_stratified_ate_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-stratified average treatment effect (operators/abtest.py
    stratified_ate): per-user conversion under a deterministic
    Knuth-hash treatment split, stratified by signup-hour quarter —
    the closed-form causal readout between raw difference-in-means and
    a fitted propensity model; strata lacking 2 units in either arm
    are trimmed (positivity). One groupBy(user) + one groupBy(stratum,
    arm) shuffle; everything after is strata-domain."""
    from weaviate_txtai_spark.functions.sampling import knuth_term
    from weaviate_txtai_spark.operators.abtest import stratified_ate

    ev = load_table(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).cast("double").alias("y"),
        (F.hour(F.min("ts")).cast("int") / 6).cast("int").alias("stratum"),
    ).select(
        "user_id",
        # overflow-safe split multiply (r13 review): the naive
        # user_id·K product dies under ANSI at id ≥ ~3.47e9;
        # value-identical parity bit at any id < 2^31
        (knuth_term("user_id") % 2 == 0).alias("treat"),
        "y",
        "stratum",
    )
    return stratified_ate(u, "treat", "y", "stratum").orderBy("stratum")


_SEQ_TRIPLES_SQL = """
WITH e AS MATERIALIZED (
  SELECT DISTINCT user_id AS u, event_type AS t, epoch_us(ts) AS us
  FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL),
h AS MATERIALIZED (
  SELECT a.u, a.t AS x, a.us AS tx, b.t AS y, b.us AS ty
  FROM e a JOIN e b ON a.u = b.u
  WHERE b.us > a.us AND b.us - a.us <= 7200000000),
p AS (
  SELECT DISTINCT h1.u, h1.x AS a, h1.y AS b, h2.y AS c
  FROM h h1 JOIN h h2
    ON h1.u = h2.u AND h1.ty = h2.tx AND h1.y = h2.x)
SELECT a, b, c, CAST(count(*) AS BIGINT) AS support
FROM p GROUP BY a, b, c HAVING count(*) >= 2
ORDER BY a, b, c
"""


@register("events_sequence_triples", _SEQ_TRIPLES_SQL)
def events_sequence_triples_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent ordered event-type TRIPLES a→b→c with both hops inside
    a two-hour window (operators/seqmine.py sequence_triples) — one
    GSP level past events_sequence_pairs. Chains compose on the SHARED
    middle event (two user-co-located self-joins); existence is over
    all chains, not greedy earliest-match, which is incomplete under a
    per-hop window bound. Support = distinct users."""
    from weaviate_txtai_spark.operators.seqmine import sequence_triples

    ev = load_table(spark, sf_dir, "events")
    return sequence_triples(
        ev, window_seconds=7200, min_support=2
    ).orderBy("a", "b", "c")


_DP_COUNTS_SQL = """
WITH g AS (
  SELECT user_id % 50 AS cohort, count(*) AS c
  FROM events GROUP BY 1),
n AS (
  SELECT cohort, c,
         ((((cohort % 2147483648) * 2654435761) % 4294967296) + 0.5)
           / 4294967296.0 AS u
  FROM g)
SELECT CAST(cohort AS BIGINT) AS cohort,
       round(GREATEST(
         c + (-1.0) * CASE WHEN u - 0.5 < 0 THEN -1.0
                           WHEN u - 0.5 > 0 THEN 1.0 ELSE 0.0 END
             * ln(GREATEST(1.0 - 2.0 * abs(u - 0.5), power(2.0, -33))),
         0.0), 6) AS noisy_count
FROM n ORDER BY cohort
"""


@register("events_dp_cohort_counts", _DP_COUNTS_SQL)
def events_dp_cohort_counts_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ε-differentially-private cohort-size release (operators/
    privacy.py dp_noisy_counts, Laplace mechanism ε=1): per-cohort
    event counts perturbed by hash-seeded Laplace noise and floored at
    zero — the aggregate-perturbation companion to the k-anonymity /
    ℓ-diversity row-suppression gates. The noise draw is a
    deterministic Knuth-hash inverse-CDF, so the release is
    reproducible AND the oracle replays it exactly (the privacy
    calculus is the same as a fresh draw while the salt stays
    private)."""
    from weaviate_txtai_spark.operators.privacy import dp_noisy_counts

    ev = load_table(spark, sf_dir, "events")
    cohorts = ev.select((F.col("user_id") % 50).alias("cohort"))
    return dp_noisy_counts(cohorts, ["cohort"], epsilon=1.0).orderBy(
        "cohort"
    )


def _bt_sql(n_iter: int = 8) -> str:
    """DuckDB twin of bradley_terry_exact on the order-price preference
    pairs: the T MM iterations unrolled as MATERIALIZED chained CTEs
    (the hits/pca oracle pattern) in the same pure-integer arithmetic
    (// == Spark div on the non-negative values here)."""
    parts = [
        """WITH cmp AS MATERIALIZED (
  SELECT a.l_partkey AS i, b.l_partkey AS j
  FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
  WHERE a.l_extendedprice > b.l_extendedprice),
und AS MATERIALIZED (
  SELECT i, j, CAST(count(*) AS BIGINT) AS n FROM (
    SELECT i, j FROM cmp UNION ALL SELECT j AS i, i AS j FROM cmp)
  GROUP BY 1, 2),
wins AS MATERIALIZED (
  SELECT i, CAST(count(*) AS BIGINT) AS w FROM cmp GROUP BY 1),
p0 AS MATERIALIZED (
  SELECT DISTINCT i, CAST(1000000000 AS BIGINT) AS p FROM und),"""
    ]
    for t in range(1, n_iter + 1):
        parts.append(
            f"""d{t} AS MATERIALIZED (
  SELECT u.i,
         CAST(SUM((u.n * 1000000000) // GREATEST(pi.p + pj.p, 1))
              AS BIGINT) AS denom
  FROM und u
  JOIN p{t - 1} pi ON u.i = pi.i
  JOIN p{t - 1} pj ON u.j = pj.i
  GROUP BY u.i),
p{t} AS MATERIALIZED (
  SELECT d.i,
         LEAST((COALESCE(w.w, 0) * 1000000000)
                 // GREATEST(d.denom, 1),
               CAST(1000000000000 AS BIGINT)) AS p
  FROM d{t} d LEFT JOIN wins w ON d.i = w.i),"""
        )
    body = "\n".join(parts).rstrip(",")
    return (
        f"{body},\nmx AS MATERIALIZED (SELECT MAX(p) AS m FROM p{n_iter})\n"
        f"SELECT p{n_iter}.i AS item,\n"
        f"       round(p{n_iter}.p / CAST(mx.m AS DOUBLE), 6) AS strength\n"
        f"FROM p{n_iter}, mx ORDER BY item"
    )


@register("part_bt_ranking", _bt_sql())
def part_bt_ranking_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bradley–Terry preference ranking (operators/btrank.py
    bradley_terry_exact) — the arena-style pairwise-judgment aggregator
    LLM eval pipelines run, exercised on a deterministic preference
    fixture: within each order, the pricier lineitem's part "beats" the
    cheaper one. Eight MM iterations in scaled-long arithmetic with
    floor divisions, a 1-unit denominator floor (never-winning items)
    and a 1e12 cap (never-losing items, ANSI-safe sums) — the
    pagerank_exact/hits_exact fixed-point discipline, replayed
    bit-identically by the unrolled-CTE oracle."""
    from weaviate_txtai_spark.operators.btrank import bradley_terry_exact

    li = load_table(spark, sf_dir, "lineitem")
    a = li.select("l_orderkey", F.col("l_partkey").alias("wi"),
                  F.col("l_extendedprice").alias("pa"))
    b = li.select("l_orderkey", F.col("l_partkey").alias("lo"),
                  F.col("l_extendedprice").alias("pb"))
    pairs = a.join(b, "l_orderkey").filter(
        F.col("pa") > F.col("pb")
    ).select(F.col("wi").alias("winner"), F.col("lo").alias("loser"))
    return bradley_terry_exact(pairs, n_iter=8).orderBy("item")


_AUC_SQL = """
WITH e AS MATERIALIZED (
  SELECT CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y,
         value AS s
  FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL),
vc AS MATERIALIZED (
  SELECT s, CAST(count(*) AS BIGINT) AS c, CAST(sum(y) AS BIGINT) AS np
  FROM e GROUP BY 1),
r AS (
  SELECT s, np,
         COALESCE(sum(c) OVER (
           ORDER BY s ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
           0) + (c + 1) / 2.0 AS ar
  FROM vc),
agg AS (
  SELECT (SELECT CAST(sum(y) AS BIGINT) FROM e) AS n_pos,
         (SELECT CAST(count(*) - sum(y) AS BIGINT) FROM e) AS n_neg,
         sum(np * ar) AS rp
  FROM r)
SELECT n_pos, n_neg,
       round((rp - n_pos * (n_pos + 1) / 2.0)
             / (n_pos * CAST(n_neg AS DOUBLE)), 6) AS auc
FROM agg
"""


@register("purchase_value_auc", _AUC_SQL)
def purchase_value_auc_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROC AUC of event value as a purchase ranker
    (operators/evalmetrics.py roc_auc) — the classifier-quality readout
    every learned quality filter gets before its threshold is trusted.
    Rank-sum identity AUC = U⁺/(n⁺n⁻) over tie-averaged ranks from the
    value-domain prefix-sum (no global-order window); ranks are exact
    multiples of ½ below 2^53, so the float sum replays exactly."""
    from weaviate_txtai_spark.operators.evalmetrics import roc_auc

    ev = load_table(spark, sf_dir, "events")
    return roc_auc(
        ev.select(
            (F.col("event_type") == "purchase").alias("y"),
            F.col("value"),
        ),
        label_col="y",
        score_col="value",
    )


_ISOTONIC_SQL = """
WITH e AS MATERIALIZED (
  SELECT CAST(floor(value) AS INT) AS bucket,
         CASE WHEN event_type = 'purchase' THEN 1.0 ELSE 0.0 END AS y
  FROM events WHERE value IS NOT NULL),
b AS MATERIALIZED (
  SELECT bucket, sum(y) AS sy, CAST(count(*) AS DOUBLE) AS n
  FROM e GROUP BY 1),
pref AS MATERIALIZED (
  SELECT bucket, sy, n,
         sum(sy) OVER (ORDER BY bucket) AS s_incl,
         sum(n) OVER (ORDER BY bucket) AS n_incl
  FROM b),
m AS MATERIALIZED (
  SELECT j.bucket AS xj,
         min((k.s_incl - (j.s_incl - j.sy))
             / (k.n_incl - (j.n_incl - j.n))) AS mj
  FROM pref j JOIN pref k ON j.bucket <= k.bucket GROUP BY 1),
fit AS (
  SELECT i.bucket, max(m.mj) AS f
  FROM pref i JOIN m ON m.xj <= i.bucket GROUP BY 1)
SELECT b.bucket, CAST(b.n AS BIGINT) AS n,
       round(b.sy / b.n, 6) AS y_mean, round(fit.f, 6) AS y_iso
FROM b JOIN fit ON b.bucket = fit.bucket ORDER BY b.bucket
"""


@register("purchase_isotonic_fit", _ISOTONIC_SQL)
def purchase_isotonic_fit_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Isotonic (PAV) calibration of P(purchase | value bucket)
    (operators/isotonic.py isotonic_fit) — the non-parametric monotone
    calibrator quality-classifier scores get before thresholding.
    Computed via the minimax characterization fit(i) = max_{j≤i}
    min_{k≥j} mean(y over j..k): after one corpus aggregate the
    quadratic runs over the BUCKET domain only (B² range self-joins, no
    unpartitioned window, no sequential PAV stack). Binary y makes
    every interval mean an exact-integer ratio — deterministic across
    engines with no rounding discipline."""
    from weaviate_txtai_spark.operators.isotonic import isotonic_fit

    ev = load_table(spark, sf_dir, "events")
    pts = ev.filter(F.col("value").isNotNull()).select(
        F.floor(F.col("value")).cast("int").alias("bucket"),
        F.when(F.col("event_type") == "purchase", 1.0)
        .otherwise(0.0).alias("y"),
    )
    return isotonic_fit(pts, "bucket", "y").orderBy("bucket")


def _markov_sql(n_iter: int = 8, final: "str | None" = None) -> str:
    """DuckDB twin of markov_stationary_exact on the per-user
    consecutive event-type transitions: the T power steps unrolled as
    MATERIALIZED chained CTEs in the same scaled-long floor arithmetic
    (// == Spark div on the non-negative masses here)."""
    parts = [
        """WITH seq AS (
  SELECT event_type,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev_type
  FROM events),
tr AS MATERIALIZED (
  SELECT prev_type AS src, event_type AS dst,
         CAST(count(*) AS BIGINT) AS cnt
  FROM seq WHERE prev_type IS NOT NULL GROUP BY 1, 2),
tot AS MATERIALIZED (
  SELECT src, CAST(sum(cnt) AS BIGINT) AS tot FROM tr GROUP BY 1),
states AS MATERIALIZED (
  SELECT src AS id FROM tr UNION SELECT dst FROM tr),
ns AS (SELECT count(*) AS n FROM states),
p0 AS MATERIALIZED (
  SELECT id, CAST(1000000000 // ns.n AS BIGINT) AS m
  FROM states, ns),"""
    ]
    for t in range(1, n_iter + 1):
        parts.append(
            f"""dm{t} AS MATERIALIZED (
  SELECT CAST(COALESCE(sum(p.m), 0) AS BIGINT) AS dm
  FROM p{t - 1} p LEFT JOIN tot ON p.id = tot.src
  WHERE tot.src IS NULL),
c{t} AS MATERIALIZED (
  SELECT tr.dst,
         CAST(sum((p.m * tr.cnt) // tt.tot) AS BIGINT) AS mass
  FROM tr JOIN p{t - 1} p ON p.id = tr.src
  JOIN tot tt ON tt.src = tr.src
  GROUP BY 1),
p{t} AS MATERIALIZED (
  SELECT s.id,
         CAST(COALESCE(c.mass, 0) + d.dm // ns.n AS BIGINT) AS m
  FROM states s LEFT JOIN c{t} c ON c.dst = s.id, dm{t} d, ns),"""
        )
    body = "\n".join(parts).rstrip(",")
    if final is None:
        final = (
            f"tm AS (SELECT CAST(sum(m) AS DOUBLE) AS t FROM p{n_iter})\n"
            f"SELECT p{n_iter}.id AS state,"
            f" round(p{n_iter}.m / tm.t, 6) AS pi\n"
            f"FROM p{n_iter}, tm ORDER BY state"
        )
    return f"{body},\n{final}"


@register("event_type_stationary", _markov_sql())
def event_type_stationary_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markov stationary distribution over event types
    (operators/markov.py markov_stationary_exact): the long-run state
    occupancy of the per-user journey chain — where sessions spend
    their time, the follow-on readout to event_transitions' one-step
    matrix. Eight power steps in scaled-long floor arithmetic with
    uniform dangling redistribution (the pagerank_exact discipline),
    replayed bit-identically by the unrolled-CTE oracle."""
    from weaviate_txtai_spark.operators.markov import (
        markov_stationary_exact,
    )

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type",
        F.lag("event_type").over(w).alias("prev_type"),
    ).filter(F.col("prev_type").isNotNull())
    tr = seq.groupBy(
        F.col("prev_type").alias("src"),
        F.col("event_type").alias("dst"),
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    return markov_stationary_exact(tr, n_iter=8).orderBy("state")


_OLS2_SQL = """
WITH b AS (
  SELECT value AS y, CAST(hour(ts) AS DOUBLE) AS x1,
         CASE WHEN event_type = 'purchase' THEN 1.0 ELSE 0.0 END AS x2
  FROM events WHERE value IS NOT NULL AND ts IS NOT NULL),
a AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(x1 AS DECIMAL(38,10))) AS DOUBLE) AS s1,
         CAST(sum(CAST(x2 AS DECIMAL(38,10))) AS DOUBLE) AS s2,
         CAST(sum(CAST(y AS DECIMAL(38,10))) AS DOUBLE) AS sy,
         CAST(sum(CAST(x1 * x1 AS DECIMAL(38,10))) AS DOUBLE) AS s11,
         CAST(sum(CAST(x1 * x2 AS DECIMAL(38,10))) AS DOUBLE) AS s12,
         CAST(sum(CAST(x2 * x2 AS DECIMAL(38,10))) AS DOUBLE) AS s22,
         CAST(sum(CAST(x1 * y AS DECIMAL(38,10))) AS DOUBLE) AS s1y,
         CAST(sum(CAST(x2 * y AS DECIMAL(38,10))) AS DOUBLE) AS s2y,
         CAST(sum(CAST(y * y AS DECIMAL(38,10))) AS DOUBLE) AS syy
  FROM b),
k AS (
  SELECT *,
    CAST(n AS DOUBLE) * (s11 * s22 - s12 * s12)
      - s1 * (s1 * s22 - s12 * s2)
      + s2 * (s1 * s12 - s11 * s2) AS det,
    sy * (s11 * s22 - s12 * s12)
      - s1 * (s1y * s22 - s12 * s2y)
      + s2 * (s1y * s12 - s11 * s2y) AS d0,
    CAST(n AS DOUBLE) * (s1y * s22 - s12 * s2y)
      - sy * (s1 * s22 - s12 * s2)
      + s2 * (s1 * s2y - s1y * s2) AS d1,
    CAST(n AS DOUBLE) * (s11 * s2y - s1y * s12)
      - s1 * (s1 * s2y - s1y * s2)
      + sy * (s1 * s12 - s11 * s2) AS d2
  FROM a),
f AS (
  SELECT n,
         CASE WHEN n >= 3 AND det <> 0 THEN d0 / det END AS b0,
         CASE WHEN n >= 3 AND det <> 0 THEN d1 / det END AS b1,
         CASE WHEN n >= 3 AND det <> 0 THEN d2 / det END AS b2,
         sy, s1y, s2y, syy, s1, s2
  FROM k)
SELECT n, round(b0, 6) AS b0, round(b1, 6) AS b1, round(b2, 6) AS b2,
       round(1.0 - (syy - b0 * sy - b1 * s1y - b2 * s2y)
                   / (syy - sy * sy / CAST(n AS DOUBLE)), 6) AS r2
FROM f
"""


@register("events_value_ols2", _OLS2_SQL)
def events_value_ols2_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-feature OLS (operators/regression.py ols2): event value
    regressed on hour-of-day and the purchase flag — multiple
    regression as ONE aggregation pass via the 3×3 normal equations in
    closed form. Every moment is an exact DECIMAL(38,10) sum
    (order-independent, the nation_trade_volume discipline), so the
    doubles entering Cramer are identical across engines and the fit
    needs no per-step rounding."""
    from weaviate_txtai_spark.operators.regression import ols2

    ev = load_table(spark, sf_dir, "events")
    pts = ev.filter(
        F.col("value").isNotNull() & F.col("ts").isNotNull()
    ).select(
        F.col("value").alias("y"),
        F.hour("ts").cast("double").alias("x1"),
        F.when(F.col("event_type") == "purchase", 1.0)
        .otherwise(0.0).alias("x2"),
    )
    return ols2(pts, "y", "x1", "x2")


_SRM_SQL = """
WITH u AS (
  SELECT DISTINCT user_id,
         CASE WHEN user_id % 10 < 5 THEN 'A'
              WHEN user_id % 10 < 8 THEN 'B' ELSE 'C' END AS g
  FROM events),
exp AS (
  SELECT 'A' AS g, 0.5 AS e
  UNION ALL SELECT 'B', 0.3 UNION ALL SELECT 'C', 0.2),
cells AS (
  SELECT exp.g, exp.e, CAST(COALESCE(c.o, 0) AS BIGINT) AS o
  FROM exp LEFT JOIN (
    SELECT g, count(*) AS o FROM u GROUP BY 1) c ON exp.g = c.g),
tot AS (SELECT CAST(sum(o) AS DOUBLE) AS n FROM cells),
agg AS (
  SELECT CAST(tot.n AS BIGINT) AS n, CAST(count(*) AS BIGINT) AS k,
         round(sum(CASE WHEN tot.n > 0 THEN
           (o - tot.n * e) * (o - tot.n * e) / (tot.n * e) END), 6)
           AS chi2
  FROM cells, tot GROUP BY tot.n),
z AS (
  SELECT n, k, chi2,
         (pow(chi2 / (k - 1), 1.0 / 3.0)
          - (1.0 - 2.0 / (9.0 * (k - 1))))
         / sqrt(2.0 / (9.0 * (k - 1))) AS zz
  FROM agg)
SELECT n, k, chi2,
       round(CASE WHEN chi2 IS NULL THEN NULL
                  WHEN zz >= 0 THEN
         (exp(-abs(zz) * abs(zz) / 2.0) / 2.5066282746310002)
         * ((1.0 / (1.0 + 0.2316419 * abs(zz)))
            * (0.319381530
               + (1.0 / (1.0 + 0.2316419 * abs(zz)))
                 * (-0.356563782
                    + (1.0 / (1.0 + 0.2316419 * abs(zz)))
                      * (1.781477937
                         + (1.0 / (1.0 + 0.2316419 * abs(zz)))
                           * (-1.821255978
                              + (1.0 / (1.0 + 0.2316419 * abs(zz)))
                                * 1.330274429)))))
                  ELSE 1.0 -
         (exp(-abs(zz) * abs(zz) / 2.0) / 2.5066282746310002)
         * ((1.0 / (1.0 + 0.2316419 * abs(zz)))
            * (0.319381530
               + (1.0 / (1.0 + 0.2316419 * abs(zz)))
                 * (-0.356563782
                    + (1.0 / (1.0 + 0.2316419 * abs(zz)))
                      * (1.781477937
                         + (1.0 / (1.0 + 0.2316419 * abs(zz)))
                           * (-1.821255978
                              + (1.0 / (1.0 + 0.2316419 * abs(zz)))
                                * 1.330274429)))))
             END, 6) AS p_value
FROM z
"""


@register("events_srm_check", _SRM_SQL)
def events_srm_check_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-ratio-mismatch guard (operators/abtest.py chisq_gof): χ²
    goodness-of-fit of the distinct-user 50/30/20 bucket assignment
    against its intended fractions — the FIRST readout of any
    experiment panel (a broken assignment invalidates every downstream
    estimate). Wilson–Hilferty normal approximation on the rounded
    statistic + the Zelen–Severo Φ polynomial — pure deterministic
    arithmetic, replayed exactly by the oracle."""
    from weaviate_txtai_spark.operators.abtest import chisq_gof

    ev = load_table(spark, sf_dir, "events")
    users = ev.select("user_id").distinct().select(
        F.when(F.col("user_id") % 10 < 5, "A")
        .when(F.col("user_id") % 10 < 8, "B")
        .otherwise("C").alias("g")
    )
    return chisq_gof(users, "g", {"A": 0.5, "B": 0.3, "C": 0.2})


_ENTROPY_RATE_FINAL = """tm AS (SELECT CAST(sum(m) AS DOUBLE) AS t FROM p8),
pi AS (SELECT p8.id, round(p8.m / tm.t, 6) AS pi FROM p8, tm),
hs AS (
  SELECT tr.src,
         sum(-(tr.cnt * 1.0 / tt.tot) * ln(tr.cnt * 1.0 / tt.tot)) AS hs,
         CAST(count(*) AS BIGINT) AS k
  FROM tr JOIN tot tt ON tt.src = tr.src GROUP BY 1)
SELECT CAST(count(*) AS BIGINT) AS n_states,
       CAST(COALESCE(sum(hs.k), 0) AS BIGINT) AS n_transitions,
       round(COALESCE(sum(pi.pi * hs.hs), 0), 6) AS entropy_rate
FROM pi LEFT JOIN hs ON pi.id = hs.src"""


@register("event_chain_entropy_rate", _markov_sql(final=_ENTROPY_RATE_FINAL))
def event_chain_entropy_rate_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entropy rate of the user-journey chain (operators/markov.py
    markov_entropy_rate): H = −Σ_u π_u Σ_v p̂_uv ln p̂_uv in nats/step —
    how predictable the next event is, the sequence-compressibility
    companion to event_type_stationary (same fixed-point π, one extra
    join + aggregate). π is rounded before the float products, so both
    engines start from identical doubles."""
    from weaviate_txtai_spark.operators.markov import markov_entropy_rate

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type",
        F.lag("event_type").over(w).alias("prev_type"),
    ).filter(F.col("prev_type").isNotNull())
    tr = seq.groupBy(
        F.col("prev_type").alias("src"),
        F.col("event_type").alias("dst"),
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    return markov_entropy_rate(tr, n_iter=8)


_CMH_SQL = """
WITH u AS (
  SELECT user_id, (user_id // 2) % 4 AS s,
         CAST(user_id % 2 AS INT) AS t,
         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS y
  FROM events GROUP BY 1, 2, 3),
cells AS (
  SELECT s, CAST(count(*) AS DOUBLE) AS N,
         CAST(sum(t) AS DOUBLE) AS n1,
         CAST(sum(y) AS DOUBLE) AS m1,
         CAST(sum(t * y) AS DOUBLE) AS a
  FROM u GROUP BY 1),
per AS (
  SELECT N,
    CASE WHEN N >= 2 AND n1 > 0 AND N - n1 > 0
              AND m1 > 0 AND N - m1 > 0 THEN a END AS a,
    CASE WHEN N >= 2 AND n1 > 0 AND N - n1 > 0
              AND m1 > 0 AND N - m1 > 0 THEN n1 * m1 / N END AS e,
    CASE WHEN N >= 2 AND n1 > 0 AND N - n1 > 0
              AND m1 > 0 AND N - m1 > 0
         THEN n1 * (N - n1) * m1 * (N - m1) / (N * N * (N - 1)) END AS v
  FROM cells),
agg AS (
  SELECT CAST(count(*) AS BIGINT) AS k_strata,
         CAST(sum(N) AS BIGINT) AS n,
         round(CASE WHEN sum(v) > 0 THEN
           (sum(a) - sum(e)) * (sum(a) - sum(e)) / sum(v) END, 6) AS cmh
  FROM per),
zz AS (SELECT k_strata, n, cmh, sqrt(cmh) AS stat FROM agg)
SELECT k_strata, n, cmh,
       round(CASE WHEN cmh IS NULL THEN NULL ELSE
         2.0 * (exp(-abs(stat) * abs(stat) / 2.0) / 2.5066282746310002)
         * ((1.0 / (1.0 + 0.2316419 * abs(stat)))
            * (0.319381530
               + (1.0 / (1.0 + 0.2316419 * abs(stat)))
                 * (-0.356563782
                    + (1.0 / (1.0 + 0.2316419 * abs(stat)))
                      * (1.781477937
                         + (1.0 / (1.0 + 0.2316419 * abs(stat)))
                           * (-1.821255978
                              + (1.0 / (1.0 + 0.2316419 * abs(stat)))
                                * 1.330274429)))))
             END, 6) AS p_value
FROM zz
"""


@register("purchase_cmh", _CMH_SQL)
def purchase_cmh_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran–Mantel–Haenszel stratified 2×2 test (operators/abtest.py
    cmh_test): does user parity associate with purchasing CONSISTENTLY
    across the (user_id div 2) % 4 strata — the binary-outcome,
    Simpson-reversal-proof companion to events_stratified_ate. Counts
    only (exact ratios); two-sided p via Zelen–Severo Φ on √CMH of the
    rounded statistic."""
    from weaviate_txtai_spark.operators.abtest import cmh_test

    ev = load_table(spark, sf_dir, "events")
    users = ev.groupBy("user_id").agg(
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("y")
    ).select(
        F.expr("(user_id div 2) % 4").alias("s"),
        (F.col("user_id") % 2).cast("int").alias("t"),
        "y",
    )
    return cmh_test(users, "s", "t", "y")


_RFM_SQL = """
WITH b AS (
  SELECT user_id AS u, epoch_us(ts) AS us, value AS v
  FROM events
  WHERE ts IS NOT NULL AND value IS NOT NULL
    AND event_type = 'purchase'),
pu AS MATERIALIZED (
  SELECT u, max(us) AS last_us, CAST(count(*) AS BIGINT) AS frequency,
         sum(v) AS monetary
  FROM b GROUP BY 1),
mx AS (SELECT max(last_us) AS cmax FROM pu),
r AS (
  SELECT u, cmax - last_us AS recency_us, frequency, monetary
  FROM pu, mx),
s AS (
  SELECT u, recency_us, frequency, monetary,
         CAST(ntile(5) OVER (ORDER BY recency_us DESC, u) AS INT)
           AS r_score,
         CAST(ntile(5) OVER (ORDER BY frequency ASC, u) AS INT)
           AS f_score,
         CAST(ntile(5) OVER (ORDER BY monetary ASC, u) AS INT)
           AS m_score
  FROM r)
SELECT u AS user_id, recency_us, frequency,
       round(monetary, 6) AS monetary, r_score, f_score, m_score,
       CAST(r_score AS VARCHAR) || CAST(f_score AS VARCHAR)
         || CAST(m_score AS VARCHAR) AS segment
FROM s ORDER BY user_id
"""


@register("customer_rfm_segments", _RFM_SQL)
def customer_rfm_segments_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation of purchasers (operators/rfm.py rfm_segments):
    exact quintile scores on recency (integer epoch-µs from the corpus
    max), frequency, and spend, with the user id tie-breaking every
    ntile ordering so bucket assignment replays exactly. The
    global-order ntile is domain-bounded (one row per purchaser after
    the groupBy; quantile_buckets is the documented corpus-scale
    twin)."""
    from weaviate_txtai_spark.operators.rfm import rfm_segments

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    return rfm_segments(ev, warn_rows=None).orderBy("user_id")


_BURSTINESS_SQL = """
WITH g AS (
  SELECT user_id,
         epoch_us(ts) - lag(epoch_us(ts)) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS gap
  FROM events WHERE ts IS NOT NULL),
a AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS n_gaps,
         CAST(sum(gap) AS BIGINT) AS sg,
         CAST(sum(CAST(CAST(gap AS DOUBLE) * CAST(gap AS DOUBLE)
                       AS DECIMAL(38,6))) AS DOUBLE) AS sq
  FROM g WHERE gap IS NOT NULL GROUP BY 1),
f AS (
  SELECT user_id, n_gaps, sg // n_gaps AS mgap,
         sg / CAST(n_gaps AS DOUBLE) AS mu,
         sqrt(greatest((sq - CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE)
                             / n_gaps) / (n_gaps - 1), 0.0)) AS sd
  FROM a WHERE n_gaps >= 2)
SELECT user_id, n_gaps, CAST(mgap AS BIGINT) AS mean_gap_us,
       round(CASE WHEN sd + mu <> 0 THEN (sd - mu) / (sd + mu) END, 6)
         AS b
FROM f ORDER BY user_id
"""


@register("user_burstiness", _BURSTINESS_SQL)
def user_burstiness_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user burstiness B = (σ−μ)/(σ+μ) of inter-event gaps
    (operators/profile.py burstiness; Goh–Barabási): the periodic-vs-
    bursty fingerprint behind bot/scheduler triage. Gaps are integer
    epoch-µs; moments are order-independent (long Σgap + decimal Σgap²)
    because float sums at µs magnitude reorder past the 6-dp grid.
    One user-partitioned lag window + one groupBy."""
    from weaviate_txtai_spark.operators.profile import burstiness

    ev = load_table(spark, sf_dir, "events")
    return burstiness(ev).orderBy("user_id")


_THEIL_SQL = """
WITH rev AS (
  SELECT n.n_name AS g, CAST(sum(o.o_totalprice) AS DOUBLE) AS x
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  GROUP BY c.c_custkey, n.n_name),
base AS MATERIALIZED (SELECT g, x FROM rev WHERE x > 0),
grp AS MATERIALIZED (
  SELECT g, CAST(count(*) AS DOUBLE) AS ng, avg(x) AS mug
  FROM base GROUP BY 1),
tot AS (SELECT CAST(count(*) AS DOUBLE) AS n, avg(x) AS mu FROM base),
tg AS (
  SELECT base.g, avg((x / mug) * ln(x / mug)) AS tgv
  FROM base JOIN grp ON base.g = grp.g GROUP BY base.g),
parts AS (
  SELECT (ng / tot.n) * (mug / tot.mu) AS w,
         ln(mug / tot.mu) AS lb, tgv
  FROM grp JOIN tg ON grp.g = tg.g, tot),
ttot AS (
  SELECT avg((x / tot.mu) * ln(x / tot.mu)) AS tt FROM base, tot)
SELECT CAST(tot.n AS BIGINT) AS n,
       CAST((SELECT count(*) FROM grp) AS BIGINT) AS n_groups,
       round(ttot.tt, 6) AS theil_total,
       round(sum(w * lb), 6) AS theil_between,
       round(sum(w * tgv), 6) AS theil_within
FROM parts, tot, ttot GROUP BY tot.n, ttot.tt
"""


@register("revenue_theil", _THEIL_SQL)
def revenue_theil_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil T inequality of per-customer revenue with the exact
    between/within-NATION decomposition (operators/inequality.py
    theil_decomposition) — the additive-decomposition property Gini
    lacks: is revenue concentration a cross-country or within-country
    phenomenon? Two shuffles (customer revenue, group moments); the
    total = between + within identity is pinned in tests."""
    from weaviate_txtai_spark.operators.inequality import (
        theil_decomposition,
    )

    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    rev = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(n), c.c_nationkey == n.n_nationkey
        )
        .groupBy("c_custkey", "n_name")
        .agg(F.sum("o_totalprice").cast("double").alias("x"))
    )
    return theil_decomposition(rev, "x", "n_name")


_ACF_SQL = """
WITH daily AS MATERIALIZED (
  SELECT CAST(ts AS DATE) AS d, CAST(count(*) AS BIGINT) AS y
  FROM events WHERE ts IS NOT NULL GROUP BY 1),
b AS (SELECT min(d) AS d0, max(d) AS d1 FROM daily),
pad AS (
  SELECT x.t, b.d0 + CAST(x.t AS INT) AS d
  FROM b, unnest(generate_series(0, datediff('day', d0, d1))) AS x(t)),
ser AS MATERIALIZED (
  SELECT pad.t, CAST(COALESCE(daily.y, 0) AS DOUBLE) AS y
  FROM pad LEFT JOIN daily ON pad.d = daily.d),
st AS (SELECT avg(y) AS mu FROM ser),
cen AS MATERIALIZED (SELECT t, y - st.mu AS c FROM ser, st),
dn AS (SELECT sum(c * c) AS dd FROM cen),
lags AS (SELECT x.l FROM unnest(generate_series(1, 14)) AS x(l)),
p AS (
  SELECT lags.l, CAST(count(*) AS BIGINT) AS n_pairs,
         sum(a.c * b2.c) AS num
  FROM cen a CROSS JOIN lags
  JOIN cen b2 ON b2.t = a.t + lags.l
  GROUP BY 1)
SELECT CAST(l AS INT) AS lag, n_pairs,
       round(CASE WHEN dd > 0 THEN num / dd END, 6) AS acf
FROM p, dn ORDER BY lag
"""


@register("events_daily_acf", _ACF_SQL)
def events_daily_acf_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample autocorrelation of the zero-filled daily event-count
    series at lags 1..14 (operators/seasonal.py acf) — the seasonality
    fingerprint (an r₇ spike = weekly cycle) and residual-whiteness
    readout. One self-join fanned by a broadcast lag list + one
    groupBy(lag); mean and denominator ride 1-row broadcasts."""
    from weaviate_txtai_spark.operators.seasonal import acf

    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.filter(F.col("ts").isNotNull())
        .groupBy(F.to_date("ts").alias("d"))
        .agg(F.count(F.lit(1)).cast("long").alias("y"))
    )
    bounds = daily.agg(
        F.min("d").alias("d0"), F.max("d").alias("d1")
    )
    pad = bounds.select(
        F.col("d0"),
        F.explode(
            F.sequence(F.lit(0), F.datediff("d1", "d0"))
        ).alias("t"),
    )
    series = (
        pad.join(
            daily,
            daily.d == F.date_add(F.col("d0"), F.col("t")),
            "left",
        )
        .select("t", F.coalesce("y", F.lit(0)).cast("double").alias("y"))
    )
    return acf(series, t_col="t", y_col="y", max_lag=14)


_ABC_SQL = """
WITH pk AS MATERIALIZED (
  SELECT l_partkey AS k,
         sum(CAST(l_extendedprice * (1 - l_discount)
                  AS DECIMAL(28,8))) AS v
  FROM lineitem GROUP BY 1),
vv AS (SELECT v, CAST(sum(CAST(v * 100000000 AS BIGINT)) AS BIGINT)
              AS mass FROM pk GROUP BY 1),
pref AS (
  SELECT v, sum(mass) OVER (
    ORDER BY v DESC RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    AS cum
  FROM vv),
tot AS (SELECT CAST(sum(CAST(v * 100000000 AS BIGINT)) AS BIGINT) AS t
        FROM pk)
SELECT pk.k AS l_partkey, CAST(round(pk.v, 2) AS DOUBLE) AS value,
       round(CAST(pref.cum AS DOUBLE) / CAST(tot.t AS DOUBLE), 6)
         AS cum_share,
       CASE WHEN CAST(pref.cum AS DOUBLE) / CAST(tot.t AS DOUBLE)
                 <= 0.80 THEN 'A'
            WHEN CAST(pref.cum AS DOUBLE) / CAST(tot.t AS DOUBLE)
                 <= 0.95 THEN 'B'
            ELSE 'C' END AS abc_class
FROM pk JOIN pref ON pk.v = pref.v, tot ORDER BY l_partkey
"""


@register("part_abc_classes", _ABC_SQL)
def part_abc_classes_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC / Pareto classification of parts by discounted revenue
    (operators/inequality.py abc_classes): A carries 80% of revenue, B
    to 95%, C the tail — the inventory-priority readout that pairs with
    gini. Cumulative shares ride the value-domain prefix machinery (no
    global-order window); tie groups share a class; decimal-exact sums
    make the boundaries deterministic."""
    from weaviate_txtai_spark.operators.inequality import abc_classes

    li = load_table(spark, sf_dir, "lineitem")
    rev = li.select(
        "l_partkey",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
            "r"
        ),
    )
    return abc_classes(rev, "l_partkey", "r").orderBy("l_partkey")


_SAX_SQL = """
WITH daily AS MATERIALIZED (
  SELECT CAST(ts AS DATE) AS d, CAST(count(*) AS BIGINT) AS y
  FROM events WHERE ts IS NOT NULL GROUP BY 1),
b AS (SELECT min(d) AS d0, max(d) AS d1 FROM daily),
pad AS (
  SELECT x.t, b.d0 + CAST(x.t AS INT) AS d
  FROM b, unnest(generate_series(0, datediff('day', d0, d1))) AS x(t)),
ser AS MATERIALIZED (
  SELECT pad.t, CAST(COALESCE(daily.y, 0) AS DOUBLE) AS y
  FROM pad LEFT JOIN daily ON pad.d = daily.d),
st AS (
  SELECT CAST(count(*) AS DOUBLE) AS n, sum(y) AS sy,
         sum(y * y) AS sq, max(t) + 1 AS len
  FROM ser),
sg AS (
  SELECT (t * 16) // len AS seg, CAST(count(*) AS BIGINT) AS n_points,
         sum(y) AS segsum
  FROM ser, st GROUP BY 1),
z AS (
  SELECT CAST(seg AS INT) AS seg, n_points,
         round(CASE WHEN (st.sq - st.sy * (st.sy / st.n)) / st.n > 0
                    THEN (segsum / n_points - st.sy / st.n)
                         / sqrt((st.sq - st.sy * (st.sy / st.n)) / st.n)
               END, 6) AS paa_z
  FROM sg, st)
SELECT seg, n_points, paa_z,
       CASE WHEN paa_z IS NULL THEN 'b'
            WHEN paa_z < -0.6745 THEN 'a'
            WHEN paa_z < 0.0 THEN 'b'
            WHEN paa_z < 0.6745 THEN 'c'
            ELSE 'd' END AS symbol
FROM z ORDER BY seg
"""


@register("events_daily_sax", _SAX_SQL)
def events_daily_sax_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SAX symbolization of the zero-filled daily event-count series
    (operators/seasonal.py sax_symbols; Lin–Keogh): z-normalize, PAA
    into 16 equal integer segments, alphabet-4 symbols at the Gaussian
    breakpoints — the time-series word behind motif discovery and cheap
    shape joins. Count-valued series keep every moment below 2^53, and
    each segment mean is rounded BEFORE the breakpoint compare, so the
    word is a pure function of rounded values."""
    from weaviate_txtai_spark.operators.seasonal import sax_symbols

    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.filter(F.col("ts").isNotNull())
        .groupBy(F.to_date("ts").alias("d"))
        .agg(F.count(F.lit(1)).cast("long").alias("y"))
    )
    bounds = daily.agg(F.min("d").alias("d0"), F.max("d").alias("d1"))
    pad = bounds.select(
        F.col("d0"),
        F.explode(
            F.sequence(F.lit(0), F.datediff("d1", "d0"))
        ).alias("t"),
    )
    series = pad.join(
        daily, daily.d == F.date_add(F.col("d0"), F.col("t")), "left"
    ).select("t", F.coalesce("y", F.lit(0)).cast("double").alias("y"))
    return sax_symbols(series, n_segments=16)


_SHAPLEY_SQL = """
WITH users AS MATERIALIZED (
  SELECT user_id,
         CAST(max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
            + max(CASE WHEN event_type = 'click' THEN 2 ELSE 0 END)
            + max(CASE WHEN event_type = 'signup' THEN 4 ELSE 0 END)
            + max(CASE WHEN event_type = 'error' THEN 8 ELSE 0 END)
            AS BIGINT) AS mask,
         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
  FROM events GROUP BY 1),
rates AS (
  SELECT mask, CAST(count(*) AS DOUBLE) AS n,
         CAST(sum(conv) AS DOUBLE) AS c
  FROM users GROUP BY 1),
masks AS (SELECT CAST(x.m AS BIGINT) AS mask
          FROM unnest(generate_series(0, 15)) AS x(m)),
v AS MATERIALIZED (
  SELECT masks.mask, COALESCE(rates.c / rates.n, 0.0) AS v,
         ((masks.mask >> 0) & 1) + ((masks.mask >> 1) & 1)
           + ((masks.mask >> 2) & 1) + ((masks.mask >> 3) & 1) AS s
  FROM masks LEFT JOIN rates ON masks.mask = rates.mask),
chan AS (
  SELECT 0 AS i, 'view' AS channel, 1 AS bitval
  UNION ALL SELECT 1, 'click', 2
  UNION ALL SELECT 2, 'signup', 4
  UNION ALL SELECT 3, 'error', 8),
phi AS (
  SELECT chan.channel,
         round(sum(
           (CASE v.s WHEN 0 THEN 0.25
                     WHEN 1 THEN 1.0 / 12
                     WHEN 2 THEN 1.0 / 12
                     WHEN 3 THEN 0.25 END)
           * (v2.v - v.v)), 6) AS shapley
  FROM v JOIN chan ON (v.mask & chan.bitval) = 0
  JOIN v v2 ON v2.mask = v.mask + chan.bitval
  GROUP BY 1),
exposed AS (
  SELECT chan.channel, CAST(count(*) AS BIGINT) AS exposed_users
  FROM users JOIN chan ON (users.mask & chan.bitval) <> 0
  GROUP BY 1)
SELECT phi.channel, phi.shapley,
       CAST(COALESCE(exposed.exposed_users, 0) AS BIGINT)
         AS exposed_users
FROM phi LEFT JOIN exposed ON phi.channel = exposed.channel
ORDER BY phi.channel
"""


@register("purchase_shapley_attribution", _SHAPLEY_SQL)
def purchase_shapley_attribution_q(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Data-driven Shapley channel attribution (operators/attribution.py
    shapley_attribution; Dalessandro et al.): coalition value = observed
    conversion rate per exact exposure set, credit = the Shapley sum
    over the 2^4 subset lattice — the positional-gaming-proof companion
    to the last/first/linear models. Exact count ratios and rational
    factorial weights; one groupBy(user) + subset-domain math."""
    from weaviate_txtai_spark.operators.attribution import (
        shapley_attribution,
    )

    ev = load_table(spark, sf_dir, "events")
    return shapley_attribution(
        ev,
        channels=["view", "click", "signup", "error"],
        conversion_type="purchase",
    ).orderBy("channel")


_EB_SHRINK_SQL = """
WITH pk AS MATERIALIZED (
  SELECT l_partkey AS k, CAST(count(*) AS DOUBLE) AS n,
         CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
              AS DOUBLE) AS c
  FROM lineitem GROUP BY 1),
r AS (SELECT k, n, c, c / n AS rr FROM pk),
mom AS (SELECT avg(rr) AS m, var_samp(rr) AS v FROM r),
prior0 AS (
  SELECT CASE WHEN v IS NOT NULL AND v > 0 AND m > 0 AND m < 1
                   AND v < m * (1 - m)
              THEN round((m * (1 - m) / v - 1) * m, 9) END AS alpha,
         CASE WHEN v IS NOT NULL AND v > 0 AND m > 0 AND m < 1
                   AND v < m * (1 - m)
              THEN round((m * (1 - m) / v - 1) * (1 - m), 9) END AS beta
  FROM mom),
prior AS (
  SELECT CASE WHEN alpha > 0 THEN alpha END AS alpha,
         CASE WHEN beta > 0 THEN beta END AS beta
  FROM prior0)
SELECT r.k AS l_partkey, CAST(r.n AS BIGINT) AS n,
       CAST(r.c AS BIGINT) AS c, round(r.rr, 6) AS rate_raw,
       round(CASE WHEN prior.alpha IS NOT NULL
                   AND prior.beta IS NOT NULL
             THEN (r.c + prior.alpha)
                  / (r.n + prior.alpha + prior.beta)
             ELSE r.rr END, 6) AS rate_eb,
       prior.alpha, prior.beta
FROM r, prior ORDER BY l_partkey
"""


@register("part_return_rate_eb", _EB_SHRINK_SQL)
def part_return_rate_eb_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Empirical-Bayes beta-binomial shrinkage of per-part return rates
    (operators/calibration.py eb_beta_binomial_shrink): method-of-
    moments Beta prior fitted on the observed rates, small-sample parts
    pulled hardest toward it — the fix for trusting a 1-of-1 return
    rate over a 3-of-40. Priors rounded at 9 dp before application so
    every shrunken rate is a pure function of rounded doubles."""
    from weaviate_txtai_spark.operators.calibration import (
        eb_beta_binomial_shrink,
    )

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        (F.col("l_returnflag") == "R").cast("int").alias("ret"),
    )
    return eb_beta_binomial_shrink(li, "l_partkey", "ret").orderBy(
        "l_partkey"
    )


_JACKKNIFE_SQL = """
WITH per AS MATERIALIZED (
  SELECT user_id,
         sum(CAST(CASE WHEN event_type = 'purchase' THEN 1.0
                  ELSE 0.0 END AS DECIMAL(28,8))) AS ni,
         sum(CAST(1.0 AS DECIMAL(28,8))) AS di
  FROM events GROUP BY 1),
tot AS (
  SELECT CAST(count(*) AS BIGINT) AS g,
         CAST(sum(ni) AS DOUBLE) AS N, CAST(sum(di) AS DOUBLE) AS D
  FROM per),
loo AS (
  SELECT tot.g, tot.N, tot.D,
         CASE WHEN tot.D - CAST(di AS DOUBLE) <> 0
              THEN (tot.N - CAST(ni AS DOUBLE))
                   / (tot.D - CAST(di AS DOUBLE)) END AS t
  FROM per, tot),
agg AS (
  SELECT max(g) AS g, max(N) AS N, max(D) AS D,
         CAST(count(t) AS BIGINT) AS g_used,
         sum(CASE WHEN t IS NOT NULL THEN t - N / D END) AS sd,
         sum(CASE WHEN t IS NOT NULL
                  THEN (t - N / D) * (t - N / D) END) AS sd2
  FROM loo)
SELECT g, g_used, round(N / D, 6) AS theta,
       round(CASE WHEN g_used >= 2 THEN
         sqrt(greatest((g_used - 1.0) / g_used
                       * (sd2 - sd * sd / g_used), 0.0)) END, 6)
         AS se_jack
FROM agg
"""


@register("purchase_rate_jackknife", _JACKKNIFE_SQL)
def purchase_rate_jackknife_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delete-one-USER jackknife SE for the purchase-per-event ratio
    (operators/bootstrap.py jackknife_ratio): the deterministic,
    resample-free companion to the cluster bootstrap — θ_(i) in closed
    form from exact-decimal grand totals, pseudo-values centered at θ̂
    before summing (the uncentered Σθ² − gθ̄² cancels catastrophically).
    One groupBy(user) + a broadcast of the 1-row totals."""
    from weaviate_txtai_spark.operators.bootstrap import jackknife_ratio

    ev = load_table(spark, sf_dir, "events")
    per = ev.select(
        "user_id",
        F.when(F.col("event_type") == "purchase", 1.0)
        .otherwise(0.0).alias("num"),
        F.lit(1.0).alias("den"),
    )
    return jackknife_ratio(per, "user_id", "num", "den")


_XCF_SQL = """
WITH daily AS MATERIALIZED (
  SELECT CAST(ts AS DATE) AS d,
         CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
              AS BIGINT) AS ye,
         CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS yp
  FROM events WHERE ts IS NOT NULL GROUP BY 1),
b AS (SELECT min(d) AS d0, max(d) AS d1 FROM daily),
pad AS (
  SELECT x.t, b.d0 + CAST(x.t AS INT) AS d
  FROM b, unnest(generate_series(0, datediff('day', d0, d1))) AS x(t)),
se AS MATERIALIZED (
  SELECT pad.t, CAST(COALESCE(daily.ye, 0) AS DOUBLE) AS y
  FROM pad LEFT JOIN daily ON pad.d = daily.d),
sp AS MATERIALIZED (
  SELECT pad.t, CAST(COALESCE(daily.yp, 0) AS DOUBLE) AS y
  FROM pad LEFT JOIN daily ON pad.d = daily.d),
ma AS (SELECT avg(y) AS mu FROM se),
mb AS (SELECT avg(y) AS mu FROM sp),
ca AS MATERIALIZED (SELECT t, y - ma.mu AS c FROM se, ma),
cb AS MATERIALIZED (SELECT t, y - mb.mu AS c FROM sp, mb),
da AS (SELECT sum(c * c) AS v FROM ca),
db AS (SELECT sum(c * c) AS v FROM cb),
lags AS (SELECT x.l FROM unnest(generate_series(-7, 7)) AS x(l)),
p AS (
  SELECT lags.l, CAST(count(*) AS BIGINT) AS n_pairs,
         sum(a.c * b2.c) AS num
  FROM ca a CROSS JOIN lags
  JOIN cb b2 ON b2.t = a.t + lags.l
  GROUP BY 1)
SELECT CAST(l AS INT) AS lag, n_pairs,
       round(CASE WHEN da.v > 0 AND db.v > 0
                  THEN num / sqrt(da.v * db.v) END, 6) AS xcf
FROM p, da, db ORDER BY lag
"""


@register("purchase_error_xcf", _XCF_SQL)
def purchase_error_xcf_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-correlation between the daily error and purchase count
    series at lags −7..+7 (operators/seasonal.py xcf): the lead-lag
    detector — positive lag means errors LEAD purchases by that many
    days. Same broadcast-lag join shape as the ACF gate, two padded
    series instead of one."""
    from weaviate_txtai_spark.operators.seasonal import xcf

    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.filter(F.col("ts").isNotNull())
        .groupBy(F.to_date("ts").alias("d"))
        .agg(
            F.sum(
                F.when(F.col("event_type") == "error", 1).otherwise(0)
            ).cast("long").alias("ye"),
            F.sum(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).cast("long").alias("yp"),
        )
    )
    bounds = daily.agg(F.min("d").alias("d0"), F.max("d").alias("d1"))
    pad = bounds.select(
        F.col("d0"),
        F.explode(
            F.sequence(F.lit(0), F.datediff("d1", "d0"))
        ).alias("t"),
    )
    joined = pad.join(
        daily, daily.d == F.date_add(F.col("d0"), F.col("t")), "left"
    )
    se = joined.select(
        "t", F.coalesce("ye", F.lit(0)).cast("double").alias("y")
    )
    sp = joined.select(
        "t", F.coalesce("yp", F.lit(0)).cast("double").alias("y")
    )
    return xcf(se, sp, max_lag=7)


_MK_SQL = """
WITH daily AS MATERIALIZED (
  SELECT CAST(ts AS DATE) AS d, CAST(count(*) AS BIGINT) AS y
  FROM events WHERE ts IS NOT NULL GROUP BY 1),
s AS MATERIALIZED (
  SELECT datediff('day', DATE '1970-01-01', d) AS t,
         CAST(y AS DOUBLE) AS y
  FROM daily),
st AS (
  SELECT CAST(COALESCE(sum(CASE WHEN b.y > a.y THEN 1
                                WHEN b.y < a.y THEN -1 ELSE 0 END), 0)
              AS BIGINT) AS s
  FROM s a JOIN s b ON b.t > a.t),
ties AS (
  SELECT CAST(COALESCE(sum(c * (c - 1) * (2 * c + 5)), 0) AS BIGINT)
           AS tie,
         CAST(sum(c) AS BIGINT) AS n
  FROM (SELECT count(*) AS c FROM s GROUP BY y)),
j AS (
  SELECT st.s, ties.n,
         (ties.n * (ties.n - 1) * (2 * ties.n + 5) - ties.tie) / 18.0
           AS var_s
  FROM st, ties),
z AS (
  SELECT n, s, round(var_s, 6) AS var_s,
         round(CASE WHEN var_s > 0 THEN
           CASE WHEN s > 0 THEN (s - 1.0) / sqrt(var_s)
                WHEN s < 0 THEN (s + 1.0) / sqrt(var_s)
                ELSE 0.0 END END, 6) AS z
  FROM j)
SELECT n, s, var_s, z,
       round(CASE WHEN z IS NULL THEN NULL ELSE
         2.0 * (exp(-abs(z) * abs(z) / 2.0) / 2.5066282746310002)
         * ((1.0 / (1.0 + 0.2316419 * abs(z)))
            * (0.319381530
               + (1.0 / (1.0 + 0.2316419 * abs(z)))
                 * (-0.356563782
                    + (1.0 / (1.0 + 0.2316419 * abs(z)))
                      * (1.781477937
                         + (1.0 / (1.0 + 0.2316419 * abs(z)))
                           * (-1.821255978
                              + (1.0 / (1.0 + 0.2316419 * abs(z)))
                                * 1.330274429)))))
             END, 6) AS p_value
FROM z
"""


@register("events_daily_mann_kendall", _MK_SQL)
def events_daily_mann_kendall_q(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Mann–Kendall monotone-trend test on the observed daily event
    counts (operators/seasonal.py mann_kendall): the outlier-proof "is
    volume drifting" check — integer S and tie-corrected variance
    replay exactly; continuity-corrected z, Φ-polynomial p. The pair
    join is quadratic in DAYS (post-reduction), not events."""
    from weaviate_txtai_spark.operators.seasonal import mann_kendall

    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.filter(F.col("ts").isNotNull())
        .groupBy(F.to_date("ts").alias("d"))
        .agg(F.count(F.lit(1)).cast("long").alias("y"))
        .select(
            F.datediff(
                F.col("d"), F.lit("1970-01-01").cast("date")
            ).alias("t"),
            "y",
        )
    )
    return mann_kendall(daily, t_col="t", y_col="y")


def _haar_sql(levels: int = 4) -> str:
    """DuckDB twin of haar_dwt on the padded daily counts: chained
    halving CTEs, one per level."""
    head = """WITH daily AS MATERIALIZED (
  SELECT CAST(ts AS DATE) AS d, CAST(count(*) AS BIGINT) AS y
  FROM events WHERE ts IS NOT NULL GROUP BY 1),
b AS (SELECT min(d) AS d0, max(d) AS d1 FROM daily),
pad AS (
  SELECT x.t, b.d0 + CAST(x.t AS INT) AS d
  FROM b, unnest(generate_series(0, datediff('day', d0, d1))) AS x(t)),
l0 AS MATERIALIZED (
  SELECT pad.t AS k, CAST(COALESCE(daily.y, 0) AS DOUBLE) AS a
  FROM pad LEFT JOIN daily ON pad.d = daily.d),"""
    parts = [head]
    for lvl in range(1, levels + 1):
        parts.append(
            f"""l{lvl} AS MATERIALIZED (
  SELECT k // 2 AS k, count(*) AS c, avg(a) AS a,
         (sum(CASE WHEN k % 2 = 0 THEN a END)
          - sum(CASE WHEN k % 2 = 1 THEN a END)) / 2.0 AS det
  FROM l{lvl - 1} GROUP BY 1),"""
        )
    body = "\n".join(parts).rstrip(",")
    selects = "\nUNION ALL ".join(
        f"SELECT {lvl} AS level, CAST(k AS BIGINT) AS k,"
        f" round(a, 6) AS approx,"
        f" round(CASE WHEN c = 2 THEN det END, 6) AS detail FROM l{lvl}"
        for lvl in range(1, levels + 1)
    )
    return (
        f"{body}\n"
        f"SELECT CAST(level AS INT) AS level, k, approx, detail FROM (\n"
        f"{selects}) ORDER BY level, k"
    )


@register("events_daily_haar", _haar_sql())
def events_daily_haar_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unnormalized Haar wavelet decomposition of the padded daily
    count series, 4 levels (operators/seasonal.py haar_dwt): the
    multi-resolution burst localizer ("WHICH week moved") pairing with
    the SAX word. Dyadic-rational coefficients of count input are
    exact doubles — no rounding discipline beyond output."""
    from weaviate_txtai_spark.operators.seasonal import haar_dwt

    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.filter(F.col("ts").isNotNull())
        .groupBy(F.to_date("ts").alias("d"))
        .agg(F.count(F.lit(1)).cast("long").alias("y"))
    )
    bounds = daily.agg(F.min("d").alias("d0"), F.max("d").alias("d1"))
    pad = bounds.select(
        F.col("d0"),
        F.explode(
            F.sequence(F.lit(0), F.datediff("d1", "d0"))
        ).alias("t"),
    )
    series = pad.join(
        daily, daily.d == F.date_add(F.col("d0"), F.col("t")), "left"
    ).select("t", F.coalesce("y", F.lit(0)).cast("double").alias("y"))
    return haar_dwt(series, levels=4).select(
        F.col("level").cast("int").alias("level"), "k", "approx", "detail"
    )


def _passk_sql(ks=(1, 5, 10)) -> str:
    """DuckDB twin of pass_at_k on per-user purchase attempts: the
    integer factor products unrolled per literal k."""
    blocks = []
    for k in ks:
        num = "CAST(1 AS DOUBLE)"
        den = "CAST(1 AS DOUBLE)"
        for i in range(k):
            num += (
                f" * (CASE WHEN {i} < least({k}, n)"
                f" THEN CAST(greatest(n - c - {i}, 0) AS DOUBLE)"
                f" ELSE 1.0 END)"
            )
            den += (
                f" * (CASE WHEN {i} < least({k}, n)"
                f" THEN CAST(n - {i} AS DOUBLE) ELSE 1.0 END)"
            )
        blocks.append(
            f"SELECT CAST({k} AS INT) AS k,"
            f" CAST(count(*) AS BIGINT) AS n_tasks,"
            f" round(avg(1.0 - ({num}) / ({den})), 6)"
            f" AS pass_at_k FROM per"
        )
        # ordered rows per k, unioned
    body = "\nUNION ALL ".join(blocks)
    return (
        "WITH per AS MATERIALIZED (\n"
        "  SELECT user_id, CAST(count(*) AS BIGINT) AS n,\n"
        "         CAST(sum(CASE WHEN event_type = 'purchase'\n"
        "                  THEN 1 ELSE 0 END) AS BIGINT) AS c\n"
        "  FROM events GROUP BY 1)\n"
        f"SELECT * FROM (\n{body}) ORDER BY k"
    )


@register("purchase_pass_at_k", _passk_sql())
def purchase_pass_at_k_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unbiased pass@k over per-user event attempts (operators/
    evalmetrics.py pass_at_k; the HumanEval estimator of Chen et al.):
    "would k sampled events include a purchase" per user, averaged —
    the repeated-generation eval readout, exercised on the events
    fixture. Exact integer factor products per literal k; n<k tasks
    clamp instead of dropping."""
    from weaviate_txtai_spark.operators.evalmetrics import pass_at_k

    ev = load_table(spark, sf_dir, "events")
    per = ev.select(
        "user_id",
        (F.col("event_type") == "purchase").cast("int").alias("s"),
    )
    return pass_at_k(per, "user_id", "s").orderBy("k")


_WILSON_SQL = """
WITH per AS MATERIALIZED (
  SELECT l_partkey AS k, CAST(count(*) AS DOUBLE) AS n,
         CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
              AS DOUBLE) AS c
  FROM lineitem GROUP BY 1),
w AS (
  SELECT k, n, c, c / n AS p,
         1 + 1.959963985 * 1.959963985 / n AS dnm,
         (c / n + 1.959963985 * 1.959963985 / (2 * n)) AS ctr_num,
         1.959963985 * sqrt((c / n) * (1 - c / n) / n
             + 1.959963985 * 1.959963985 / (4 * n * n)) AS half_num
  FROM per)
SELECT k AS l_partkey, CAST(n AS BIGINT) AS n, CAST(c AS BIGINT) AS c,
       round(p, 6) AS rate,
       round(greatest(ctr_num / dnm - half_num / dnm, 0.0), 6)
         AS wilson_lb,
       round(least(ctr_num / dnm + half_num / dnm, 1.0), 6)
         AS wilson_ub
FROM w ORDER BY l_partkey
"""


@register("part_return_wilson", _WILSON_SQL)
def part_return_wilson_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilson 95% score interval for per-part return rates
    (operators/evalmetrics.py wilson_interval) — rank by the LOWER
    bound so a 1-of-1 return cannot outrank a 95-of-100; the
    closed-form frequentist companion to the EB shrinkage gate on the
    same fixture. Pure deterministic arithmetic on exact count
    ratios."""
    from weaviate_txtai_spark.operators.evalmetrics import (
        wilson_interval,
    )

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        (F.col("l_returnflag") == "R").cast("int").alias("ret"),
    )
    return wilson_interval(li, "l_partkey", "ret").orderBy("l_partkey")


_LTV_SQL = """
WITH first AS MATERIALIZED (
  SELECT user_id,
         CAST(date_trunc('week', min(ts)) AS DATE) AS cohort_week
  FROM events GROUP BY 1),
sizes AS (
  SELECT cohort_week, CAST(count(*) AS BIGINT) AS cohort_users
  FROM first GROUP BY 1),
weekly AS MATERIALIZED (
  SELECT f.cohort_week,
         CAST(date_diff('day', f.cohort_week,
                        CAST(date_trunc('week', e.ts) AS DATE)) / 7
              AS INT) AS week_offset,
         sum(CAST(CASE WHEN e.event_type = 'purchase'
                  THEN e.value ELSE 0 END AS DECIMAL(28,8))) AS wv
  FROM events e JOIN first f ON e.user_id = f.user_id
  GROUP BY 1, 2),
cum AS (
  SELECT cohort_week, week_offset, wv,
         sum(wv) OVER (PARTITION BY cohort_week ORDER BY week_offset
                       ROWS UNBOUNDED PRECEDING) AS cv
  FROM weekly)
SELECT c.cohort_week, c.week_offset, s.cohort_users,
       CAST(round(c.wv, 2) AS DOUBLE) AS week_value,
       CAST(round(c.cv, 2) AS DOUBLE) AS cum_value,
       round(CAST(c.cv AS DOUBLE) / s.cohort_users, 6) AS ltv_per_user
FROM cum c JOIN sizes s ON c.cohort_week = s.cohort_week
ORDER BY c.cohort_week, c.week_offset
"""


@register("cohort_ltv_triangle", _LTV_SQL)
def cohort_ltv_triangle_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort LTV payback triangle (operators/funnel.py cohort_ltv):
    cumulative purchase value per cohort head by weekly age — the
    revenue companion to events_retention on the same ISO-week cohort
    anchors. Value mass is decimal-summed (exact), the cumulative runs
    in a cohort-partitioned window, and per-head division is one
    broadcast join."""
    from weaviate_txtai_spark.operators.funnel import cohort_ltv

    ev = load_table(spark, sf_dir, "events")
    return cohort_ltv(
        ev, value_filter=(F.col("event_type") == "purchase")
    )


_SIMPSON_SQL = """
WITH u AS (
  SELECT user_id, (user_id // 2) % 4 AS s,
         CAST(user_id % 2 AS INT) AS t,
         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS y
  FROM events GROUP BY 1, 2, 3),
cells AS (
  SELECT s, CAST(sum(t) AS DOUBLE) AS n1,
         CAST(sum(1 - t) AS DOUBLE) AS n0,
         CAST(sum(t * y) AS DOUBLE) AS c1,
         CAST(sum((1 - t) * y) AS DOUBLE) AS c0
  FROM u GROUP BY 1),
agg AS (
  SELECT CAST(count(*) AS BIGINT) AS k_strata,
         CAST(sum(CASE WHEN n1 > 0 AND n0 > 0 THEN 1 ELSE 0 END)
              AS BIGINT) AS k_usable,
         sum(n1) AS sn1, sum(n0) AS sn0,
         sum(c1) AS sc1, sum(c0) AS sc0,
         CAST(sum(CASE WHEN n1 > 0 AND n0 > 0
                        AND c1 / n1 - c0 / n0 > 0 THEN 1 ELSE 0 END)
              AS BIGINT) AS pos,
         CAST(sum(CASE WHEN n1 > 0 AND n0 > 0
                        AND c1 / n1 - c0 / n0 < 0 THEN 1 ELSE 0 END)
              AS BIGINT) AS neg,
         CAST(sum(CASE WHEN n1 > 0 AND n0 > 0
                        AND c1 / n1 - c0 / n0 = 0 THEN 1 ELSE 0 END)
              AS BIGINT) AS n_zero
  FROM cells),
p AS (
  SELECT *, CASE WHEN sn1 > 0 AND sn0 > 0
                 THEN sc1 / sn1 - sc0 / sn0 END AS pooled
  FROM agg)
SELECT k_strata, k_usable, round(pooled, 6) AS pooled_diff,
       CAST(CASE WHEN pooled > 0 THEN pos
                 WHEN pooled < 0 THEN neg
                 ELSE 0 END AS BIGINT) AS n_agree,
       CAST(CASE WHEN pooled > 0 THEN neg
                 WHEN pooled < 0 THEN pos
                 ELSE 0 END AS BIGINT) AS n_reverse,
       n_zero,
       COALESCE(pooled <> 0, FALSE)
         AND 2 * (CASE WHEN pooled > 0 THEN neg
                       WHEN pooled < 0 THEN pos
                       ELSE 0 END) > k_usable AS reversed
FROM p
"""


@register("purchase_simpson_check", _SIMPSON_SQL)
def purchase_simpson_check_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simpson's-paradox pre-flight (operators/abtest.py simpson_check)
    on the CMH fixture: does the pooled parity→purchase rate difference
    disagree in sign with the majority of usable strata? Exact count
    ratios and integer sign logic — the admissibility gate that runs
    BEFORE purchase_cmh's adjusted estimate is trusted."""
    from weaviate_txtai_spark.operators.abtest import simpson_check

    ev = load_table(spark, sf_dir, "events")
    users = ev.groupBy("user_id").agg(
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("y")
    ).select(
        F.expr("(user_id div 2) % 4").alias("s"),
        (F.col("user_id") % 2).cast("int").alias("t"),
        "y",
    )
    return simpson_check(users, "s", "t", "y")


_ODDS_SQL = """
WITH u AS (
  SELECT user_id, CAST(user_id % 2 AS INT) AS t,
         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS y
  FROM events GROUP BY 1, 2),
agg AS (
  SELECT CAST(sum(t * y) AS BIGINT) AS a,
         CAST(sum(t * (1 - y)) AS BIGINT) AS b,
         CAST(sum((1 - t) * y) AS BIGINT) AS c,
         CAST(sum((1 - t) * (1 - y)) AS BIGINT) AS d
  FROM u),
k AS (
  SELECT a, b, c, d,
         (a = 0 OR b = 0 OR c = 0 OR d = 0) AS corrected,
         CAST(a AS DOUBLE)
           + CASE WHEN a = 0 OR b = 0 OR c = 0 OR d = 0
                  THEN 0.5 ELSE 0.0 END AS aa,
         CAST(b AS DOUBLE)
           + CASE WHEN a = 0 OR b = 0 OR c = 0 OR d = 0
                  THEN 0.5 ELSE 0.0 END AS bb,
         CAST(c AS DOUBLE)
           + CASE WHEN a = 0 OR b = 0 OR c = 0 OR d = 0
                  THEN 0.5 ELSE 0.0 END AS cc,
         CAST(d AS DOUBLE)
           + CASE WHEN a = 0 OR b = 0 OR c = 0 OR d = 0
                  THEN 0.5 ELSE 0.0 END AS dd
  FROM agg)
SELECT a, b, c, d, corrected,
       round(CASE WHEN a + b > 0 AND c + d > 0
                   AND a + c > 0 AND b + d > 0
             THEN exp(ln(aa * dd / (bb * cc))) END, 6) AS or_,
       round(CASE WHEN a + b > 0 AND c + d > 0
                   AND a + c > 0 AND b + d > 0
             THEN exp(ln(aa * dd / (bb * cc))
                  - 1.959963985
                    * sqrt(1 / aa + 1 / bb + 1 / cc + 1 / dd)) END, 6)
         AS or_lo,
       round(CASE WHEN a + b > 0 AND c + d > 0
                   AND a + c > 0 AND b + d > 0
             THEN exp(ln(aa * dd / (bb * cc))
                  + 1.959963985
                    * sqrt(1 / aa + 1 / bb + 1 / cc + 1 / dd)) END, 6)
         AS or_hi
FROM k
"""


@register("purchase_odds_ratio", _ODDS_SQL)
def purchase_odds_ratio_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pooled 2×2 odds ratio with the Woolf log-CI (operators/abtest.py
    odds_ratio): the effect-size companion to purchase_cmh and the
    Simpson pre-flight on the same parity→purchase fixture; the
    Haldane–Anscombe +½ applies only on zero cells (integer rule,
    identical on both engines). One 1-row aggregate."""
    from weaviate_txtai_spark.operators.abtest import odds_ratio

    ev = load_table(spark, sf_dir, "events")
    users = ev.groupBy("user_id").agg(
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("y")
    ).select((F.col("user_id") % 2).cast("int").alias("t"), "y")
    return odds_ratio(users, "t", "y")


_KENDALL_SQL = """
WITH cells AS MATERIALIZED (
  SELECT l_quantity AS x, l_discount AS y, CAST(count(*) AS BIGINT) AS c
  FROM lineitem GROUP BY 1, 2),
cd AS (
  SELECT CAST(sum(CASE WHEN a.y < b.y THEN a.c * b.c ELSE 0 END)
           AS BIGINT) AS C,
         CAST(sum(CASE WHEN a.y > b.y THEN a.c * b.c ELSE 0 END)
           AS BIGINT) AS D
  FROM cells a JOIN cells b ON a.x < b.x),
tx AS (SELECT CAST(sum(cx * (cx - 1)) AS BIGINT) AS tx2
       FROM (SELECT CAST(sum(c) AS BIGINT) AS cx FROM cells GROUP BY x)),
ty AS (SELECT CAST(sum(cy * (cy - 1)) AS BIGINT) AS ty2
       FROM (SELECT CAST(sum(c) AS BIGINT) AS cy FROM cells GROUP BY y)),
tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM cells)
SELECT n, C AS n_concordant, D AS n_discordant,
       tx2 // 2 AS tie_x, ty2 // 2 AS tie_y,
       round(CAST(C - D AS DOUBLE) * 2.0
             / sqrt(CAST(n * (n - 1) - tx2 AS DOUBLE)
                  * CAST(n * (n - 1) - ty2 AS DOUBLE)), 6) AS tau_b
FROM cd, tx, ty, tot
"""


@register("lineitem_kendall_tau", _KENDALL_SQL)
def lineitem_kendall_tau_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall τ-b rank correlation between quantity and discount
    (operators/rankstats.py kendall_tau_b) — the concordant/discordant
    companion to lineitem_spearman: the corpus reduces to the ≤50×11
    value-domain contingency table in one groupBy, C/D come from cell
    PAIRS (never row pairs), ties from the marginals, and the only
    float op is one sqrt of exact integers."""
    from weaviate_txtai_spark.operators.rankstats import kendall_tau_b

    li = load_table(spark, sf_dir, "lineitem")
    return kendall_tau_b(li, "l_quantity", "l_discount")


_CHANGEPOINT_SQL = """
WITH daily AS MATERIALIZED (
  SELECT CAST(ts AS DATE) AS d, CAST(count(*) AS BIGINT) AS y
  FROM events WHERE ts IS NOT NULL GROUP BY 1),
span AS (SELECT min(d) AS d0, max(d) AS d1 FROM daily),
grid AS (
  SELECT CAST(datediff('day', d0, u.x) AS BIGINT) AS t,
         COALESCE(y, 0) AS y, u.x AS day
  FROM span,
       LATERAL (SELECT unnest(generate_series(d0, d1,
                       INTERVAL 1 DAY)) AS x) u
  LEFT JOIN daily ON daily.d = u.x),
pre AS (
  SELECT t, day,
         CAST(sum(y) OVER (ORDER BY t) AS HUGEINT) AS s1,
         CAST((SELECT sum(y) FROM grid) AS HUGEINT) AS s,
         CAST((SELECT count(*) FROM grid) AS HUGEINT) AS n
  FROM grid),
scores AS (
  SELECT t + 1 AS k, n,
         (s1 * n - s * (t + 1)) * (s1 * n - s * (t + 1)) * 1000000
           // ((t + 1) * (n - t - 1)) AS score,
         s1, s
  FROM pre WHERE t + 1 < n),
best AS (SELECT * FROM scores ORDER BY score DESC, k ASC LIMIT 1)
SELECT CAST(k AS BIGINT) AS k,
       CAST(k AS BIGINT) AS t_split,
       CAST(n AS BIGINT) AS n,
       CAST(s1 AS DOUBLE) / CAST(k AS DOUBLE) AS mean_before,
       CAST(s - s1 AS DOUBLE) / CAST(n - k AS DOUBLE) AS mean_after,
       CAST(score AS BIGINT) AS score
FROM best
"""


@register("events_daily_changepoint", _CHANGEPOINT_SQL)
def events_daily_changepoint_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact single-changepoint split of the zero-filled daily event
    count series (operators/seasonal.py single_changepoint) — binary
    segmentation's first step, the OFFLINE companion to the online
    events_daily_cusum monitor: argmax of the between-segment sum of
    squares, compared as exact integers (D²·10⁶ // k(n−k)), ties to
    the smaller k; the corpus reduces to the day grid in one groupBy
    and the argmax folds driver-side over ≤ horizon-days rows."""
    from weaviate_txtai_spark.operators.seasonal import single_changepoint

    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.filter(F.col("ts").isNotNull())
        .groupBy(F.to_date("ts").alias("d"))
        .agg(F.count(F.lit(1)).cast("long").alias("y"))
    )
    bounds = daily.agg(F.min("d").alias("d0"), F.max("d").alias("d1"))
    pad = bounds.select(
        F.col("d0"),
        F.explode(
            F.sequence(F.lit(0), F.datediff("d1", "d0"))
        ).alias("t"),
    )
    series = pad.join(
        daily, daily.d == F.date_add(F.col("d0"), F.col("t")), "left"
    ).select("t", F.coalesce("y", F.lit(0)).cast("long").alias("y"))
    return single_changepoint(series)


def _sprt_sql() -> str:
    """DuckDB twin of events_sprt_decision: the SAME scaled-integer
    SPRT constants (sprt_constants(0.1, 0.2), computed once here and
    embedded as literals) drive a windowed cumulative walk; the first
    boundary crossing — or the final row when none — is selected with
    exact integer comparisons, mirroring the driver-side fold."""
    from weaviate_txtai_spark.operators.abtest import sprt_constants

    c = sprt_constants(0.1, 0.2, alpha=0.05, beta=0.05)
    return f"""
WITH daily AS MATERIALIZED (
  SELECT CAST(ts AS DATE) AS d,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
           AS BIGINT) AS s
  FROM events WHERE ts IS NOT NULL GROUP BY 1),
org AS (SELECT min(d) AS d0 FROM daily),
w AS (SELECT CAST(datediff('day', d0, d) AS BIGINT) AS t,
             CAST(sum(s) OVER (ORDER BY d) AS BIGINT) AS k,
             CAST(sum(n) OVER (ORDER BY d) AS BIGINT) AS nn,
             CAST(row_number() OVER (ORDER BY d) AS BIGINT) AS i
      FROM daily, org),
l AS (SELECT t, i, k, nn,
             k * {c["c1"]} + (nn - k) * {c["c0"]} AS llr
      FROM w),
crs AS (SELECT * FROM l WHERE llr >= {c["a"]} OR llr <= {c["b"]}
        ORDER BY t LIMIT 1),
fin AS (SELECT * FROM l ORDER BY t DESC LIMIT 1),
sel AS (SELECT * FROM crs
        UNION ALL
        SELECT * FROM fin WHERE (SELECT count(*) FROM crs) = 0)
SELECT CASE WHEN llr >= {c["a"]} THEN 'accept_h1'
            WHEN llr <= {c["b"]} THEN 'accept_h0'
            ELSE 'continue' END AS decision,
       t AS stop_period,
       i AS n_periods_used,
       k AS k_success,
       nn AS n_trials,
       llr AS llr_scaled,
       CAST({c["a"]} AS BIGINT) AS a_scaled,
       CAST({c["b"]} AS BIGINT) AS b_scaled
FROM sel
"""


@register("events_sprt_decision", _sprt_sql())
def events_sprt_decision_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald SPRT on the daily purchase rate (operators/abtest.py
    sprt_bernoulli): H0 p=0.1 vs H1 p=0.2 at α=β=0.05 — the
    sequential always-valid stopping decision an experiment platform
    runs instead of a fixed-horizon z-test. The LLR walk is exact
    integer arithmetic on pre-scaled log constants (no accumulating
    float), the corpus reduces to the day grid in one groupBy, and the
    first-crossing scan folds driver-side over ≤ horizon-days rows."""
    from weaviate_txtai_spark.operators.abtest import sprt_bernoulli

    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.filter(F.col("ts").isNotNull())
        .groupBy(F.to_date("ts").alias("d"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).cast("long").alias("s"),
        )
    )
    d0 = daily.agg(F.min("d").alias("d0"))
    periods = daily.join(F.broadcast(d0)).select(
        F.datediff("d", "d0").cast("long").alias("t"), "n", "s"
    )
    return sprt_bernoulli(
        periods, "t", "n", "s", p0=0.1, p1=0.2, alpha=0.05, beta=0.05
    )


_PARETO_SQL = """
WITH p AS MATERIALIZED (
  SELECT l_partkey AS pk,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) * 100
           AS BIGINT) AS rc,
         CAST(sum(l_quantity) AS BIGINT) AS q
  FROM lineitem GROUP BY 1)
SELECT pk AS partkey, CAST(rc AS DOUBLE) / 100.0 AS revenue,
       q AS quantity
FROM p a
WHERE NOT EXISTS (
  SELECT 1 FROM p b
  WHERE b.rc >= a.rc AND b.q >= a.q AND (b.rc > a.rc OR b.q > a.q))
ORDER BY partkey
"""


@register("part_pareto_frontier", _PARETO_SQL)
def part_pareto_frontier_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto frontier (2-D skyline) of parts maximizing (revenue,
    quantity) — operators/skyline.py skyline_2d: the dominance
    shortlist behind any two-objective trade-off question. The Spark
    side never runs the quadratic NOT EXISTS: per-x max + bucketed
    hierarchical suffix max (all exact integer comparisons on exact
    decimal cents); the oracle is the independent naive anti-join."""
    from weaviate_txtai_spark.operators.skyline import skyline_2d

    li = load_table(spark, sf_dir, "lineitem")
    per_part = li.groupBy(F.col("l_partkey").alias("partkey")).agg(
        (
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
            * 100
        ).cast("long").alias("rc"),
        F.sum("l_quantity").cast("long").alias("quantity"),
    )
    sky = skyline_2d(per_part, "partkey", "rc", "quantity")
    return sky.select(
        "partkey",
        (F.col("rc").cast("double") / F.lit(100.0)).alias("revenue"),
        "quantity",
    ).orderBy("partkey")


_LOGRANK_SQL = """
WITH mx AS (SELECT max(ts) AS m FROM events),
s AS (SELECT user_id, min(ts) AS t0 FROM events
      WHERE event_type = 'signup' GROUP BY 1),
p AS (SELECT e.user_id, min(e.ts) AS t1 FROM events e JOIN s USING (user_id)
      WHERE e.event_type = 'purchase' AND e.ts > s.t0 GROUP BY 1),
subj AS (
  SELECT CASE WHEN s.user_id % 2 = 0 THEN 'A' ELSE 'B' END AS variant,
         CASE WHEN p.t1 IS NOT NULL
              THEN CAST(floor(epoch(p.t1 - s.t0) / 86400) AS INT)
              ELSE CAST(floor(epoch(mx.m - s.t0) / 86400) AS INT) END AS t,
         CASE WHEN p.t1 IS NOT NULL THEN 1 ELSE 0 END AS e
  FROM s LEFT JOIN p USING (user_id), mx),
c AS (SELECT t,
        CAST(sum(e) AS BIGINT) AS d,
        CAST(count(*) AS BIGINT) AS cc,
        CAST(sum(CASE WHEN variant = 'A' THEN e ELSE 0 END) AS BIGINT)
          AS d1,
        CAST(sum(CASE WHEN variant = 'A' THEN 1 ELSE 0 END) AS BIGINT)
          AS c1
      FROM subj GROUP BY 1),
k AS (SELECT t, d, d1,
        CAST(sum(cc) OVER (ORDER BY t
             ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
          AS HUGEINT) AS n,
        CAST(sum(c1) OVER (ORDER BY t
             ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
          AS HUGEINT) AS n1
      FROM c),
terms AS (SELECT
        CASE WHEN d > 0 AND n > 1 THEN d1 ELSE 0 END AS o1t,
        CASE WHEN d > 0 AND n > 1
             THEN (d * n1 * 1000000) // n ELSE 0 END AS e1t,
        CASE WHEN d > 0 AND n > 1
             THEN (d * n1 * (n - n1) * (n - d) * 1000000)
                  // (n * n * (n - 1))
             ELSE 0 END AS vt
      FROM k),
agg AS (SELECT CAST(sum(o1t) AS HUGEINT) AS o1,
               CAST(sum(e1t) AS HUGEINT) AS e1s,
               CAST(sum(vt) AS HUGEINT) AS vs
        FROM terms),
sizes AS (SELECT
        CAST(sum(CASE WHEN variant = 'A' THEN 1 ELSE 0 END) AS BIGINT)
          AS na,
        CAST(sum(CASE WHEN variant = 'B' THEN 1 ELSE 0 END) AS BIGINT)
          AS nb
      FROM subj)
SELECT na AS n1, nb AS n2, CAST(o1 AS BIGINT) AS o1,
       CAST(e1s AS DOUBLE) / 1000000.0 AS e1,
       CAST(vs AS DOUBLE) / 1000000.0 AS v,
       CASE WHEN vs > 0
            THEN CAST((2 * (o1 * 1000000 - e1s) * (o1 * 1000000 - e1s)
                         * 1000000 + vs * 1000000)
                      // (2 * vs * 1000000) AS DOUBLE) / 1000000.0
            ELSE NULL END AS chi2
FROM agg, sizes
"""


@register("signup_survival_logrank", _LOGRANK_SQL)
def signup_survival_logrank_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample log-rank test between the even/odd signup cohorts'
    time-to-first-purchase curves (operators/survival.py logrank_test)
    — the inference companion to signup_to_purchase_survival: two KM
    curves that LOOK apart need this before the conclusion ships. E/V
    accumulate as term-wise scaled-integer truncating divisions over
    exact hypergeometric counts, so the sums replay bit-identically;
    the only float work is the final χ² expression."""
    from weaviate_txtai_spark.operators.survival import logrank_test

    ev = load_table(spark, sf_dir, "events")
    mx = ev.agg(F.max("ts").alias("m"))
    s = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t0"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s, "user_id")
        .filter(F.col("ts") > F.col("t0"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    subj = (
        s.join(p, "user_id", "left")
        .join(F.broadcast(mx))
        .select(
            F.when(F.col("user_id") % 2 == 0, "A").otherwise("B").alias(
                "variant"
            ),
            F.floor(
                (
                    F.unix_micros(F.coalesce("t1", "m"))
                    - F.unix_micros("t0")
                )
                / F.lit(86400e6)
            ).cast("int").alias("t"),
            F.when(F.col("t1").isNotNull(), 1).otherwise(0).alias("e"),
        )
    )
    return logrank_test(subj, "t", "e", "variant")


def _perm_test_sql(n_perms: int = 64) -> str:
    return f"""
WITH users AS MATERIALIZED (
  SELECT user_id AS u,
         CAST(user_id % 2 AS INT) AS t,
         CAST(max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
           AS INT) AS y
  FROM events GROUP BY 1, 2),
obs AS (SELECT CAST(sum(t) AS BIGINT) AS n1,
               CAST(sum(1 - t) AS BIGINT) AS n0,
               CAST(sum(t * y) AS BIGINT) AS s1,
               CAST(sum((1 - t) * y) AS BIGINT) AS s0
        FROM users),
perms AS (
  SELECT s.seed,
         CAST((((((u + s.seed) % 2147483648) + 2147483648) % 2147483648)
                * 2654435761)
              % 4294967296 // 2147483648 AS INT) AS pt,
         y
  FROM users, (SELECT unnest(generate_series(1, {n_perms})) AS seed) s),
per_seed AS (
  SELECT seed,
         CAST(sum(pt) AS BIGINT) AS pn1,
         CAST(sum(1 - pt) AS BIGINT) AS pn0,
         CAST(sum(pt * y) AS BIGINT) AS ps1,
         CAST(sum((1 - pt) * y) AS BIGINT) AS ps0
  FROM perms GROUP BY 1),
ext AS (
  SELECT CAST(sum(CASE
           WHEN pn1 * pn0 = 0 THEN 1
           WHEN abs(CAST(ps1 * pn0 - ps0 * pn1 AS HUGEINT))
                * (obs.n1 * obs.n0)
                >= abs(CAST(obs.s1 * obs.n0 - obs.s0 * obs.n1
                         AS HUGEINT))
                * (pn1 * pn0)
           THEN 1 ELSE 0 END) AS BIGINT) AS n_extreme
  FROM per_seed, obs)
SELECT obs.n1, obs.n0,
       round(CAST(obs.s1 AS DOUBLE) / obs.n1
             - CAST(obs.s0 AS DOUBLE) / obs.n0, 6) AS obs_diff,
       CAST({n_perms} AS BIGINT) AS n_perms,
       ext.n_extreme,
       round((ext.n_extreme + 1) / {float(n_perms + 1)!r}, 6) AS p_value
FROM obs, ext
"""


@register("purchase_permutation_test", _perm_test_sql())
def purchase_permutation_test_q(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Permutation test for the even/odd purchase-rate difference
    (operators/abtest.py permutation_test_rates): 64 label
    re-assignments via the replayable Knuth hash, extremity decided by
    CROSS-MULTIPLIED exact-integer comparison (no float ever picks a
    permutation), p as an exact add-one rational. The assumption-free
    companion to the z-test — under the null the split is just one of
    the permutations, so p concentrates near uniform."""
    from weaviate_txtai_spark.operators.abtest import (
        permutation_test_rates,
    )

    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        (F.col("user_id") % 2).cast("int").alias("t"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias(
            "y"
        ),
    )
    return permutation_test_rates(ev, "user_id", "t", "y", n_perms=64)
