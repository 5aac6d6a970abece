"""Co-bucketed fact join: the orderkey shuffle disappears from the plan
and results stay identical to the plain join."""

import pytest
from pyspark.sql import functions as F

from weaviate_txtai_spark.sources.bucketed import cobucket_facts
from weaviate_txtai_spark.sources.tables import load_table


def _joined(li, orders):
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .groupBy("o_orderstatus")
        .agg(F.round(F.sum("l_extendedprice"), 2).alias("total"))
        .orderBy("o_orderstatus")
    )


@pytest.fixture()
def no_broadcast(spark):
    # at test SF the dims fit under the broadcast threshold; disable it so
    # both plans take the SortMergeJoin path the comparison is about
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_cobucketed_join_is_shuffle_free(spark, sf_dir, no_broadcast):
    li_t, o_t = cobucket_facts(spark, sf_dir, n_buckets=4)

    plain_plan = _joined(
        load_table(spark, sf_dir, "lineitem"), load_table(spark, sf_dir, "orders")
    )
    bucketed_plan = _joined(spark.table(li_t), spark.table(o_t))

    plain = plain_plan._jdf.queryExecution().executedPlan().toString()
    bucketed = bucketed_plan._jdf.queryExecution().executedPlan().toString()
    # plain SMJ shuffles both sides on the join key
    assert "hashpartitioning(l_orderkey" in plain
    assert "hashpartitioning(o_orderkey" in plain
    # co-bucketed SMJ shuffles neither side — bucket layout IS the partitioning
    assert "hashpartitioning(l_orderkey" not in bucketed
    assert "hashpartitioning(o_orderkey" not in bucketed
    assert "SortMergeJoin" in bucketed

    # identical results
    a = [tuple(r) for r in plain_plan.collect()]
    b = [tuple(r) for r in bucketed_plan.collect()]
    assert a == b


def test_bucketed_overwrite_is_idempotent(spark, sf_dir):
    # second call must not trip LOCATION_ALREADY_EXISTS on the leftover dir
    cobucket_facts(spark, sf_dir, n_buckets=4)
    li_t, _ = cobucket_facts(spark, sf_dir, n_buckets=4)
    assert spark.table(li_t).count() == load_table(
        spark, sf_dir, "lineitem"
    ).count()
