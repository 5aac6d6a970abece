"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All query definitions live in ``weaviate_txtai_spark/plans/queries.py``
(Spark plan + DuckDB oracle side by side, one entry per SURVEY.md §2
operator).
"""

from __future__ import annotations

import functools
import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO_DIR = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _REPO_DIR)

def _ensure_shipped(spark: SparkSession) -> None:
    """Ship the package to Spark's Python workers via addPyFile.

    The driver process may run from any cwd; pandas-UDF/mapInPandas
    closures are pickled by module reference, so workers need the package
    importable too — sys.path edits in this process don't reach them."""
    from weaviate_txtai_spark.ship import ensure_shipped

    ensure_shipped(spark)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: batch kNN cosine top-k
    (the reference's search hot path, made batch-first)."""
    _ensure_shipped(spark)
    from weaviate_txtai_spark.plans.queries import knn_batch_q

    return knn_batch_q(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from weaviate_txtai_spark.plans import queries as q

    def shipped(fn):
        @functools.wraps(fn)
        def wrapper(spark: SparkSession, sf_dir: str) -> DataFrame:
            _ensure_shipped(spark)
            return fn(spark, sf_dir)

        return wrapper

    return {name: shipped(fn) for name, fn in q.queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalent for each oracle-able query."""
    from weaviate_txtai_spark.plans import queries as q

    return q.oracle_sql()
