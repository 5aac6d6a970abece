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

import math
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from weaviate_txtai_spark.functions.vector import cosine_sim
from weaviate_txtai_spark.sources.tables import load_table

QueryFn = Callable[[SparkSession, str], DataFrame]

REGISTRY: dict[str, tuple[QueryFn, Optional[str]]] = {}


def register(name: str, oracle: Optional[str]):
    def deco(fn: QueryFn) -> QueryFn:
        # a silent overwrite hides a gate from the driver forever (a
        # second registration of "events_funnel" nearly shadowed the
        # original in r7) — duplicates must fail at import time
        if name in REGISTRY:
            raise ValueError(f"gate {name!r} registered twice")
        REGISTRY[name] = (fn, oracle)
        return fn

    return deco


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "embeddings")
