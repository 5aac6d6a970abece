"""Dump `.explain("formatted")` for bench queries to plans/$SPARK_GRAFT_PLANS_DIR
(default r14).

Usage: python tools/opt_plans.py before|after [name ...]
Writes plans/<dir>/<name>_<tag>.txt for each bench query (default: all of
bench.HEADLINE + bench.HEADLINE_HEAVY), using the same session shape as
bench.py (local[$SPARK_GRAFT_CPUS], shuffle.partitions=CPUS, AQE on) so
the captured plans are the ones the bench actually runs.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "plans",
    os.environ.get("SPARK_GRAFT_PLANS_DIR", "r14"),
)


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:]
    from pyspark.sql import SparkSession

    import bench

    if not names:
        names = bench.HEADLINE + bench.HEADLINE_HEAVY

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("opt-plans")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from weaviate_txtai_spark.cache import cache_scope
    from weaviate_txtai_spark.plans.queries import queries

    qs = queries()
    os.makedirs(OUT, exist_ok=True)
    for name in names:
        try:
            with cache_scope():
                df = qs[name](spark, SF_DIR)
                plan = df._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                        "formatted"
                    )
                )
        except Exception as e:  # capture the failure instead of dying
            plan = f"ERROR capturing plan: {e}"
        path = os.path.join(OUT, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(f"# {name} — explain('formatted') at {SF_DIR}, "
                    f"local[{CPUS}], tag={tag}\n")
            f.write(plan)
        n_ex = plan.count("Exchange")
        n_py = (plan.count("BatchEvalPython") + plan.count("ArrowEvalPython")
                + plan.count("MapInPandas") + plan.count("FlatMapGroupsInPandas"))
        print(f"{name}: exchanges~{n_ex} python-nodes~{n_py} -> {path}",
              flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
