"""order_scc 1x/2x/4x/8x profile (r13 VERDICT task 5).

The r12 watch item: order_scc's 1x->2x step measured 2.9 while 2x->4x
was 2.02. Hypothesis (r11's affine fit): the 1x point sits ABOVE the
linear asymptote because the algorithm pays a FIXED number of
trim/color/mark rounds regardless of size (round count is set by the
chain structure, identical in every clone), and each round has a fixed
per-job scheduling cost. This script adds the 8x point and fits
t = F + c*E on the (2x,4x,8x) tail; the floor model holds if the 8x
step is <= 2x-input-linear and the fit's residual at 1x is positive
(the 1x elevation IS the floor). Also counts Spark jobs at 1x and 8x —
equal job counts == equal round counts == the fixed-round claim,
measured rather than asserted.

Writes SCALE_CHECK.json -> scc_profile. Usage: python tools/scc_profile.py
"""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import SparkSession, Window, functions as F

spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.driver.memory", "16g")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from weaviate_txtai_spark.cache import cache_scope
from weaviate_txtai_spark.operators.graph import strongly_connected_components
from weaviate_txtai_spark.sources.tables import load_table

SF = "/root/testdata/sf0.1"

ord1 = load_table(spark, SF, "orders").select("o_orderkey", "o_custkey")


def ord_clone(o, off):
    return o.withColumn("o_orderkey", F.col("o_orderkey") + F.lit(off)).withColumn(
        "o_custkey", F.col("o_custkey") + F.lit(off)
    )


scales = {1: ord1}
cur = ord1
for i, s in enumerate([2, 4, 8]):
    adds = [ord_clone(ord1, 10_000_000 * (2 ** i + j)) for j in range(2 ** i)]
    for a in adds:
        cur = cur.unionByName(a)
    scales[s] = cur


def scc_graph(orders):
    # the order_scc gate's graph: per-customer directed chain with a
    # back-edge every 4th position (4-cycles + trailing singletons)
    w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
    pos = orders.select(
        F.col("o_orderkey").alias("k"),
        F.lead("o_orderkey").over(w).alias("nxt"),
        F.row_number().over(w).alias("rn"),
        F.lag("o_orderkey", 3).over(w).alias("back"),
    )
    chain = pos.select(
        F.col("k").alias("src"), F.coalesce("nxt", "k").alias("dst")
    )
    backe = pos.filter((F.col("rn") % 4 == 0) & F.col("back").isNotNull()).select(
        F.col("k").alias("src"), F.col("back").alias("dst")
    )
    return chain.unionByName(backe)


def run(orders):
    ts, n, jobs = [], None, None
    tracker = spark.sparkContext.statusTracker()
    for _ in range(2):
        with cache_scope():
            t = time.time()
            n = strongly_connected_components(scc_graph(orders)).count()
            ts.append(time.time() - t)
    # job-count proxy: run once more under a dedicated group
    spark.sparkContext.setJobGroup("sccprof", "scc")
    with cache_scope():
        strongly_connected_components(scc_graph(orders)).count()
    # NOTE: getJobIdsForGroup accumulates over the session — readings
    # across scales are CUMULATIVE (13/26/39/52 == 13 jobs per run)
    jobs = len(tracker.getJobIdsForGroup("sccprof") or [])
    spark.sparkContext.setJobGroup(None, None)
    return min(ts), n, jobs


out = {}
for s, orders in scales.items():
    t, n, jobs = run(orders)
    out[str(s)] = {"t": round(t, 3), "rows": n, "jobs": jobs}
    print(s, out[str(s)], flush=True)

t2, t4, t8 = out["2"]["t"], out["4"]["t"], out["8"]["t"]
# affine fit on the tail: per-unit slope from 4x->8x, floor from 2x/4x
c = (t8 - t4) / 4.0
fl = t4 - 2 * ((t8 - t4) / 4.0) * 2  # F = t4 - c*4
out["fit"] = {
    "slope_per_1x": round(c, 3),
    "floor": round(t4 - c * 4, 3),
    "r84": round(t8 / t4, 2),
    "r42": round(t4 / t2, 2),
    "r21": round(t2 / out["1"]["t"], 2),
}
print(json.dumps(out))
from scale_check import merge_write

path = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "SCALE_CHECK.json",
)
merge_write(path, {"scc_profile": out})
print("merged into", path)
