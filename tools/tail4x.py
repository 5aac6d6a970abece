"""1x/2x/4x scaling profile of the SCALE_CHECK ratio-tail cases
(VERDICT r8 item 4): the four operators whose r8 2x ratios were worst
(customer_affinity 1.83, dedup_prefix_jaccard 1.49, source_drift_jsd
1.45, threshold_join_bucketed 1.43), extended in r10 with that round's
two worst (docs_heaps_law 1.44, customer_linkage_em 1.58-with-2x-
output). The 4x corpus is two more perturbed clones (token prefixes
'y'/'z'; a third sign-flip pattern for embeddings; disjoint key+nation
shifts for customers), so every doubling is structurally honest like
the 2x one. Writes the measurements into SCALE_CHECK.json under
"tail_4x".

Usage: python tools/tail4x.py
"""
import os, sys, time, json
sys.path.insert(0, "/root/repo")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from pyspark.sql import SparkSession, functions as F
spark = (SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions","32")
    .config("spark.sql.adaptive.enabled","true")
    .config("spark.sql.session.timeZone","UTC")
    .config("spark.ui.enabled","false")
    .config("spark.driver.memory","16g").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
from weaviate_txtai_spark.sources.tables import load_table
SF="/root/testdata/sf0.1"

docs1 = load_table(spark, SF, "documents")
def doc_clone(d, off, pref):
    return (d.withColumn("doc_id", F.col("doc_id")+F.lit(off))
        .withColumn("text", F.concat_ws(" ", F.transform(F.split(F.col("text")," "),
            lambda t: F.concat(F.lit(pref), t)))))
docs2 = docs1.unionByName(doc_clone(docs1, 1_000_000, "x"))
docs4 = docs2.unionByName(doc_clone(docs1, 2_000_000, "y")).unionByName(doc_clone(docs1, 3_000_000, "z"))

emb1 = load_table(spark, SF, "embeddings")
def emb_clone(e, off, mode):
    if mode == 0:
        f = lambda x, i: F.when(i % 2 == 0, x).otherwise(-x)
    elif mode == 1:
        f = lambda x, i: F.when(i % 2 == 1, x).otherwise(-x)
    else:
        f = lambda x, i: F.when((i % 4) < 2, x).otherwise(-x)
    return (e.withColumn("vec_id", F.col("vec_id")+F.lit(off))
        .withColumn("embedding", F.transform("embedding", f).cast("array<float>")))
emb2 = emb1.unionByName(emb_clone(emb1, 1_000_000, 0))
emb4 = emb2.unionByName(emb_clone(emb1, 2_000_000, 1)).unionByName(emb_clone(emb1, 3_000_000, 2))

li1 = load_table(spark, SF, "lineitem")
cp1 = (load_table(spark, SF, "orders")
    .join(li1, F.col("o_orderkey")==F.col("l_orderkey"))
    .select(F.col("o_custkey").alias("cust"), F.col("l_partkey").alias("part")))
def cp_clone(c, off):
    return c.withColumn("cust", F.col("cust")+F.lit(off)).withColumn("part", F.col("part")+F.lit(off))
cp2 = cp1.unionByName(cp_clone(cp1, 1_000_000))
cp4 = cp2.unionByName(cp_clone(cp1, 2_000_000)).unionByName(cp_clone(cp1, 3_000_000))

cust1 = load_table(spark, SF, "customer")
def cust_clone(c, off):
    # disjoint component: keys AND the blocking nation shifted
    return (c.withColumn("c_custkey", F.col("c_custkey")+F.lit(off))
        .withColumn("c_nationkey", F.col("c_nationkey")+F.lit(off//400_000)))
cust2 = cust1.unionByName(cust_clone(cust1, 10_000_000))
cust4 = cust2.unionByName(cust_clone(cust1, 20_000_000)).unionByName(cust_clone(cust1, 30_000_000))

def q_affinity(cp):
    from weaviate_txtai_spark.operators.linkpred import link_scores
    return link_scores(cp, "cust", "part", max_item_degree=20, min_common=2)
def q_prefix_jaccard(d):
    from weaviate_txtai_spark.operators.setjoin import jaccard_prefix_pairs
    return jaccard_prefix_pairs(d, threshold=0.8)
def q_jsd(d):
    from weaviate_txtai_spark.functions.text import tokens
    from weaviate_txtai_spark.operators.drift import jsd_drift
    tok = d.select("source", F.explode(tokens("text")).alias("tok"))
    return jsd_drift(tok, group_col="source", token_col="tok")
def q_threshold_bucketed(e):
    from weaviate_txtai_spark.operators.simjoin import threshold_join
    left = e.select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vector"))
    return threshold_join(left, e, 0.9, right_id="vec_id", right_vec="embedding", strategy="bucketed")
# q_heaps / q_linkage_em are imported from scale_check (same bodies
# must drive the 1x/2x and 4x harnesses)
from scale_check import q_heaps, q_linkage_em  # noqa: E402

from weaviate_txtai_spark.cache import cache_scope
def run(fn, inp):
    ts = []
    for _ in range(2):
        with cache_scope():
            t = time.time(); n = fn(inp).count(); ts.append(time.time()-t)
    return min(ts), n

cases = {
    "customer_affinity": (q_affinity, cp1, cp2, cp4),
    "dedup_prefix_jaccard": (q_prefix_jaccard, docs1, docs2, docs4),
    "source_drift_jsd": (q_jsd, docs1, docs2, docs4),
    "threshold_join_bucketed": (q_threshold_bucketed, emb1, emb2, emb4),
    "docs_heaps_law": (q_heaps, docs1, docs2, docs4),
    "customer_linkage_em": (q_linkage_em, cust1, cust2, cust4),
}
out = {}
for name, (fn, i1, i2, i4) in cases.items():
    t1, n1 = run(fn, i1); t2, n2 = run(fn, i2); t4, n4 = run(fn, i4)
    out[name] = dict(t_1x=round(t1,3), t_2x=round(t2,3), t_4x=round(t4,3),
                     r21=round(t2/t1,2), r42=round(t4/t2,2),
                     rows=(n1,n2,n4))
    print(name, out[name], flush=True)
print(json.dumps(out))
from scale_check import merge_write
path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "SCALE_CHECK.json")
merge_write(path, {"tail_4x": out})
print("merged into", path)
