"""Record linkage + sequential inference walkthrough: the r10 operator
families composed end-to-end over the driver's customer + events
tables.

Stages (each a documented operator with its own correctness gate):
  1. unsupervised EM-fitted Fellegi–Sunter linkage of a perturbed
     customer copy — no labels, pattern counts from marginals
     (operators/recordlinkage, gate: customer_linkage_em)
  2. the supervised fit on the SAME fixture for comparison
     (gate: customer_linkage_fs)
  3. Kaplan–Meier signup→purchase curves per cohort + the log-rank
     test between them (operators/survival, gates:
     signup_to_purchase_survival, signup_survival_logrank)
  4. sequential SPRT decision on the purchase rate + the
     hash-permutation test on the cohort split (operators/abtest,
     gates: events_sprt_decision, purchase_permutation_test)

Run: python examples/linkage_and_inference.py [sf_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"


def main() -> None:
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("linkage-and-inference")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from weaviate_txtai_spark.operators.recordlinkage import (
        fs_em_fit,
        fs_em_weights,
        fs_pattern_counts_blocked,
        fs_weights_blocked,
    )
    from weaviate_txtai_spark.plans.queries import REGISTRY
    from weaviate_txtai_spark.sources.tables import load_table

    cust = load_table(spark, SF_DIR, "customer")
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

    print("== 1. unsupervised EM fit (no labels anywhere) ==")
    counts = fs_pattern_counts_blocked(
        a, b, a_block="an", b_block="bn", fields=fields
    )
    fit = fs_em_fit(counts, len(fields), n_iter=8)
    sc = fit["scale"]
    n_total = sum(counts.values())
    print(f"  blocked pairs: {n_total}; fitted match share p = "
          f"{fit['p'] / sc:.4f}")
    for i, name in enumerate(fields):
        print(f"  {name}: m = {fit['m'][i] / sc:.3f}  "
              f"u = {fit['u'][i] / sc:.4f}")
    w_em = fs_em_weights(fit, list(fields))

    print("== 2. supervised fit on the same fixture ==")
    w_sup = fs_weights_blocked(
        a, b, a_key="ak", b_key="bk", a_block="an", b_block="bn",
        fields=fields,
    )
    for name in fields:
        print(f"  {name}: EM (wa, wd) = {w_em[name]}  "
              f"supervised = {w_sup[name]}")

    print("== 3. survival curves + log-rank ==")
    km = REGISTRY["signup_to_purchase_survival"][0](spark, SF_DIR)
    km.filter(F.col("n_events") > 0).orderBy("variant", "t").show(6)
    lr = REGISTRY["signup_survival_logrank"][0](spark, SF_DIR)
    r = lr.collect()[0]
    print(f"  log-rank: O1 = {r.o1}, E1 = {r.e1:.2f}, chi2 = {r.chi2}")

    print("== 4. sequential + permutation inference ==")
    sprt = REGISTRY["events_sprt_decision"][0](spark, SF_DIR).collect()[0]
    print(f"  SPRT (H0 p=0.1 vs H1 p=0.2): {sprt.decision} after "
          f"{sprt.n_periods_used} day(s), {sprt.k_success}/"
          f"{sprt.n_trials} successes")
    perm = REGISTRY["purchase_permutation_test"][0](
        spark, SF_DIR
    ).collect()[0]
    print(f"  permutation test on the even/odd split: diff = "
          f"{perm.obs_diff}, p = {perm.p_value}")
    spark.stop()


if __name__ == "__main__":
    main()
