"""ANN-at-scale walkthrough: the memory/recall ladder from exact kNN to
IVF-PQ, on the driver's embeddings table.

    python examples/ann_scale.py [sf_dir]

Ladder (each rung trades exactness for scan cost):
1. exact kNN             — reads every float vector (4·dim B/row)
2. IVF                   — reads nprobe/nlist of the float vectors
3. PQ + ADC + rerank     — reads m-byte codes, floats only for shortlist
4. IVF-PQ                — reads m-byte codes of nprobe/nlist of rows
Plus the txtai facade's opt-in 'ivf' backend.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"


def main() -> None:
    spark = (
        SparkSession.builder.master("local[*]")
        .appName("ann-scale-example")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from weaviate_txtai_spark.operators.ann import IVFIndex, tune_nprobe
    from weaviate_txtai_spark.operators.ivfpq import IVFPQIndex
    from weaviate_txtai_spark.operators.pq import (
        adc_topk_rerank,
        pq_encode,
        train_pq,
    )
    from weaviate_txtai_spark.operators.topk import knn_topk
    from weaviate_txtai_spark.sources.tables import load_table

    emb = load_table(spark, SF_DIR, "embeddings")
    qdf = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vector"),
    )
    q0 = list(emb.filter(F.col("vec_id") == 0).head()["embedding"])

    print("== 1. exact kNN (cosine) ==")
    knn_topk(emb, qdf, 3, vector_col="embedding", id_col="vec_id").show()

    print("== 2. IVF: probe-pruned, recall tuned on a sample ==")
    ivf = IVFIndex.build(emb, nlist=16)
    nprobe, curve = tune_nprobe(ivf, qdf, 5, recall_target=0.9)
    print(f"   tuned nprobe={nprobe}, curve={curve}")
    ivf.search(qdf, 3, nprobe=nprobe).show()

    print("== 3. PQ codes + ADC shortlist + exact rerank (squared L2) ==")
    pq = train_pq(emb, m=8, k=16, iters=2, quantize_decimals=6)
    coded = pq_encode(emb, pq, packed=False)
    adc_topk_rerank(coded, emb, pq, q0, 3, shortlist=10).show()

    print("== 4. IVF-PQ: cells + residual codes ==")
    ivfpq = IVFPQIndex.build(emb, nlist=8, m=8, k_pq=16, pq_iters=2)
    ivfpq.search([(0, q0)], 3, nprobe=4, shortlist=10).show()

    print("== 5. txtai facade with the IVF backend ==")
    from weaviate_txtai_spark import Embeddings

    e = Embeddings(
        spark, config={"backend": "ivf", "ivf": {"nlist": 4, "nprobe": 2}}
    )
    e.index([(f"d{i}", f"document number {i} about topic {i % 7}", None)
             for i in range(200)])
    print("   facade search:", e.search("document about topic 3", 3))
    spark.stop()


if __name__ == "__main__":
    main()
