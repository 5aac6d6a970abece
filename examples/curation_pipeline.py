"""Training-data curation pipeline: the LLM-data workflow the engine's
north-star operators exist for, composed end-to-end over the driver's
documents + embeddings tables.

Stages (each one a documented operator with its own correctness gate):
  1. text stats + quality score       (functions/text, oracle: text_quality)
  2. language filter                  (lang_id argmax heuristic)
  3. exact dedup                      (fingerprint groupBy)
  4. near-dup groups via MinHash LSH  (verified Jaccard >= 0.8 + components)
  5. embedding near-dup cross-check   (hyperplane LSH + bucket GEMM verify)
  6. curated output + summary

Run: python examples/curation_pipeline.py [sf_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"


def docs_quality_tiers_counts(spark, curated):
    """Head/middle/tail counts over the curated set's NLL terciles."""
    from pyspark.sql import Window

    from weaviate_txtai_spark.operators.lm import nll_quality_filter

    scored = nll_quality_filter(curated.select("doc_id", "text")).filter(
        F.col("nll").isNotNull()
    )
    w = Window.orderBy(F.asc("nll"), F.asc("doc_id"))
    return (
        scored.withColumn("t", F.ntile(3).over(w))
        .withColumn(
            "tier",
            F.when(F.col("t") == 1, "head")
            .when(F.col("t") == 2, "middle")
            .otherwise("tail"),
        )
        .groupBy("tier")
        .count()
        .collect()
    )


def main() -> None:
    spark = (
        SparkSession.builder.master("local[*]")
        .appName("curation-pipeline-example")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from weaviate_txtai_spark.functions.text import (
        fingerprint,
        lang_id,
        quality_score,
        token_count,
    )
    from weaviate_txtai_spark.operators.dedup import (
        duplicate_groups,
        embedding_dup_pairs_lsh,
        minhash_lsh_pairs,
    )
    from weaviate_txtai_spark.sources.tables import load_table

    docs = load_table(spark, SF_DIR, "documents")
    n0 = docs.count()

    # 1-2. annotate: token count, quality in [0,1], language guess —
    # all native column exprs, one map-only pass
    annotated = docs.select(
        "doc_id",
        "text",
        "source",
        token_count("text").alias("n_tokens"),
        F.round(quality_score("text"), 4).alias("quality"),
        lang_id("text").alias("lang_guess"),
        fingerprint("text").alias("fp"),
    ).persist()

    kept_quality = annotated.filter(
        (F.col("quality") >= 0.2) & (F.col("n_tokens") >= 5)
    )
    n1 = kept_quality.count()

    # 3. exact dedup: keep lowest doc_id per normalized fingerprint
    from pyspark.sql import Window

    w = Window.partitionBy("fp").orderBy("doc_id")
    exact_unique = (
        kept_quality.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    n2 = exact_unique.count()

    # 4. near-dup: MinHash-LSH candidates verified at Jaccard >= 0.8,
    # connected components, keep one representative per group
    pairs = minhash_lsh_pairs(docs, threshold=0.8)
    groups = duplicate_groups(pairs)
    drop = groups.filter(F.col("doc_id") != F.col("group_id")).select("doc_id")
    curated = exact_unique.join(drop, "doc_id", "left_anti")
    n3 = curated.count()

    # 5. embedding-space cross-check (different signal than lexical):
    # how many near-dup pairs does cosine-LSH flag among the survivors?
    emb = load_table(spark, SF_DIR, "embeddings")
    emb_pairs = embedding_dup_pairs_lsh(emb, threshold=0.95)
    n_emb_pairs = emb_pairs.count()

    # 5b. LM-perplexity quality (CCNet shape): unigram NLL keep-flag +
    # bigram NLL for transition-aware gibberish detection
    from weaviate_txtai_spark.operators.lm import bigram_nll, nll_quality_filter

    lm_scores = nll_quality_filter(curated.select("doc_id", "text"))
    n_lm_keep = lm_scores.filter("keep").count()
    big_row = (
        bigram_nll(curated.select("doc_id", "text"))
        .agg(F.round(F.avg("nll"), 3).alias("mean_bigram_nll"))
        .collect()[0]
    )

    # 5b'. classifier quality tier (the GPT-3/FineWeb recipe): a linear
    # classifier trained to tell reference sources from the rest, every
    # doc scored reference-likeness in [0,1] — integer-exact GD, so the
    # run is bit-reproducible on any cluster
    from weaviate_txtai_spark.cache import cache_scope, scoped_persist
    from weaviate_txtai_spark.functions.text import tokens as _toks
    from weaviate_txtai_spark.operators.classifier import (
        W_SCALE,
        fit_hard_sigmoid_gd,
        normalized_features,
        score_hard_sigmoid,
    )

    with cache_scope():
        tf = (
            curated.select("doc_id", F.explode(_toks("text")).alias("t"))
            .groupBy("doc_id")
            .agg(
                F.count(F.lit(1)).cast("long").alias("nt"),
                F.countDistinct("t").cast("long").alias("nd"),
                F.sum(F.length("t")).cast("long").alias("tl"),
            )
        )
        # scoped_persist, not bare .persist(): cache_scope only releases
        # what scoped_persist registered
        clf_feats = scoped_persist(normalized_features(
            curated.join(tf, "doc_id", "left").select(
                "doc_id",
                F.when(F.col("source").isin("src0", "src1", "src2"), 1)
                .otherwise(0).cast("int").alias("y"),
                F.coalesce("nt", F.lit(0)).cast("long").alias("nt"),
                F.coalesce("nd", F.lit(0)).cast("long").alias("nd"),
                F.coalesce("tl", F.lit(0)).cast("long").alias("tl"),
            ),
            ["nt", "nd", "tl"],
            out_cols=["x1", "x2", "x3"],
        ))
        clf_w = fit_hard_sigmoid_gd(clf_feats, ["x1", "x2", "x3"], "y")
        clf_mean = (
            clf_feats.select(
                (score_hard_sigmoid(["x1", "x2", "x3"], clf_w)
                 / F.lit(float(W_SCALE))).alias("p")
            )
            .agg(F.round(F.avg("p"), 4).alias("m"))
            .collect()[0]["m"]
        )

    # 5c. SemDeDup (the full recipe): cluster cheap PCA projections,
    # verify cosine on the full embeddings, keep one member per near-dup
    # neighborhood
    from weaviate_txtai_spark.operators.kmeans import (
        semantic_dedup_pairs,
        semantic_dedup_survivors,
    )
    from weaviate_txtai_spark.operators.pca import pca_fit, pca_transform

    pca_model = pca_fit(emb, 8)
    reduced = pca_transform(emb, pca_model, output_col="pca")
    sem_pairs = semantic_dedup_pairs(
        reduced, k=4, iters=2, threshold=0.95, cluster_vector_col="pca"
    )
    n_sem_survivors = semantic_dedup_survivors(emb, sem_pairs).count()

    # 5d. materialize the target source mixture (50/30/20 over the three
    # largest sources), reproducible under any partitioning
    from weaviate_txtai_spark.functions.sampling import mixture_sample

    top_sources = [
        r["source"]
        for r in curated.groupBy("source").count()
        .orderBy(F.desc("count"), "source").limit(3).collect()
    ]
    target = (0.5, 0.3, 0.2)[: len(top_sources)]
    weights = dict(zip(top_sources, target))
    mix_counts = dict(
        mixture_sample(curated, weights, strata_col="source")
        .groupBy("source").count().collect()
    )

    # 5e. round-4 curation signals: CCNet quality tiers (NLL terciles),
    # soft-dedup weights (1/cluster-size instead of dropping), a
    # temperature draw (size^0.5 upweights small sources), and a
    # per-source quota cap
    from weaviate_txtai_spark.functions.sampling import temperature_sample

    tier_counts = dict(
        docs_quality_tiers_counts(spark, curated)
    )
    sizes = groups.groupBy("group_id").agg(F.count(F.lit(1)).alias("sz"))
    soft_w = (
        curated.join(groups, "doc_id", "left")
        .join(sizes, "group_id", "left")
        .select(
            F.round(
                F.lit(1.0) / F.coalesce(F.col("sz"), F.lit(1)), 6
            ).alias("w")
        )
        .agg(F.round(F.sum("w"), 2).alias("effective_docs"))
        .collect()[0]["effective_docs"]
    )
    temp_counts = dict(
        temperature_sample(curated, 300, 0.5)
        .groupBy("source").count()
        .orderBy(F.desc("count")).limit(3).collect()
    )

    # 6. chunk the curated survivors into model windows, pack short
    # chunks into fixed token budgets, and stamp the reproducible
    # train/valid/test split — the batch shapes a pretraining data
    # loader reads directly
    from weaviate_txtai_spark.functions.sampling import assign_split
    from weaviate_txtai_spark.operators.chunking import chunk_docs, pack_sequences

    chunks = chunk_docs(
        curated.select("doc_id", "text"), size=200, stride=100
    ).filter(F.col("chunk_len") > 0)
    n_chunks = chunks.count()
    packs = pack_sequences(
        curated.select("doc_id", "source", "text"), budget=512
    )
    n_packs = packs.select("source", "pack_id").distinct().count()
    split_counts = dict(
        curated.withColumn("split", assign_split("doc_id"))
        .groupBy("split")
        .count()
        .collect()
    )

    # 7. retrieval sanity over the curated corpus: BM25 lexical top-5
    from weaviate_txtai_spark.operators.bm25 import bm25_scores

    top_lex = (
        bm25_scores(curated.select("doc_id", "text"), ["spark", "vector", "join"])
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(5)
        .collect()
    )

    # 8. materialize training shards: Hive-partitioned by split/lang so
    # a loader reads train/ without listing valid/ or test/ (directory
    # pruning), docid-sorted within files for tight row-group stats
    import tempfile

    from weaviate_txtai_spark.sources.tables import write_partitioned

    shard_dir = os.path.join(tempfile.mkdtemp(), "shards")
    write_partitioned(
        curated.withColumn("split", assign_split("doc_id")),
        shard_dir,
        partition_cols=["split", "lang_guess"],
        sort_cols=["doc_id"],
    )
    n_train = (
        spark.read.parquet(shard_dir).filter(F.col("split") == "train").count()
    )

    # 9. summary
    print(f"documents            {n0:>8}")
    print(f"quality/len filter   {n1:>8}  (-{n0 - n1})")
    print(f"exact dedup          {n2:>8}  (-{n1 - n2})")
    print(f"near-dup (minhash)   {n3:>8}  (-{n2 - n3})")
    print(f"embedding pairs @.95 {n_emb_pairs:>8} (cross-check signal)")
    print(f"unigram-LM head keep {n_lm_keep:>8}  (nll <= corpus mean)")
    print(f"mean bigram NLL      {big_row['mean_bigram_nll']:>8}")
    print(f"clf mean ref-score   {clf_mean:>8}  (hard-sigmoid GD, w={clf_w})")
    print(f"semantic survivors   {n_sem_survivors:>8}  (PCA-clustered, full-space verify @.95)")
    print(f"quality tiers        {tier_counts}")
    print(f"soft-dedup mass      {soft_w:>8}  effective docs (1/cluster-size weights)")
    print(f"temperature top-3    {temp_counts}  (alpha=0.5 draw of 300)")
    print(f"mixture {weights}   -> {mix_counts}")
    print(f"chunks (200/100)     {n_chunks:>8}")
    print(f"packs (512 tokens)   {n_packs:>8}")
    print(f"split                {split_counts}")
    print(f"train shard rows     {n_train:>8}  ({shard_dir})")
    print(f"bm25 top-5           {[(r['doc_id'], r['score']) for r in top_lex]}")
    curated.groupBy("lang_guess").count().orderBy("lang_guess").show()
    spark.stop()


if __name__ == "__main__":
    main()
