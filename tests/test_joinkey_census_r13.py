"""r13 JOIN-key census regressions (tools/joinkey_audit.py).

The real defect class found: NULL-id corpus rows consumed ANN shortlist
slots, then silently vanished at the exact-rerank equi-join (NULL never
matches), so the final top-n quietly returned fewer than n true rows.
Fixed by excluding NULL-id rows at the shortlist scans (adc_topk,
hamming_topk) and at index build/append (IVFIndex, IVFPQIndex).
"""

import pytest
from pyspark.sql import functions as F

from weaviate_txtai_spark.functions.vector import sign_pack
from weaviate_txtai_spark.operators.ann import IVFIndex
from weaviate_txtai_spark.operators.ivfpq import IVFPQIndex
from weaviate_txtai_spark.operators.pq import adc_topk_rerank, train_pq, pq_encode
from weaviate_txtai_spark.operators.topk import hamming_topk_rerank
from weaviate_txtai_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def emb100(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings").limit(100).cache()


@pytest.fixture(scope="module")
def with_null_ids(spark, emb100):
    """The 100-row corpus plus 5 NULL-id CLONES of real rows — each
    clone's vector ranks exactly where its source does, so pre-fix it
    reliably lands in any shortlist its source lands in."""
    clones = (
        emb100.limit(5)
        .withColumn("vec_id", F.lit(None).cast("long"))
    )
    return emb100.unionByName(clones).cache()


@pytest.fixture(scope="module")
def query(emb100):
    return [float(x) for x in emb100.orderBy("vec_id").head()["embedding"]]


def test_adc_rerank_null_ids_do_not_shrink_topn(
    spark, emb100, with_null_ids, query
):
    model = train_pq(emb100, m=4, k=8, iters=2, dist_round_decimals=6,
                     quantize_decimals=6)
    codes_clean = pq_encode(emb100, model, packed=False)
    codes_dirty = pq_encode(with_null_ids, model, packed=False)
    # shortlist=1: every wasted slot directly costs a final row pre-fix
    clean = adc_topk_rerank(codes_clean, emb100, model, query, 10,
                            shortlist=1).collect()
    dirty = adc_topk_rerank(codes_dirty, with_null_ids, model, query, 10,
                            shortlist=1).collect()
    assert len(dirty) == 10
    assert [r["vec_id"] for r in dirty] == [r["vec_id"] for r in clean]
    assert all(r["vec_id"] is not None for r in dirty)


def test_hamming_rerank_null_ids_do_not_shrink_topn(
    spark, emb100, with_null_ids, query
):
    packed = sign_pack(F.col("embedding"))
    codes_clean = emb100.select("vec_id", packed.alias("sign_code"))
    codes_dirty = with_null_ids.select("vec_id", packed.alias("sign_code"))
    qcode = [int(w) for w in
             codes_clean.orderBy("vec_id").head()["sign_code"]]
    clean = hamming_topk_rerank(codes_clean, emb100, query, qcode, 10,
                                shortlist=1).collect()
    dirty = hamming_topk_rerank(codes_dirty, with_null_ids, query, qcode,
                                10, shortlist=1).collect()
    assert len(dirty) == 10
    assert [r["vec_id"] for r in dirty] == [r["vec_id"] for r in clean]


def test_ivf_build_and_append_exclude_null_ids(spark, emb100, with_null_ids):
    idx = IVFIndex.build(with_null_ids, nlist=4)
    assert idx.assigned.filter(F.col("vec_id").isNull()).count() == 0
    assert idx.assigned.count() == 100
    more = (
        emb100.limit(3)
        .withColumn("vec_id", F.col("vec_id") + 1000)
        .unionByName(
            emb100.limit(2).withColumn(
                "vec_id", F.lit(None).cast("long"))
        )
    )
    grown = idx.append(more)
    assert grown.assigned.filter(F.col("vec_id").isNull()).count() == 0
    assert grown.assigned.count() == 103


def test_ivfpq_search_with_null_id_corpus_rows(spark, emb100, with_null_ids,
                                               query):
    clean = IVFPQIndex.build(emb100, nlist=4, m=4, k_pq=8, pq_iters=2)
    dirty = IVFPQIndex.build(with_null_ids, nlist=4, m=4, k_pq=8,
                             pq_iters=2)
    assert dirty.codes.filter(F.col("vec_id").isNull()).count() == 0
    a = clean.search([(0, query)], 5, nprobe=4).collect()
    b = dirty.search([(0, query)], 5, nprobe=4).collect()
    assert [r["vec_id"] for r in a] == [r["vec_id"] for r in b]
    assert len(b) == 5
