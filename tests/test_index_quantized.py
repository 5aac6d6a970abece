"""int8 storage mode (weaviate.quantize: true): ~4× smaller index files,
search recall stays high, every mutation path works through the
encode/decode seam, and quantization is drift-free (idempotent)."""

import pytest

from weaviate_txtai_spark.index import VectorIndex


def _vecs(spark, n=200, dim=16, seed=3):
    import numpy as np

    rng = np.random.default_rng(seed)
    m = rng.standard_normal((n, dim))
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    return [list(map(float, row)) for row in m]


@pytest.fixture()
def qidx(spark, tmp_path):
    cfg = {"weaviate": {"quantize": True}}
    idx = VectorIndex(spark, str(tmp_path / "qidx"), config=cfg).create()
    idx.append(_vecs(spark))
    return idx


def test_quantized_storage_schema_and_size(spark, tmp_path, qidx):
    # physical files hold int8 + scale, not floats
    raw = spark.read.option("recursiveFileLookup", "true").parquet(
        qidx._data_path()
    )
    assert "qvec" in raw.columns and "qscale" in raw.columns
    assert "vector" not in raw.columns
    # logical view is float vectors
    assert dict(qidx.to_df().dtypes)["vector"] == "array<float>"
    # byte footprint: materially smaller than the float index once the
    # vector payload dominates (at tiny sizes parquet metadata + the
    # uuid strings swamp the ratio)
    big = _vecs(spark, n=1000, dim=64)
    cfg = {"weaviate": {"quantize": True}}
    qbig = VectorIndex(spark, str(tmp_path / "qbig"), config=cfg).create()
    qbig.append(big)
    fbig = VectorIndex(spark, str(tmp_path / "fbig")).create()
    fbig.append(big)
    assert qbig.stats()["bytes"] < 0.6 * fbig.stats()["bytes"]


def test_quantized_search_recall(spark, tmp_path, qidx):
    vecs = _vecs(spark)
    fidx = VectorIndex(spark, str(tmp_path / "f2")).create()
    fidx.append(vecs)
    k = 10
    hits_q = qidx.search([vecs[0], vecs[17], vecs[133]], limit=k)
    hits_f = fidx.search([vecs[0], vecs[17], vecs[133]], limit=k)
    for hq, hf in zip(hits_q, hits_f):
        exact = {d for d, _ in hf}
        approx = {d for d, _ in hq}
        assert len(exact & approx) >= 8  # recall@10 >= 0.8 per query
        # int8 over unit vectors: reconstruction error <= scale/2 per dim
        assert hq[0][0] == hf[0][0]  # top-1 survives quantization


def test_quantized_mutations_roundtrip(spark, qidx):
    vecs = _vecs(spark)
    qidx.delete([0, 1])
    assert qidx.count() == 198
    qidx.upsert([(1, vecs[1]), (500, vecs[2])])
    assert qidx.count() == 200
    assert qidx.offset == 501
    got = {r["docid"] for r in qidx.to_df().select("docid").collect()}
    assert 0 not in got and 1 in got and 500 in got


def test_quantization_idempotent_through_compact(spark, qidx):
    """decode→encode is exact (q → q·s → q), so compaction/mutations
    never accumulate drift: vectors byte-identical through compact."""
    before = {
        r["docid"]: list(r["vector"]) for r in qidx.to_df().collect()
    }
    qidx.compact(target_rows_per_file=50)
    after = {
        r["docid"]: list(r["vector"]) for r in qidx.to_df().collect()
    }
    assert before == after


def test_quantize_flag_persisted(spark, tmp_path, qidx):
    idx2 = VectorIndex(spark, str(tmp_path / "qidx"))
    idx2.load("ignored")
    assert idx2.quantize is True
    assert idx2.count() == qidx.count()


def test_quantized_bucketed_combo(spark, tmp_path):
    cfg = {"weaviate": {"quantize": True, "buckets": 4}}
    idx = VectorIndex(spark, str(tmp_path / "qb"), config=cfg).create()
    vecs = _vecs(spark, n=80)
    idx.append(vecs)
    assert idx._is_fully_bucketed()
    idx.upsert([(5, vecs[6])])
    assert idx.count() == 80
    res = idx.search([vecs[42]], limit=3)
    assert res[0][0][0] == 42
