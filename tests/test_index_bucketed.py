"""Bucketed index layout: mutations rewrite ONLY touched buckets
(VERDICT r1 item 2) and streaming appends are exactly-once at batch
granularity (ADVICE r1)."""

import hashlib
import os

import pytest

from weaviate_txtai_spark.index import VectorIndex


def _bucket_fingerprints(idx) -> dict[str, dict[str, str]]:
    """bucket dir -> {filename: sha256} for every bucket=* dir."""
    out = {}
    data = idx._data_path()
    for entry in sorted(os.listdir(data)):
        if not entry.startswith("bucket="):
            continue
        d = os.path.join(data, entry)
        out[entry] = {
            f: hashlib.sha256(open(os.path.join(d, f), "rb").read()).hexdigest()
            for f in sorted(os.listdir(d))
            if f.endswith(".parquet")
        }
    return out


@pytest.fixture()
def bidx(spark, tmp_path):
    cfg = {"weaviate": {"buckets": 4}}
    idx = VectorIndex(spark, str(tmp_path / "bidx"), config=cfg).create()
    idx.append([[float(i), 1.0] for i in range(40)])  # docids 0..39
    return idx


def test_bucketed_append_layout_and_read(bidx):
    assert bidx._is_fully_bucketed()
    assert bidx.count() == 40
    docids = sorted(r["docid"] for r in bidx.to_df().collect())
    assert docids == list(range(40))
    # every bucket dir holds exactly the docids hashing to it
    for b in range(4):
        sub = bidx._read_buckets([b])
        assert {r["docid"] % 4 for r in sub.collect()} == {b}


def test_upsert_touches_only_its_buckets(bidx):
    before = _bucket_fingerprints(bidx)
    # docids 5 and 13 both hash to bucket 1; 41 is a fresh insert -> bucket 1
    bidx.upsert([(5, [9.0, 9.0]), (13, [8.0, 8.0]), (41, [7.0, 7.0])])
    after = _bucket_fingerprints(bidx)
    assert after["bucket=1"] != before["bucket=1"]
    for b in ("bucket=0", "bucket=2", "bucket=3"):
        assert after[b] == before[b]  # byte-identical files
    rows = {r["docid"]: list(r["vector"]) for r in bidx.to_df().collect()}
    assert rows[5] == [9.0, 9.0]
    assert rows[41] == [7.0, 7.0]
    assert len(rows) == 41
    assert bidx.offset == 42


def test_delete_touches_only_its_buckets(bidx):
    before = _bucket_fingerprints(bidx)
    bidx.delete([2, 6])  # both bucket 2
    after = _bucket_fingerprints(bidx)
    assert after["bucket=2"] != before["bucket=2"]
    for b in ("bucket=0", "bucket=1", "bucket=3"):
        assert after[b] == before[b]
    got = sorted(r["docid"] for r in bidx.to_df().collect())
    assert got == [i for i in range(40) if i not in (2, 6)]


def test_bucketed_search_and_compact(bidx):
    res = bidx.search([[39.0, 1.0]], limit=3)
    assert res[0][0][0] == 39  # nearest by cosine is itself
    files_before = len(bidx._data_files())
    bidx.compact()
    assert bidx.count() == 40
    assert len(bidx._data_files()) <= files_before
    assert bidx._is_fully_bucketed()


def test_bucketed_survives_reload(spark, tmp_path, bidx):
    """buckets is persisted in meta: a reader that didn't pass the config
    still mutates bucket-scoped."""
    idx2 = VectorIndex(spark, str(tmp_path / "bidx"))
    idx2.load("ignored")
    assert idx2.n_buckets == 4
    assert idx2.offset == 40
    assert idx2._is_fully_bucketed()


# ------------------------------------------------------ exactly-once append


def test_append_stream_batch_replay_is_noop(spark, tmp_path):
    idx = VectorIndex(spark, str(tmp_path / "eidx")).create()
    batch = spark.createDataFrame(
        [([1.0, 0.0],), ([0.0, 1.0],)], "vector array<float>"
    )
    idx.append_stream_batch(batch, stream_key="cp", batch_id=0)
    assert idx.count() == 2
    assert idx.offset == 2
    # replay of the SAME batch id (crash-after-commit restart): no-op
    idx.append_stream_batch(batch, stream_key="cp", batch_id=0)
    assert idx.count() == 2
    assert idx.offset == 2
    # next batch appends densely
    idx.append_stream_batch(batch, stream_key="cp", batch_id=1)
    assert idx.count() == 4
    assert sorted(r["docid"] for r in idx.to_df().collect()) == [0, 1, 2, 3]


def test_append_stream_batch_recovers_unrecorded_commit(spark, tmp_path):
    """Crash window: files published (commit dir renamed) but meta not yet
    saved. Replay must NOT rewrite the files and must re-derive the
    offset from the published docids."""
    idx = VectorIndex(spark, str(tmp_path / "ridx")).create()
    batch = spark.createDataFrame(
        [([1.0, 0.0],), ([0.0, 1.0],), ([1.0, 1.0],)], "vector array<float>"
    )
    idx.append_stream_batch(batch, stream_key="cp", batch_id=0)
    # simulate the crash: roll the meta back to pre-batch state
    idx.stream_state = {}
    idx.offset = 0
    idx._save_meta()
    files_before = sorted(idx._data_files())
    idx2 = VectorIndex(spark, str(tmp_path / "ridx"))
    idx2.load("ignored")
    idx2.append_stream_batch(batch, stream_key="cp", batch_id=0)
    assert sorted(idx2._data_files()) == files_before  # not rewritten
    assert idx2.offset == 3  # recovered from published docids
    assert idx2.stream_state["cp"] == 0
    assert idx2.count() == 3


def test_stream_state_separate_per_stream(spark, tmp_path):
    idx = VectorIndex(spark, str(tmp_path / "sidx")).create()
    b = spark.createDataFrame([([1.0, 2.0],)], "vector array<float>")
    idx.append_stream_batch(b, stream_key="cpA", batch_id=0)
    idx.append_stream_batch(b, stream_key="cpB", batch_id=0)  # distinct stream
    assert idx.count() == 2
    assert idx.stream_state == {"cpA": 0, "cpB": 0}


def test_create_resets_stream_watermarks(spark, tmp_path):
    """Drop-and-recreate must clear per-stream watermarks: a restarted
    stream (fresh checkpoint, batch ids from 0) would otherwise be
    silently skipped against stale state (review finding r2)."""
    idx = VectorIndex(spark, str(tmp_path / "widx")).create()
    b = spark.createDataFrame([([1.0, 2.0],)], "vector array<float>")
    idx.append_stream_batch(b, stream_key="cp", batch_id=5)
    assert idx.stream_state == {"cp": 5}
    idx.create()  # drop and recreate
    assert idx.stream_state == {}
    idx.append_stream_batch(b, stream_key="cp", batch_id=0)
    assert idx.count() == 1  # batch 0 applied, not skipped


def test_stream_commit_dirs_keyed_by_full_key(spark, tmp_path):
    """Two streams whose checkpoint paths share a long suffix must not
    collide on the same commit dir (review finding r2)."""
    idx = VectorIndex(spark, str(tmp_path / "cidx")).create()
    a = spark.createDataFrame([([1.0, 0.0],)], "vector array<float>")
    b = spark.createDataFrame([([0.0, 1.0],), ([1.0, 1.0],)], "vector array<float>")
    shared_tail = "ingest-stream-checkpoint-directory-that-is-long-v1"
    idx.append_stream_batch(a, stream_key=f"/data/tenant1/{shared_tail}", batch_id=0)
    idx.append_stream_batch(b, stream_key=f"/data/tenant2/{shared_tail}", batch_id=0)
    assert idx.count() == 3  # both streams' batches landed
    assert idx.offset == 3


# ------------------------------------------------- crash-safe rewrite swap


def test_bucket_swap_crash_before_rename_rolls_back(spark, tmp_path, bidx):
    """Crash window: bucket moved aside but replacement never renamed in
    (ADVICE r2 — the old rmtree-then-move protocol lost the bucket here).
    Recovery on re-attach must restore the moved-aside bucket."""
    import shutil

    data = bidx._data_path()
    b1 = os.path.join(data, "bucket=1")
    os.replace(b1, os.path.join(data, ".bucket=1.old"))  # dst aside, crash
    # the abandoned replacement lives in data.tmp, as in a real crash
    os.makedirs(data + ".tmp", exist_ok=True)
    idx2 = VectorIndex(spark, str(tmp_path / "bidx"))
    idx2.load("ignored")
    assert os.path.exists(b1)
    assert not os.path.exists(os.path.join(data, ".bucket=1.old"))
    assert not os.path.exists(data + ".tmp")
    assert sorted(r["docid"] for r in idx2.to_df().collect()) == list(range(40))
    shutil.rmtree(data + ".tmp", ignore_errors=True)


def test_bucket_swap_crash_after_rename_drops_old(spark, tmp_path, bidx):
    """Crash window: replacement renamed in but the .old not yet deleted.
    Recovery keeps the new rows and deletes the leftover .old."""
    data = bidx._data_path()
    b2 = os.path.join(data, "bucket=2")
    aside = os.path.join(data, ".bucket=2.old")
    # committed-swap case: bucket=2 (new) and its aside (old) both exist,
    # crash happened before the aside cleanup — recovery drops the aside
    os.makedirs(aside)
    bidx2 = VectorIndex(spark, str(tmp_path / "bidx"))
    bidx2.load("ignored")
    assert os.path.exists(b2) and not os.path.exists(aside)
    assert bidx2.count() == 40


def test_full_swap_crash_before_rename_rolls_back(spark, tmp_path):
    """Flat-layout rewrite: crash after data -> data.old with data.tmp
    still holding the replacement. Recovery restores data from .old."""
    idx = VectorIndex(spark, str(tmp_path / "fidx")).create()
    idx.append([[1.0, 0.0], [0.0, 1.0]])
    data = idx._data_path()
    os.replace(data, data + ".old")
    os.makedirs(data + ".tmp", exist_ok=True)
    idx2 = VectorIndex(spark, str(tmp_path / "fidx"))
    idx2.load("ignored")
    assert os.path.exists(data)
    assert not os.path.exists(data + ".old")
    assert not os.path.exists(data + ".tmp")
    assert idx2.count() == 2


def test_old_dirs_invisible_to_reads_and_mutations(spark, tmp_path, bidx):
    """A not-yet-recovered .old dir must not be scanned or counted as a
    bucket: reads and the bucketed-layout check ignore it."""
    data = bidx._data_path()
    b3 = os.path.join(data, "bucket=3")
    aside = os.path.join(data, ".bucket=3.old")
    import shutil

    shutil.copytree(b3, aside)  # duplicate rows in a mid-swap aside dir
    assert bidx.count() == 40  # aside files not scanned (hidden to Spark)
    assert bidx._is_fully_bucketed()  # aside not treated as a bucket
    shutil.rmtree(aside)
