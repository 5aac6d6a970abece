"""Streaming ingest into a VectorIndex (SURVEY §7 M4).

The reference ingests via HTTP batches into Weaviate
(weaviate_txtai/ann/weaviate.py:132-149); the streaming-native Spark
form is: text stream → Arrow-batched encode → ``foreachBatch`` append
into the index's parquet directory.

Why ``foreachBatch`` and not a direct parquet sink: docids must stay
**dense and monotonic across the whole index** (reference offset
semantics, weaviate.py:67,149). A direct ``writeStream.parquet`` could
write rows but not coordinate the running offset; ``foreachBatch``
hands each micro-batch to the index, which assigns dense docids from
the persisted offset (parallel two-pass scheme, ``operators/ids``).

Delivery semantics: ``foreachBatch`` alone is at-least-once — a crash
after the write but before the streaming checkpoint commits re-runs the
micro-batch on restart. Both sinks here are **exactly-once at batch
granularity** (ADVICE r1):

- ``stream_ingest`` routes through ``VectorIndex.append_stream_batch``,
  whose stage-dir → atomic-rename → meta-commit protocol makes a
  replayed ``batch_id`` a no-op (already-applied batches are detected by
  the persisted per-stream watermark or the already-published commit
  dir; docids never double-advance).
- ``stream_upsert`` skips batches at-or-below the persisted watermark;
  the residual crash window (merge applied, watermark not yet saved)
  re-applies the SAME merge, which is idempotent by value — upsert is a
  deterministic function of (index state, batch), so state converges.

``trigger(availableNow=True)`` drains the backlog and stops — the
batch/stream parity mode used by all streaming tests here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from weaviate_txtai_spark.functions.encoders import HashingEncoder
from weaviate_txtai_spark.index import VectorIndex


def stream_ingest(
    stream_df: DataFrame,
    index: VectorIndex,
    *,
    text_col: str = "text",
    encoder: HashingEncoder | None = None,
    checkpoint: str,
    available_now: bool = True,
) -> StreamingQuery:
    """Encode ``stream_df[text_col]`` and append into ``index``.

    Returns the started StreamingQuery; call ``awaitTermination()`` for
    availableNow drains. The encode runs inside each micro-batch (an
    Arrow-batched pandas UDF — map-only, no state), so the streaming
    plan itself stays stateless. Replayed micro-batches after a crash
    are skipped by the index's commit protocol (exactly-once).
    """
    enc = encoder or HashingEncoder()

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.isEmpty():
            index.append_stream_batch(
                enc.encode_df(batch_df, text_col=text_col),
                stream_key=checkpoint,
                batch_id=batch_id,
            )

    writer = stream_df.writeStream.foreachBatch(sink).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_upsert(
    stream_df: DataFrame,
    index: VectorIndex,
    *,
    docid_col: str = "docid",
    vector_col: str = "vector",
    checkpoint: str,
    available_now: bool = True,
) -> StreamingQuery:
    """CDC-style streaming merge: each micro-batch of (docid, vector)
    changes is MERGEd into the index (replace matching docids, insert
    new ones) via ``VectorIndex.upsert``.

    Within a micro-batch the same docid may appear multiple times (rapid
    updates); last-writer-wins is enforced by keeping the max-``ts``
    row per docid when a ``ts`` column exists, with the VECTOR as the
    tie key for equal-``ts`` duplicates (content-deterministic — never
    the physical row order; a real CDC feed avoids ties entirely via
    its log sequence number). Without a ``ts`` column, an arbitrary
    single row survives (dropDuplicates). Batches apply in order, so
    cross-batch last-writer-wins follows from per-batch application.

    Cost bound at scale: create the index with ``weaviate.buckets: N``
    and each micro-batch rewrites ONLY the buckets its docids hash into
    — O(index/N × distinct touched buckets), not O(index) (VERDICT r1
    item 2). Caveat: ``stream_ingest``'s flat commit dirs break the
    canonical bucket layout, so an index receiving BOTH streaming
    appends and CDC upserts degrades to full (atomic) rewrites until
    ``compact()`` folds the layout back — run the two pipelines on
    separate indexes or schedule compaction between them. Replayed
    batches are skipped via the persisted per-stream watermark; a
    replay that races the watermark save re-applies an idempotent merge
    (see module docstring).
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        index._load_meta()  # refresh watermark across restarts
        if int(batch_id) <= int(index.stream_state.get(checkpoint, -1)):
            return
        if batch_df.isEmpty():
            pass
        else:
            if "ts" in batch_df.columns:
                # vector tiebreak (r13 window-order census): two updates
                # to the same docid at the SAME ts would otherwise pick a
                # winner by physical row order — undefined after a
                # shuffle. Arrays are orderable, so the pick depends only
                # on content (greatest vector wins; any fixed rule works,
                # it just must not be the partitioning)
                w = Window.partitionBy(docid_col).orderBy(
                    F.desc("ts"), F.desc(vector_col)
                )
                batch_df = (
                    batch_df.withColumn("__rn", F.row_number().over(w))
                    .filter(F.col("__rn") == 1)
                    .drop("__rn")
                )
            else:
                batch_df = batch_df.dropDuplicates([docid_col])
            # distributed merge: the micro-batch never lands on the
            # driver — a multi-million-row CDC batch would OOM a
            # collect()-based sink
            index.upsert_df(
                batch_df, docid_col=docid_col, vector_col=vector_col
            )
        index.stream_state[checkpoint] = int(batch_id)
        index._save_meta()

    writer = stream_df.writeStream.foreachBatch(sink).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
