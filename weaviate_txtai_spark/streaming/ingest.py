"""Streaming ingest into a VectorIndex (SURVEY §7 M4).

The reference ingests via HTTP batches into Weaviate
(weaviate_txtai/ann/weaviate.py:132-149); the streaming-native Spark
form is: text stream → Arrow-batched encode → ``foreachBatch`` append
into the index's parquet directory.

Why ``foreachBatch`` and not a direct parquet sink: docids must stay
**dense and monotonic across the whole index** (reference offset
semantics, weaviate.py:67,149). A direct ``writeStream.parquet`` could
write rows but not coordinate the running offset; ``foreachBatch``
hands each micro-batch to ``VectorIndex.append``, which assigns
``row_number() + offset`` and commits the new offset to the sidecar
after the files land — exactly-once bookkeeping per micro-batch under
the default at-least-once file sink semantics (re-run batches would
re-append; the checkpoint prevents replay on restart).

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
    plan itself stays stateless.
    """
    enc = encoder or HashingEncoder()

    def sink(batch_df: DataFrame, _batch_id: int) -> None:
        if not batch_df.isEmpty():
            index.append(enc.encode_df(batch_df, text_col=text_col))

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
    row per docid when a ``ts`` column exists, else an arbitrary single
    row (dropDuplicates) — the deterministic variant a real CDC feed
    gets from its log sequence number. Batches apply in order, so
    cross-batch last-writer-wins follows from per-batch application.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    def sink(batch_df: DataFrame, _batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        if "ts" in batch_df.columns:
            w = Window.partitionBy(docid_col).orderBy(F.desc("ts"))
            batch_df = (
                batch_df.withColumn("__rn", F.row_number().over(w))
                .filter(F.col("__rn") == 1)
                .drop("__rn")
            )
        else:
            batch_df = batch_df.dropDuplicates([docid_col])
        items = [
            (r[docid_col], list(r[vector_col])) for r in batch_df.collect()
        ]
        index.upsert(items)

    writer = stream_df.writeStream.foreachBatch(sink).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
