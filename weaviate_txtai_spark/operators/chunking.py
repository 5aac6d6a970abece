"""Document chunking & sequence packing for LLM training-data pipelines.

The reference stores whole documents (one Weaviate object per txtai row,
`/root/reference/weaviate_txtai/ann/weaviate.py:140-147`); a training
pipeline additionally needs to cut corpora into model-window-sized
pieces and pack short pieces together. Both operators here are pure
native column expressions (no Python row path) and deterministic, so
they are DuckDB-oracle-able:

- ``chunk_docs``: overlapping fixed-size character windows via
  explode(sequence(...)) + substring — map-only, no shuffle at all; at
  100 TB it parallelizes with the scan and the output partitioning
  inherits the input's.
- ``pack_sequences``: concat-then-split style packing — docs ordered by
  id within a source, running token count, pack = cumsum div budget.
  One shuffle (window partitioned by source). This is the standard
  deterministic approximation of bin packing used for pretraining
  batches: no pack exceeds budget + max_doc_tokens, and every pack
  except the last is at least budget-full in the cumulative stream.
  Skew note: partitioning by source means one giant source serializes
  into one task; at scale, salt the window key with a coarse
  date/shard column and renumber packs by (salt, pack) afterwards.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from weaviate_txtai_spark.functions.text import token_count


def chunk_docs(
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    size: int = 200,
    stride: int = 100,
) -> DataFrame:
    """Overlapping character-window chunks: starts at 0, stride, 2·stride,
    … while the start lies inside the text; last chunks may be short.
    Empty documents yield one empty chunk (start 0) — keeps the operator
    total, callers filter on chunk_len if they want them gone."""
    starts = F.sequence(
        F.lit(0),
        F.greatest(F.length(text_col) - 1, F.lit(0)),
        F.lit(stride),
    )
    return docs.select(
        F.col(id_col),
        F.posexplode(starts).alias("chunk_id", "__start"),
        F.col(text_col),
    ).select(
        id_col,
        "chunk_id",
        F.substring(F.col(text_col), F.col("__start") + 1, size).alias("chunk_text"),
    ).withColumn("chunk_len", F.length("chunk_text"))


def pack_sequences(
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    group_col: str = "source",
    budget: int = 512,
) -> DataFrame:
    """Assign each doc to a pack: docs stream through a group in id
    order; a doc opens a new pack when the tokens already streamed
    (exclusive prefix sum) cross a multiple of the budget."""
    toks = token_count(text_col)
    w = (
        Window.partitionBy(group_col)
        .orderBy(F.asc(id_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before: Column = F.coalesce(F.sum("__toks").over(w), F.lit(0))
    return (
        docs.select(group_col, id_col, toks.alias("__toks"))
        .withColumn("pack_id", F.floor(cum_before / budget))
        .select(
            group_col,
            F.col(id_col),
            F.col("__toks").alias("n_tokens"),
            "pack_id",
        )
    )
