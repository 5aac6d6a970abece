"""Multimodal columns: opaque binary payloads + typed metadata (M3.4).

Reference parity: txtai stores binary ``object`` payloads next to vectors
(examples/01_simple.ipynb cell 29 — an image fetched back via
``select object from txtai where similar(...)``); Weaviate's blob dataType.
Spark-side the payload is a ``BinaryType`` column with a metadata struct,
and media ops run as Arrow-batched ``mapInPandas`` so bytes never cross
the JVM↔Python boundary row-at-a-time.

The container has no image/audio codecs, so DECODING IS STUBBED:
``decode_image`` raises NotImplementedError unless ``fake=True``, in which
case a deterministic fake decode (bytes → seeded pixel stats) exercises
the real plumbing — schema, partitioning, UDF signature, Arrow batch
shape — which is the part that matters for the Spark design.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

PAYLOAD_META_SCHEMA = StructType(
    [
        StructField("media_type", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        # long: a >2 GiB payload overflows int, an ANSI job kill
        StructField("n_bytes", LongType()),
    ]
)


def _id_sql_type(df: DataFrame, id_col: str) -> str:
    """The id column's OWN sql type for mapInPandas output schemas — a
    hardcoded `long` corrupts (or crashes Arrow conversion for) string
    or uuid document ids; same dtype-generic stance as coreset/MMR."""
    return df.schema[id_col].dataType.simpleString()


def attach_fake_payload(
    docs: DataFrame, *, text_col: str = "text", media_type: str = "image/png"
) -> DataFrame:
    """Attach a deterministic fake binary payload derived from the text
    (sha256 bytes repeated) + typed metadata. Stands in for reading real
    media files into a BinaryType column (spark.read.format('binaryFile')
    in production)."""
    payload = F.sha2(F.col(text_col), 256).cast("binary")
    return docs.withColumn("payload", payload).withColumn(
        "payload_meta",
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.lit(8).alias("width"),
            F.lit(8).alias("height"),
            F.length(payload).cast("long").alias("n_bytes"),
        ),
    )


def decode_image(payload: bytes, *, fake: bool = False):
    """Decode an image payload to a pixel array.

    STUB: real decoding needs an image codec (Pillow/opencv — not in this
    container). ``fake=True`` returns a deterministic 8x8 'pixel' array
    derived from the payload bytes, preserving the exact call shape a real
    decoder would have."""
    if not fake:
        raise NotImplementedError(
            "image decoding requires a codec library; pass fake=True for the "
            "deterministic test double"
        )
    h = hashlib.sha256(payload or b"").digest()
    # 64 deterministic pseudo-pixels in [0, 255]
    return [h[i % len(h)] for i in range(64)]


def resize_images(
    df: DataFrame,
    *,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    width: int = 4,
    height: int = 4,
) -> DataFrame:
    """Batch image resize over Arrow batches (decode stubbed).

    Real pipeline shape: decode → resample → re-encode per payload, all
    inside one mapInPandas pass so pixels stay in the Python worker and
    only the (smaller) output bytes return through Arrow. The fake
    decoder stands in for the codec; the resample is a real block-mean
    over the fake 8x8 pixel grid, so output values are deterministic
    and size-reduction is observable in tests."""

    if width <= 0 or height <= 0 or 8 % width or 8 % height:
        raise ValueError(
            f"resize_images: width/height must divide the 8x8 source grid "
            f"(got {width}x{height}) — the fake decode is block-mean only"
        )

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out = []
            for payload in pdf[payload_col]:
                px = np.asarray(
                    decode_image(bytes(payload or b""), fake=True),
                    dtype=np.float64,
                ).reshape(8, 8)
                bh, bw = 8 // height, 8 // width
                small = px.reshape(height, bh, width, bw).mean(axis=(1, 3))
                out.append(small.astype(np.uint8).tobytes())
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "resized": out,
                    "width": width,
                    "height": height,
                }
            )

    from weaviate_txtai_spark.sources.tables import spread

    return spread(df.select(id_col, payload_col)).mapInPandas(
        compute,
        schema=f"{id_col} {_id_sql_type(df, id_col)}, "
        "resized binary, width int, height int",
    )


def sample_frames(
    df: DataFrame,
    *,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    n_frames: int = 4,
) -> DataFrame:
    """Frame sampling for video payloads (decode stubbed): one output row
    per sampled frame — the standard explode shape for frame-level
    downstream ops (captioning, embedding, dedup).

    The fake 'video' treats the payload as a byte stream and samples
    n_frames evenly-spaced 8-byte windows as 'frames'; a real
    implementation swaps the window slicing for a demuxer keyframe read,
    keeping schema (id, frame_idx, frame) and batch shape identical."""
    if n_frames < 1:
        # range(n_frames) over a non-positive count would silently emit
        # ZERO frames for every payload instead of failing the call
        raise ValueError(f"sample_frames: n_frames must be >= 1, got {n_frames}")

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for rid, payload in zip(pdf[id_col], pdf[payload_col]):
                data = bytes(payload or b"")
                if not data:
                    continue
                step = max(len(data) // n_frames, 1)
                for i in range(n_frames):
                    lo = min(i * step, max(len(data) - 8, 0))
                    ids.append(rid)
                    idxs.append(i)
                    frames.append(data[lo : lo + 8])
            yield pd.DataFrame(
                {id_col: ids, "frame_idx": idxs, "frame": frames}
            )

    from weaviate_txtai_spark.sources.tables import spread

    return spread(df.select(id_col, payload_col)).mapInPandas(
        compute,
        schema=f"{id_col} {_id_sql_type(df, id_col)}, "
        "frame_idx int, frame binary",
    )


def extract_features(
    df: DataFrame, *, payload_col: str = "payload", id_col: str = "doc_id",
    dim: int = 8
) -> DataFrame:
    """Per-payload feature vector via Arrow-batched mapInPandas.

    The 'feature extractor' is the fake decoder + a byte histogram —
    deterministic, so tests can assert exact values. Swap the body for a
    real model (CLIP etc.) without touching the Spark plumbing: same
    schema, same batch shape, same partitioning.
    """

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            feats = []
            for payload in pdf[payload_col]:
                pixels = np.asarray(
                    decode_image(bytes(payload or b""), fake=True), dtype=np.float64
                )
                hist, _ = np.histogram(pixels, bins=dim, range=(0, 256))
                norm = np.linalg.norm(hist)
                feats.append((hist / (norm or 1.0)).tolist())
            yield pd.DataFrame(
                {id_col: pdf[id_col], "features": feats}
            )

    from weaviate_txtai_spark.sources.tables import spread

    return spread(df.select(id_col, payload_col)).mapInPandas(
        compute,
        schema=f"{id_col} {_id_sql_type(df, id_col)}, features array<double>",
    )
