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


# ------------------------------------------------------ byte-level dedup

_HEX_DIGITS = "0123456789abcdef"


def byte_shingle_table(
    df: DataFrame,
    *,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    k: int = 16,
    sample_hex: int = 4,
) -> DataFrame:
    """Distinct (``__id``, ``__sh``) table of content-defined-sampled
    k-byte windows of a BINARY payload — the shingle layer for
    byte-level media dedup (images/audio/video near-dup BY BYTES,
    before any perceptual hash exists; Broder-style mod-p shingle
    sampling, public sketching literature).

    Every k-byte window (stride 1) is considered; a window is KEPT iff
    the last hex digit of md5(hex(window)) falls in the first
    ``sample_hex`` digits — selection depends on window CONTENT only,
    so two payloads sharing a byte run sample the SAME windows
    regardless of byte offset (a positional stride would misalign
    after any insertion). Fraction kept = sample_hex/16. md5-of-hex
    (not of raw bytes) because the DuckDB oracle can only slice/hash
    the hex image of a blob — both engines hash the identical string.

    Kept windows are hashed to int64 (xxhash64 over the raw bytes) for
    8-byte shuffle keys — same collision stance as
    ``operators.dedup.jaccard_pairs``. NULL ids/payloads and payloads
    shorter than k are excluded (an unkeyed or sub-window payload can
    never pair). One explode + filter (map-side, ~1/4 of windows
    survive) and one distinct shuffle on the sampled rows.
    """
    if int(k) < 1:
        # k=0 would reduce every payload to identical empty windows —
        # all pairs jaccard 1.0, a dedup pass deleting the whole corpus
        raise ValueError(f"byte_shingle_table: k {k} must be >= 1")
    if not 1 <= int(sample_hex) <= 16:
        raise ValueError(f"byte_shingle_table: sample_hex {sample_hex} "
                         "must be in 1..16")
    from weaviate_txtai_spark.sources.tables import spread

    base = spread(
        df.filter(
            F.col(id_col).isNotNull()
            & F.col(payload_col).isNotNull()
            & (F.length(payload_col) >= k)
        )
    ).select(F.col(id_col).alias("__id"), F.col(payload_col).alias("__pl"))
    win = F.col("__pl").substr(F.col("__p"), F.lit(k))
    keep = list(_HEX_DIGITS[: int(sample_hex)])
    return (
        base.select(
            "__id",
            "__pl",
            F.explode(
                F.sequence(F.lit(1), F.length("__pl") - F.lit(k - 1))
            ).alias("__p"),
        )
        .select("__id", win.alias("__w"))
        .filter(F.substring(F.md5(F.hex("__w")), 32, 1).isin(keep))
        .select("__id", F.xxhash64("__w").alias("__sh"))
        .distinct()
    )


def binary_jaccard_pairs(
    df: DataFrame,
    *,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    k: int = 16,
    threshold: float = 0.8,
    sample_hex: int = 4,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """All payload pairs with byte-shingle Jaccard >= threshold (exact
    over the content-defined-sampled window universe) — the
    specification twin of :func:`binary_dup_pairs`, same
    inverted-index join shape as ``operators.dedup.jaccard_pairs``.

    ``max_doc_freq`` (opt-in, same contract as ``jaccard_pairs``):
    media corpora GUARANTEE hot shingles — every JPEG/PNG/MP4 shares
    its format's magic-byte header, so a header window appears in the
    whole corpus and alone contributes O(n²) candidate pairs. Capping
    document frequency drops exactly those keys; Jaccard is then
    computed consistently over the capped universe (sizes AND commons
    both exclude capped windows). Near-dups still share plenty of
    content windows; format headers carry zero dedup signal anyway.
    The LSH path (:func:`binary_dup_pairs`) is structurally immune —
    a hot window is one of many signature positions and banding never
    joins on a single shingle.

    Output: d1, d2 (d1 < d2), jaccard rounded to 6dp."""
    from weaviate_txtai_spark.cache import scoped_persist

    # eager (both): multi-consumer fan-outs race a lazy fill (r14 opt)
    sh = scoped_persist(
        byte_shingle_table(
            df, payload_col=payload_col, id_col=id_col, k=k,
            sample_hex=sample_hex,
        ),
        eager=True,
    )
    if max_doc_freq is not None:
        dfc = sh.groupBy("__sh").agg(F.count(F.lit(1)).alias("__df"))
        sh = scoped_persist(
            sh.join(
                dfc.filter(F.col("__df") <= int(max_doc_freq)), "__sh"
            ).select("__id", "__sh"),
            eager=True,
        )
    sizes = sh.groupBy("__id").agg(F.count(F.lit(1)).alias("__sz"))
    shz = sh.join(F.broadcast(sizes), "__id")
    a, b = shz.alias("a"), shz.alias("b")
    t = F.lit(threshold)
    common = (
        a.join(
            b,
            (F.col("a.__sh") == F.col("b.__sh"))
            & (F.col("a.__id") < F.col("b.__id"))
            & (F.col("a.__sz") >= t * F.col("b.__sz"))
            & (F.col("b.__sz") >= t * F.col("a.__sz")),
        )
        .groupBy(F.col("a.__id").alias("d1"), F.col("b.__id").alias("d2"))
        .agg(
            F.count(F.lit(1)).alias("__common"),
            F.first(F.col("a.__sz")).alias("__sz1"),
            F.first(F.col("b.__sz")).alias("__sz2"),
        )
    )
    jac = F.col("__common") / (
        F.col("__sz1") + F.col("__sz2") - F.col("__common")
    )
    return (
        common.withColumn("jaccard", F.round(jac, 6))
        .filter(F.col("jaccard") >= threshold)
        .select("d1", "d2", "jaccard")
    )


def binary_dup_pairs(
    df: DataFrame,
    *,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    k: int = 16,
    threshold: float = 0.8,
    num_perms: int = 64,
    bands: int = 16,
    sample_hex: int = 4,
) -> DataFrame:
    """Byte-level near-dup pairs via MinHash-LSH banding over sampled
    k-byte windows, verified with exact (sampled-universe) Jaccard —
    the SCALE path: shuffle is O(payloads x bands) bucket rows plus
    the verify join on candidates only, reusing
    ``operators.dedup.minhash_lsh_pairs``'s banding + pair-granularity
    array_intersect verify wholesale via its ``signatures`` seam.
    Output: d1, d2, jaccard — equal to :func:`binary_jaccard_pairs` up
    to LSH recall (pytest pins equality on the fixture corpus)."""
    from weaviate_txtai_spark.cache import scoped_persist
    from weaviate_txtai_spark.operators.dedup import (
        minhash_lsh_pairs,
        signatures_from_hashed_shingles,
    )

    sh = byte_shingle_table(
        df, payload_col=payload_col, id_col=id_col, k=k,
        sample_hex=sample_hex,
    )
    # eager: feeds the banding self-join sides + the verify join (r14)
    per_doc = scoped_persist(
        signatures_from_hashed_shingles(sh, num_perms=num_perms),
        eager=True,
    )
    return minhash_lsh_pairs(
        df,
        threshold=threshold,
        num_perms=num_perms,
        bands=bands,
        signatures=per_doc,
    )
