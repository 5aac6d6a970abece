"""Structured Streaming + multimodal gates (batch-equivalent oracles where SQL-expressible).

Split out of plans/queries.py (round 4); registration order inside a module is
unchanged, and queries.py remains the single registry hub.
"""

from __future__ import annotations

import math
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from weaviate_txtai_spark.functions.vector import cosine_sim
from weaviate_txtai_spark.sources.tables import load_table
from weaviate_txtai_spark.plans.base import QueryFn, _emb, register
from weaviate_txtai_spark.plans.relational import _EVENTS_HOURLY_SQL
from weaviate_txtai_spark.plans.dedup import _JACCARD_CTE

# --------------------------------------------------------------------------
# Streaming (M4) + multimodal (M3.4)
# --------------------------------------------------------------------------


@register("streaming_hourly", _EVENTS_HOURLY_SQL)
def streaming_hourly_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured Streaming tumbling-window agg (availableNow) — same
    oracle as the batch query: streaming correctness IS batch
    equivalence for a static source."""
    from weaviate_txtai_spark.streaming.events import run_hourly_available_now

    return run_hourly_available_now(spark, sf_dir, table_name="hourly_stream_gate")


_STREAM_INGEST_SQL = """
SELECT CAST(row_number() OVER (ORDER BY doc_id) - 1 AS BIGINT) AS docid
FROM documents
ORDER BY docid
"""


@register("streaming_ingest", _STREAM_INGEST_SQL)
def streaming_ingest_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming ingest into a VectorIndex (M4): file stream over the
    documents table → Arrow-batched encode → foreachBatch append with
    running-offset docids. The oracle checks the ingest invariant the
    reference enforces with its offset counter (weaviate.py:67,149):
    docids come out dense 0..N-1 regardless of micro-batch boundaries."""
    import os
    import tempfile

    from weaviate_txtai_spark.index import VectorIndex
    from weaviate_txtai_spark.streaming.ingest import stream_ingest

    schema = spark.read.parquet(
        os.path.join(sf_dir, "documents.parquet")
    ).schema
    work = tempfile.mkdtemp(prefix="wts_stream_ingest_")
    idx = VectorIndex(spark, os.path.join(work, "idx")).create()
    stream = spark.readStream.schema(schema).parquet(
        os.path.join(sf_dir, "documents.parque*")
    )
    q = stream_ingest(stream, idx, checkpoint=os.path.join(work, "cp"))
    # bounded wait: an availableNow drain of one file finishes in seconds;
    # never hang the driver harness if the stream wedges
    q.awaitTermination(600)
    q.stop()
    return idx.to_df().select("docid").orderBy("docid")


_STREAM_SESSIONS_SQL = """
WITH wm AS (
  SELECT (CAST(floor(epoch_us(max(ts)) / 1000) AS BIGINT) - 3600000) * 1000
           AS wm_us
  FROM events),
e AS (SELECT user_id, epoch_us(ts) AS us FROM events),
g AS (
  SELECT user_id, us,
         CASE WHEN lag(us) OVER w IS NULL
                OR us - lag(us) OVER w > 1800000000 THEN 1 ELSE 0 END AS brk
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us)),
s AS (
  SELECT user_id, us,
         sum(brk) OVER (PARTITION BY user_id ORDER BY us
                        ROWS UNBOUNDED PRECEDING) AS sid
  FROM g),
sess AS (
  SELECT user_id, min(us) AS start_us, max(us) AS end_us,
         CAST(count(*) AS BIGINT) AS n_events
  FROM s GROUP BY user_id, sid)
SELECT user_id, CAST(start_us // 1000000 AS BIGINT) AS start_s,
       CAST(end_us // 1000000 AS BIGINT) AS end_s, n_events
FROM sess, wm WHERE end_us + 1800000000 < wm.wm_us
"""


@register("streaming_sessions", _STREAM_SESSIONS_SQL)
def streaming_sessions_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful operator (applyInPandasWithState session windows),
    hash-oracled via availableNow batch replay — the streaming_monitor
    pattern: every event arrives in the single data micro-batch while
    the watermark is still 0 (nothing dropped), so the final emitted set
    is exactly the batch sessionization (gaps-and-islands in the oracle)
    restricted to watermark-SEALED sessions: end + gap < max(ts) − 1 h
    (ms-floored, matching getCurrentWatermarkMs). The ms-truncated
    timeout registration and the µs seal condition provably agree at
    boundaries (end_us+gap_us < wm_ms·1000 ⇔ end_ms+gap_ms+1 ≤ wm_ms).
    Equivalence to the batch lag-gap spec is also asserted in
    tests/test_sessions.py."""
    from weaviate_txtai_spark.streaming.events import stream_events
    from weaviate_txtai_spark.streaming.sessions import sessionize_stream

    out = sessionize_stream(stream_events(spark, sf_dir))
    q = (
        out.writeStream.format("memory")
        .queryName("sessions_stream_gate")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table("sessions_stream_gate").select(
        "user_id",
        F.col("session_start").cast("long").alias("start_s"),
        F.col("session_end").cast("long").alias("end_s"),
        "n_events",
    )


_MULTIMODAL_SQL = """
WITH h AS (
  SELECT doc_id, sha256(coalesce(sha256(text), '')) AS d FROM documents),
b AS (
  SELECT doc_id,
         (strpos('0123456789abcdef', substr(d, 2 * s.i - 1, 1)) - 1) * 16
         + (strpos('0123456789abcdef', substr(d, 2 * s.i, 1)) - 1) AS byte
  FROM h, unnest(generate_series(1, 32)) AS s(i)),
c AS (
  SELECT doc_id, CAST(byte // 32 AS INTEGER) AS bin, count(*) AS c
  FROM b GROUP BY 1, 2)
SELECT doc_id,
       round(coalesce(sum(CASE WHEN bin = 0 THEN c END), 0)
             / sqrt(sum(c * c)), 6) AS f0,
       8 AS dim
FROM c GROUP BY doc_id
"""


@register("multimodal_features", _MULTIMODAL_SQL)
def multimodal_features_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload -> Arrow-batched feature extraction; deterministic
    fake decoder (no codecs in container), real Spark plumbing.

    Hash-oracled: the fake payload is the 64-char hex of sha2(text), the
    fake decode is sha256(payload) bytes tiled to 64 'pixels' (each of
    the 32 digest bytes appears exactly TWICE), and the feature is the
    L2-normalized 8-bin byte histogram — so the ×2 cancels and
    f0 = c₀/√Σc², which the oracle rebuilds from hex-nibble parsing in
    plain SQL. A real codec would re-open the rows-only gap; the
    PLUMBING contract (schema, Arrow batching, partition spread) is
    what the gate pins."""
    from weaviate_txtai_spark.multimodal.binary import (
        attach_fake_payload,
        extract_features,
    )

    docs = load_table(spark, sf_dir, "documents")
    feats = extract_features(attach_fake_payload(docs))
    return feats.select(
        "doc_id",
        F.round(F.element_at("features", 1), 6).alias("f0"),
        F.size("features").alias("dim"),
    )


_STREAM_INTERVAL_JOIN_SQL = """
WITH e AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'error')
SELECT e.event_id, e.user_id,
       CAST(count(*) AS BIGINT) AS n_follow,
       round(sum(r.value), 4) AS sum_follow
FROM e JOIN events r
  ON r.user_id = e.user_id
 AND epoch_us(r.ts) > epoch_us(e.ts)
 AND epoch_us(r.ts) <= epoch_us(e.ts) + 600000000
GROUP BY e.event_id, e.user_id
ORDER BY e.event_id
"""


@register("streaming_interval_join", _STREAM_INTERVAL_JOIN_SQL)
def streaming_interval_join_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked stream-stream self-join (streaming/joins.py) drained
    with availableNow, aggregated batch-side — must equal the static
    inequality join (streaming correctness = batch equivalence). Inner
    join, so zero-follower errors drop (unlike events_range_join)."""
    from weaviate_txtai_spark.streaming.joins import run_error_follow_join

    pairs = run_error_follow_join(
        spark, sf_dir, table_name="interval_join_gate"
    )
    return (
        pairs.groupBy("event_id", "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_follow"),
            F.round(F.sum("r_value"), 4).alias("sum_follow"),
        )
        .orderBy("event_id")
    )


_STREAM_DEDUP_SQL = """
SELECT event_type, CAST(count(*) AS BIGINT) AS n_distinct_users
FROM (SELECT DISTINCT user_id, event_type FROM events)
GROUP BY 1 ORDER BY 1
"""


@register("streaming_dedup", _STREAM_DEDUP_SQL)
def streaming_dedup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact dedup: dropDuplicates over the event stream
    (availableNow) must emit exactly the batch DISTINCT pairs — the
    post-aggregation runs batch-side on the materialized sink. See
    streaming/dedup.py for the state-size / watermark tradeoff."""
    from weaviate_txtai_spark.streaming.dedup import stream_distinct_pairs

    pairs = stream_distinct_pairs(spark, sf_dir, table_name="dedup_stream_gate")
    return (
        pairs.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_distinct_users"))
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# Streaming near-dup dedup (continuous-ingest incremental MinHash)
# --------------------------------------------------------------------------

# Oracle replays the two-micro-batch semantics in SQL over the EXACT
# jaccard pair set (LSH recall == exact at the testdata dup rate — the
# same equivalence the dedup_minhash gate rests on): batch 1 = even
# ids, batch 2 = odd ids; within a batch the lower-id member of a pair
# survives; batch-2 docs also drop against batch-1 SURVIVORS (not
# batch-1 dropped docs — the store only ever holds survivors).
_STREAM_NEAR_DEDUP_SQL = (
    _JACCARD_CTE
    + """
, p08 AS (
  SELECT d1, d2 FROM pairs WHERE jaccard >= 0.8
), s1 AS (
  SELECT doc_id FROM documents WHERE doc_id % 2 = 0 AND doc_id NOT IN (
    SELECT d2 FROM p08 WHERE d1 % 2 = 0 AND d2 % 2 = 0)
), odd_drop AS (
  SELECT d2 AS doc_id FROM p08 WHERE d1 % 2 = 1 AND d2 % 2 = 1
  UNION
  SELECT CASE WHEN d1 % 2 = 1 THEN d1 ELSE d2 END AS doc_id
  FROM p08
  WHERE (d1 % 2) <> (d2 % 2)
    AND (CASE WHEN d1 % 2 = 0 THEN d1 ELSE d2 END) IN (SELECT doc_id FROM s1)
)
SELECT doc_id, source FROM documents
WHERE (doc_id % 2 = 0 AND doc_id IN (SELECT doc_id FROM s1))
   OR (doc_id % 2 = 1 AND doc_id NOT IN (SELECT doc_id FROM odd_drop))
ORDER BY doc_id
"""
)


@register("streaming_near_dedup", _STREAM_NEAR_DEDUP_SQL)
def streaming_near_dedup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous-ingest NEAR-dup dedup: a real two-micro-batch stream
    (maxFilesPerTrigger=1, mtime-ordered files) through
    streaming.dedup.stream_near_dedup — in-batch MinHash dedup, then a
    bipartite LSH join against the survivor signature store (prior
    batch text is never re-read). The oracle replays the sequential
    semantics over the exact pair set."""
    import os
    import tempfile
    import time

    from weaviate_txtai_spark.streaming.dedup import stream_near_dedup

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text", "source")
    tmp = tempfile.mkdtemp(prefix="snd_gate_")
    src = os.path.join(tmp, "src")
    docs.filter(F.col("doc_id") % 2 == 0).coalesce(1).write.parquet(
        os.path.join(src, "a")
    )
    docs.filter(F.col("doc_id") % 2 == 1).coalesce(1).write.parquet(
        os.path.join(src, "b")
    )
    now = time.time()
    for sub, age in (("a", 200), ("b", 100)):
        for dirpath, _, files in os.walk(os.path.join(src, sub)):
            for fn in files:
                os.utime(os.path.join(dirpath, fn), (now - age, now - age))
    stream = (
        spark.readStream.schema("doc_id long, text string, source string")
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(src, "*"))
    )
    q = stream_near_dedup(
        stream,
        store_dir=os.path.join(tmp, "store"),
        out_dir=os.path.join(tmp, "out"),
        checkpoint_dir=os.path.join(tmp, "ckpt"),
        threshold=0.8,
    )
    q.awaitTermination()
    return (
        spark.read.parquet(os.path.join(tmp, "out"))
        .select("doc_id", "source")
        .orderBy("doc_id")
    )


_STREAM_ENRICH_SQL = """
SELECT c.c_mktsegment, e.event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       round(sum(e.value), 4) AS sum_value
FROM events e JOIN customer c ON e.user_id = c.c_custkey
GROUP BY 1, 2 ORDER BY 1, 2
"""


@register("streaming_enrich", _STREAM_ENRICH_SQL)
def streaming_enrich_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static join (the one streaming join shape the suite didn't
    gate): events stream enriched with the broadcast customer dim and
    rolled up per (segment, event type). No state store, no watermark —
    the dim re-resolves per micro-batch; availableNow over the fixed
    file must equal the batch join, which is exactly the oracle."""
    from weaviate_txtai_spark.streaming.joins import run_segment_rollup

    return run_segment_rollup(spark, sf_dir).orderBy(
        "c_mktsegment", "event_type"
    )


# Oracle: the literal per-event EWMA+CUSUM recursion (recursive CTE)
# over the watermark-sealed prefix — Spark's event-time watermark is
# max event-time TRUNCATED TO MILLIS minus the delay, reproduced
# exactly below. Sealing order ties break by (ts, value) in both
# engines. 1−α is written 0.7 because double(1−0.3) == double(0.7).
_STREAM_MONITOR_SQL = """
WITH RECURSIVE wm AS (
  SELECT (CAST(floor(epoch_us(max(ts)) / 1000) AS BIGINT) - 3600000) * 1000
           AS wm_us
  FROM events),
e AS (
  SELECT event_type AS key, ts, value AS x,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY ts, value) AS rn
  FROM events, wm WHERE epoch_us(ts) < wm.wm_us),
r AS (
  SELECT key, ts, x, rn, x AS ew,
         greatest(0, x - 100 - 2) AS sp,
         greatest(0, -(x - 100 + 2)) AS sn
  FROM e WHERE rn = 1
  UNION ALL
  SELECT e.key, e.ts, e.x, e.rn,
         0.3 * e.x + 0.7 * r.ew,
         greatest(0, r.sp + (e.x - 100 - 2)),
         greatest(0, r.sn - (e.x - 100 + 2))
  FROM r JOIN e ON e.key = r.key AND e.rn = r.rn + 1)
SELECT key, ts, x, round(ew, 6) AS ewma,
       round(sp, 6) AS s_pos, round(sn, 6) AS s_neg,
       (round(sp, 6) > 50 OR round(sn, 6) > 50) AS alarm
FROM r ORDER BY key, ts, x
"""


@register("streaming_monitor", _STREAM_MONITOR_SQL)
def streaming_monitor_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming per-key EWMA+CUSUM monitor
    (streaming/monitor.py, applyInPandasWithState): out-of-order rows
    BUFFER in state until the event-time watermark passes them, then
    seal in ts order through the carried recursion — so the stream's
    output over a finite run equals the batch recursion on the sealed
    prefix, which the recursive-CTE oracle replays literally. The
    second custom stateful operator beside session windows; state per
    key = carried stats + the un-sealed buffer (watermark-bounded)."""
    from weaviate_txtai_spark.streaming.events import stream_events
    from weaviate_txtai_spark.streaming.monitor import monitor_stream

    stream = stream_events(spark, sf_dir).select(
        F.col("event_type").alias("key"), "ts", F.col("value").alias("x")
    )
    out = monitor_stream(
        stream, alpha=0.3, target=100.0, drift=2.0, threshold=50.0,
        watermark="1 hour",
    )
    q = (
        out.writeStream.format("memory")
        .queryName("monitor_stream_gate")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table("monitor_stream_gate").orderBy("key", "ts", "x")


_STREAM_FUNNEL_SQL = """
WITH wm AS (
  SELECT (CAST(floor(epoch_us(max(ts)) / 1000) AS BIGINT) - 3600000) * 1000
           AS wm_us
  FROM events),
e AS (
  SELECT DISTINCT user_id,
         CASE event_type WHEN 'signup' THEN 0 WHEN 'view' THEN 1
                         WHEN 'click' THEN 2 END AS s,
         epoch_us(ts) AS us
  FROM events WHERE event_type IN ('signup', 'view', 'click')),
a AS (SELECT user_id, us AS anchor FROM e, wm
      WHERE s = 0 AND us + 86400000000 < wm.wm_us),
t1 AS (SELECT a.user_id, a.anchor, min(e.us) AS v
       FROM a LEFT JOIN e ON e.user_id = a.user_id AND e.s = 1
            AND e.us > a.anchor AND e.us <= a.anchor + 86400000000
       GROUP BY 1, 2),
t2 AS (SELECT t1.user_id, t1.anchor, t1.v, min(e.us) AS c
       FROM t1 LEFT JOIN e ON e.user_id = t1.user_id AND e.s = 2
            AND e.us > t1.v AND e.us <= t1.anchor + 86400000000
       GROUP BY 1, 2, 3)
SELECT user_id, anchor AS anchor_us,
       CAST(CASE WHEN c IS NOT NULL THEN 3
                 WHEN v IS NOT NULL THEN 2 ELSE 1 END AS INTEGER) AS level
FROM t2 ORDER BY user_id, anchor_us
"""


@register("streaming_funnel", _STREAM_FUNNEL_SQL)
def streaming_funnel_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THIRD oracled custom stateful streaming operator
    (streaming/funnel.py, applyInPandasWithState): per-anchor funnel
    levels emitted only when the event-time watermark seals the
    anchor's window (anchor + 24 h < wm) — the monitor/sessions replay
    pattern: every event arrives in the single data micro-batch while
    the watermark is 0, so the emitted set equals the batch
    chain-EXISTS enumeration restricted to watermark-sealed anchors,
    which the oracle replays via greedy min-chains (equivalent to
    EXISTS — a later chain's step time is never earlier than the
    greedy one's)."""
    from weaviate_txtai_spark.streaming.events import stream_events
    from weaviate_txtai_spark.streaming.funnel import funnel_stream

    out = funnel_stream(
        stream_events(spark, sf_dir),
        ["signup", "view", "click"],
        window_seconds=86400,
        watermark="1 hour",
    )
    q = (
        out.writeStream.format("memory")
        .queryName("funnel_stream_gate")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table("funnel_stream_gate").orderBy(
        "user_id", "anchor_us"
    )


_BYTE_DEDUP_SQL = """
WITH p AS (
  SELECT doc_id, hex(encode(text)) AS h FROM documents
  WHERE doc_id IS NOT NULL AND text IS NOT NULL
        AND octet_length(encode(text)) >= 16
),
sh AS (
  SELECT DISTINCT doc_id, substring(h, 2 * s.x - 1, 32) AS win
  FROM p, unnest(generate_series(1, len(h) // 2 - 15)) AS s(x)
  WHERE substring(md5(substring(h, 2 * s.x - 1, 32)), 32, 1)
        IN ('0', '1', '2', '3')
),
sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
common AS (
  SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS c
  FROM sh a JOIN sh b ON a.win = b.win AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
pairs AS (
  SELECT d1, d2, round(c * 1.0 / (s1.n + s2.n - c), 6) AS jaccard
  FROM common
  JOIN sz s1 ON common.d1 = s1.doc_id
  JOIN sz s2 ON common.d2 = s2.doc_id
)
SELECT d1, d2, jaccard FROM pairs WHERE jaccard >= 0.8 ORDER BY d1, d2
"""


@register("multimodal_byte_dedup", _BYTE_DEDUP_SQL)
def multimodal_byte_dedup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-level near-dup over BINARY payloads (multimodal/binary.py
    binary_dup_pairs): MinHash-LSH banding over content-defined-sampled
    16-byte windows, exact-Jaccard-verified — dedup media BY BYTES
    before any perceptual hash exists (reference parity: txtai's binary
    ``object`` payloads, examples/01_simple.ipynb cell 29; the dedup
    itself is the crawl-pipeline need the reference lacks).

    The fixture payload is the document text's UTF-8 bytes (the
    container has no codecs to decode real media; the OPERATOR is
    byte-native — BinaryType substr windows, hex only for the sampling
    hash both engines can replay). The oracle computes the exact
    sampled-universe Jaccard over raw windows via DuckDB's hex image
    of the blob (DuckDB 1.0 cannot slice BLOBs; the hex string is a
    lossless bijection); with 16 bands x 4 rows a 0.8-Jaccard pair
    escapes banding with p ~ 2e-5, so LSH output == exact output on
    the fixture and a recall miss FAILS the gate (the dedup_minhash
    stance)."""
    from weaviate_txtai_spark.multimodal.binary import binary_dup_pairs

    docs = load_table(spark, sf_dir, "documents")
    media = docs.select(
        "doc_id", F.encode("text", "UTF-8").alias("payload")
    )
    return binary_dup_pairs(media, k=16, threshold=0.8).orderBy("d1", "d2")
