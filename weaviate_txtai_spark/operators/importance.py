"""Data-selection importance reweighting (DSIR shape — Xie et al.,
"Data Selection for Language Models via Importance Resampling",
NeurIPS 2023; public). Score every raw-corpus document by how much its
feature distribution looks like a TARGET domain:

    weight(doc) = Σ_f∈doc  ln p̂_target(f) − ln p̂_raw(f)

with Laplace-smoothed unigram (or hashed-bucket) feature estimates.
High-weight docs are target-like; the existing samplers
(``functions.sampling`` weighted/exact-k) turn the weights into the
actual resample, so this module only produces the per-doc log-ratio.

Spark shape (three shuffles, all bounded):
- one explode + groupBy(feature) builds BOTH corpus distributions in a
  single conditional aggregate (no second scan for the target);
- the totals (n_raw, n_target, |V|) are a 1-row aggregate broadcast
  back via crossJoin — no driver round-trip in the plan;
- the per-doc sum joins tokens to the vocab table. With
  ``num_buckets`` set, the vocab is a FIXED-size table (the paper's
  hashed n-gram trick) and the join side is broadcastable at any
  corpus size — that is the 100 TB configuration; raw-string features
  are the oracle-exact gate mode.

Reference behavioral anchor: the reference engine has no curation
layer at all (/root/reference/weaviate_txtai/ann/weaviate.py is a
store/query adapter); this extends the engine toward the
training-data-pipeline surface the task brief lists as first-class.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from weaviate_txtai_spark.functions.text import tokens


def hash_feature(tok: Column, num_buckets: int) -> Column:
    """Deterministic, engine-portable token→bucket hash: a polynomial
    fold over the token's characters (base 31, mod 1e9+7), then mod
    num_buckets. Pure codegen-able exprs; the identical fold is
    expressible in ANSI SQL for oracles. Weak vs murmur but collisions
    are inherent to hashed-feature DSIR anyway (the paper uses hashed
    n-grams precisely to fix the feature-space size)."""
    chars = F.split(tok, "")
    folded = F.aggregate(
        F.transform(chars, lambda c: F.ascii(c)),
        F.lit(0).cast("long"),
        lambda acc, x: F.pmod(acc * 31 + x, F.lit(1_000_000_007).cast("long")),
    )
    return F.pmod(folded, F.lit(int(num_buckets)).cast("long"))


def dsir_weights(
    df: DataFrame,
    target: Column,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    smoothing: float = 0.5,
    num_buckets: Optional[int] = None,
    round_decimals: Optional[int] = None,
) -> DataFrame:
    """Per-document importance weights ln p̂_t(doc) − ln p̂_r(doc) under
    smoothed unigram feature models of the target slice (rows where
    ``target`` is true) vs the whole input. Returns (id_col, weight).

    The raw corpus INCLUDES the target slice (the paper's setting:
    raw = the big crawl, target = the small quality domain; here both
    live in one frame and ``target`` marks the domain). Smoothing uses
    the union vocabulary size V, so no feature has zero probability in
    either model and OOV cannot occur (the vocab is built from the
    same rows being scored)."""
    feat = F.explode(tokens(F.col(text_col))).alias("f")
    # NULL doc ids excluded ONCE, before every branch: the per-doc
    # weight aggregate would lump every unkeyed document's features
    # into one pseudo-doc's weight, and the tokenless-restore branch
    # below would re-admit a NULL row claiming weight 0
    df = df.filter(F.col(id_col).isNotNull())
    tok = df.select(
        F.col(id_col), target.alias("__is_t"), feat
    )
    if num_buckets is not None:
        tok = tok.select(
            id_col, "__is_t", hash_feature(F.col("f"), num_buckets).alias("f")
        )
    vocab = tok.groupBy("f").agg(
        F.count(F.lit(1)).alias("c_raw"),
        F.sum(F.when(F.col("__is_t"), 1).otherwise(0)).alias("c_t"),
    )
    totals = vocab.agg(
        F.sum("c_raw").alias("n_raw"),
        F.sum("c_t").alias("n_t"),
        F.count(F.lit(1)).alias("v"),
    )
    a = float(smoothing)
    lr = vocab.crossJoin(F.broadcast(totals)).select(
        "f",
        (
            F.log((F.col("c_t") + a) / (F.col("n_t") + a * F.col("v")))
            - F.log((F.col("c_raw") + a) / (F.col("n_raw") + a * F.col("v")))
        ).alias("__lr"),
    )
    # fixed-size hashed vocab → broadcast by construction; string vocab
    # is data-sized, so leave the strategy to AQE there
    if num_buckets is not None and num_buckets <= 4_000_000:
        lr = F.broadcast(lr)
    scored = (
        tok.join(lr, "f")
        .groupBy(id_col)
        .agg(F.sum("__lr").alias("weight"))
    )
    # EVERY input doc gets a weight row: a tokenless doc has zero
    # exploded rows and would silently vanish from the output (skewing
    # any downstream weighted resample keyed on doc id) — its log-ratio
    # sum over zero tokens is exactly 0.0
    out = (
        df.select(id_col)
        .distinct()
        .join(scored, id_col, "left")
        .select(
            id_col, F.coalesce("weight", F.lit(0.0)).alias("weight")
        )
    )
    if round_decimals is not None:
        out = out.select(
            id_col, F.round("weight", round_decimals).alias("weight")
        )
    return out
