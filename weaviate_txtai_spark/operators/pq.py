"""Product quantization: m-subspace vector codes + ADC search.

The memory half of IVF-PQ (Jégou, Douze, Schmid, "Product Quantization
for Nearest Neighbor Search", TPAMI 2011 — public knowledge): split a
dim-d vector into m contiguous sub-vectors, k-means each subspace to k
centroids (k ≤ 256 → one byte per subspace), store only the m codes.
At 100 TB this is THE difference between an index that fits in cluster
memory and one that doesn't: a 64-dim float32 vector is 256 B, its
m=8/k=256 PQ code is 8 B — 32×. Search uses asymmetric distance
computation (ADC): one k×m lookup table per query (computed against
the FULL query vector, so only the database side is quantized), then
every candidate's distance is m table lookups + m adds — no float
vector ever read.

Spark shapes (scale notes):
- **Training** reuses :func:`operators.kmeans.lloyd` per subspace on a
  sliced column — m independent small k-means runs; driver state is
  m×k×(d/m) = k×d floats (same bounded contract as IVFIndex
  centroids). Deterministic: lowest-id seeding + optional distance
  rounding, so the whole model is a pure function of the corpus.
- **Encoding** is map-only: per subspace an argmin over k codebook
  literals (the ``assign_clusters`` expr/gemm machinery, applied to
  ``F.slice`` of the vector) — no shuffle, no join, codes land as one
  packed BIGINT (k^m ≤ 2^63) or an array<int>.
- **ADC search** stays JVM-side: the per-query LUT is a m×k literal
  array; the distance is a codegen ``aggregate`` over the code array
  (m element_at lookups per row). The corpus never shuffles before its
  per-partition top-k reduction (same plan shape as ``knn_topk``).

Reference provenance: the reference exposes only exact HNSW search via
the Weaviate server (`/root/reference/weaviate_txtai/ann/weaviate.py`);
PQ is part of the beyond-reference scale surface (SURVEY §2.4), the
database-side companion to the int8 SQ storage mode (`index.py`
``weaviate.quantize``).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from weaviate_txtai_spark.operators.kmeans import assign_clusters, lloyd


@dataclass
class PQModel:
    """Trained product quantizer: ``codebooks[s]`` is the subspace-s
    codebook as [(code, sub_vector), ...] with codes dense 0..k-1."""

    m: int
    k: int
    dim: int
    codebooks: list[list[tuple[int, list[float]]]]

    @property
    def sub_dim(self) -> int:
        return self.dim // self.m

    def lut(self, query: Sequence[float], *, round_decimals: Optional[int] = 6
            ) -> list[list[float]]:
        """ADC lookup table for one query: lut[s][c] = squared L2
        between the query's subspace-s slice and codebook entry c.
        Computed against the FULL (unquantized) query — the asymmetric
        part of ADC."""
        q = [float(v) for v in query]
        if len(q) != self.dim:
            raise ValueError(f"PQModel.lut: query dim {len(q)} != {self.dim}")
        d = self.sub_dim
        out = []
        for s in range(self.m):
            qs = q[s * d : (s + 1) * d]
            row = []
            for _, c in self.codebooks[s]:
                v = sum((a - b) * (a - b) for a, b in zip(qs, c))
                row.append(round(v, round_decimals) if round_decimals is not None else v)
            out.append(row)
        return out


def train_pq(
    df: DataFrame,
    *,
    m: int = 8,
    k: int = 256,
    iters: int = 5,
    id_col: str = "vec_id",
    vector_col: str = "embedding",
    dist_round_decimals: Optional[int] = None,
    quantize_decimals: Optional[int] = None,
) -> PQModel:
    """Train per-subspace codebooks with deterministic Lloyd's.

    ``iters=0`` is the exactness mode: codebooks are exactly the k
    lowest-id vectors' sub-slices (no update step) — fully reproducible
    in oracle SQL without replaying a k-means trajectory. Production
    uses ``iters≥1`` for real quantization error; the trajectory stays
    deterministic (see ``lloyd``) so the model is still a pure function
    of the corpus, just a longer SQL transcription away.
    """
    head = df.select(vector_col).head()
    if head is None:
        raise ValueError("train_pq: empty input")
    dim = len(head[0])
    if dim % m != 0:
        raise ValueError(f"train_pq: dim {dim} not divisible by m={m}")
    if k > 2**16:
        raise ValueError("train_pq: k > 65536 defeats the point of PQ")
    d = dim // m
    codebooks = []
    for s in range(m):
        sub = df.select(
            F.col(id_col).alias("vec_id"),
            F.slice(F.col(vector_col).cast("array<double>"), s * d + 1, d
                    ).alias("sub"),
        )
        if iters == 0:
            seed_rows = (
                sub.orderBy(F.asc("vec_id")).limit(k).collect()
            )
            if len(seed_rows) < k:
                raise ValueError(
                    f"train_pq: k={k} but only {len(seed_rows)} rows"
                )
            codebooks.append(
                [(i, [float(v) for v in r["sub"]]) for i, r in enumerate(seed_rows)]
            )
        else:
            model = lloyd(
                sub,
                k=k,
                iters=iters,
                id_col="vec_id",
                vector_col="sub",
                dist_round_decimals=dist_round_decimals,
                quantize_decimals=quantize_decimals,
            )
            codebooks.append(model.centroids)
    return PQModel(m=m, k=k, dim=dim, codebooks=codebooks)


def pq_encode(
    df: DataFrame,
    model: PQModel,
    *,
    vector_col: str = "embedding",
    code_col: str = "pq_code",
    dist_round_decimals: Optional[int] = None,
    packed: bool = True,
    strategy: str = "auto",
) -> DataFrame:
    """Add the PQ code: per subspace, the nearest codebook entry
    (squared L2, ties to the lowest code — ``assign_clusters``
    semantics on the sliced column; map-only, no shuffle).

    ``packed=True`` emits one BIGINT ``sum_s code_s · k^s`` (requires
    k^m ≤ 2^63 — fine for every sane parameterization and exactly what
    a columnar store scans fastest); ``packed=False`` emits
    ``array<int>`` of length m (what ``adc_topk`` consumes directly).
    """
    d = model.sub_dim
    if packed and model.k ** model.m > 2**53:
        # 2^53, not 2^62: pq_unpack recovers digits with double pow —
        # beyond the double-exact integer range the round-trip corrupts
        raise ValueError(
            f"pq_encode: k={model.k}^m={model.m} overflows the packed-"
            "long exact range; use packed=False"
        )
    out = df
    code_cols = []
    for s in range(model.m):
        cname = f"__pq{s}"
        out = assign_clusters(
            out.withColumn(
                "__sub", F.slice(F.col(vector_col).cast("array<double>"),
                                 s * d + 1, d)
            ),
            model.codebooks[s],
            vector_col="__sub",
            cluster_col=cname,
            dist_round_decimals=dist_round_decimals,
            strategy=strategy,
        ).drop("__sub")
        code_cols.append(cname)
    if packed:
        expr = F.lit(0).cast("long")
        mult = 1
        for s, cname in enumerate(code_cols):
            expr = expr + F.col(cname).cast("long") * F.lit(mult)
            mult *= model.k
        out = out.withColumn(code_col, expr)
    else:
        out = out.withColumn(
            code_col, F.array(*[F.col(c) for c in code_cols])
        )
    return out.drop(*code_cols)


def adc_scores(
    codes: DataFrame,
    model: PQModel,
    query: Sequence[float],
    *,
    code_col: str = "pq_code",
    dist_col: str = "adc_dist",
    lut_round_decimals: Optional[int] = 6,
) -> DataFrame:
    """Approximate squared-L2 distance to ``query`` for every coded row
    via the ADC lookup table — pure codegen: the LUT is an m×k literal,
    the distance an ``aggregate`` of m ``element_at`` lookups over the
    (unpacked) code array. Never touches a float vector column.

    ``codes`` must carry ``code_col`` as array<int> (``packed=False``
    encoding); unpack a packed code first with :func:`pq_unpack`.
    """
    lut = model.lut(query, round_decimals=lut_round_decimals)
    lut_lit = F.array(
        *[F.array(*[F.lit(v) for v in row]) for row in lut]
    )
    dist = F.aggregate(
        F.zip_with(
            F.lit([i for i in range(model.m)]).cast("array<int>"),
            F.col(code_col),
            lambda s, c: F.element_at(F.element_at(lut_lit, s + 1), c + 1),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return codes.withColumn(dist_col, F.round(dist, 6))


def pq_unpack(
    df: DataFrame, model: PQModel, *, code_col: str = "pq_code",
    out_col: str = "pq_codes",
) -> DataFrame:
    """Packed BIGINT → array<int> of per-subspace codes (map-only)."""
    codes = F.transform(
        F.sequence(F.lit(0), F.lit(model.m - 1)),
        lambda s: F.pmod(
            F.floor(F.col(code_col) / F.pow(F.lit(float(model.k)), s.cast("double"))).cast("long"),
            F.lit(model.k),
        ).cast("int"),
    )
    return df.withColumn(out_col, codes)


def adc_topk(
    codes: DataFrame,
    model: PQModel,
    query: Sequence[float],
    n: int,
    *,
    id_col: str = "vec_id",
    code_col: str = "pq_code",
) -> DataFrame:
    """Top-n rows by ADC distance (ascending; ties to lowest id) — the
    PQ search primitive. orderBy+limit compiles to
    TakeOrderedAndProject (per-partition top-n, then one n-row merge —
    the corpus never lands on a single task); the rank window then runs
    over only the n survivors."""
    scored = adc_scores(codes, model, query, code_col=code_col)
    top = (
        scored.select(id_col, "adc_dist")
        .orderBy(F.asc("adc_dist"), F.asc(id_col))
        .limit(n)
    )
    w = Window.orderBy(F.asc("adc_dist"), F.asc(id_col))
    return top.withColumn("rank", F.row_number().over(w))


def adc_topk_rerank(
    codes: DataFrame,
    vectors: DataFrame,
    model: PQModel,
    query: Sequence[float],
    n: int,
    *,
    shortlist: int = 10,
    id_col: str = "vec_id",
    code_col: str = "pq_code",
    vector_col: str = "embedding",
) -> DataFrame:
    """ADC shortlist → exact re-rank: how production PQ search actually
    runs. The coded (m-bytes-per-row) table is scanned for a
    ``shortlist×n`` ADC candidate set; only those rows' float vectors
    are then read (broadcast semi-join on the tiny id set — at scale
    this is the point: the full-precision read is O(shortlist·n), not
    O(corpus)) and re-scored with exact squared L2.

    Shortlist sizing is the recall knob: ADC's rank correlation with
    the exact distance is high but not 1 (quantization noise), so the
    true top-n live in a modest ADC prefix — measured on the isotropic
    testdata (the worst case), shortlist=5 recovers ~0.9 of the exact
    top-10 and re-ranking restores the exact order of whatever the
    shortlist contains. Output: ``id, dist, rank``.
    """
    q = [float(v) for v in query]
    cand = adc_topk(
        codes, model, q, shortlist * n, id_col=id_col, code_col=code_col
    ).select(id_col)
    lit = F.array(*[F.lit(v) for v in q])
    exact = (
        vectors.join(F.broadcast(cand), id_col)
        .select(
            id_col,
            F.round(
                F.aggregate(
                    F.zip_with(
                        F.col(vector_col).cast("array<double>"),
                        lit,
                        lambda a, b: (a - b) * (a - b),
                    ),
                    F.lit(0.0),
                    lambda acc, v: acc + v,
                ),
                6,
            ).alias("dist"),
        )
        .orderBy(F.asc("dist"), F.asc(id_col))
        .limit(n)
    )
    w = Window.orderBy(F.asc("dist"), F.asc(id_col))
    return exact.withColumn("rank", F.row_number().over(w))
