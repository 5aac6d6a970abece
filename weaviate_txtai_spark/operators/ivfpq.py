"""IVF-PQ: coarse cell routing + product-quantized residual codes.

The composition FAISS calls IndexIVFPQ (Jégou et al. 2011, §IV): route
every vector to its nearest coarse centroid (IVF — ``operators.ann``),
then product-quantize the RESIDUAL vector − centroid (PQ —
``operators.pq``). Residuals concentrate around zero with far less
variance than raw vectors, so the same codebook budget quantizes them
much more accurately; search probes nprobe cells and scores candidates
with one ADC lookup table per (query, probed cell) — the table is built
against the query's residual in that cell — then optionally re-ranks a
shortlist with exact full-precision distances.

At 100 TB this is the standard memory/recall design point: the scan
side holds m bytes + a cell id per vector (the float corpus is read
only for the shortlist re-rank), the probe prunes the scan to
nprobe/nlist of the data, and every stage is a DataFrame op:

- **build**: IVF build (one shuffle to cell layout) + a broadcast
  centroid join for residuals (map-only) + m subspace k-means on the
  residual column (driver state k×dim floats) + map-only encoding.
- **search**: probe fan-out (tiny crossJoin) → LUT literal per (query,
  cell) computed driver-side from the query batch — bounded by the
  same batch-query contract as ``knn_topk``'s broadcast path — → ADC
  distance as a codegen aggregate → TakeOrdered shortlist → optional
  exact re-rank over the shortlist ids only.

Determinism: both stages reuse the deterministic lloyd/assign
machinery, so an index built twice from the same corpus is identical.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from weaviate_txtai_spark.operators.ann import IVFIndex
from weaviate_txtai_spark.operators.pq import PQModel, pq_encode, train_pq


@dataclass
class IVFPQIndex:
    """IVF cell assignment + PQ model over residuals + coded corpus.

    ``codes``: DataFrame(id_col, cell, pq_code array<int>) — the only
    table the ADC search scans. ``ivf`` keeps the float corpus for
    re-ranking and the coarse centroids for probing."""

    ivf: IVFIndex
    pq: PQModel
    codes: DataFrame
    id_col: str
    vector_col: str

    @classmethod
    def build(
        cls,
        df: DataFrame,
        *,
        nlist: int = 16,
        m: int = 8,
        k_pq: int = 256,
        pq_iters: int = 3,
        id_col: str = "vec_id",
        vector_col: str = "embedding",
        seed: int = 42,
        dist_round_decimals: Optional[int] = None,
        keep_cols: Sequence[str] = (),
    ) -> "IVFPQIndex":
        ivf = IVFIndex.build(
            df, nlist=nlist, id_col=id_col, vector_col=vector_col, seed=seed
        )
        # persist: every subspace's k-means (m × iters stat collections)
        # and the final encode all scan this frame — unpersisted, each
        # re-runs the MLlib transform + centroid join (measured: 37 s ->
        # ~8 s build at sf0.1). Released via cache_scope.
        from weaviate_txtai_spark.cache import scoped_persist

        residuals = scoped_persist(
            _with_residual(ivf.assigned, ivf.centroids, vector_col=vector_col)
        )
        pq = train_pq(
            residuals,
            m=m,
            k=k_pq if k_pq is not None else 256,
            iters=pq_iters,
            id_col=id_col,
            vector_col="__res",
            dist_round_decimals=dist_round_decimals,
            quantize_decimals=6,
        )
        # keep_cols: filterable metadata DENORMALIZED into the codes
        # table — the only way filtered ADC search can prune BEFORE the
        # shortlist cut (filtering at re-rank time under-fills n, the
        # classic filtered-ANN bug; joining metadata back in would
        # re-read a corpus-sized table and defeat the m-byte scan)
        missing = set(keep_cols) - set(residuals.columns)
        if missing:
            raise ValueError(f"IVFPQIndex.build: keep_cols not in input: "
                             f"{sorted(missing)}")
        codes = pq_encode(
            residuals,
            pq,
            vector_col="__res",
            packed=False,
            dist_round_decimals=dist_round_decimals,
        ).select(id_col, "cell", "pq_code", *keep_cols)
        # materialize: the coded table IS the index — without this every
        # search would re-derive codes from the float corpus (re-reading
        # embeddings and re-running the encode), defeating the m-bytes
        # scan story. Release via cache_scope; save() writes it to disk.
        from weaviate_txtai_spark.cache import scoped_persist

        codes = scoped_persist(codes)
        return cls(
            ivf=ivf, pq=pq, codes=codes, id_col=id_col, vector_col=vector_col
        )

    def save(self, path: str) -> None:
        """Persist the index: codes partitioned by cell (the scan side —
        probe pruning becomes directory pruning, same layout promise as
        IVFIndex.save), the float corpus for re-ranking, and a JSON meta
        sidecar with both codebook sets."""
        import json
        import os

        spark = self.codes.sparkSession
        (
            self.codes.write.mode("overwrite")
            .partitionBy("cell")
            .parquet(os.path.join(path, "codes"))
        )
        (
            self.ivf.assigned.write.mode("overwrite")
            .partitionBy("cell")
            .parquet(os.path.join(path, "vectors"))
        )
        meta = {
            "id_col": self.id_col,
            "vector_col": self.vector_col,
            "centroids": self.ivf.centroids,
            "pq": {
                "m": self.pq.m,
                "k": self.pq.k,
                "dim": self.pq.dim,
                "codebooks": self.pq.codebooks,
            },
        }
        (
            spark.createDataFrame([(json.dumps(meta),)], "meta string")
            .coalesce(1)
            .write.mode("overwrite")
            .text(os.path.join(path, "ivfpq_meta"))
        )

    @classmethod
    def load(cls, spark, path: str) -> "IVFPQIndex":
        import json
        import os

        meta = json.loads(
            spark.read.text(os.path.join(path, "ivfpq_meta")).collect()[0][
                "value"
            ]
        )
        codes = spark.read.parquet(os.path.join(path, "codes"))
        vectors = spark.read.parquet(os.path.join(path, "vectors"))
        centroids = [
            (int(c), [float(x) for x in v]) for c, v in meta["centroids"]
        ]
        ivf = IVFIndex(
            vectors, centroids, meta["id_col"], meta["vector_col"]
        )
        p = meta["pq"]
        pq = PQModel(
            m=int(p["m"]),
            k=int(p["k"]),
            dim=int(p["dim"]),
            codebooks=[
                [(int(c), [float(x) for x in v]) for c, v in cb]
                for cb in p["codebooks"]
            ],
        )
        return cls(
            ivf=ivf,
            pq=pq,
            codes=codes,
            id_col=meta["id_col"],
            vector_col=meta["vector_col"],
        )

    def search(
        self,
        queries: Sequence[tuple],
        n: int,
        *,
        nprobe: int = 4,
        shortlist: Optional[int] = 10,
        query_id_type=None,
        where=None,
    ) -> DataFrame:
        """Batch ADC search: ``queries`` is [(query_id, vector), ...]
        (driver-side batch, same contract as ``knn_topk_gemm``). For
        each query: probe the nprobe nearest coarse centroids; in each
        probed cell score that cell's codes against the LUT of the
        query's RESIDUAL in that cell; merge per-query candidates; when
        ``shortlist`` is set, re-rank the ``shortlist×n`` best ADC ids
        with exact squared L2 on the float corpus (broadcast semi-join —
        full-precision I/O is O(shortlist·n·Q), never O(corpus)).

        Output: query_id, id, dist (squared L2 — exact when re-ranked,
        ADC-approximate otherwise), rank.
        """
        import numpy as np

        if not queries:
            raise ValueError("IVFPQIndex.search: empty query batch")
        spark = self.codes.sparkSession
        cents = sorted(self.ivf.centroids)
        cmat = np.asarray([c for _, c in cents], dtype=np.float64)
        cids = [cid for cid, _ in cents]
        nprobe = min(nprobe, len(cids))

        # Build one LUT literal per (query, probed cell): map cell ->
        # array<array<double>> keyed into a single CASE via the cell
        # column. Driver cost: Q × nprobe × m × k floats — the batch
        # contract bounds Q (≲ 10^3), nprobe×m×k ≲ 10^4.
        lut_rows = []  # (qid, cell, lut)
        for qid, qv in queries:
            q = np.asarray(list(qv), dtype=np.float64)
            # probe by L2 distance to coarse centroids (deterministic
            # ties to lowest cell id via lexsort)
            d = ((cmat - q) ** 2).sum(axis=1)
            order = np.lexsort((np.asarray(cids), d))[:nprobe]
            for idx in order:
                res = (q - cmat[idx]).tolist()
                lut_rows.append(
                    (qid, int(cids[idx]), self.pq.lut(res, round_decimals=6))
                )

        from pyspark.sql.types import (
            ArrayType,
            DoubleType,
            IntegerType,
            StructField,
            StructType,
        )

        if query_id_type is None:
            from pyspark.sql.types import LongType

            first = queries[0][0]
            query_id_type = (
                LongType() if isinstance(first, int) else None
            )
            if query_id_type is None:
                raise ValueError(
                    "IVFPQIndex.search: pass query_id_type for non-int ids"
                )
        lut_schema = StructType(
            [
                StructField("__qid", query_id_type),
                StructField("cell", IntegerType()),
                StructField("__lut", ArrayType(ArrayType(DoubleType()))),
            ]
        )
        luts = F.broadcast(spark.createDataFrame(lut_rows, lut_schema))

        m = self.pq.m
        dist = F.round(
            F.aggregate(
                F.zip_with(
                    F.lit(list(range(m))).cast("array<int>"),
                    F.col("pq_code"),
                    lambda s, c: F.element_at(
                        F.element_at(F.col("__lut"), s + 1), c + 1
                    ),
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            ),
            6,
        )
        # the codes table never shuffles: the LUT fan-out broadcasts and
        # only probed cells' rows survive the join filter. `where` (over
        # keep_cols stored IN the codes table at build time) prunes
        # candidates BEFORE the shortlist cut — top-n slots are never
        # wasted on rows the caller would discard.
        base = self.codes
        if where is not None:
            base = base.filter(
                F.expr(where) if isinstance(where, str) else where
            )
        cand = (
            base.join(luts, "cell")
            .select(F.col("__qid"), F.col(self.id_col), dist.alias("adc_dist"))
        )
        take = n if shortlist is None else shortlist * n
        w = Window.partitionBy("__qid").orderBy(
            F.asc("adc_dist"), F.asc(self.id_col)
        )
        top = (
            cand.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= take)
        )
        if shortlist is None:
            return top.select(
                F.col("__qid").alias("query_id"),
                self.id_col,
                F.col("adc_dist").alias("dist"),
                "rank",
            )
        # exact re-rank over the shortlist only
        qlit = F.create_map(
            *[
                x
                for qid, qv in queries
                for x in (
                    F.lit(qid),
                    F.array(*[F.lit(float(v)) for v in qv]),
                )
            ]
        )
        shortlist_ids = top.select("__qid", self.id_col)
        exact = (
            self.ivf.assigned.join(
                F.broadcast(shortlist_ids), self.id_col
            )
            .withColumn("__qv", qlit[F.col("__qid")])
            .select(
                "__qid",
                self.id_col,
                F.round(
                    F.aggregate(
                        F.zip_with(
                            F.col(self.vector_col).cast("array<double>"),
                            F.col("__qv"),
                            lambda a, b: (a - b) * (a - b),
                        ),
                        F.lit(0.0),
                        lambda acc, v: acc + v,
                    ),
                    6,
                ).alias("dist"),
            )
        )
        w2 = Window.partitionBy("__qid").orderBy(
            F.asc("dist"), F.asc(self.id_col)
        )
        return (
            exact.withColumn("rank", F.row_number().over(w2))
            .filter(F.col("rank") <= n)
            .select(
                F.col("__qid").alias("query_id"), self.id_col, "dist", "rank"
            )
        )


def _with_residual(
    assigned: DataFrame,
    centroids: list[tuple[int, list[float]]],
    *,
    vector_col: str,
) -> DataFrame:
    """Add ``__res`` = vector − cell centroid (map-only: the centroid
    table broadcasts; zip_with subtraction stays JVM-side)."""
    spark = assigned.sparkSession
    cell_type = assigned.schema["cell"].dataType.simpleString()
    cent = spark.createDataFrame(
        [(int(c), [float(x) for x in v]) for c, v in centroids],
        "cell long, __cent array<double>",
    ).withColumn("cell", F.col("cell").cast(cell_type))
    return (
        assigned.join(F.broadcast(cent), "cell")
        .withColumn(
            "__res",
            F.zip_with(
                F.col(vector_col).cast("array<double>"),
                F.col("__cent"),
                lambda a, b: a - b,
            ),
        )
        .drop("__cent")
    )
