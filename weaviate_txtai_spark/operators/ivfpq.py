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
- **search**: probe fan-out (tiny crossJoin) → LUT per (query, cell)
  computed driver-side from the query batch — bounded by the same
  batch-query contract as ``knn_topk``'s broadcast path — → ADC
  distances from a shuffle-free Arrow gather kernel (LUTs in the
  closure; the interpreted-expr fold twin is kept as the
  oracle/exactness path — same float64 op sequence, equal up to the
  np.round/F.round midpoint caveat on ``pq._adc_scores_gemm``) →
  merged shortlist → optional
  exact re-rank over the shortlist ids only (query vectors
  broadcast-joined, never a per-row lookup literal). For a DataFrame
  query side (unbounded Q) use ``search_df``/``topk_join_ivfpq``.

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

    def append(self, new_df: DataFrame) -> "IVFPQIndex":
        """Incremental maintenance, mirroring ``IVFIndex.append``: route
        NEW vectors to the EXISTING coarse centroids, encode their
        residuals with the EXISTING codebooks, and union both the float
        layout and the codes table — no re-clustering, no re-training,
        no touch of old rows (the daily-ingest shape; rebuild when
        drift degrades recall). Map-only for the new batch: centroid
        broadcast + argmin, residual subtraction, fused Arrow encode.

        Caveat (same as any frozen quantizer): appended vectors far
        from the training distribution quantize worse — the model is
        deliberately NOT updated so old codes stay valid.

        Precondition (same as ``IVFIndex.append``): appended ids must be
        NEW. A duplicate id appends a second row to BOTH the float
        layout and the codes table consistently (it will appear twice in
        results) — deduplicate or route updates through a delete first.
        The previous anti-join against the coded ids silently dropped
        the duplicate from the codes table only, desynchronizing the two
        layouts — and it shuffled the whole corpus id set per append;
        encoding the new batch directly is O(batch)."""
        from weaviate_txtai_spark.operators.kmeans import assign_clusters

        # same NULL-id exclusion as IVFIndex.build/append: keeps the
        # float layout and the codes table symmetric (r13 join census)
        new_df = new_df.filter(F.col(self.id_col).isNotNull())
        ivf_new = self.ivf.append(new_df)
        keep = [
            c for c in self.codes.columns
            if c not in (self.id_col, "cell", "pq_code")
        ]
        assigned_new = assign_clusters(
            new_df,
            self.ivf.centroids,
            vector_col=self.vector_col,
            cluster_col="cell",
        )
        residual_new = _with_residual(
            assigned_new, self.ivf.centroids, vector_col=self.vector_col
        )
        codes_new = pq_encode(
            residual_new, self.pq, vector_col="__res", packed=False
        ).select(self.id_col, "cell", "pq_code", *keep)
        merged = self.codes.unionByName(
            codes_new.select(self.codes.columns), allowMissingColumns=False
        )
        return IVFPQIndex(
            ivf=ivf_new,
            pq=self.pq,
            codes=merged,
            id_col=self.id_col,
            vector_col=self.vector_col,
        )

    def append_to_saved(self, path: str, new_df: DataFrame) -> None:
        """Physical incremental append to a SAVED index (the daily-
        ingest shape, mirroring ``IVFIndex.append_to_saved``): assign
        the new vectors to existing centroids, encode residuals with
        the frozen codebooks, and APPEND into the existing ``cell=…/``
        partition directories of both the codes and the float layout —
        old files are never rewritten, cost is O(new batch) regardless
        of index size. Schema AND type are validated against the saved
        layout before any write (the mixed-parquet-footer hazard: an
        append with a differently-typed column succeeds silently and
        only blows up at load)."""
        import os

        from weaviate_txtai_spark.operators.kmeans import assign_clusters

        # schema/type validation BEFORE any write (same mixed-footer
        # hazard as IVFIndex.append_to_saved: parquet append accepts
        # mismatched footers silently and load() blows up later)
        expected = [
            f for f in self.ivf.assigned.schema.fields if f.name != "cell"
        ]
        missing = {f.name for f in expected} - set(new_df.columns)
        if missing:
            raise ValueError(
                f"append_to_saved: new rows lack index columns "
                f"{sorted(missing)}"
            )
        new_types = {f.name: f.dataType for f in new_df.schema.fields}
        mismatched = [
            (f.name, f.dataType.simpleString(),
             new_types[f.name].simpleString())
            for f in expected
            if new_types[f.name] != f.dataType
        ]
        if mismatched:
            raise ValueError(
                "append_to_saved: column types differ from the saved "
                f"index (column, saved, new): {mismatched} — cast before "
                "appending"
            )
        # same NULL-id exclusion as build/append (r13 join census)
        new_df = new_df.filter(F.col(self.id_col).isNotNull())
        assigned_new = assign_clusters(
            new_df.select(*[f.name for f in expected]),
            self.ivf.centroids,
            vector_col=self.vector_col,
            cluster_col="cell",
        )
        (
            assigned_new.write.mode("append")
            .partitionBy("cell")
            .parquet(os.path.join(path, "vectors"))
        )
        residual_new = _with_residual(
            assigned_new, self.ivf.centroids, vector_col=self.vector_col
        )
        keep = [
            c for c in self.codes.columns
            if c not in (self.id_col, "cell", "pq_code")
        ]
        (
            pq_encode(residual_new, self.pq, vector_col="__res", packed=False)
            .select(self.id_col, "cell", "pq_code", *keep)
            .write.mode("append")
            .partitionBy("cell")
            .parquet(os.path.join(path, "codes"))
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
        strategy: str = "auto",
    ) -> DataFrame:
        """Batch ADC search: ``queries`` is [(query_id, vector), ...]
        (driver-side batch, same contract as ``knn_topk_gemm``). For
        each query: probe the nprobe nearest coarse centroids; in each
        probed cell score that cell's codes against the LUT of the
        query's RESIDUAL in that cell; merge per-query candidates; when
        ``shortlist`` is set, re-rank the ``shortlist×n`` best ADC ids
        with exact squared L2 on the float corpus (broadcast semi-join —
        full-precision I/O is O(shortlist·n·Q), never O(corpus)).

        ``strategy='auto'``/'gemm' (default) scores candidates with a
        shuffle-free Arrow gather kernel — the LUT set rides in the
        kernel closure (bounded by the batch-query contract), the codes
        table is scanned once in place, the distance is m numpy gathers
        + adds per (query, candidate), and only each query's per-batch
        top-``take`` rows leave the kernel, so the merge window sees
        O(batches·Q·take) rows, never O(candidates).
        'expr' keeps the broadcast-LUT join + interpreted ``aggregate``
        fold — the oracle/exactness twin (the kernel accumulates the
        same rounded LUT entries in the same subspace order; equal up
        to the np.round/F.round midpoint caveat on
        ``pq._adc_scores_gemm``, pytest-pinned on the test corpus),
        but the fold is evaluated
        interpreted per candidate row, a ~10× constant on the index's
        scan stage.

        Output: query_id, id, dist (squared L2 — exact when re-ranked,
        ADC-approximate otherwise), rank.
        """
        import numpy as np

        if not queries:
            raise ValueError("IVFPQIndex.search: empty query batch")
        # a None query id would merge its candidates with every other
        # unkeyed query's in the per-query windows downstream — raise
        if any(q[0] is None for q in queries):
            raise ValueError("IVFPQIndex.search: query ids must not be None")
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
        if strategy not in ("auto", "gemm", "expr"):
            raise ValueError(f"IVFPQIndex.search: unknown strategy {strategy!r}")
        # `where` (over keep_cols stored IN the codes table at build
        # time) prunes candidates BEFORE the shortlist cut — top-n slots
        # are never wasted on rows the caller would discard.
        base = self.codes
        if where is not None:
            base = base.filter(
                F.expr(where) if isinstance(where, str) else where
            )
        take = n if shortlist is None else shortlist * n
        if strategy == "expr":
            # oracle/exactness twin: broadcast-LUT join + interpreted
            # aggregate fold. The codes table never shuffles (only
            # probed cells' rows survive the join filter), but the fold
            # runs interpreted per candidate row — use the gemm path
            # for anything perf-sensitive.
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
            cand = (
                base.join(luts, "cell")
                .select(
                    F.col("__qid"), F.col(self.id_col), dist.alias("adc_dist")
                )
            )
        else:
            cand = self._adc_candidates_gemm(base, lut_rows, lut_schema, take)
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
        # exact re-rank over the shortlist only. The query vectors come
        # in via a broadcast-joined DataFrame, NOT a create_map literal:
        # a Q-entry map literal is probed linearly per row (O(Q) per
        # shortlist row -> O(Q²·take) total; measured +15 s at Q=500,
        # sf0.1) and its O(Q·dim) expression tree bloats analysis too.
        qdf = F.broadcast(
            spark.createDataFrame(
                [(qid, [float(v) for v in qv]) for qid, qv in queries],
                StructType(
                    [
                        StructField("__qid", query_id_type),
                        StructField("__qv", ArrayType(DoubleType())),
                    ]
                ),
            )
        )
        shortlist_ids = top.select("__qid", self.id_col)
        exact = (
            self.ivf.assigned.join(
                F.broadcast(shortlist_ids), self.id_col
            )
            .join(qdf, "__qid")
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

    def search_df(
        self,
        query_df: DataFrame,
        n: int,
        *,
        nprobe: int = 4,
        shortlist: Optional[int] = 10,
        query_id_col: str = "query_id",
        query_vector_col: str = "query_vector",
        where=None,
        cell_salt: Optional[int] = None,
        probe_strategy: str = "gemm",
    ) -> DataFrame:
        """Both-sides-huge ADC search: the query side is a DataFrame
        (unbounded Q — nothing about the queries ever lands on the
        driver), the scan side is the m-bytes-per-row codes table.

        Plan: probe fan-out (queries × broadcast centroids, window
        top-nprobe by L2) → cogrouped per-(cell, salt) Arrow kernel
        that builds each query's RESIDUAL LUT in-kernel (closure state
        is just the PQ codebooks + coarse centroids — k·dim floats, the
        same bounded contract as the index itself) and scores the
        cell's code matrix with m gathers + adds per query, emitting
        only per-group top-``take`` rows — (adc_dist, id) is a strict
        total order, so the global merge window is exact over the
        per-group winners. When ``shortlist`` is set, the merged
        shortlist re-ranks against the float corpus via two equi-joins
        and a vectorized Arrow distance kernel (never an interpreted
        per-pair fold), then cuts to top-n.

        Same salting/AQE-exemption/key-type discipline as
        ``ann.IVFIndex._cogroup_scored`` (cogroup does NOT auto-cast
        grouping keys). Output: query_id, id, dist (exact squared L2
        when re-ranked, ADC-approximate otherwise), rank.
        """
        import numpy as np
        import pandas as pd

        spark = self.codes.sparkSession
        # NULL query ids excluded: per-query LUT/window steps key on the
        # id, so unkeyed queries would lump into one merged result list
        query_df = query_df.filter(F.col(query_id_col).isNotNull())
        take = n if shortlist is None else shortlist * n
        m, kq, d = self.pq.m, self.pq.k, self.pq.sub_dim
        id_col = self.id_col
        base = self.codes
        if where is not None:
            base = base.filter(
                F.expr(where) if isinstance(where, str) else where
            )

        cents = sorted(self.ivf.centroids)
        if probe_strategy == "gemm":
            # map-only Arrow GEMM probe (VERDICT r5 item 4): the expr twin
            # below shuffles Q × nlist rows through a window and evaluates
            # an interpreted zip_with/aggregate fold per pair — and nlist
            # grows ∝ √N. Same (dist ASC, cell ASC) rule after rounding.
            from weaviate_txtai_spark.operators.ann import probe_cells_gemm

            probes = probe_cells_gemm(
                query_df,
                cents,
                nprobe,
                metric="l2",
                query_id_col=query_id_col,
                query_vector_col=query_vector_col,
            )
        elif probe_strategy == "expr":
            # probe fan-out: queries × nlist centroids (tiny broadcast
            # crossJoin), window top-nprobe by (L2 asc, cell asc) — the
            # same deterministic rule the driver-batch path uses (lexsort)
            cent = spark.createDataFrame(
                [(int(c), [float(x) for x in v]) for c, v in cents],
                "cell int, __cent array<double>",
            )
            l2 = F.round(
                F.aggregate(
                    F.zip_with(
                        F.col("__qv"),
                        F.col("__cent"),
                        lambda a, b: (a - b) * (a - b),
                    ),
                    F.lit(0.0),
                    lambda acc, v: acc + v,
                ),
                9,
            )
            wprobe = Window.partitionBy("__qid").orderBy(
                F.asc("__cd"), F.asc("cell")
            )
            probes = (
                query_df.select(
                    F.col(query_id_col).alias("__qid"),
                    F.col(query_vector_col).cast("array<double>").alias("__qv"),
                )
                .crossJoin(F.broadcast(cent))
                .withColumn("__cd", l2)
                .withColumn("__pr", F.row_number().over(wprobe))
                .filter(F.col("__pr") <= min(nprobe, len(cents)))
                .select("__qid", "__qv", "cell")
            )
        else:
            raise ValueError(
                f"search_df: unknown probe_strategy {probe_strategy!r}"
            )

        # ---- cogrouped ADC: salt the cell key so one group never holds
        # a whole cell; EXPLICIT partition count (AQE coalesces
        # byte-small shuffles onto one task and this stage is
        # compute-bound); both sides' keys cast to int BEFORE their
        # separate repartitions (cogroup does not auto-cast keys)
        par = spark.sparkContext.defaultParallelism
        nsalt = cell_salt or max(1, -(-par * 2 // max(len(cents), 1)))
        nparts = min(max(len(cents), 1) * nsalt, par * 4)
        corpus = (
            base.select(
                F.col("cell").cast("int").alias("cell"),
                F.col(id_col),
                F.col("pq_code"),
            )
            .withColumn(
                "__salt",
                F.pmod(F.xxhash64(F.col(id_col)), F.lit(nsalt)).cast("int"),
            )
            .repartition(nparts, "cell", "__salt")
        )
        probes_s = (
            probes.withColumn("cell", F.col("cell").cast("int"))
            .withColumn(
                "__salt",
                F.explode(
                    F.sequence(
                        F.lit(0).cast("int"), F.lit(nsalt - 1).cast("int")
                    )
                ),
            )
            .repartition(nparts, "cell", "__salt")
        )
        cb = np.asarray(
            [[c for _, c in self.pq.codebooks[s]] for s in range(m)],
            dtype=np.float64,
        )  # (m, k, d)
        cent_map = {int(c): np.asarray(v, dtype=np.float64) for c, v in cents}
        id_ddl = base.schema[id_col].dataType.simpleString()
        qid_ddl = probes_s.schema["__qid"].dataType.simpleString()

        def score(cpdf: pd.DataFrame, qpdf: pd.DataFrame) -> pd.DataFrame:
            if cpdf.empty or qpdf.empty:
                return pd.DataFrame({"__qid": [], id_col: [], "adc_dist": []})
            codes = np.asarray(list(cpdf["pq_code"]), dtype=np.int64)
            ids = cpdf[id_col].to_numpy()
            cell = int(cpdf["cell"].iloc[0])
            centv = cent_map[cell]
            qmat = np.asarray(list(qpdf["__qv"]), dtype=np.float64)
            qids = qpdf["__qid"].to_numpy()
            res = qmat - centv[None, :]  # (q, dim) residuals
            out_q, out_i, out_d = [], [], []
            chunk = 256
            for lo in range(0, len(qids), chunk):
                r = res[lo : lo + chunk]  # (c, dim)
                # per-subspace LUT for the chunk: (c, k) each — same
                # rounding as PQModel.lut so driver-batch search,
                # DataFrame search, and the expr oracle path agree
                luts = [
                    np.round(
                        ((cb[s][None, :, :] - r[:, None, s * d : (s + 1) * d])
                         ** 2).sum(axis=2),
                        6,
                    )
                    for s in range(m)
                ]
                for j in range(r.shape[0]):
                    dist = np.zeros(len(ids), dtype=np.float64)
                    for s in range(m):
                        dist = dist + luts[s][j][codes[:, s]]
                    dist = np.round(dist, 6)
                    t = min(take, len(ids))
                    if t < len(ids):
                        part = np.argpartition(dist, t - 1)[:t]
                        kth = dist[part].max()
                        cand = np.nonzero(dist <= kth)[0]
                    else:
                        cand = np.arange(len(ids))
                    order = cand[np.lexsort((ids[cand], dist[cand]))][:t]
                    out_q.append(np.repeat(qids[lo + j], len(order)))
                    out_i.append(ids[order])
                    out_d.append(dist[order])
            return pd.DataFrame(
                {
                    "__qid": np.concatenate(out_q),
                    id_col: np.concatenate(out_i),
                    "adc_dist": np.concatenate(out_d),
                }
            )

        cand = (
            corpus.groupBy("cell", "__salt")
            .cogroup(probes_s.groupBy("cell", "__salt"))
            .applyInPandas(
                score,
                schema=f"__qid {qid_ddl}, {id_col} {id_ddl}, adc_dist double",
            )
        )
        w = Window.partitionBy("__qid").orderBy(
            F.asc("adc_dist"), F.asc(id_col)
        )
        top = (
            cand.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= take)
        )
        if shortlist is None:
            return top.select(
                F.col("__qid").alias(query_id_col),
                id_col,
                F.col("adc_dist").alias("dist"),
                "rank",
            )

        # ---- exact re-rank: two equi-joins bring each shortlist pair
        # its float vectors, then one vectorized Arrow pass computes the
        # exact squared L2 — O(Q·take) pairs, never an interpreted
        # per-pair fold, never O(corpus) float I/O
        pairs = (
            top.select("__qid", id_col)
            .join(
                self.ivf.assigned.select(
                    id_col,
                    F.col(self.vector_col).cast("array<double>").alias("__dv"),
                ),
                id_col,
            )
            .join(
                query_df.select(
                    F.col(query_id_col).alias("__qid"),
                    F.col(query_vector_col).cast("array<double>").alias("__qv"),
                ),
                "__qid",
            )
        )

        def exact(batches):
            for pdf in batches:
                if pdf.empty:
                    continue
                dv = np.asarray(list(pdf["__dv"]), dtype=np.float64)
                qv = np.asarray(list(pdf["__qv"]), dtype=np.float64)
                dist = np.round(((dv - qv) ** 2).sum(axis=1), 6)
                yield pd.DataFrame(
                    {
                        "__qid": pdf["__qid"],
                        id_col: pdf[id_col],
                        "dist": dist,
                    }
                )

        exact_df = pairs.mapInPandas(
            exact, schema=f"__qid {qid_ddl}, {id_col} {id_ddl}, dist double"
        )
        w2 = Window.partitionBy("__qid").orderBy(F.asc("dist"), F.asc(id_col))
        return (
            exact_df.withColumn("rank", F.row_number().over(w2))
            .filter(F.col("rank") <= n)
            .select(
                F.col("__qid").alias(query_id_col), id_col, "dist", "rank"
            )
        )

    def _adc_candidates_gemm(
        self, base: DataFrame, lut_rows: list, lut_schema, take: int
    ) -> DataFrame:
        """Shuffle-free Arrow gather ADC scoring (see search). The LUT
        set rides in the kernel CLOSURE — it is Q·nprobe·m·k floats,
        bounded by the driver-batch query contract (Q ≲ 10³ → ≲ 10 MB)
        — so the codes table is scanned ONCE in place, with no join and
        no shuffle: each batch groups its rows by cell, gathers every
        probing query's distances (m gathers + adds accumulated in
        subspace order — the expr fold's op sequence, equal up to the
        np.round/F.round midpoint caveat), and emits
        only each query's top-``take`` rows within the batch.
        (adc_dist, id) is a strict total order, so the per-batch cut is
        exact under the global merge window, which then sees
        O(batches·Q·take) rows, never O(candidates).

        Probed cells are pruned driver-side BEFORE the scan (a static
        IN-filter — on a saved partitionBy('cell') index this is
        directory pruning, same as the IVF broadcast path)."""
        import numpy as np
        import pandas as pd

        m, k = self.pq.m, self.pq.k
        id_col = self.id_col
        id_ddl = base.schema[id_col].dataType.simpleString()
        qid_ddl = lut_schema["__qid"].dataType.simpleString()

        probed = sorted({c for _, c, _ in lut_rows})
        by_cell: dict = {}
        for qid, cell, lut in lut_rows:
            by_cell.setdefault(cell, []).append(
                (qid, np.asarray(lut, dtype=np.float64))
            )

        corpus = base.filter(F.col("cell").isin(probed)).select(
            F.col("cell").cast("int").alias("cell"),
            F.col(id_col),
            F.col("pq_code"),
        )

        def score(batches):
            for pdf in batches:
                if pdf.empty:
                    continue
                codes = np.asarray(list(pdf["pq_code"]), dtype=np.int64)
                ids = pdf[id_col].to_numpy()
                cells = pdf["cell"].to_numpy()
                out = {}  # qid -> [(dist_arr, id_arr)]
                for cell in np.unique(cells):
                    luts = by_cell.get(int(cell))
                    if not luts:
                        continue
                    sel = np.nonzero(cells == cell)[0]
                    sub, sids = codes[sel], ids[sel]
                    for qid, lut_arr in luts:
                        dist = np.zeros(len(sids), dtype=np.float64)
                        for s in range(m):
                            dist = dist + lut_arr[s][sub[:, s]]
                        out.setdefault(qid, []).append(
                            (np.round(dist, 6), sids)
                        )
                if not out:
                    continue
                out_q, out_i, out_d = [], [], []
                for qid, parts in out.items():
                    dist = np.concatenate([d for d, _ in parts])
                    pids = np.concatenate([i for _, i in parts])
                    t = min(take, len(pids))
                    if t < len(pids):
                        part = np.argpartition(dist, t - 1)[:t]
                        kth = dist[part].max()
                        cand = np.nonzero(dist <= kth)[0]
                    else:
                        cand = np.arange(len(pids))
                    order = cand[np.lexsort((pids[cand], dist[cand]))][:t]
                    out_q.append(np.repeat(qid, len(order)))
                    out_i.append(pids[order])
                    out_d.append(dist[order])
                yield pd.DataFrame(
                    {
                        "__qid": np.concatenate(out_q),
                        id_col: np.concatenate(out_i),
                        "adc_dist": np.concatenate(out_d),
                    }
                )

        return corpus.mapInPandas(
            score, schema=f"__qid {qid_ddl}, {id_col} {id_ddl}, adc_dist double"
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


def tune_shortlist(
    index: IVFPQIndex,
    sample_queries: list,
    k: int,
    *,
    nprobe: int = 4,
    recall_target: float = 0.9,
    max_shortlist: int = 64,
) -> tuple[int, dict[int, float]]:
    """Smallest shortlist multiplier meeting ``recall_target`` on a
    held-out query sample — the PQ-tier companion to ``ann.tune_nprobe``
    (nprobe governs the COARSE miss rate, shortlist the FINE one: how
    deep the ADC prefix must go before the true top-k is inside it).

    Ground truth is exact brute-force L2 top-k computed DISTRIBUTED
    (``knn_topk_gemm(metric='l2')`` — one corpus scan, per-partition
    top-k, only Q·k·partitions rows ever reach the driver; ADVICE r5:
    the previous full-corpus ``collect()`` broke the bounded-driver-
    state discipline and would OOM at the scale this module targets).
    Doubles shortlist 1, 2, 4, … ``max_shortlist``, measuring mean
    per-query recall@k at the FIXED nprobe, so the curve isolates the
    quantization-induced loss from the probe-induced loss. Returns
    (chosen_shortlist, {shortlist: recall}). Deterministic for the same
    reason as tune_nprobe (ties break on id everywhere). The measured
    curve is the artifact that justifies the production shortlist — at
    100 TB the re-rank's float I/O is shortlist·n·Q rows, so every
    doubling you don't need is real money.
    """
    from weaviate_txtai_spark.operators.topk import knn_topk_gemm

    if not sample_queries:
        raise ValueError("tune_shortlist: empty sample_queries")
    truth: dict = {}
    truth_rows = knn_topk_gemm(
        index.ivf.assigned,
        [(qid, list(qv)) for qid, qv in sample_queries],
        k,
        vector_col=index.vector_col,
        id_col=index.id_col,
        metric="l2",
    ).collect()  # ≤ Q·k rows — bounded by the sample size, not the corpus
    for r in truth_rows:
        truth.setdefault(r["query_id"], set()).add(r[index.id_col])
    if not truth:
        # same guard as tune_search_params: an empty/fully-filtered
        # corpus yields no ground truth and the recall mean below would
        # ZeroDivisionError deep in the ladder
        raise ValueError("tune_shortlist: no ground truth — empty corpus")

    curve: dict[int, float] = {}
    shortlist = 1
    chosen = max_shortlist
    while True:
        shortlist = min(shortlist, max_shortlist)
        got: dict = {}
        res = index.search(
            sample_queries, k, nprobe=nprobe, shortlist=shortlist
        )
        for r in res.collect():
            got.setdefault(r["query_id"], set()).add(r[index.id_col])
        recalls = [
            len(truth[q] & got.get(q, set())) / len(truth[q]) for q in truth
        ]
        curve[shortlist] = sum(recalls) / len(recalls)
        if curve[shortlist] >= recall_target or shortlist == max_shortlist:
            chosen = shortlist
            break
        shortlist *= 2
    return chosen, curve


def tune_search_params(
    index: IVFPQIndex,
    sample_queries: list,
    k: int,
    *,
    recall_target: float = 0.9,
    max_shortlist: int = 64,
) -> tuple[int, int, dict[tuple[int, int], float]]:
    """Jointly pick (nprobe, shortlist) for a recall target — the
    composed auto-config that proves ``ann.tune_nprobe`` and
    ``tune_shortlist`` compose (VERDICT r5 item 6).

    Cost model, explicit: at scale the ADC scan is the dominant term —
    it touches nprobe/nlist of the codes table (m bytes/vector over
    the probed cells), while the re-rank reads shortlist·k float rows
    PER QUERY, orders of magnitude less I/O. So the search is
    lexicographic: the smallest nprobe at which the target is
    reachable with shortlist ≤ max_shortlist, then the smallest
    shortlist at that nprobe. Both axes walk the same 1,2,4,…
    doubling ladder as the single-parameter tuners, so the whole grid
    costs O(log(nlist)·log(max_shortlist)) measured searches on the
    sample.

    Ground truth is computed once, distributed (same
    ``knn_topk_gemm(metric='l2')`` path as tune_shortlist — bounded
    driver state). Returns (nprobe, shortlist, curve) where curve maps
    every measured (nprobe, shortlist) → mean recall@k; the curve is
    the audit artifact: minimality means no measured predecessor on
    either axis meets the target. If even (nlist, max_shortlist)
    misses the target the exhaustive corner is returned — callers can
    see the shortfall in the curve rather than get an exception
    mid-pipeline.
    """
    from weaviate_txtai_spark.operators.topk import knn_topk_gemm

    if not sample_queries:
        raise ValueError("tune_search_params: empty sample_queries")
    truth: dict = {}
    for r in knn_topk_gemm(
        index.ivf.assigned,
        [(qid, list(qv)) for qid, qv in sample_queries],
        k,
        vector_col=index.vector_col,
        id_col=index.id_col,
        metric="l2",
    ).collect():
        truth.setdefault(r["query_id"], set()).add(r[index.id_col])
    if not truth:
        raise ValueError("tune_search_params: no ground truth — empty corpus")

    def measure(nprobe: int, shortlist: int) -> float:
        got: dict = {}
        res = index.search(
            sample_queries, k, nprobe=nprobe, shortlist=shortlist
        )
        for r in res.collect():
            got.setdefault(r["query_id"], set()).add(r[index.id_col])
        return sum(
            len(truth[q] & got.get(q, set())) / len(truth[q]) for q in truth
        ) / len(truth)

    nlist = len(index.ivf.centroids)
    curve: dict[tuple[int, int], float] = {}
    nprobe = 1
    while True:
        nprobe = min(nprobe, nlist)
        # ceiling check first: at max_shortlist the re-rank sees the
        # deepest ADC prefix this nprobe allows — if THAT misses, no
        # smaller shortlist can hit, so the inner ladder never runs
        ceil_recall = measure(nprobe, max_shortlist)
        curve[(nprobe, max_shortlist)] = ceil_recall
        if ceil_recall < recall_target and nprobe == nlist:
            # exhaustive corner: recall is monotone non-decreasing in
            # shortlist under exact re-rank, so if the ceiling misses at
            # nprobe == nlist no inner-ladder point can hit — return the
            # best-available operating point without log2(max_shortlist)
            # wasted measured searches (ADVICE r6)
            return nlist, max_shortlist, curve
        if ceil_recall >= recall_target or nprobe == nlist:
            shortlist = 1
            while shortlist < max_shortlist:
                r = measure(nprobe, shortlist)
                curve[(nprobe, shortlist)] = r
                if r >= recall_target:
                    return nprobe, shortlist, curve
                shortlist *= 2
            return nprobe, max_shortlist, curve
        nprobe *= 2
