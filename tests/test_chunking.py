"""Invariants for chunk_docs / pack_sequences (operators/chunking.py)."""

from pyspark.sql import functions as F

from weaviate_txtai_spark.operators.chunking import chunk_docs, pack_sequences


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def test_chunks_cover_and_overlap(spark):
    text = "abcdefghij" * 25  # 250 chars
    df = _docs(spark, [(1, "s", text)])
    chunks = chunk_docs(df, size=100, stride=50).orderBy("chunk_id").collect()
    # starts at 0,50,100,150,200 → 5 chunks; last is short (50 chars)
    assert [c["chunk_id"] for c in chunks] == [0, 1, 2, 3, 4]
    assert [c["chunk_len"] for c in chunks] == [100, 100, 100, 100, 50]
    for a, b in zip(chunks, chunks[1:]):
        assert a["chunk_text"][50:] == b["chunk_text"][: len(a["chunk_text"][50:])]
    # stride == size → exact partition, lossless reassembly
    exact = chunk_docs(df, size=50, stride=50).orderBy("chunk_id").collect()
    assert "".join(c["chunk_text"] for c in exact) == text


def test_empty_doc_yields_one_empty_chunk(spark):
    chunks = chunk_docs(_docs(spark, [(1, "s", "")]), size=10, stride=5).collect()
    assert len(chunks) == 1 and chunks[0]["chunk_len"] == 0


def test_pack_budget_invariant(spark, sf_dir):
    from weaviate_txtai_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    budget = 128
    packs = pack_sequences(docs, budget=budget)
    stats = (
        packs.groupBy("source", "pack_id")
        .agg(F.sum("n_tokens").alias("tot"), F.max("n_tokens").alias("mx"))
        .collect()
    )
    assert stats
    for r in stats:
        # a pack overflows only by the doc that crossed the boundary
        assert r["tot"] < budget + r["mx"] or r["tot"] == r["mx"]
    # pack ids per source start at 0 and are monotone in doc order
    per_source = (
        packs.groupBy("source")
        .agg(F.min("pack_id").alias("mn"), F.max("pack_id").alias("mx"))
        .collect()
    )
    for r in per_source:
        assert r["mn"] == 0
    rows = packs.orderBy("source", "doc_id").collect()
    last = {}
    for r in rows:
        prev = last.get(r["source"], 0)
        assert r["pack_id"] >= prev
        last[r["source"]] = r["pack_id"]


def _pack_invariants(packs, docs, budget, group_col="source"):
    """Shared pack-invariant assertions: per-pack budget bound, dense
    pack ids from 0 per group, every doc assigned exactly once, token
    totals preserved."""
    stats = (
        packs.groupBy(group_col, "pack_id")
        .agg(F.sum("n_tokens").alias("tot"), F.max("n_tokens").alias("mx"))
        .collect()
    )
    assert stats
    for r in stats:
        assert r["tot"] < budget + r["mx"] or r["tot"] == r["mx"]
    per_group = {}
    for r in packs.select(group_col, "pack_id").collect():
        per_group.setdefault(r[group_col], set()).add(r["pack_id"])
    for g, ids in per_group.items():
        assert ids == set(range(len(ids))), f"pack ids not dense for {g}: {sorted(ids)[:5]}…"
    assert packs.count() == docs.count()
    assert packs.select("doc_id").distinct().count() == docs.count()


def test_pack_salted_invariants(spark, sf_dir):
    """Opt-in sharded packing (VERDICT r2 item 2): budget + density
    invariants hold, and token totals match the unsalted assignment."""
    from weaviate_txtai_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    budget = 128
    salted = pack_sequences(docs, budget=budget, shards=4)
    _pack_invariants(salted, docs, budget)
    # the same docs with the same token counts are packed either way
    base = pack_sequences(docs, budget=budget)
    assert (
        salted.agg(F.sum("n_tokens")).collect()[0][0]
        == base.agg(F.sum("n_tokens")).collect()[0][0]
    )


def test_pack_salt_col_invariants(spark):
    """An existing coarse column (e.g. ingest date) can be the salt."""
    rows = [
        (i, "src", f"d{i}", " ".join(f"w{j}" for j in range(10)))
        for i in range(40)
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, source string, day string, text string"
    )
    packs = pack_sequences(docs, budget=25, salt_col="day")
    _pack_invariants(packs, docs, 25)


def test_pack_oversize_doc_density(spark):
    """A doc spanning several budget multiples must not leave pack-id
    holes (floor of the prefix sum alone would skip ids; dense_rank
    closes them) — in both the unsalted and the sharded path."""
    rows = [
        (1, "s", " ".join(f"a{j}" for j in range(1200))),  # ~2.3x budget
        (2, "s", " ".join(f"b{j}" for j in range(10))),
        (3, "s", " ".join(f"c{j}" for j in range(10))),
        (4, "s", " ".join(f"d{j}" for j in range(2000))),  # ~4x budget
        (5, "s", " ".join(f"e{j}" for j in range(10))),
    ]
    docs = _docs(spark, rows)
    for kwargs in ({}, {"shards": 2}):
        packs = pack_sequences(docs, budget=512, **kwargs)
        _pack_invariants(packs, docs, 512)


def test_pack_salted_parallelism(spark):
    """The salted plan partitions the heavy window by (group, salt) —
    a single-source corpus no longer funnels into one window partition."""
    docs = spark.createDataFrame(
        [(i, "only_source", "w " * 20) for i in range(100)],
        "doc_id long, source string, text string",
    )
    plan = (
        pack_sequences(docs, budget=64, shards=8)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # the doc-cardinality window (the one summing __toks) must key on
    # the salt, not source alone
    wins = [
        ln for ln in plan.splitlines()
        if "Window [sum(__toks" in ln.strip()
    ]
    assert wins, plan
    assert all("__salt" in w for w in wins), plan
