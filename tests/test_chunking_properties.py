"""Property tests for chunk_docs / pack_sequences over random unicode.

Each hypothesis example generates a BATCH of documents and runs one
Spark job for the whole batch (per-row Spark jobs would be 100x
slower), verifying the operator against a plain-Python reimplementation
of its contract row by row.
"""

from hypothesis import given, settings, strategies as st

from pyspark.sql import functions as F

from weaviate_txtai_spark.operators.chunking import chunk_docs, pack_sequences

TEXT = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=300
)


@settings(max_examples=5, deadline=None)
@given(st.lists(TEXT, min_size=1, max_size=25))
def test_chunk_reassembly_property(spark, texts):
    size, stride = 50, 50  # exact partition: lossless reassembly
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got: dict[int, list] = {}
    for r in chunk_docs(df, size=size, stride=stride).collect():
        got.setdefault(r["doc_id"], []).append((r["chunk_id"], r["chunk_text"]))
    for i, t in enumerate(texts):
        chunks = [c for _, c in sorted(got[i])]
        assert "".join(chunks) == t
        # every chunk except the last is exactly `size` chars
        for c in chunks[:-1]:
            assert len(c) == size


@settings(max_examples=5, deadline=None)
@given(st.lists(TEXT, min_size=1, max_size=25), st.integers(8, 64))
def test_pack_prefix_sum_property(spark, texts, budget):
    df = spark.createDataFrame(
        [(i, "s", t) for i, t in enumerate(texts)],
        "doc_id long, source string, text string",
    )
    rows = {
        r["doc_id"]: (r["n_tokens"], r["pack_id"])
        for r in pack_sequences(df, budget=budget).collect()
    }
    # python mirror of the exclusive-prefix-sum spec
    cum = 0
    for i, t in enumerate(texts):
        n_tok = len([w for w in t.split(" ") if w])
        expect_pack = cum // budget
        assert rows[i] == (n_tok, expect_pack), (i, rows[i], (n_tok, expect_pack))
        cum += n_tok
