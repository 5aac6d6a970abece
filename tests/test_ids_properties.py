"""Property tests: dense-id assignment and int8 quantization invariants
hold for arbitrary sizes/partitionings/values (hypothesis drives the
parameters; each case runs one small Spark job)."""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from weaviate_txtai_spark.operators.ids import with_dense_ids


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    n=st.integers(min_value=0, max_value=300),
    parts=st.integers(min_value=1, max_value=9),
    start=st.integers(min_value=0, max_value=10**12),
)
def test_ids_always_dense(spark, n, parts, start):
    df = spark.range(0, n).repartition(parts).select(F.col("id").alias("v"))
    tagged, got_n = with_dense_ids(df, start=start, id_col="docid")
    rows = tagged.collect()
    assert got_n == n
    assert sorted(r["docid"] for r in rows) == list(range(start, start + n))
    assert len({r["v"] for r in rows}) == n


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    vec=st.lists(
        st.floats(
            min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
        ),
        min_size=1,
        max_size=24,
    )
)
def test_int8_quantize_invariants(spark, vec):
    from weaviate_txtai_spark.functions.vector import int8_quantize, int8_scale

    df = spark.createDataFrame([(vec,)], "v array<double>")
    row = df.select(
        int8_quantize("v").alias("q"), int8_scale("v").alias("s")
    ).collect()[0]
    q, s = list(row["q"]), row["s"]
    assert all(-127 <= x <= 127 for x in q)  # symmetric range
    ma = max(abs(x) for x in vec)
    if ma / 127.0 == 0.0:
        # zero vector, or denormal max|x| whose scale underflows to 0.0:
        # codes must stay consistent with the zero scale
        assert q == [0] * len(vec) and s == 0.0
    else:
        # reconstruction error bound: |x - q*s| <= s/2 per component
        for orig, qi in zip(vec, q):
            assert abs(orig - qi * s) <= s / 2 * (1 + 1e-9)
