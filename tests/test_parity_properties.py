"""Property-based PARITY tests against independent oracles (r11): the
hostile-input sweeps prove edge behavior; these prove the core
semantics on randomized inputs the fixtures never cover.

- asof_join (backward/forward) vs pandas.merge_asof on random keyed
  event sets with duplicate timestamps and unmatched keys.
- edit_distance_join vs a brute-force Levenshtein double loop on random
  short strings (exercises the short pool, the boundary band, AND the
  rare-gram probe path).
- sequence_pairs support vs a brute-force per-user scan.

Hypothesis drives the input shapes; examples are kept small so each
case is one local Spark job.
"""

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from pyspark.sql import functions as F

_SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@st.composite
def _asof_case(draw):
    n_left = draw(st.integers(1, 8))
    n_right = draw(st.integers(0, 8))
    keys = st.integers(1, 3)
    ts = st.integers(0, 20)
    left = [(draw(keys), draw(ts)) for _ in range(n_left)]
    right = [
        (draw(keys), draw(ts), draw(st.integers(0, 99)))
        for _ in range(n_right)
    ]
    # pandas merge_asof needs unique right (key, ts) — the operator's
    # documented expectation too
    seen = set()
    right = [
        r for r in right
        if (r[0], r[1]) not in seen and not seen.add((r[0], r[1]))
    ]
    return left, right


def _pandas_asof(left, right, direction):
    lp = pd.DataFrame(left, columns=["k", "ts"]).sort_values(
        ["ts", "k"], kind="mergesort"
    )
    rp = pd.DataFrame(right, columns=["k", "ts", "sig"]).sort_values(
        ["ts", "k"], kind="mergesort"
    )
    if rp.empty:
        out = lp.copy()
        out["sig"] = None
        return out
    m = pd.merge_asof(
        lp, rp, on="ts", by="k", direction=direction,
        suffixes=("", "_r"),
    )
    return m


@settings(**_SETTINGS)
@given(case=_asof_case(), direction=st.sampled_from(["backward", "forward"]))
def test_asof_join_matches_pandas_merge_asof(spark, case, direction):
    from weaviate_txtai_spark.operators.asof import asof_join

    left, right = case
    ldf = spark.createDataFrame(left, "k long, ts long")
    rdf = spark.createDataFrame(right, "k long, ts long, sig long")
    got = asof_join(ldf, rdf, on=["k"], direction=direction)
    got_rows = sorted(
        ((r.k, r.ts, r.sig) for r in got.collect()),
        key=lambda t: (t[0], t[1], -1 if t[2] is None else t[2]),
    )
    exp = _pandas_asof(left, right, direction)
    exp_rows = sorted(
        (
            (int(r.k), int(r.ts), None if pd.isna(r.sig) else int(r.sig))
            for r in exp.itertuples()
        ),
        key=lambda t: (t[0], t[1], -1 if t[2] is None else t[2]),
    )
    assert got_rows == exp_rows


def _lev(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


@settings(**_SETTINGS)
@given(
    strings=st.lists(
        st.text(alphabet="abc", min_size=0, max_size=10),
        min_size=2, max_size=10,
    ),
    k=st.integers(1, 2),
)
def test_edit_distance_join_matches_bruteforce(spark, strings, k):
    from weaviate_txtai_spark.operators.stringjoin import edit_distance_join

    rows = [(i, s) for i, s in enumerate(strings)]
    df = spark.createDataFrame(rows, "id long, s string")
    got = {
        (r.id1, r.id2, r.dist)
        for r in edit_distance_join(df, "id", "s", k=k).collect()
    }
    exp = set()
    for i in range(len(rows)):
        for j in range(i + 1, len(rows)):
            d = _lev(rows[i][1], rows[j][1])
            if d <= k:
                exp.add((i, j, d))
    assert got == exp


@settings(**_SETTINGS)
@given(
    events=st.lists(
        st.tuples(
            st.integers(1, 3),              # user
            st.sampled_from(["a", "b", "c"]),
            st.integers(0, 5000),           # seconds
        ),
        min_size=1, max_size=20,
    ),
)
def test_sequence_pairs_support_matches_bruteforce(spark, events):
    from weaviate_txtai_spark.operators.seqmine import sequence_pairs

    df = spark.createDataFrame(
        [(u, t, s * 1_000_000) for u, t, s in events],
        "user_id long, event_type string, us long",
    ).select(
        "user_id", "event_type",
        F.timestamp_micros(F.col("us")).alias("ts"),
    )
    out = {
        (r.a, r.b): r.support
        for r in sequence_pairs(
            df, window_seconds=3600, min_support=1
        ).collect()
    }
    # brute force: per user, distinct (a, b) with 0 < tb-ta <= 1h
    per_user: dict = {}
    for u, t, s in set(events):
        per_user.setdefault(u, []).append((t, s))
    exp: dict = {}
    for u, evs in per_user.items():
        pats = set()
        for ta_t, ta_s in evs:
            for tb_t, tb_s in evs:
                if 0 < tb_s - ta_s <= 3600:
                    pats.add((ta_t, tb_t))
        for p in pats:
            exp[p] = exp.get(p, 0) + 1
    assert out == exp
