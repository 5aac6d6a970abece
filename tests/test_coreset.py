"""operators/coreset.kcenter_coreset."""

import math

import pytest

from weaviate_txtai_spark.operators.coreset import kcenter_coreset


def _cos_dist(a, b):
    dot = sum(x * y for x, y in zip(a, b))
    na = math.sqrt(sum(x * x for x in a))
    nb = math.sqrt(sum(x * x for x in b))
    return 1 - dot / (na * nb)


def _py_kcenter(vecs, k, seed):
    ids = sorted(vecs)
    sel = [seed]
    out = [(1, seed, 0.0)]
    dmin = {i: round(_cos_dist(vecs[i], vecs[seed]), 6) for i in ids}
    for rank in range(2, k + 1):
        cand = [i for i in ids if i not in sel]
        best = max(cand, key=lambda i: (dmin[i], -i))
        out.append((rank, best, dmin[best]))
        sel.append(best)
        for i in ids:
            dmin[i] = min(dmin[i], round(_cos_dist(vecs[i], vecs[best]), 6))
    return out


def test_kcenter_matches_reference(spark):
    import random

    rng = random.Random(21)
    vecs = {
        i: [rng.gauss(0, 1) for _ in range(8)] for i in range(40)
    }
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in vecs.items()],
        "vec_id long, embedding array<float>",
    ).repartition(4)
    got = [
        (r.rank, r.vec_id, r.min_dist)
        for r in kcenter_coreset(df, 5).orderBy("rank").collect()
    ]
    # float32 storage: recompute reference on the float32-rounded vectors
    import struct

    f32 = {
        i: [struct.unpack("f", struct.pack("f", x))[0] for x in v]
        for i, v in vecs.items()
    }
    want = _py_kcenter(f32, 5, seed=0)
    assert [(g[0], g[1]) for g in got] == [(w[0], w[1]) for w in want]
    for g, w in zip(got, want):
        assert g[2] == pytest.approx(w[2], abs=2e-6)
    # farthest-first invariant: selection distances non-increasing
    dists = [g[2] for g in got][1:]
    assert all(a >= b for a, b in zip(dists, dists[1:]))


def test_kcenter_orthogonal_picks_all_axes(spark):
    # 3 orthogonal clusters: k=3 must pick one per cluster
    base = {
        0: [1.0, 0.0, 0.0], 1: [0.99, 0.01, 0.0],
        2: [0.0, 1.0, 0.0], 3: [0.0, 0.98, 0.02],
        4: [0.0, 0.0, 1.0],
    }
    df = spark.createDataFrame(
        [(i, v) for i, v in base.items()],
        "vec_id long, embedding array<float>",
    )
    got = {r.vec_id for r in kcenter_coreset(df, 3).collect()}
    axes = {
        tuple(1 if x > 0.5 else 0 for x in base[i]) for i in got
    }
    assert len(axes) == 3


def test_kcenter_k_exceeds_corpus(spark):
    df = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])],
        "vec_id long, embedding array<float>",
    )
    rows = kcenter_coreset(df, 10).collect()
    assert len(rows) == 2
    with pytest.raises(ValueError):
        kcenter_coreset(df, 0)
    with pytest.raises(ValueError):
        kcenter_coreset(df, 2, seed_id=99)
