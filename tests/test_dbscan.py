"""operators/dbscan.py."""

import pytest

from weaviate_txtai_spark.operators.dbscan import dbscan


def _run(spark, ids, pairs, min_neighbors):
    ids_df = spark.createDataFrame([(i,) for i in ids], ["id"])
    pairs_df = spark.createDataFrame(pairs, ["i", "j"])
    return {
        r.id: (r.role, r.cluster)
        for r in dbscan(
            ids_df, pairs_df, min_neighbors=min_neighbors
        ).collect()
    }


def test_two_clusters_border_noise(spark):
    # cluster A: 1-2-3-4 mutually close (each ≥2 neighbors);
    # border 5 hangs off 4; cluster B: 10,11,12 triangle; 20 isolated
    pairs = [
        (1, 2), (1, 3), (2, 3), (3, 4), (2, 4), (1, 4),
        (4, 5),
        (10, 11), (10, 12), (11, 12),
    ]
    got = _run(spark, [1, 2, 3, 4, 5, 10, 11, 12, 20], pairs, 2)
    assert all(got[i][0] == "core" for i in [1, 2, 3, 4, 10, 11, 12])
    assert got[5] == ("border", got[4][1])
    assert got[20] == ("noise", None)
    assert len({got[i][1] for i in [1, 2, 3, 4]}) == 1
    assert len({got[i][1] for i in [10, 11, 12]}) == 1
    assert got[1][1] != got[10][1]


def test_chain_of_cores_is_one_cluster(spark):
    # path where every interior node has 2 neighbors: cores chain into
    # ONE cluster; the endpoints (1 neighbor) become border
    pairs = [(i, i + 1) for i in range(6)]
    got = _run(spark, list(range(7)), pairs, 2)
    cores = [i for i in range(7) if got[i][0] == "core"]
    assert cores == [1, 2, 3, 4, 5]
    assert len({got[i][1] for i in cores}) == 1
    assert got[0][0] == "border" and got[6][0] == "border"


def test_border_tie_breaks_to_min_cluster(spark):
    # node 99 adjacent to two DIFFERENT clusters' cores but with only 2
    # neighbors (< min_neighbors=3): border, min cluster label wins
    k4a = [(a, b) for a in [1, 2, 3, 4] for b in [1, 2, 3, 4] if a < b]
    k4b = [(a, b) for a in [10, 11, 12, 13] for b in [10, 11, 12, 13] if a < b]
    pairs = k4a + k4b + [(3, 99), (10, 99)]
    got = _run(spark, [1, 2, 3, 4, 10, 11, 12, 13, 99], pairs, 3)
    assert got[99][0] == "border"
    assert got[99][1] == min(got[1][1], got[10][1])
    assert got[1][1] != got[10][1]  # 99 must not merge the clusters


def test_isolated_core_pair_and_min_neighbors(spark):
    # two mutually-close points: with min_neighbors=1 both core, one
    # cluster; with 2 both noise
    pairs = [(1, 2)]
    got1 = _run(spark, [1, 2], pairs, 1)
    assert got1[1][0] == "core" and got1[1][1] == got1[2][1]
    got2 = _run(spark, [1, 2], pairs, 2)
    assert got2[1] == ("noise", None) and got2[2] == ("noise", None)
    with pytest.raises(ValueError):
        _run(spark, [1], [], 0)
