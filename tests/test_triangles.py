"""triangle_count — hand graphs, orientation invariants."""

from pyspark.sql import functions as F

from weaviate_txtai_spark.operators.graph import triangle_count


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def test_k4_plus_path(spark):
    """K4: 4 triangles, each node in C(3,2)=3; the attached path adds
    none and its nodes are omitted (sparse output contract)."""
    out = sorted(
        (r["node"], r["triangles"])
        for r in triangle_count(
            _edges(
                spark,
                [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
                 (5, 6), (6, 7), (4, 5)],
            )
        ).collect()
    )
    assert out == [(1, 3), (2, 3), (3, 3), (4, 3)]


def test_duplicate_reverse_and_self_edges_ignored(spark):
    """(2,1) vs (1,2), repeats, and self-loops must not change counts."""
    base = [(1, 2), (2, 3), (3, 1)]
    noisy = base + [(2, 1), (1, 2), (3, 3), (1, 1), (3, 2)]
    a = sorted(map(tuple, triangle_count(_edges(spark, base)).collect()))
    b = sorted(map(tuple, triangle_count(_edges(spark, noisy)).collect()))
    assert a == b == [(1, 1), (2, 1), (3, 1)]


def test_star_has_no_triangles(spark):
    """A hub with many spokes (the celebrity-node shape the orientation
    exists for) has zero triangles — empty output."""
    star = [(0, i) for i in range(1, 30)]
    assert triangle_count(_edges(spark, star)).count() == 0


def test_two_disjoint_triangles_sharing_no_node(spark):
    out = sorted(
        map(
            tuple,
            triangle_count(
                _edges(spark, [(1, 2), (2, 3), (3, 1), (7, 8), (8, 9), (9, 7)])
            ).collect(),
        )
    )
    assert out == [(1, 1), (2, 1), (3, 1), (7, 1), (8, 1), (9, 1)]


def test_clique_closed_form(spark):
    """K6: every node in C(5,2) = 10 triangles."""
    pairs = [(i, j) for i in range(6) for j in range(i + 1, 6)]
    out = triangle_count(_edges(spark, pairs)).collect()
    assert sorted(r["triangles"] for r in out) == [10] * 6
