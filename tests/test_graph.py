"""triangle_count_bitset: exact counts vs a brute-force reference on
known graphs, empty/degenerate inputs, and >64-node graphs (multi-word
masks)."""

from __future__ import annotations

from itertools import combinations

from dockerized_data_pipeline_spark.operators.graph import triangle_count_bitset


def _count_ref(edges):
    es = set(edges)
    nodes = sorted({x for e in es for x in e})
    return sum(
        1
        for x, y, z in combinations(nodes, 3)
        if (x, y) in es and (y, z) in es and (x, z) in es
    )


def _run(spark, edges):
    df = spark.createDataFrame(edges or [(0, 0)], "a long, b long")
    if not edges:
        df = df.filter("a < 0")
    return triangle_count_bitset(df).collect()[0].n_triangles


def test_known_small_graphs(spark):
    k4 = [(a, b) for a, b in combinations(range(4), 2)]  # complete: C(4,3)=4
    assert _run(spark, k4) == 4
    tri_plus_tail = [(1, 2), (1, 3), (2, 3), (3, 4)]
    assert _run(spark, tri_plus_tail) == 1
    square = [(1, 2), (2, 3), (3, 4), (1, 4)]  # 4-cycle, no chord
    assert _run(spark, square) == 0
    assert _run(spark, []) == 0
    assert _run(spark, [(7, 9)]) == 0


def test_matches_bruteforce_on_random_graph(spark):
    # deterministic pseudo-random graph over 150 nodes (multi-word masks,
    # non-contiguous sparse node ids)
    edges = sorted(
        {
            tuple(sorted(((i * 37 + 11) % 331, (i * 101 + 73) % 331)))
            for i in range(900)
        }
    )
    edges = [(a, b) for a, b in edges if a != b]
    assert _run(spark, edges) == _count_ref(edges)
