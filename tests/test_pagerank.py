"""PageRank invariants: cycle uniformity, hub dominance, mass
conservation on strongly-connected graphs, bit-exact determinism across
runs and partitionings, and exact replay by an independent pure-Python
fixed-point reference (the same property the DuckDB oracle CTE chain
relies on)."""

from __future__ import annotations

from dockerized_data_pipeline_spark.operators.pagerank import SCALE, pagerank


def _edges(spark, pairs, parts=None):
    df = spark.createDataFrame(pairs, "src long, dst long")
    return df.repartition(parts) if parts else df


def _reference(pairs, iterations, num=85, den=100):
    """Independent fixed-point replay: floor arithmetic per the operator
    docstring, plain dicts -- no Spark, no shared code."""
    e = sorted(set(pairs))
    nodes = sorted({u for u, _ in e} | {v for _, v in e})
    n = len(nodes)
    deg: dict[int, int] = {}
    for u, _ in e:
        deg[u] = deg.get(u, 0) + 1
    dn = den * n
    t = (den - num) * (SCALE // dn) + ((den - num) * (SCALE % dn)) // dn
    r = {v: SCALE // n for v in nodes}
    for _ in range(iterations):
        inb = {v: 0 for v in nodes}
        for u, v in e:
            inb[v] += r[u] // deg[u]
        r = {
            v: t + (inb[v] // den) * num + ((inb[v] % den) * num) // den
            for v in nodes
        }
    return r


def test_cycle_is_uniform_and_conserves_mass(spark):
    # 5-cycle: symmetric structure -> every node gets exactly 1/5
    cyc = [(i, (i + 1) % 5) for i in range(5)]
    got = {r.node: r.rank_u for r in pagerank(_edges(spark, cyc), iterations=7).collect()}
    assert len(set(got.values())) == 1
    total = sum(got.values())
    # no dangling -> conserved up to floor quantization (< 1e-12 of mass)
    assert SCALE - total < SCALE // 10**12


def test_hub_outranks_spokes(spark):
    # spokes all point at the hub and the hub points back: hub dominates
    spokes = list(range(1, 6))
    edges = [(s, 0) for s in spokes] + [(0, s) for s in spokes]
    got = {r.node: r.rank_u for r in pagerank(_edges(spark, edges), iterations=10).collect()}
    assert got[0] > max(got[s] for s in spokes)
    assert len({got[s] for s in spokes}) == 1  # symmetric spokes tie exactly


def test_deterministic_across_runs_and_partitionings(spark):
    edges = [(i, (i * 3 + 1) % 17) for i in range(17)] + [(i, (i + 5) % 17) for i in range(17)]
    a = sorted((r.node, r.rank_u) for r in pagerank(_edges(spark, edges), iterations=6).collect())
    b = sorted((r.node, r.rank_u) for r in pagerank(_edges(spark, edges, parts=7), iterations=6).collect())
    assert a == b  # bit-identical integers, not approximately-equal floats


def test_matches_independent_fixed_point_reference(spark):
    # irregular digraph with a dangling node (9 has no out-edges)
    edges = [(0, 1), (0, 2), (1, 2), (2, 0), (3, 2), (4, 2), (2, 9),
             (5, 0), (5, 9), (6, 5), (7, 5), (8, 7), (3, 8)]
    got = {r.node: r.rank_u for r in pagerank(_edges(spark, edges), iterations=5).collect()}
    assert got == _reference(edges, 5)


def test_non_default_damping_is_exact_fraction(spark):
    edges = [(0, 1), (1, 2), (2, 0), (2, 1)]
    got = {
        r.node: r.rank_u
        for r in pagerank(_edges(spark, edges), damping="0.5", iterations=4).collect()
    }
    assert got == _reference(edges, 4, num=1, den=2)
