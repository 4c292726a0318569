"""PageRank invariants: cycle uniformity, hub dominance, mass
conservation on strongly-connected graphs, and bit-exact determinism
across runs and partitionings (the decimal-arithmetic discipline)."""

from __future__ import annotations

from decimal import Decimal

from dockerized_data_pipeline_spark.operators.pagerank import pagerank


def _edges(spark, pairs, parts=None):
    df = spark.createDataFrame(pairs, "src long, dst long")
    return df.repartition(parts) if parts else df


def test_cycle_is_uniform_and_conserves_mass(spark):
    # 5-cycle: symmetric structure -> every node gets exactly 1/5
    cyc = [(i, (i + 1) % 5) for i in range(5)]
    got = {r.node: r.rank for r in pagerank(_edges(spark, cyc), iterations=7).collect()}
    assert len(set(got.values())) == 1
    total = sum(got.values())
    assert abs(total - Decimal(1)) < Decimal("0.000001")  # no dangling -> conserved


def test_hub_outranks_spokes(spark):
    # spokes all point at the hub and the hub points back: hub dominates
    spokes = list(range(1, 6))
    edges = [(s, 0) for s in spokes] + [(0, s) for s in spokes]
    got = {r.node: r.rank for r in pagerank(_edges(spark, edges), iterations=10).collect()}
    assert got[0] > max(got[s] for s in spokes)
    assert len({got[s] for s in spokes}) == 1  # symmetric spokes tie exactly


def test_deterministic_across_runs_and_partitionings(spark):
    edges = [(i, (i * 3 + 1) % 17) for i in range(17)] + [(i, (i + 5) % 17) for i in range(17)]
    a = sorted((r.node, r.rank) for r in pagerank(_edges(spark, edges), iterations=6).collect())
    b = sorted((r.node, r.rank) for r in pagerank(_edges(spark, edges, parts=7), iterations=6).collect())
    assert a == b  # bit-identical decimals, not approximately-equal floats
