"""PageRank over a DataFrame edge list -- the weighted-propagation member
of the engine's iterative family (min-label connected components in
operators/dedup.py, Lloyd's k-means in operators/kmeans.py).

Each iteration is one join + one aggregation over the edge list (no
driver-side graph, no RDDs), with ``localCheckpoint`` truncating the
lineage so 10+ rounds don't stack a 10-deep plan.

Determinism discipline (r8, strengthened from the r5 decimal version):
all rank arithmetic is FIXED-POINT INTEGER over 1e-18 units. Float
addition is order-dependent and shuffle partitioning is not stable across
runs or cluster sizes; integer sums are exact and integer floor-division
is a single well-defined operation, so ranks are bit-identical on any
partitioning, any run -- AND exactly replayable by any engine with 64-bit
integers, which is what makes the trade-graph query hash-matchable
against the DuckDB oracle (VERDICT r7 item 2; the previous decimal
version hit Spark-specific DECIMAL division result-scale rules that no
other engine reproduces).

Every step is floor arithmetic on non-negative BIGINTs:
  * R0(v)      = SCALE div n
  * contrib(u) = R(u) div deg(u)                  (per out-edge)
  * inbound(v) = sum of contribs over in-edges    (exact, <= SCALE)
  * R'(v)      = T + floor(num * inbound / den)   (damping = num/den)
  * T          = floor((den - num) * SCALE / (den * n))
The num/den multiply-divide is decomposed as
``num * (x div den) + (num * (x mod den)) div den`` so no intermediate
exceeds ~SCALE and everything stays in BIGINT (no HUGEINT/DECIMAL).

Dangling nodes (no out-edges) keep the standard simplification: their
mass leaks out of the system rather than being redistributed, which
preserves ranking order and determinism; pass a strongly-connected (e.g.
symmetrized) edge list when conservation matters. Quantization: each
floor drops < 1e-18 of mass per term per iteration -- at most
(edges + nodes) * 1e-18 per round, orders of magnitude below any rank
gap of interest.
"""

from __future__ import annotations

from fractions import Fraction

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 10**18  # rank units: 1.0 == 10^18, max BIGINT ~ 9.2e18


def _mul_div_floor(x: str, num: int, den: int) -> str:
    """SQL for floor(num * x / den) over non-negative BIGINT ``x`` without
    overflowing: num*(x div den) + (num*(x mod den)) div den."""
    return (
        f"(({x}) DIV {den}) * {num} + ((({x}) % {den}) * {num}) DIV {den}"
    )


def pagerank(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    damping: str = "0.85",
    iterations: int = 10,
) -> DataFrame:
    """Ranks for every node of the directed edge list: (node, rank_u)
    where rank_u is the rank in 1e-18 units (BIGINT; divide by 1e18 for
    the conventional [0, 1] value).

    ``damping`` is a string parsed exactly (Fraction), so 0.85 is 17/20
    -- never a float.
    """
    frac = Fraction(damping).limit_denominator(10**6)
    num, den = frac.numerator, frac.denominator
    if not 0 < frac < 1:
        raise ValueError(f"damping must be in (0, 1), got {damping!r}")

    from pyspark.storagelevel import StorageLevel

    # The loop-invariant frames (deduped edges, node set, out-degrees) are
    # materialized ONCE: un-checkpointed they re-ran their scan+distinct
    # shuffles inside every one of the 10 iteration jobs.
    # The edge list is checkpointed DISK_ONLY (r9): it is the one frame
    # that scales with the data (120M rows at the sf10 tier), and the
    # default MEMORY_AND_DISK level parked it in the protected storage
    # half of the unified region, starving the per-iteration hash
    # aggregations into AGGREGATE_OUT_OF_MEMORY on an 8g heap. Edges are
    # scanned once per iteration -- streaming them from local disk costs
    # one sequential read while leaving execution memory whole, which is
    # the right trade for a loop invariant at any scale.
    e = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .distinct()
        .localCheckpoint(eager=True, storageLevel=StorageLevel.DISK_ONLY)
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()  # scalar driver value: sizes the teleport term only
    # T = floor((den-num) * SCALE / (den*n)), decomposed overflow-free
    dn = den * n
    teleport = (den - num) * (SCALE // dn) + ((den - num) * (SCALE % dn)) // dn
    out_deg = (
        e.groupBy("src")
        .agg(F.count("*").alias("out_degree"))
        .localCheckpoint(eager=True)
    )

    ranks = nodes.withColumn(
        "rank_u", F.lit(SCALE // n).cast("bigint")
    ).localCheckpoint()
    for _ in range(iterations):
        contrib = (
            e.join(ranks, e.src == ranks.node)
            .join(out_deg, "src")
            .select(
                F.col("dst").alias("node"),
                F.expr("rank_u DIV out_degree").alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").cast("bigint").alias("inbound"))
        )
        damped = _mul_div_floor("coalesce(inbound, 0)", num, den)
        ranks = (
            nodes.join(contrib, "node", "left")
            .select(
                "node",
                F.expr(f"CAST({teleport} + ({damped}) AS BIGINT)").alias(
                    "rank_u"
                ),
            )
            .localCheckpoint()
        )
    return ranks
