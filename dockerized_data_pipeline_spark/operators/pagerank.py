"""PageRank over a DataFrame edge list -- the weighted-propagation member
of the engine's iterative family (min-label connected components in
operators/dedup.py, Lloyd's k-means in operators/kmeans.py).

Each iteration is one join + one aggregation over the edge list (no
driver-side graph, no RDDs), with ``localCheckpoint`` truncating the
lineage so 10+ rounds don't stack a 10-deep plan.

Determinism discipline (matches kmeans): all rank arithmetic is DECIMAL.
Float addition is order-dependent and shuffle partitioning is not stable
across runs or cluster sizes; decimal sums are exact, and decimal
division rounds deterministically (HALF_UP) -- so ranks are bit-identical
on any partitioning, any run. Dangling nodes (no out-edges) keep the
standard simplification: their mass leaks out of the system rather than
being redistributed, which preserves ranking order and determinism; pass
a strongly-connected (e.g. symmetrized) edge list when conservation
matters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_RANK = "decimal(38,18)"


def pagerank(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    damping: str = "0.85",
    iterations: int = 10,
) -> DataFrame:
    """Ranks for every node of the directed edge list: (node, rank).

    ``damping`` is a string so it enters the plan as an exact decimal
    literal, not a float.
    """
    # The loop-invariant frames (deduped edges, node set, out-degrees) are
    # materialized ONCE: un-checkpointed they re-ran their scan+distinct
    # shuffles inside every one of the 10 iteration jobs.
    e = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()  # scalar driver value: sizes the teleport term only
    d = F.lit(damping).cast(_RANK)
    teleport = ((F.lit(1).cast(_RANK) - d) / F.lit(n)).cast(_RANK)
    out_deg = (
        e.groupBy("src")
        .agg(F.count("*").alias("out_degree"))
        .localCheckpoint(eager=True)
    )

    ranks = nodes.withColumn(
        "rank", (F.lit(1).cast(_RANK) / F.lit(n)).cast(_RANK)
    ).localCheckpoint()
    for _ in range(iterations):
        contrib = (
            e.join(ranks, e.src == ranks.node)
            .join(out_deg, "src")
            .select(
                F.col("dst").alias("node"),
                (F.col("rank") / F.col("out_degree")).cast(_RANK).alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").cast(_RANK).alias("inbound"))
        )
        ranks = (
            nodes.join(contrib, "node", "left")
            .select(
                "node",
                (teleport + d * F.coalesce(F.col("inbound"), F.lit(0).cast(_RANK)))
                .cast(_RANK)
                .alias("rank"),
            )
            .localCheckpoint()
        )
    return ranks
