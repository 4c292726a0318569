"""Count-Min sketch as a DataFrame composition (frequency estimation for
key spaces too large to groupBy exactly).

Batch shape: ONE scan explodes each row into ``depth`` (seed, bucket)
cells; map-side combine collapses them so the shuffle carries at most
depth x width rows per input partition regardless of input size -- the
fixed-memory property that makes CMS the 100 TB substitute for exact
per-key counts. Probing broadcasts the (tiny) sketch table.

All hashing is xxhash64 with fixed integer seeds: deterministic across
runs and partitionings (rows-only check). Standard CMS guarantee: the
estimate never undercounts, and overcounts by more than (e/width) * N
with probability at most e^-depth.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _cells(key: Column, depth: int, width: int) -> Column:
    return F.array(
        *[
            F.struct(
                F.lit(i).alias("seed"),
                F.pmod(F.xxhash64(key, F.lit(i)), F.lit(width)).alias("bucket"),
            )
            for i in range(depth)
        ]
    )


def count_min_sketch_table(
    df: DataFrame, key_col: str, depth: int = 4, width: int = 256
) -> DataFrame:
    """The sketch itself as a (seed, bucket, cnt) table of depth*width rows."""
    cells = df.select(F.explode(_cells(F.col(key_col), depth, width)).alias("c"))
    return cells.groupBy(
        F.col("c.seed").alias("seed"), F.col("c.bucket").alias("bucket")
    ).agg(F.count("*").alias("cnt"))


def count_min_estimates(
    df: DataFrame,
    key_col: str,
    probes: DataFrame,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Estimated frequency of each probe key: min over the key's depth
    buckets (absent bucket == zero). Probes keep their input columns."""
    sketch = count_min_sketch_table(df, key_col, depth, width)
    expanded = probes.withColumn(
        "c", F.explode(_cells(F.col(key_col), depth, width))
    ).select(*probes.columns, F.col("c.seed").alias("seed"), F.col("c.bucket").alias("bucket"))
    return (
        expanded.join(F.broadcast(sketch), ["seed", "bucket"], "left")
        .groupBy(*probes.columns)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("cm_estimate"))
    )
