"""Sketch/approximate aggregates (engine surface; the 100 TB substitutes for
exact distinct/percentile): HyperLogLog++ distinct counts and GK-sketch
percentiles. Deterministic for fixed input (rows-only checks: the sketch
algorithms are engine-specific, so no cross-engine oracle), with exact
counterparts asserted in tests at small scale."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators import cms
from .registry import query


@query("sketch_approx_distinct")
def sketch_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HLL++, rsd=1%) per order status -- the
    shuffle-light distinct for 100 TB (fixed-size sketch vs exact's
    per-value shuffle)."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.approx_count_distinct("o_custkey", rsd=0.01).alias("approx_customers"),
        F.countDistinct("o_custkey").alias("exact_customers"),
    )


@query("sketch_approx_percentiles")
def sketch_approx_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percentile_approx (Greenwald-Khanna) -- single-pass mergeable
    quantiles; accuracy 10000 keeps it exact-ish at this scale. The exact
    percentiles ride along so the sketch is self-validating: tests assert
    the relative error bound (at 100 TB you would drop the exact column --
    it buffers per-group values -- and keep only the sketch)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.percentile_approx("l_extendedprice", [0.25, 0.5, 0.75, 0.99], 10000).alias(
            "price_quartiles"
        ),
        F.percentile("l_extendedprice", F.lit([0.25, 0.5, 0.75, 0.99])).alias(
            "exact_quartiles"
        ),
        F.count("*").alias("n"),
    )


def _cms_oracle(depth: int = 4, width: int = 256) -> str:
    """Replays the CMS build + probe in DuckDB using the XXH64-in-SQL
    machinery (plans/duckhash.py): bucket_i = xxhash64(key, i) mod width
    -- Spark's pmod of the signed hash equals the unsigned value's mod
    because 2^64 is a multiple of the width. Hashing runs per DISTINCT
    key (the sketch and the probes both derive from the same 5
    priorities), then the cell counts weight by the exact frequencies."""
    from . import duckhash as DH

    s = DH.Steps("c")
    hh = DH.xxh64_ascii(s, "k", DH.SEED42)
    mixed = DH.xxh64_int_batch(s, [str(i) for i in range(depth)], hh)
    buckets = ", ".join(
        f"({m}) % {DH._c(width)} AS b{i}" for i, m in enumerate(mixed)
    )
    inner = s.nest(
        "SELECT o_orderpriority AS k, COUNT(*) AS n FROM orders GROUP BY 1"
    )
    cell_union = " UNION ALL ".join(
        f"SELECT {i} AS seed, b{i} AS bucket, n FROM hk" for i in range(depth)
    )
    probe_union = " UNION ALL ".join(
        f"SELECT k, n, {i} AS seed, b{i} AS bucket FROM hk"
        for i in range(depth)
    )
    return f"""
WITH hk AS MATERIALIZED (
  SELECT k, n, {buckets} FROM ({inner})
),
sketch AS (
  SELECT seed, bucket, SUM(n) AS cnt FROM ({cell_union}) GROUP BY 1, 2
)
SELECT p.k AS o_orderpriority,
       CAST(p.n AS BIGINT) AS exact_count,
       CAST(MIN(COALESCE(s.cnt, 0)) AS BIGINT) AS cm_estimate
FROM ({probe_union}) p
LEFT JOIN sketch s ON p.seed = s.seed AND p.bucket = s.bucket
GROUP BY p.k, p.n"""


@query("sketch_count_min_freq", oracle=_cms_oracle())
def sketch_count_min_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min frequency estimates (operators/cms.py) for each order
    priority, with the exact count riding along so the sketch is
    self-validating (test asserts estimate >= exact and the CMS
    overcount bound). Deterministic: fixed xxhash64 seeds. Hash-matched
    (r8, was rows-only): the XXH64 bucket assignment replays in DuckDB
    (plans/duckhash.py)."""
    o = load_table(spark, sf_dir, "orders")
    exact = o.groupBy("o_orderpriority").agg(F.count("*").alias("exact_count"))
    return cms.count_min_estimates(
        o, "o_orderpriority", exact, depth=4, width=256
    ).select("o_orderpriority", "exact_count", "cm_estimate")


@query("sketch_hll_mergeable_rollup")
def sketch_hll_mergeable_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-level mergeable-sketch rollup (Apache DataSketches HLL): build
    one per-(event_type, day) user sketch, then UNION the daily sketches
    into the per-type total -- the incremental pattern that lets a 100 TB
    pipeline keep small daily sketches and re-derive any coarser distinct
    count without touching raw data (register-max merge is commutative, so
    the result is partition-order invariant). Rows-only: the sketch binary
    is engine-specific; tests assert the estimate against exact distincts.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.groupBy("event_type", F.date_trunc("day", F.col("ts")).alias("day"))
        .agg(F.hll_sketch_agg("user_id").alias("sk"))
    )
    return (
        daily.groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n_days"),
            F.hll_sketch_estimate(F.hll_union_agg("sk"))
            .cast("bigint")
            .alias("approx_users"),
        )
        .orderBy("event_type")
    )
