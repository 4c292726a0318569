"""Sketch/approximate aggregates (engine surface; the 100 TB substitutes for
exact distinct/percentile): HyperLogLog++ distinct counts and GK-sketch
percentiles. Deterministic for fixed input (rows-only checks: the sketch
algorithms are engine-specific, so no cross-engine oracle), with exact
counterparts asserted in tests at small scale."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators import cms, hll
from .registry import query


@query("sketch_approx_distinct")
def sketch_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HLL++, rsd=1%) per order status -- the
    shuffle-light distinct for 100 TB (fixed-size sketch vs exact's
    per-value shuffle)."""
    o = load_table(spark, sf_dir, "orders")
    # r11: mixing countDistinct with another aggregate makes Catalyst plan
    # an Expand-based 3-level aggregation (row stream doubled, the 16 KB
    # rsd=1% HLL sketch carried through every level) -- measured 4.8 s vs
    # ~1 s for either aggregate alone. HLL is duplicate-insensitive, so
    # both answers come from ONE pre-deduplicated pass: identical approx
    # sketch (same value set -> same registers -> same estimate) and the
    # exact count is count(custkey) over the distinct pairs (count of the
    # non-NULL keys, exactly countDistinct's NULL handling).
    dd = o.select("o_orderstatus", "o_custkey").distinct()
    return dd.groupBy("o_orderstatus").agg(
        F.approx_count_distinct("o_custkey", rsd=0.01).alias("approx_customers"),
        F.count("o_custkey").alias("exact_customers"),
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
    # NULL-key rule (r10 NULL tier): Spark's xxhash64 SKIPS a NULL column
    # (the running hash stays at the 42 seed before the seed-index mixes
    # in), so a NULL key lands in real buckets and gets a real estimate;
    # the ascii chain instead yields NULL. Pin the Spark semantics.
    hh = f"(CASE WHEN k IS NULL THEN {DH.SEED42} ELSE {hh} END)"
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


def _hll_oracle() -> str:
    """Replays operators/hll.py in DuckDB: xxhash64 of each distinct
    (status, custkey) via the XXH64-in-SQL machinery, register index =
    unsigned hash mod 256 (== Spark's pmod of the signed hash), rank =
    1 + trailing zeros of hash >> 8 by the same 6-step binary search,
    exact HUGEINT harmonic sum, one double division at the end."""
    from . import duckhash as DH

    s = DH.Steps("h")
    u = DH.xxh64_long(s, DH.u64_of_i64("k"), DH.SEED42)
    v = s.add(f"({u}) // {DH._c(hll.M)}")
    r_names = []
    for k in (32, 16, 8, 4, 2, 1):
        m = DH._c(1 << k)
        cond = f"({v}) % {m} = 0"
        rk, v = s.add_level(
            [
                f"CASE WHEN {cond} THEN {k} ELSE 0 END",
                f"CASE WHEN {cond} THEN ({v}) // {m} ELSE ({v}) END",
            ]
        )
        r_names.append(rk)
    rho = "1 + " + " + ".join(r_names)
    # IS NOT NULL mirrors hll_registers' COUNT(DISTINCT)-style NULL-key
    # exclusion (Spark xxhash64(NULL) = seed, SQL replay NULL-propagates
    # -- the engines only agree when neither hashes NULL keys)
    inner = s.nest(
        "SELECT DISTINCT o_orderstatus AS g, o_custkey AS k FROM orders "
        "WHERE o_custkey IS NOT NULL"
    )
    pow_list = "[" + ", ".join(f"'{p}'" for p in hll.POW2) + "]"
    lc_list = "[" + ", ".join(hll.LINEAR) + "]"
    two64 = "CAST('18446744073709551616' AS HUGEINT)"
    return f"""
WITH hk AS MATERIALIZED (
  SELECT g, ({u}) % {DH._c(hll.M)} AS reg_idx, {rho} AS rho FROM ({inner})
),
regs AS (SELECT g, reg_idx, MAX(rho) AS reg FROM hk GROUP BY 1, 2),
den AS (
  SELECT g, SUM(CAST(list_extract({pow_list}, reg) AS HUGEINT)) AS sum_term,
         COUNT(*) AS n_regs
  FROM regs GROUP BY g
),
est AS (
  SELECT g, {hll.M} - n_regs AS n_zero,
         {hll.NUM!r} / CAST(CAST(
           sum_term + ({hll.M} - n_regs) * {two64} AS VARCHAR) AS DOUBLE) AS raw
  FROM den
),
ex AS (SELECT o_orderstatus AS g, COUNT(DISTINCT o_custkey) AS exact_customers
       FROM orders GROUP BY 1)
SELECT e.g AS o_orderstatus,
       CASE WHEN n_zero > 0 AND raw <= {hll.LC_THRESHOLD!r}
            THEN CAST(list_extract({lc_list}, n_zero) AS BIGINT)
            ELSE CAST(FLOOR(raw) AS BIGINT) END AS approx_customers,
       CAST(n_zero AS BIGINT) AS n_zero_regs,
       CAST(exact_customers AS BIGINT) AS exact_customers
FROM est e JOIN ex ON e.g = ex.g"""


@query("sketch_hll_portable", oracle=_hll_oracle())
def sketch_hll_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate distinct customers per order status via the PORTABLE
    HyperLogLog (operators/hll.py): xxhash64 registers, exact-decimal
    harmonic sum, no engine sketch binary -- so unlike
    sketch_approx_distinct (HLL++, rows-only by necessity) this one
    hash-matches a DuckDB replay end to end. Exact distinct rides along
    as the self-validation column; tests assert the 1.04/sqrt(256)
    error envelope and register mergeability."""
    o = load_table(spark, sf_dir, "orders")
    est = hll.hll_distinct(o, "o_custkey", ["o_orderstatus"])
    exact = o.groupBy("o_orderstatus").agg(
        F.countDistinct("o_custkey").alias("exact_customers")
    )
    return est.join(exact, "o_orderstatus").select(
        "o_orderstatus",
        F.col("approx_distinct").alias("approx_customers"),
        "n_zero_regs",
        F.col("exact_customers").cast("bigint").alias("exact_customers"),
    )


_HISTO_QS = (25, 50, 75, 99)
_HISTO_BIN = 64.0


def _histo_oracle() -> str:
    """Same fixed-width histogram in DuckDB: bin = FLOOR(price / 64.0)
    (IEEE double division + floor, portable), exact integer cumulative
    counts, and the integer cross-multiplied threshold cum*100 >= n*q
    (== cum >= ceil(n*q/100) without any division)."""
    edges = ", ".join(
        f"CAST(MIN(CASE WHEN cum * 100 >= n * {q} THEN bin END) * {int(_HISTO_BIN)} "
        f"AS BIGINT) AS p{q}_edge"
        for q in _HISTO_QS
    )
    return f"""
WITH counts AS (
  SELECT l_returnflag, CAST(FLOOR(l_extendedprice / {_HISTO_BIN!r}) AS BIGINT) AS bin,
         COUNT(*) AS c
  FROM lineitem WHERE l_extendedprice IS NOT NULL GROUP BY 1, 2
),
cum AS (
  SELECT l_returnflag, bin,
         SUM(c) OVER (PARTITION BY l_returnflag ORDER BY bin) AS cum
  FROM counts
),
tot AS (SELECT l_returnflag, COUNT(*) AS n FROM lineitem
        WHERE l_extendedprice IS NOT NULL GROUP BY 1)
SELECT c.l_returnflag, {edges}, CAST(n AS BIGINT) AS n
FROM cum c JOIN tot t ON c.l_returnflag = t.l_returnflag
GROUP BY c.l_returnflag, n"""


@query("sketch_histogram_percentiles", oracle=_histo_oracle())
def sketch_histogram_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Portable quantile sketch: fixed-width histogram (bin = 64 price
    units), quantile = lower edge of the first bin whose cumulative
    count crosses ceil(n*q/100) -- compared by integer cross-
    multiplication, no division anywhere. Unlike percentile_approx (GK
    sketch, engine-internal), every step is exact integer/IEEE
    arithmetic, so it oracles cross-engine; error is bounded by the bin
    width by construction (tested against exact percentiles). At 100 TB:
    one map-side-combined groupBy onto a bounded bin set per group, a
    window over that tiny set, and bins merge additively across shards
    or days."""
    from pyspark.sql import Window

    # NULL parity (ADVICE r8): Spark windows ORDER BY bin NULLS FIRST while
    # DuckDB defaults NULLS LAST, and NULL-price rows would count toward n
    # without ever landing in a bin -- filter them out on BOTH sides so the
    # quantile edges agree engine-to-engine (tests/test_oracle_null_parity).
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_extendedprice").isNotNull()
    )
    counts = li.groupBy(
        "l_returnflag",
        F.floor(F.col("l_extendedprice") / F.lit(_HISTO_BIN))
        .cast("bigint")
        .alias("bin"),
    ).agg(F.count("*").alias("c"))
    w = Window.partitionBy("l_returnflag").orderBy("bin")
    cum = counts.withColumn("cum", F.sum("c").over(w))
    tot = li.groupBy("l_returnflag").agg(F.count("*").alias("n"))
    edges = [
        (
            F.min(
                F.when(F.col("cum") * 100 >= F.col("n") * q, F.col("bin"))
            )
            * int(_HISTO_BIN)
        )
        .cast("bigint")
        .alias(f"p{q}_edge")
        for q in _HISTO_QS
    ]
    return (
        cum.join(tot, "l_returnflag")
        .groupBy("l_returnflag", "n")
        .agg(*edges)
        .select(
            "l_returnflag", *[f"p{q}_edge" for q in _HISTO_QS],
            F.col("n").cast("bigint").alias("n"),
        )
    )


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
