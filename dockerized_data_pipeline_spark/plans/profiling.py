"""Data-profiling query (T8 completeness checking generalized): per-column
null counts, distinct counts, and ranges in ONE scan -- the batch shape of
the quality checks a pipeline runs after every load. All-exact arithmetic,
oracle-checked."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from .registry import query


@query(
    "t8_histogram_totalprice",
    oracle="""
    SELECT CAST(FLOOR(o_totalprice / 50000) AS BIGINT) AS bucket,
           COUNT(*) AS n,
           CAST(CAST(MIN(o_totalprice) AS DECIMAL(12,2)) AS DOUBLE) AS lo,
           CAST(CAST(MAX(o_totalprice) AS DECIMAL(12,2)) AS DOUBLE) AS hi
    FROM orders GROUP BY 1
    """,
)
def t8_histogram_totalprice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram via integer bucket arithmetic (portable; the
    one-scan shape of distribution profiling)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.floor(F.col("o_totalprice") / 50000).cast("bigint").alias("bucket")
        )
        .agg(
            F.count("*").alias("n"),
            F.min("o_totalprice").cast("decimal(12,2)").alias("lo"),
            F.max("o_totalprice").cast("decimal(12,2)").alias("hi"),
        )
    )


@query(
    "t8_profile_orders",
    oracle="""
    SELECT COUNT(*) AS n_rows,
           COUNT(o_custkey) AS custkey_nonnull,
           COUNT(DISTINCT o_custkey) AS custkey_distinct,
           COUNT(DISTINCT o_orderstatus) AS status_distinct,
           MIN(o_orderdate) AS first_order,
           MAX(o_orderdate) AS last_order,
           CAST(SUM(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS nonpositive_prices,
           CAST(SUM(CASE WHEN o_orderpriority IS NULL OR o_orderpriority = '' THEN 1 ELSE 0 END) AS BIGINT) AS blank_priorities
    FROM orders
    """,
)
def t8_profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.agg(
        F.count("*").alias("n_rows"),
        F.count("o_custkey").alias("custkey_nonnull"),
        F.countDistinct("o_custkey").alias("custkey_distinct"),
        F.countDistinct("o_orderstatus").alias("status_distinct"),
        F.min("o_orderdate").alias("first_order"),
        F.max("o_orderdate").alias("last_order"),
        F.sum(F.when(F.col("o_totalprice") <= 0, 1).otherwise(0)).alias("nonpositive_prices"),
        F.sum(
            F.when(F.col("o_orderpriority").isNull() | (F.col("o_orderpriority") == ""), 1).otherwise(0)
        ).alias("blank_priorities"),
    )


# Referential-integrity audit: orphan counts across the fact->dim edges,
# the cross-table half of the T8 quality checks. Each edge is a left-anti
# join; the dim side of each is the distinct key set, so at 100 TB every
# check is one shuffle (or broadcast when the key set is small, as with
# supplier here). One row per check so downstream alerting can threshold
# on n_violations.
@query(
    "t8_fk_audit",
    oracle="""
    SELECT 'lineitem_without_order' AS check_name, COUNT(*) AS n_violations
    FROM lineitem WHERE NOT EXISTS (
      SELECT 1 FROM orders WHERE o_orderkey = l_orderkey)
    UNION ALL
    SELECT 'lineitem_without_supplier', COUNT(*)
    FROM lineitem WHERE NOT EXISTS (
      SELECT 1 FROM supplier WHERE s_suppkey = l_suppkey)
    UNION ALL
    SELECT 'order_without_customer', COUNT(*)
    FROM orders WHERE NOT EXISTS (
      SELECT 1 FROM customer WHERE c_custkey = o_custkey)
    """,
)
def t8_fk_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supplier = load_table(spark, sf_dir, "supplier")
    customer = load_table(spark, sf_dir, "customer")

    def orphans(name: str, fact: DataFrame, fk: str, dim: DataFrame, pk: str) -> DataFrame:
        return (
            fact.select(fk)
            .join(dim.select(pk), fact[fk] == dim[pk], "left_anti")
            .agg(F.count("*").alias("n_violations"))
            .select(F.lit(name).alias("check_name"), "n_violations")
        )

    return (
        orphans("lineitem_without_order", li, "l_orderkey", orders, "o_orderkey")
        .unionAll(
            orphans("lineitem_without_supplier", li, "l_suppkey", supplier, "s_suppkey")
        )
        .unionAll(
            orphans("order_without_customer", orders, "o_custkey", customer, "c_custkey")
        )
    )


@query(
    "t8_skew_audit",
    oracle="""
    WITH c AS (SELECT user_id, COUNT(*) AS n FROM events GROUP BY user_id),
    t AS (SELECT CAST(SUM(n) AS DOUBLE) AS total FROM c)
    SELECT user_id, n,
           CAST(FLOOR(n * 1000000.0 / total) AS BIGINT) AS share_ppm
    FROM c, t ORDER BY n DESC, user_id LIMIT 10
    """,
)
def t8_skew_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew audit: the 10 hottest event keys with their ppm share
    of all rows -- the pre-flight check before keying a shuffle on user_id
    (operators/skew.py salted_join is the mitigation when a key's share is
    pathological). One hash-agg shuffle; the grand total is a 1-row
    broadcast; top-10 is TakeOrderedAndProject, never a global sort."""
    ev = load_table(spark, sf_dir, "events")
    c = ev.groupBy("user_id").agg(F.count("*").alias("n"))
    t = c.agg(F.sum("n").cast("double").alias("total"))
    return (
        c.crossJoin(F.broadcast(t))
        .select(
            "user_id",
            "n",
            F.floor(F.col("n") * 1_000_000.0 / F.col("total"))
            .cast("bigint")
            .alias("share_ppm"),
        )
        .orderBy(F.desc("n"), F.asc("user_id"))
        .limit(10)
    )


@query(
    "t8_value_outliers",
    oracle="""
    WITH s AS (
      SELECT event_type, COUNT(*) AS n,
             SUM(CAST(CAST(value AS DECIMAL(12,4)) * 10000 AS HUGEINT)) AS sy,
             SUM(CAST(CAST(value AS DECIMAL(12,4)) * 10000 AS HUGEINT)
                 * CAST(CAST(value AS DECIMAL(12,4)) * 10000 AS HUGEINT)) AS syy
      FROM events GROUP BY event_type)
    SELECT e.event_id, e.event_type,
           CAST(CAST(e.value AS DECIMAL(12,4)) AS DOUBLE) AS value
    FROM events e JOIN s ON e.event_type = s.event_type
    WHERE CAST(s.n * CAST(CAST(e.value AS DECIMAL(12,4)) * 10000 AS HUGEINT)
               - s.sy AS DOUBLE)
          * CAST(s.n * CAST(CAST(e.value AS DECIMAL(12,4)) * 10000 AS HUGEINT)
                 - s.sy AS DOUBLE)
          > 9.0 * CAST(s.n * s.syy - s.sy * s.sy AS DOUBLE)
    """,
)
def t8_value_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-sigma outlier flags per event_type with EXACT arithmetic: the test
    (x - mean)^2 > 9 * variance is cleared of divisions --
    (n*x - sum)^2 > 9 * (n*sum_sq - sum^2) -- so mean and variance are
    never materialized as floats; the only doubles are casts of identical
    exact integers on both engines. Scale shape: a 5-row stats aggregate
    broadcast back over the scan; the filter is a per-row expression."""
    ev = load_table(spark, sf_dir, "events")
    y = (F.col("value").cast("decimal(12,4)") * 10000).cast("decimal(38,0)")
    s = ev.groupBy(F.col("event_type").alias("s_type")).agg(
        F.count("*").cast("decimal(38,0)").alias("n"),
        F.sum(y).alias("sy"),
        F.sum((y * y).cast("decimal(38,0)")).alias("syy"),
    )
    a = (F.col("n") * y - F.col("sy")).cast("decimal(38,0)").cast("double")
    b = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast(
        "decimal(38,0)"
    ).cast("double")
    return (
        ev.join(F.broadcast(s), ev.event_type == F.col("s_type"))
        .filter(a * a > 9.0 * b)
        .select(
            "event_id",
            "event_type",
            F.col("value").cast("decimal(12,4)").alias("value"),
        )
    )


@query(
    "t8_equidepth_histogram",
    oracle="""
    WITH thr AS (
      SELECT quantile_cont(o_totalprice, 0.25) AS q1,
             quantile_cont(o_totalprice, 0.50) AS q2,
             quantile_cont(o_totalprice, 0.75) AS q3
      FROM orders)
    SELECT CASE WHEN o_totalprice <= q1 THEN 0
                WHEN o_totalprice <= q2 THEN 1
                WHEN o_totalprice <= q3 THEN 2
                ELSE 3 END AS bucket,
           COUNT(*) AS n,
           CAST(CAST(MIN(o_totalprice) AS DECIMAL(12,2)) AS DOUBLE) AS lo,
           CAST(CAST(MAX(o_totalprice) AS DECIMAL(12,2)) AS DOUBLE) AS hi
    FROM orders, thr GROUP BY 1
    """,
)
def t8_equidepth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-DEPTH (quantile-bucket) histogram -- the skew-honest
    counterpart of t8_histogram_totalprice's fixed-width buckets: every
    bucket holds ~25% of rows no matter how lopsided the distribution.
    Thresholds are a 1-row exact-percentile aggregate broadcast over the
    scan (identical IEEE interpolation on both engines); classification
    is a per-row expression. At 100 TB swap percentile for the
    approx_percentile sketch, as with x5_length_trim."""
    o = load_table(spark, sf_dir, "orders")
    thr = o.agg(
        F.expr("percentile(o_totalprice, 0.25)").alias("q1"),
        F.expr("percentile(o_totalprice, 0.50)").alias("q2"),
        F.expr("percentile(o_totalprice, 0.75)").alias("q3"),
    )
    p = F.col("o_totalprice")
    bucket = (
        F.when(p <= F.col("q1"), 0)
        .when(p <= F.col("q2"), 1)
        .when(p <= F.col("q3"), 2)
        .otherwise(3)
    )
    return (
        o.crossJoin(F.broadcast(thr))
        .groupBy(bucket.alias("bucket"))
        .agg(
            F.count("*").alias("n"),
            F.min(p).cast("decimal(12,2)").alias("lo"),
            F.max(p).cast("decimal(12,2)").alias("hi"),
        )
    )


@query(
    "t8_benford_digits",
    oracle="""
    WITH c AS (
      SELECT o_orderstatus,
             SUBSTRING(CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT)
                       AS VARCHAR), 1, 1) AS d
      FROM orders WHERE o_totalprice > 0
    )
    SELECT o_orderstatus, d AS first_digit,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM c GROUP BY o_orderstatus, d
    """,
)
def t8_benford_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law forensic audit: first-digit distribution of order
    totals per status (fabricated financial data skews away from the
    log-uniform digit curve). Digit extracted from the exact integer cents
    via string head -- bigint-to-string is identical in every engine,
    unlike double formatting."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 0)
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    return (
        o.select(
            "o_orderstatus",
            F.substring(cents.cast("string"), 1, 1).alias("first_digit"),
        )
        .groupBy("o_orderstatus", "first_digit")
        .agg(F.count("*").cast("bigint").alias("n"))
    )


@query(
    "t8_mad_robust_outliers",
    oracle="""
    WITH c AS (
      SELECT event_type, CAST(ROUND(value * 100) AS BIGINT) AS cents
      FROM events
    ), med AS (
      SELECT event_type,
             CAST(2 * quantile_cont(cents, 0.5) AS BIGINT) AS med2
      FROM c GROUP BY event_type
    ), dev AS (
      SELECT c.event_type, c.cents, m.med2,
             ABS(2 * c.cents - m.med2) AS adev2
      FROM c JOIN med m ON c.event_type = m.event_type
    ), mad AS (
      SELECT event_type, med2,
             CAST(2 * quantile_cont(adev2, 0.5) AS BIGINT) AS mad4
      FROM dev GROUP BY event_type, med2
    )
    SELECT d.event_type,
           ANY_VALUE(d.med2) AS median_x2_cents,
           ANY_VALUE(m.mad4) AS mad_x4_cents,
           CAST(COUNT(CASE WHEN 4 * ABS(2 * d.cents - d.med2) > 3 * m.mad4
                           THEN 1 END) AS BIGINT) AS n_outliers,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM dev d JOIN mad m ON d.event_type = m.event_type
    GROUP BY d.event_type
    """,
)
def t8_mad_robust_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust (median/MAD) outlier detection per key, fully exact: medians
    are carried as 2x (even-n midpoints become integers), absolute
    deviations as 2x, the MAD as 4x, and the 3-sigma-equivalent test
    compares 4*|2x - med2| > 3*mad4 -- all int64, no float rounding
    anywhere. Complements the mean/stddev z-score query
    (t8_value_outliers) with the heavy-tail-safe variant. Two grouped
    percentile passes + broadcast joins of the tiny per-key stats."""
    ev = load_table(spark, sf_dir, "events")
    c = ev.select(
        "event_type", F.round(F.col("value") * 100).cast("bigint").alias("cents")
    )
    med = c.groupBy("event_type").agg(
        (2 * F.expr("percentile(cents, 0.5)")).cast("bigint").alias("med2")
    )
    dev = c.join(F.broadcast(med), "event_type").withColumn(
        "adev2", F.abs(2 * F.col("cents") - F.col("med2"))
    )
    mad = dev.groupBy("event_type", "med2").agg(
        (2 * F.expr("percentile(adev2, 0.5)")).cast("bigint").alias("mad4")
    )
    out = dev.join(F.broadcast(mad.select("event_type", "mad4")), "event_type")
    return out.groupBy("event_type").agg(
        F.first("med2").alias("median_x2_cents"),
        F.first("mad4").alias("mad_x4_cents"),
        F.count(
            F.when(4 * F.abs(2 * F.col("cents") - F.col("med2")) > 3 * F.col("mad4"), 1)
        )
        .cast("bigint")
        .alias("n_outliers"),
        F.count("*").cast("bigint").alias("n"),
    )


@query(
    "t8_ingest_coverage",
    oracle="""
    WITH m AS (
      SELECT CAST(ts AS DATE) AS day,
             date_trunc('minute', ts) AS minute
      FROM events
    )
    SELECT day,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(DISTINCT minute) AS BIGINT) AS minutes_present,
           CAST(COUNT(DISTINCT minute) * 1000000 // 1440 AS BIGINT) AS coverage_ppm
    FROM m GROUP BY day
    """,
)
def t8_ingest_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest-continuity audit for a scheduled pipeline (the reference
    runs on a cron DAG with no backfill -- dags/stock_data_pipeline.py:22
    `catchup=False` -- so missed runs become silent gaps): per day, how
    many of the 1440 minute slots contain at least one event, as an exact
    coverage ppm. A day whose coverage dips below its neighbors is a
    missed-run scar. One scan, one grouped distinct -- the partial
    aggregate carries (day, minute) pairs, bounded at 1440/day regardless
    of event volume."""
    ev = load_table(spark, sf_dir, "events")
    m = ev.select(
        F.to_date("ts").alias("day"),
        F.date_trunc("minute", F.col("ts")).alias("minute"),
    )
    return m.groupBy("day").agg(
        F.count("*").cast("bigint").alias("n_events"),
        F.count_distinct("minute").cast("bigint").alias("minutes_present"),
        F.floor(F.count_distinct("minute") * 1_000_000 / 1440)
        .cast("bigint")
        .alias("coverage_ppm"),
    )


@query(
    "t8_distribution_drift",
    oracle="""
    WITH w AS (
      SELECT event_type,
             CASE WHEN ts < TIMESTAMP '2024-01-16 00:00:00'
                  THEN 1 ELSE 0 END AS in_w1
      FROM events
    ), c AS (
      SELECT event_type,
             SUM(in_w1) AS n1,
             SUM(1 - in_w1) AS n2
      FROM w GROUP BY event_type
    ), t AS (
      SELECT SUM(n1) AS t1, SUM(n2) AS t2 FROM c
    )
    SELECT event_type,
           CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
           CAST(n1 * 1000000 // GREATEST(t1, 1) AS BIGINT) AS share1_ppm,
           CAST(n2 * 1000000 // GREATEST(t2, 1) AS BIGINT) AS share2_ppm,
           CAST(ABS(n1 * 1000000 // GREATEST(t1, 1)
                    - n2 * 1000000 // GREATEST(t2, 1)) AS BIGINT)
               AS drift_ppm
    FROM c, t
    """,
)
def t8_distribution_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population-drift audit (PSI-style, exact integers): compare each
    event type's share of traffic between the first and second half of
    the window; drift_ppm is the absolute share shift. The pre-deploy
    check for 'did my upstream mix change' -- at 100 TB one scan, one
    per-type aggregate, and a single-row totals broadcast (cross join of
    an aggregate is a 1-row BroadcastNestedLoopJoin, not a shuffle)."""
    ev = load_table(spark, sf_dir, "events")
    w = ev.select(
        "event_type",
        F.when(F.col("ts") < F.lit("2024-01-16 00:00:00").cast("timestamp_ntz"), 1)
        .otherwise(0)
        .alias("in_w1"),
    )
    c = w.groupBy("event_type").agg(
        F.sum("in_w1").alias("n1"), F.sum(1 - F.col("in_w1")).alias("n2")
    )
    t = c.agg(F.sum("n1").alias("t1"), F.sum("n2").alias("t2"))
    # GREATEST(t, 1) on both sides: an empty half-window must yield share 0,
    # not NULL (Spark floor(n/0)) vs a division-by-zero error (DuckDB //).
    share1 = F.floor(
        F.col("n1") * 1_000_000 / F.greatest(F.col("t1"), F.lit(1))
    ).cast("bigint")
    share2 = F.floor(
        F.col("n2") * 1_000_000 / F.greatest(F.col("t2"), F.lit(1))
    ).cast("bigint")
    return c.crossJoin(F.broadcast(t)).select(
        "event_type",
        F.col("n1").cast("bigint").alias("n1"),
        F.col("n2").cast("bigint").alias("n2"),
        share1.alias("share1_ppm"),
        share2.alias("share2_ppm"),
        F.abs(share1 - share2).cast("bigint").alias("drift_ppm"),
    )


@query(
    "t8_pk_duplicate_audit",
    oracle="""
    WITH groups AS (
      SELECT l_orderkey, l_linenumber, COUNT(*) AS n
      FROM lineitem GROUP BY l_orderkey, l_linenumber
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
           CAST(SUM(CASE WHEN n > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_violated_keys,
           CAST(SUM(CASE WHEN n > 1 THEN n ELSE 0 END) AS BIGINT)
             AS n_rows_in_violation,
           CAST(MAX(n) AS BIGINT) AS max_multiplicity
    FROM groups
    """,
)
def t8_pk_duplicate_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Primary-key uniqueness audit on the fact table's composite key
    (orderkey, linenumber) -- the invariant check upstream of any keyed
    MERGE: violated keys, rows involved, worst multiplicity. One hash
    aggregate on the key (map-side combine) feeding a 4-value global
    fold; the companion to t8_fk_audit's orphan counts."""
    li = load_table(spark, sf_dir, "lineitem")
    groups = li.groupBy("l_orderkey", "l_linenumber").agg(F.count("*").alias("n"))
    return groups.agg(
        F.count("*").cast("bigint").alias("n_keys"),
        F.sum((F.col("n") > 1).cast("int")).cast("bigint").alias("n_violated_keys"),
        F.sum(F.when(F.col("n") > 1, F.col("n")).otherwise(0))
        .cast("bigint")
        .alias("n_rows_in_violation"),
        F.max("n").cast("bigint").alias("max_multiplicity"),
    )
