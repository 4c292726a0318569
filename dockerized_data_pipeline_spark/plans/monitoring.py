"""Monitoring / freshness aggregates: the reference's actual analytical
queries (SURVEY section 2.4 A1-A4, section 2.6 O1-O3, section 2.2 P7/P9/P10).

The reference runs these in Postgres against ``stock_data``/``pipeline_logs``
(README.md:202-226, Makefile:219-222); here they run over the ``events``
fixture (entity key ``event_type`` ~ ``symbol``, event time ``ts`` ~
``timestamp``) as pure Catalyst plans: partial+final hash aggregation,
TakeOrderedAndProject for top-k, predicate pushdown for time-range filters.

NOW() is replaced by the injected AS_OF literal so oracle comparison is
deterministic (SURVEY section 7, "hard part 3").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_events_range, load_table
from .registry import AS_OF, ONE_DAY_BEFORE_AS_OF, query


# A1 -- per-key record count + latest timestamp (README.md:202-204, Makefile:101).
@query(
    "a1_records_per_key",
    oracle="""
    SELECT event_type, COUNT(*) AS records, MAX(ts) AS latest
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def a1_records_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.count("*").alias("records"), F.max("ts").alias("latest"))
        .orderBy("event_type")
    )


# A2 -- filtered multi-key aggregate (pipeline_logs success/failure rate,
# README.md:217-220): WHERE created_at >= NOW() - INTERVAL '1 day'.
@query(
    "a2_multikey_counts_last_day",
    oracle=f"""
    SELECT event_type, user_id, COUNT(*) AS runs
    FROM events
    WHERE ts >= TIMESTAMP '{ONE_DAY_BEFORE_AS_OF}'
    GROUP BY event_type, user_id
    """,
)
def a2_multikey_counts_last_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_events_range(spark, sf_dir, ts_from=ONE_DAY_BEFORE_AS_OF)
        .groupBy("event_type", "user_id")
        .agg(F.count("*").alias("runs"))
    )


# A3 -- data freshness: latest point per key + age (README.md:223-226).
# Age emitted as whole seconds via integer microsecond arithmetic: exact and
# identical in both engines (interval types don't hash portably).
@query(
    "a3_freshness_age",
    oracle=f"""
    SELECT event_type,
           MAX(ts) AS latest_data,
           (epoch_us(TIMESTAMP '{AS_OF}') - epoch_us(MAX(ts))) // 1000000 AS age_sec
    FROM events GROUP BY event_type
    """,
)
def a3_freshness_age(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.max("ts").alias("latest_data"))
        .withColumn(
            "age_sec",
            # latest_data is NTZ; session tz is pinned UTC so the cast back
            # to TIMESTAMP for unix_micros is exact.
            F.expr(
                f"(unix_micros(TIMESTAMP '{AS_OF}')"
                " - unix_micros(cast(latest_data as timestamp))) div 1000000"
            ),
        )
    )


# A4 -- per-key min/max/count data-range summary (README.md:314-321).
@query(
    "a4_key_stats",
    oracle="""
    SELECT event_type, COUNT(*) AS total_records,
           MIN(ts) AS oldest_data, MAX(ts) AS newest_data
    FROM events GROUP BY event_type
    """,
)
def a4_key_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("total_records"),
            F.min("ts").alias("oldest_data"),
            F.max("ts").alias("newest_data"),
        )
    )


# O1 -- ORDER BY ... DESC LIMIT 10 (README.md:206-208). Unique tiebreak column
# (o_orderkey) added for determinism; Catalyst plans TakeOrderedAndProject
# (distributed top-k, no full sort).
@query(
    "o1_latest_orders_top10",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate
    FROM orders ORDER BY o_orderdate DESC, o_orderkey DESC LIMIT 10
    """,
)
def o1_latest_orders_top10(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate")
        .orderBy(F.desc("o_orderdate"), F.desc("o_orderkey"))
        .limit(10)
    )


# O2 -- projected recent-rows peek (Makefile:219): narrow projection + top-k.
@query(
    "o2_recent_events_top5",
    oracle="""
    SELECT event_id, event_type, ts
    FROM events ORDER BY ts DESC, event_id DESC LIMIT 5
    """,
)
def o2_recent_events_top5(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "events")
        .select("event_id", "event_type", "ts")
        .orderBy(F.desc("ts"), F.desc("event_id"))
        .limit(5)
    )


# P7 -- time-range predicate (README.md:219); pushed down to the parquet scan.
@query(
    "p7_time_range_filter",
    oracle=f"""
    SELECT event_id, ts, user_id, event_type, value
    FROM events WHERE ts >= TIMESTAMP '{ONE_DAY_BEFORE_AS_OF}'
    """,
)
def p7_time_range_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_events_range(spark, sf_dir, ts_from=ONE_DAY_BEFORE_AS_OF).select(
        "event_id", "ts", "user_id", "event_type", "value"
    )


# P8 -- retention predicate (README.md:296-297): keep rows newer than cutoff.
# The write path (partition-overwrite delete) lives in operators.retention;
# this query is the surviving-rows scan, partition-prunable on a date layout.
@query(
    "p8_retention_survivors",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_shipdate
    FROM lineitem WHERE l_shipdate >= TIMESTAMP '2000-01-01 00:00:00'
    """,
)
def p8_retention_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate") >= F.lit("2000-01-01 00:00:00").cast("timestamp"))
        .select("l_orderkey", "l_linenumber", "l_shipdate")
    )


# P6 -- string normalize + non-empty filter (scripts/fetch_stock_data.py:140-142).
@query(
    "p6_normalize_symbols",
    oracle="""
    SELECT c_custkey, UPPER(TRIM(c_mktsegment)) AS segment
    FROM customer WHERE LENGTH(TRIM(c_mktsegment)) > 0
    """,
)
def p6_normalize_symbols(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = load_table(spark, sf_dir, "customer")
    return df.select(
        "c_custkey", F.upper(F.trim(F.col("c_mktsegment"))).alias("segment")
    ).filter(F.length(F.trim(F.col("c_mktsegment"))) > 0)


# P9/P10 -- star + narrow projections (README.md:206, Makefile:219). Column
# pruning reaches the scan: ReadSchema lists exactly these three columns.
@query(
    "p10_narrow_projection",
    oracle="SELECT event_id, event_type, value FROM events",
)
def p10_narrow_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events").select("event_id", "event_type", "value")
