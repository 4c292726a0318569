"""Ingest-path operators as oracle-checkable queries (SURVEY section 2.2
P1-P5, section 2.8 F1/F8/F9, section 2.1 S4 / section 2.3 J1 merge-upsert).

The full Alpha-Vantage parse pipeline (sources.parse) is exercised with
synthesized payloads in tests/; the queries here re-express each constituent
operator over the ``events`` fixture so the driver's DuckDB oracle can
hash-check it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..catalog import load_table, spread_input
from ..operators.merge import dedup_keep_newest, merge_upsert
from .registry import query


# P1 -- JSON map -> rows generator (the explode at the heart of the parse
# pipeline, scripts/fetch_stock_data.py:56-69).
@query(
    "p1_json_map_flatten",
    oracle="""
    SELECT event_id, k AS prop_key,
           CAST(json_extract_string(props, '$.' || k) AS BIGINT) AS prop_value
    FROM (SELECT event_id, props, UNNEST(json_keys(props)) AS k FROM events)
    """,
)
def p1_json_map_flatten(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r11: from_json is per-row parse work; spread the single-split scan
    # (no-op on multi-split inputs; measured 0.37 -> 0.26 s at sf0.1)
    ev = spread_input(load_table(spark, sf_dir, "events").select("event_id", "props"))
    parsed = F.from_json(F.col("props"), T.MapType(T.StringType(), T.LongType()))
    return ev.select(
        "event_id", F.explode(parsed).alias("prop_key", "prop_value")
    )


# F8/F9 -- JSON field access with presence test
# (scripts/fetch_stock_data.py:33, :52-53, :61-67).
@query(
    "f8_json_scalar_extract",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_value,
           (json_extract_string(props, '$.missing') IS NOT NULL) AS has_missing
    FROM events
    """,
)
def f8_json_scalar_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("bigint").alias("k_value"),
        F.get_json_object("props", "$.missing").isNotNull().alias("has_missing"),
    )


# F1/P4 -- timestamp parse with explicit format: format out, parse back
# (strptime analog, scripts/fetch_stock_data.py:60), plus numeric/date casts.
@query(
    "f1_timestamp_parse_roundtrip",
    oracle="""
    SELECT event_id,
           strptime(strftime(ts, '%Y-%m-%d %H:%M:%S'), '%Y-%m-%d %H:%M:%S') AS ts_parsed,
           CAST(ts AS DATE) AS ts_date
    FROM events
    """,
)
def f1_timestamp_parse_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.to_timestamp(
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss"), "yyyy-MM-dd HH:mm:ss"
        ).alias("ts_parsed"),
        F.col("ts").cast("date").alias("ts_date"),
    )


@query(
    "p4_typed_casts",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(CAST(l_quantity AS DECIMAL(15,4)) AS DOUBLE) AS qty_dec,
           CAST(CAST(l_extendedprice AS DECIMAL(15,4)) AS DOUBLE) AS price_dec,
           CAST(l_shipdate AS DATE) AS ship_date,
           CAST(l_orderkey AS VARCHAR) AS orderkey_str
    FROM lineitem
    """,
)
def p4_typed_casts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_quantity").cast("decimal(15,4)").alias("qty_dec"),
        F.col("l_extendedprice").cast("decimal(15,4)").alias("price_dec"),
        F.col("l_shipdate").cast("date").alias("ship_date"),
        F.col("l_orderkey").cast("string").alias("orderkey_str"),
    )


# S4/J1 -- the keyed MERGE itself, oracle-checked against an equivalent
# priority-union formulation in DuckDB. Key = (user_id, event_type) with two
# overlapping batches split by time (FIXTURES.md section 4).
_MERGE_CUT_TARGET = "2024-01-20 00:00:00"
_MERGE_CUT_BATCH = "2024-01-15 00:00:00"


@query(
    "s4_merge_upsert_events",
    oracle=f"""
    WITH t AS (
      SELECT user_id, event_type, event_id, ts, value FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                     ORDER BY ts DESC, event_id DESC) AS rn
        FROM events WHERE ts < TIMESTAMP '{_MERGE_CUT_TARGET}'
      ) WHERE rn = 1
    ), b AS (
      SELECT user_id, event_type, event_id, ts, value FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                     ORDER BY ts DESC, event_id DESC) AS rn
        FROM events WHERE ts >= TIMESTAMP '{_MERGE_CUT_BATCH}'
      ) WHERE rn = 1
    ), u AS (
      SELECT *, 1 AS pri FROM b
      UNION ALL
      SELECT *, 0 AS pri FROM t
    )
    SELECT user_id, event_type, event_id, ts, value FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                   ORDER BY pri DESC) AS rn FROM u
    ) WHERE rn = 1
    """,
)
def s4_merge_upsert_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Target = pre-cutoff snapshot, batch = overlapping re-fetch; batch rows
    update matched keys, new keys insert -- the ON CONFLICT semantics of
    scripts/fetch_stock_data.py:90-102."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "event_id", "ts", "value"
    )
    keys = ["user_id", "event_type"]
    order = ["ts", "event_id"]
    target = dedup_keep_newest(
        ev.filter(F.col("ts") < F.lit(_MERGE_CUT_TARGET).cast("timestamp")), keys, order
    )
    batch = ev.filter(F.col("ts") >= F.lit(_MERGE_CUT_BATCH).cast("timestamp"))
    return merge_upsert(
        target, batch, keys=keys, batch_order_by=order
    )
