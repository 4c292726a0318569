"""Alpha-Vantage-shaped JSON payload parser (SURVEY section 2.2 P1-P5).

Re-expresses the reference's driver-side parse loop
(scripts/fetch_stock_data.py:49-78) as a fully declarative Catalyst plan:

    from_json (explicit MapType schema -- never inferSchema on the ingest
    path) -> explode of the time-series map (one row per datapoint) ->
    key-rename projection with typed casts -> malformed-to-null + filter.

Differences from the reference, by design (SURVEY section 7 non-goals):
the reference coerces malformed numerics to 0 (``float(... or 0)``,
scripts/fetch_stock_data.py:61-65); we cast-to-null, drop rows whose
*timestamp* fails to parse (they have no identity), keep rows with null
measures, and surface counts via ``observe`` metrics instead of silent
zeros.

At scale: the parse is per-row and embarrassingly parallel -- no shuffle,
whole-stage codegen end to end, so it streams at scan speed over any number
of executors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Explicit payload schema (FIXTURES.md section 3): a "Meta Data" string map +
# a per-timestamp map of stringly-typed OHLCV fields
# (scripts/fetch_stock_data.py:52-53, :61-67).
PAYLOAD_SCHEMA = T.StructType(
    [
        T.StructField("Meta Data", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField(
            "Time Series (60min)",
            T.MapType(T.StringType(), T.MapType(T.StringType(), T.StringType())),
            True,
        ),
        # Error-taxonomy keys (scripts/fetch_stock_data.py:33-38): presence
        # means the payload carries no data.
        T.StructField("Error Message", T.StringType(), True),
        T.StructField("Note", T.StringType(), True),
    ]
)

TS_FORMAT = "yyyy-MM-dd HH:mm:ss"
PRICE_TYPE = "decimal(15,4)"

# OHLCV key-rename projection (scripts/fetch_stock_data.py:61-65).
FIELD_MAP = {
    "1. open": "open_price",
    "2. high": "high_price",
    "3. low": "low_price",
    "4. close": "close_price",
}


def classify_payloads(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """S2 error/rate-limit detection: tag each payload row with its status.

    ``error`` / ``rate_limited`` payloads (scripts/fetch_stock_data.py:33-38)
    carry no time series and are excluded from parsing but kept countable.
    """
    parsed = F.from_json(F.col(payload_col), PAYLOAD_SCHEMA)
    return df.withColumn("__parsed", parsed).withColumn(
        "__status",
        F.when(F.col(f"__parsed.`Error Message`").isNotNull(), F.lit("error"))
        .when(F.col("__parsed.Note").isNotNull(), F.lit("rate_limited"))
        .when(F.col("`__parsed`.`Time Series (60min)`").isNull(), F.lit("empty"))
        .otherwise(F.lit("ok")),
    )


def parse_timeseries(
    df: DataFrame,
    symbol_col: str = "symbol",
    payload_col: str = "payload",
    observation: Observation | None = None,
) -> DataFrame:
    """payload JSON -> typed ``stock_data`` rows (one per datapoint).

    Input: one row per fetched (symbol, payload-json-string).
    Output schema matches catalog.STOCK_DATA_SCHEMA minus ``created_at``
    (stamped by the sink, mirroring DEFAULT CURRENT_TIMESTAMP at
    dags/stock_data_pipeline.py:36).
    """
    tagged = classify_payloads(df, payload_col)
    ok = tagged.filter(F.col("__status") == "ok")

    meta = F.col("__parsed.`Meta Data`")
    exploded = ok.select(
        F.upper(F.trim(F.col(symbol_col))).alias("symbol"),
        # P3: per-response scalar metadata broadcast onto every series row
        # (scripts/fetch_stock_data.py:53, :66-67). try_* variants give
        # malformed->null under ANSI mode (the reference's skip-and-warn).
        F.try_to_timestamp(F.element_at(meta, "3. Last Refreshed"), F.lit(TS_FORMAT))
        .cast("timestamp_ntz")
        .alias("last_refreshed"),
        F.element_at(meta, "5. Time Zone").alias("time_zone"),
        # P1: map -> rows generator (scripts/fetch_stock_data.py:56-69).
        F.explode(F.col("`__parsed`.`Time Series (60min)`")).alias("ts_str", "vals"),
    )

    projected = exploded.select(
        "symbol",
        # F1/P4: typed casts; malformed -> null (scripts/fetch_stock_data.py:60-65).
        # NTZ end-to-end (catalog.STOCK_DATA_SCHEMA): wall-clock timestamps
        # with session tz pinned UTC.
        F.try_to_timestamp(F.col("ts_str"), F.lit(TS_FORMAT)).cast("timestamp_ntz").alias(
            "timestamp"
        ),
        *[
            F.element_at(F.col("vals"), k).try_cast(PRICE_TYPE).alias(alias)
            for k, alias in FIELD_MAP.items()
        ],
        F.element_at(F.col("vals"), "5. volume").try_cast("bigint").alias("volume"),
        "last_refreshed",
        "time_zone",
    )

    if observation is not None:
        # T8-style quality counters replace the reference's per-row warn logs
        # (scripts/fetch_stock_data.py:70-72).
        projected = projected.observe(
            observation,
            F.count(F.lit(1)).alias("rows_total"),
            F.count(F.when(F.col("timestamp").isNull(), 1)).alias("bad_timestamp"),
            F.count(F.when(F.col("open_price").isNull(), 1)).alias("bad_open"),
            F.count(F.when(F.col("volume").isNull(), 1)).alias("bad_volume"),
        )

    # P5: a datapoint without a parseable timestamp has no identity -> drop.
    return projected.filter(F.col("timestamp").isNotNull())
