"""Catalog tests (SURVEY section 2.1 S5, section 2.4 A5): view
registration, DDL analog, schema-presence check, nano-timestamp edge."""

from __future__ import annotations

from dockerized_data_pipeline_spark.catalog import (
    STOCK_DATA_SCHEMA,
    create_table_if_not_exists,
    load_events_range,
    load_table,
    register_views,
    tables_present,
)


def test_register_views_and_presence(spark, sf_dir):
    views = register_views(spark, sf_dir)
    try:
        assert set(views) == {
            "region", "nation", "customer", "supplier", "part",
            "orders", "lineitem", "events", "documents", "embeddings",
        }
        assert tables_present(spark, ("region", "lineitem", "nope")) == 2
        assert spark.sql("SELECT COUNT(*) AS n FROM region").first().n == 5
    finally:
        for name in views:
            spark.catalog.dropTempView(name)


def test_create_table_ddl_analog(spark, tmp_path):
    loc = str(tmp_path / "stock_data")
    create_table_if_not_exists(spark, "stock_data", STOCK_DATA_SCHEMA, loc)
    df = spark.read.parquet(loc)
    assert df.count() == 0
    assert dict(df.dtypes)["open_price"] == "decimal(15,4)"
    assert dict(df.dtypes)["timestamp"] == "timestamp_ntz"
    # IF NOT EXISTS: second call is a no-op, not an overwrite
    create_table_if_not_exists(spark, "stock_data", STOCK_DATA_SCHEMA, loc)
    assert spark.read.parquet(loc).count() == 0


def test_events_nanos_load_and_range_agree(spark, sf_dir):
    full = load_table(spark, sf_dir, "events")
    assert dict(full.dtypes)["ts"] == "timestamp_ntz"
    ranged = load_events_range(spark, sf_dir, ts_from="2024-01-10 00:00:00",
                               ts_to="2024-01-20 00:00:00")
    from pyspark.sql import functions as F

    manual = full.filter(
        (F.col("ts") >= F.lit("2024-01-10 00:00:00").cast("timestamp_ntz"))
        & (F.col("ts") < F.lit("2024-01-20 00:00:00").cast("timestamp_ntz"))
    )
    assert ranged.count() == manual.count()
