"""End-to-end market-analytics tick: the time-series counterpart of
``pipeline.ingest``. One call per schedule interval (the reference's DAG
runs fetch-then-load hourly, dags/stock_data_pipeline.py:24-47; this is
the downstream analytics job a consumer would add next):

  events  ->  daily OHLC candles      -> write-audit-publish (versioned,
                                         expectations + change breaker)
          ->  running-peak drawdowns  -> keyed MERGE into the alerts table
          ->  one pipeline_logs row (oplog) per tick

Idempotent by construction: re-running over the same events publishes an
identical OHLC version (the change-volume breaker sees 0 ppm disturbed)
and the alert MERGE keys on (event_type, ts) so replays never duplicate.
"""

from __future__ import annotations

import datetime as dt
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import load_table
from .operators import timeseries as TS
from .operators.merge import merge_upsert_path
from .operators.wap import (
    AuditError,
    expect_max_change,
    expect_min_rows,
    expect_unique_key,
    write_audit_publish,
)


def _cents() -> F.Column:
    return F.round(F.col("value") * 100).cast("bigint")


def daily_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events").withColumn("cents", _cents())
    return TS.resample_ohlc(
        events, ["event_type"], "ts", "cents", unit="day", tiebreak_cols=["event_id"]
    )


def drawdown_alerts(
    spark: SparkSession, sf_dir: str, threshold_ppm: int = 200_000
) -> DataFrame:
    from pyspark.sql import Window

    events = load_table(spark, sf_dir, "events").withColumn("cents", _cents())
    w = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    peak = F.max("cents").over(w)
    dd = (
        F.when(peak > 0, F.floor(((peak - F.col("cents")) * 1_000_000) / peak))
        .otherwise(F.lit(0))
        .cast("bigint")
    )
    return (
        events.withColumn("peak_cents", peak)
        .withColumn("drawdown_ppm", dd)
        .filter(F.col("drawdown_ppm") >= threshold_ppm)
        .select("event_type", "ts", "peak_cents", "drawdown_ppm",
                F.col("cents").alias("value_cents"))
    )


def analytics_tick(
    spark: SparkSession,
    sf_dir: str,
    warehouse: str,
    max_changed_ppm: int = 500_000,
) -> dict[str, int]:
    """Run one tick; returns row counts per output. Raises AuditError (and
    logs a failed run) if the staged OHLC fails its audits -- the live
    table is untouched in that case."""
    from .oplog import append_run_log

    os.makedirs(warehouse, exist_ok=True)
    ohlc_path = os.path.join(warehouse, "ohlc_daily")
    alerts_path = os.path.join(warehouse, "alerts")
    logs_path = os.path.join(warehouse, "pipeline_logs")
    t0 = time.time()

    ohlc = daily_ohlc(spark, sf_dir)
    current = None
    if os.path.exists(ohlc_path):
        current = spark.read.parquet(ohlc_path)
    audits = [
        expect_min_rows(1),
        expect_unique_key(["event_type", "bucket"]),
        expect_max_change(current, ["event_type", "bucket"], max_changed_ppm),
    ]
    now = dt.datetime.now(dt.timezone.utc).replace(tzinfo=None)
    try:
        write_audit_publish(spark, ohlc, ohlc_path, audits)
    except AuditError as exc:
        append_run_log(
            spark, logs_path, "analytics_tick", "publish_ohlc",
            now, "failed", time.time() - t0, 0,
            error_message=str(exc),
        )
        raise

    alerts = drawdown_alerts(spark, sf_dir)
    merge_upsert_path(
        spark, alerts_path, alerts, keys=["event_type", "ts"],
    )

    n_ohlc = spark.read.parquet(ohlc_path).count()
    n_alerts = spark.read.parquet(alerts_path).count()
    append_run_log(
        spark, logs_path, "analytics_tick", "publish_ohlc",
        now, "success", time.time() - t0, n_ohlc,
    )
    return {"ohlc_rows": n_ohlc, "alert_rows": n_alerts}
