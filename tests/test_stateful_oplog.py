"""Tests: applyInPandasWithState running aggregates across micro-batches,
and the documented pipeline_logs / stock_metadata operational tables."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import types as T

from dockerized_data_pipeline_spark.oplog import (
    append_run_log,
    recent_failures,
    recent_runs,
    upsert_stock_metadata,
)
from dockerized_data_pipeline_spark.streaming.stateful import running_key_stats

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_type", T.StringType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def t(s):
    return dt.datetime.fromisoformat(s)


def test_stateful_running_stats_across_batches(spark, tmp_path):
    src = str(tmp_path / "src")
    rows1 = [("click", t("2024-01-01 10:00:00"), 1.0), ("click", t("2024-01-01 11:00:00"), 2.0)]
    spark.createDataFrame(rows1, EVENT_SCHEMA).coalesce(1).write.mode("append").parquet(src)

    stream = spark.readStream.schema(EVENT_SCHEMA).parquet(src)
    q = (
        running_key_stats(stream)
        .writeStream.format("memory")
        .queryName("running_stats")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()

        def latest():
            # update mode appends per batch; the newest row per key wins
            rows = spark.sql(
                "SELECT * FROM running_stats ORDER BY running_count"
            ).collect()
            return {r.event_type: r for r in rows}

        out1 = latest()
        assert out1["click"].running_count == 2
        assert out1["click"].running_sum == 3.0
        assert out1["click"].latest_ts == t("2024-01-01 11:00:00")

        # batch 2: state must carry over (count accumulates, not reset)
        rows2 = [("click", t("2024-01-01 12:00:00"), 4.0), ("view", t("2024-01-01 12:00:00"), 7.0)]
        spark.createDataFrame(rows2, EVENT_SCHEMA).coalesce(1).write.mode("append").parquet(src)
        q.processAllAvailable()
        out2 = latest()
        assert out2["click"].running_count == 3
        assert out2["click"].running_sum == 7.0
        assert out2["click"].latest_ts == t("2024-01-01 12:00:00")
        assert out2["view"].running_count == 1
    finally:
        q.stop()
        spark.catalog.dropTempView("running_stats")


def test_pipeline_logs_append_and_queries(spark, tmp_path):
    logs = str(tmp_path / "pipeline_logs")
    append_run_log(spark, logs, "stock_pipeline", "fetch", t("2024-01-05 10:00:00"),
                   "success", 12.5, 500)
    append_run_log(spark, logs, "stock_pipeline", "fetch", t("2024-01-05 11:00:00"),
                   "failed", 30.0, 0, "rate limited")
    append_run_log(spark, logs, "stock_pipeline", "fetch", t("2024-01-01 00:00:00"),
                   "success", 9.0, 480)

    counts = {
        (r.dag_id, r.status): r.runs
        for r in recent_failures(spark, logs, "2024-01-05 00:00:00").collect()
    }
    assert counts == {("stock_pipeline", "success"): 1, ("stock_pipeline", "failed"): 1}

    latest = recent_runs(spark, logs, limit=2).collect()
    assert [r.created_at for r in latest] == [t("2024-01-05 11:00:00"), t("2024-01-05 10:00:00")]


def test_monitor_loop_polls_health_queries(spark, tmp_path):
    """make-monitor analog: finite iterations, injectable sleep, snapshots
    carry failure counts (the alerting substance of email_on_failure)."""
    from dockerized_data_pipeline_spark.oplog import monitor

    logs = str(tmp_path / "pipeline_logs")
    append_run_log(spark, logs, "stock_pipeline", "fetch", t("2024-01-05 10:00:00"),
                   "success", 12.5, 500)
    append_run_log(spark, logs, "stock_pipeline", "fetch", t("2024-01-05 11:00:00"),
                   "failed", 30.0, 0, "rate limited")

    sleeps, ticks = [], []
    snaps = monitor(
        spark, logs, "2024-01-05 00:00:00", every_s=30.0, iterations=3,
        sleep=sleeps.append, on_tick=lambda s: ticks.append(s["tick"]),
    )
    assert sleeps == [30.0, 30.0]  # no sleep before the first tick
    assert ticks == [0, 1, 2]
    assert all(s["n_failed"] == 1 for s in snaps)
    assert all(
        s["runs_by_status"][("stock_pipeline", "success")] == 1 for s in snaps
    )
    assert len(snaps[0]["latest_runs"]) == 2


def test_stock_metadata_keyed_upsert(spark, tmp_path):
    meta = str(tmp_path / "stock_metadata")
    schema = (
        "symbol string, last_updated timestamp, last_fetch_success boolean,"
        " error_message string, total_records long"
    )
    b1 = spark.createDataFrame(
        [("AAPL", t("2024-01-05 10:00:00"), True, None, 100),
         ("MSFT", t("2024-01-05 10:00:00"), True, None, 90)],
        schema,
    )
    upsert_stock_metadata(spark, meta, b1)
    b2 = spark.createDataFrame(
        [("AAPL", t("2024-01-05 11:00:00"), False, "timeout", 100)], schema
    )
    upsert_stock_metadata(spark, meta, b2)
    rows = {r.symbol: r for r in spark.read.parquet(meta).collect()}
    assert len(rows) == 2
    assert rows["AAPL"].last_fetch_success is False  # newest state won
    assert rows["AAPL"].error_message == "timeout"
    assert rows["MSFT"].total_records == 90
