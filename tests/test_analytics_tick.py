"""End-to-end analytics tick: OHLC publish with audits, alert MERGE,
oplog -- idempotent across reruns; a poisoned stage never goes live."""

from __future__ import annotations

import os

import pytest

from dockerized_data_pipeline_spark.analytics_tick import analytics_tick

SF = "/root/testdata/sf0.001"


def test_tick_idempotent_and_audited(spark, tmp_path):
    wh = str(tmp_path / "wh")
    r1 = analytics_tick(spark, SF, wh)
    assert r1["ohlc_rows"] > 0 and r1["alert_rows"] > 0

    # same inputs -> identical publish (0 ppm disturbed), identical alerts
    r2 = analytics_tick(spark, SF, wh)
    assert r2 == r1

    logs = spark.read.parquet(os.path.join(wh, "pipeline_logs"))
    assert logs.filter("status = 'success'").count() == 2

    # OHLC is the versioned symlink layout; readable and keyed uniquely
    ohlc = spark.read.parquet(os.path.join(wh, "ohlc_daily"))
    assert ohlc.groupBy("event_type", "bucket").count().filter("count > 1").count() == 0


def test_tick_rejects_catastrophic_change(spark, tmp_path, monkeypatch):
    from dockerized_data_pipeline_spark import analytics_tick as mod
    from dockerized_data_pipeline_spark.operators.wap import AuditError

    wh = str(tmp_path / "wh")
    analytics_tick(spark, SF, wh)
    before = spark.read.parquet(os.path.join(wh, "ohlc_daily")).count()

    # poison the OHLC builder: next tick stages 1 row (99% keys removed)
    real = mod.daily_ohlc
    monkeypatch.setattr(mod, "daily_ohlc", lambda s, d: real(s, d).limit(1))
    with pytest.raises(AuditError):
        analytics_tick(spark, SF, wh)
    after = spark.read.parquet(os.path.join(wh, "ohlc_daily")).count()
    assert after == before  # live table untouched
    logs = spark.read.parquet(os.path.join(wh, "pipeline_logs"))
    assert logs.filter("status = 'failed'").count() == 1
