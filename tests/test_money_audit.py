"""Clean-money contract enforcement (VERDICT r11 item 6).

The scaled-long aggregation path (plans/relational.py) is only exact when
money doubles are clean 2-decimal quantities. SPARK_GRAFT_MONEY_AUDIT=1
turns the assumption into a per-row assertion: a 3-decimal value must fail
LOUDLY instead of silently rounding into the cent sum. tools/audit_money.py
is the offline twin over committed tiers (0 violations, committed as
MONEY_AUDIT_r12.txt)."""

from __future__ import annotations

import pytest

from dockerized_data_pipeline_spark.plans import relational
from pyspark.sql import functions as F


def _cents_with_audit(monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_MONEY_AUDIT", "1")
    return relational._cents


def test_audit_mode_rejects_three_decimal_money(spark, monkeypatch):
    cents = _cents_with_audit(monkeypatch)
    df = spark.createDataFrame([(1.25,), (0.005,)], "l_extendedprice double")
    with pytest.raises(Exception, match="not clean 2-decimal"):
        df.select(cents("l_extendedprice").alias("c")).collect()


def test_audit_mode_passes_clean_values_and_nulls(spark, monkeypatch):
    cents = _cents_with_audit(monkeypatch)
    df = spark.createDataFrame(
        [(1.25,), (0.10,), (None,), (12345.99,)], "l_extendedprice double"
    )
    got = {
        r["c"]
        for r in df.select(cents("l_extendedprice").alias("c")).collect()
    }
    assert got == {125, 10, None, 1234599}


def test_audit_off_is_the_bare_fast_path(spark, monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_MONEY_AUDIT", raising=False)
    df = spark.createDataFrame([(0.005,)], "l_extendedprice double")
    # without audit the value silently rounds (documented fast-path
    # behavior); the point of the audit mode is making this opt-out loud
    [r] = df.select(relational._cents("l_extendedprice").alias("c")).collect()
    assert r["c"] == 0 or r["c"] == 1  # round-half-even of 0.5


def test_q1_runs_under_audit_on_fixture_tier(spark, monkeypatch):
    # the committed tiers satisfy the contract, so audit mode must be a
    # pass-through there (same rows, no raise)
    monkeypatch.setenv("SPARK_GRAFT_MONEY_AUDIT", "1")
    from dockerized_data_pipeline_spark.plans import QUERIES

    rows = QUERIES["q1_pricing_summary"](spark, "/root/testdata/sf0.001").collect()
    assert len(rows) > 0
