"""Crash-safety tests for the versioned-table publish protocol
(operators/atomic.py): readers must find a complete table at target_path
no matter where a writer crashes."""

from __future__ import annotations

import datetime as dt
import os

import pytest

from dockerized_data_pipeline_spark.operators import atomic
from dockerized_data_pipeline_spark.operators.atomic import (
    publish_table,
    recover_table,
)
from dockerized_data_pipeline_spark.operators.merge import merge_upsert_path

SCHEMA = "symbol string, ts timestamp, close_price double"


def t(s):
    return dt.datetime.fromisoformat(s)


def _rows(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _read_prices(spark, path):
    return {r.symbol: r.close_price for r in spark.read.parquet(path).collect()}


def test_publish_creates_symlinked_version(spark, tmp_path):
    path = str(tmp_path / "tbl")
    df = _rows(spark, [("AAPL", t("2024-01-05 15:00:00"), 1.0)])
    publish_table(path, lambda v: df.write.parquet(v))
    assert os.path.islink(path)
    assert _read_prices(spark, path) == {"AAPL": 1.0}


def test_crash_before_flip_leaves_old_table_readable(spark, tmp_path, monkeypatch):
    path = str(tmp_path / "tbl")
    v1 = _rows(spark, [("AAPL", t("2024-01-05 15:00:00"), 1.0)])
    publish_table(path, lambda v: v1.write.parquet(v))

    # simulate a crash at the flip itself: os.replace raises
    def boom(src, dst):
        raise OSError("simulated crash during pointer flip")

    monkeypatch.setattr(atomic.os, "replace", boom)
    v2 = _rows(spark, [("AAPL", t("2024-01-05 15:00:00"), 2.0)])
    with pytest.raises(OSError, match="simulated crash"):
        publish_table(path, lambda v: v2.write.parquet(v))
    monkeypatch.undo()

    # readers still see the previous complete version
    assert _read_prices(spark, path) == {"AAPL": 1.0}
    # recover_table reports healthy (no repair needed)
    assert recover_table(path) is not None
    # a retried publish succeeds and GCs the orphaned version dir
    publish_table(path, lambda v: v2.write.parquet(v))
    assert _read_prices(spark, path) == {"AAPL": 2.0}
    leftover = [e for e in os.listdir(tmp_path) if e.startswith(".tbl.v-")]
    assert len(leftover) == 1  # only the current version remains


def test_recover_after_crash_in_legacy_upgrade(spark, tmp_path):
    """The one non-atomic window: upgrading a plain-directory table. A
    crash after the old dir is demoted but before the symlink exists must
    be repairable from the version dirs."""
    path = str(tmp_path / "tbl")
    old = _rows(spark, [("AAPL", t("2024-01-05 15:00:00"), 1.0)])
    old.write.parquet(path)  # legacy real directory, no symlink

    # hand-simulate the crash state: new version written, old dir demoted,
    # no symlink at target_path
    new = _rows(spark, [("AAPL", t("2024-01-05 15:00:00"), 2.0), ("MSFT", t("2024-01-05 15:00:00"), 9.0)])
    new_version = str(tmp_path / ".tbl.v-newaaaa")
    new.write.parquet(new_version)
    os.rename(path, str(tmp_path / ".tbl.v-prevbbb"))
    assert not os.path.exists(path)

    chosen = recover_table(path)
    assert chosen is not None and chosen.endswith(".tbl.v-newaaaa")
    assert _read_prices(spark, path) == {"AAPL": 2.0, "MSFT": 9.0}


def test_recover_ignores_incomplete_versions(spark, tmp_path):
    path = str(tmp_path / "tbl")
    good = _rows(spark, [("AAPL", t("2024-01-05 15:00:00"), 1.0)])
    good_version = str(tmp_path / ".tbl.v-good0000")
    good.write.parquet(good_version)
    # an incomplete (crashed mid-write) newer version: no _SUCCESS marker
    partial = str(tmp_path / ".tbl.v-partial0")
    os.makedirs(partial)
    with open(os.path.join(partial, "part-00000.parquet"), "wb") as fh:
        fh.write(b"garbage")

    chosen = recover_table(path)
    assert chosen is not None and chosen.endswith(".tbl.v-good0000")
    assert _read_prices(spark, path) == {"AAPL": 1.0}


def test_recover_with_nothing_recoverable(tmp_path):
    assert recover_table(str(tmp_path / "missing")) is None


def test_merge_upsert_path_crash_midway_then_retry(spark, tmp_path, monkeypatch):
    """End-to-end: a merge that dies at the flip leaves readers on the old
    table; re-running the same idempotent merge completes it."""
    path = str(tmp_path / "stock")
    b1 = _rows(spark, [("AAPL", t("2024-01-05 15:00:00"), 1.0)])
    merge_upsert_path(spark, path, b1, ["symbol", "ts"])

    calls = {"n": 0}
    real_replace = os.replace

    def flaky_replace(src, dst):
        calls["n"] += 1
        raise OSError("simulated crash")

    monkeypatch.setattr(atomic.os, "replace", flaky_replace)
    b2 = _rows(spark, [("MSFT", t("2024-01-05 15:00:00"), 9.0)])
    with pytest.raises(OSError):
        merge_upsert_path(spark, path, b2, ["symbol", "ts"])
    monkeypatch.setattr(atomic.os, "replace", real_replace)

    assert _read_prices(spark, path) == {"AAPL": 1.0}  # old table intact
    merge_upsert_path(spark, path, b2, ["symbol", "ts"])  # retry
    assert _read_prices(spark, path) == {"AAPL": 1.0, "MSFT": 9.0}


def test_write_audit_publish_rejects_bad_stage(spark, tmp_path):
    """A failing audit must leave the live table untouched and remove the
    staged version."""
    import glob
    import pytest

    from dockerized_data_pipeline_spark.operators.wap import (
        AuditError,
        expect_max_change,
        expect_min_rows,
        expect_unique_key,
        write_audit_publish,
    )

    target = str(tmp_path / "prices")
    v1 = spark.createDataFrame(
        [(i, float(i)) for i in range(100)], "k long, v double"
    )
    write_audit_publish(
        spark, v1, target, [expect_min_rows(50), expect_unique_key(["k"])]
    )
    assert spark.read.parquet(target).count() == 100

    current = spark.read.parquet(target)
    truncated = v1.filter("k < 5")  # upstream truncation: 95% keys removed
    with pytest.raises(AuditError, match="change volume"):
        write_audit_publish(
            spark,
            truncated,
            target,
            [expect_min_rows(1), expect_max_change(current, ["k"], 100_000)],
        )
    assert spark.read.parquet(target).count() == 100  # live table untouched
    # rejected stage removed: only the one live (hidden) version dir remains
    parent = str(tmp_path)
    versions = glob.glob(f"{parent}/.prices.v-*")
    assert len(versions) == 1

    # a sane incremental publish (3% changed) passes the same breaker
    v2 = spark.createDataFrame(
        [(i, float(i) + (1 if i < 3 else 0)) for i in range(100)],
        "k long, v double",
    )
    write_audit_publish(
        spark, v2, target, [expect_max_change(current, ["k"], 100_000)]
    )
    assert spark.read.parquet(target).filter("v != k").count() == 3


def test_write_audit_publish_null_audit(spark, tmp_path):
    import pytest

    from dockerized_data_pipeline_spark.operators.wap import (
        AuditError,
        expect_no_nulls,
        write_audit_publish,
    )

    target = str(tmp_path / "t")
    df = spark.createDataFrame([(1, "a"), (2, None)], "k long, v string")
    with pytest.raises(AuditError, match="NULL"):
        write_audit_publish(spark, df, target, [expect_no_nulls(["v"])])


def test_time_travel_reads_retained_versions(spark, tmp_path):
    from dockerized_data_pipeline_spark.operators.atomic import (
        list_versions,
        read_table_version,
    )

    path = str(tmp_path / "tt")
    for v in (1, 2, 3):
        df = _rows(spark, [("AAPL", t(f"2024-01-0{v} 00:00:00"), float(v))])
        publish_table(path, lambda d, df=df: df.write.parquet(d), keep_versions=3)

    assert len(list_versions(path)) == 3
    # n_back=0 == the live pointer
    assert read_table_version(spark, path, 0).collect()[0].close_price == 3.0
    assert spark.read.parquet(path).collect()[0].close_price == 3.0
    # history is intact and ordered
    assert read_table_version(spark, path, 1).collect()[0].close_price == 2.0
    assert read_table_version(spark, path, 2).collect()[0].close_price == 1.0
    with pytest.raises(IndexError):
        read_table_version(spark, path, 3)


def test_retention_rolls_old_versions_off(spark, tmp_path):
    from dockerized_data_pipeline_spark.operators.atomic import list_versions

    path = str(tmp_path / "roll")
    for v in range(4):
        df = _rows(spark, [("AAPL", t("2024-01-01 00:00:00"), float(v))])
        publish_table(path, lambda d, df=df: df.write.parquet(d), keep_versions=2)
    vs = list_versions(path)
    assert len(vs) == 2
    assert spark.read.parquet(vs[0]).collect()[0].close_price == 3.0
    assert spark.read.parquet(vs[1]).collect()[0].close_price == 2.0


def test_default_publish_keeps_single_version(spark, tmp_path):
    from dockerized_data_pipeline_spark.operators.atomic import list_versions

    path = str(tmp_path / "single")
    for v in (1, 2):
        df = _rows(spark, [("AAPL", t("2024-01-01 00:00:00"), float(v))])
        publish_table(path, lambda d, df=df: df.write.parquet(d))
    assert len(list_versions(path)) == 1
