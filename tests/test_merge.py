"""MERGE/upsert semantics tests (SURVEY section 2.1 S4, section 5.2 item 4):
column-level update/preserve lists and idempotence -- the exact guarantees of
the reference's ON CONFLICT upsert (scripts/fetch_stock_data.py:90-102)."""

from __future__ import annotations

import datetime as dt

from dockerized_data_pipeline_spark.operators.merge import (
    dedup_keep_newest,
    merge_upsert,
    merge_upsert_path,
)

SCHEMA = (
    "symbol string, ts timestamp, close_price double, last_refreshed timestamp,"
    " time_zone string, created_at timestamp"
)


def t(s):
    return dt.datetime.fromisoformat(s)


def _rows(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


KEYS = ["symbol", "ts"]
UPDATE = ["close_price", "last_refreshed"]
PRESERVE = ["time_zone", "created_at"]


def test_update_and_insert_semantics(spark):
    target = _rows(
        spark,
        [
            ("AAPL", t("2024-01-05 15:00:00"), 100.0, t("2024-01-05 15:00:00"), "US/Eastern", t("2024-01-01 00:00:00")),
            ("AAPL", t("2024-01-05 16:00:00"), 101.0, t("2024-01-05 16:00:00"), "US/Eastern", t("2024-01-01 00:00:00")),
        ],
    )
    batch = _rows(
        spark,
        [
            # overlaps key 16:00 -> updates close/last_refreshed, preserves tz/created_at
            ("AAPL", t("2024-01-05 16:00:00"), 999.0, t("2024-01-05 17:00:00"), "UTC", t("2024-02-01 00:00:00")),
            # new key -> insert with batch's preserve values
            ("AAPL", t("2024-01-05 17:00:00"), 102.0, t("2024-01-05 17:00:00"), "UTC", t("2024-02-01 00:00:00")),
        ],
    )
    out = {
        (r.symbol, r.ts): r
        for r in merge_upsert(target, batch, KEYS, UPDATE, PRESERVE).collect()
    }
    assert len(out) == 3
    updated = out[("AAPL", t("2024-01-05 16:00:00"))]
    assert updated.close_price == 999.0
    assert updated.last_refreshed == t("2024-01-05 17:00:00")
    assert updated.time_zone == "US/Eastern"  # preserved (not in SET list)
    assert updated.created_at == t("2024-01-01 00:00:00")  # preserved
    inserted = out[("AAPL", t("2024-01-05 17:00:00"))]
    assert inserted.time_zone == "UTC"
    untouched = out[("AAPL", t("2024-01-05 15:00:00"))]
    assert untouched.close_price == 100.0


def test_merge_is_idempotent(spark):
    target = _rows(
        spark,
        [("AAPL", t("2024-01-05 15:00:00"), 100.0, t("2024-01-05 15:00:00"), "US/Eastern", t("2024-01-01 00:00:00"))],
    )
    batch = _rows(
        spark,
        [
            ("AAPL", t("2024-01-05 15:00:00"), 200.0, t("2024-01-05 16:00:00"), "UTC", t("2024-02-01 00:00:00")),
            ("GOOG", t("2024-01-05 15:00:00"), 50.0, t("2024-01-05 16:00:00"), "UTC", t("2024-02-01 00:00:00")),
        ],
    )
    once = merge_upsert(target, batch, KEYS, UPDATE, PRESERVE)
    twice = merge_upsert(once, batch, KEYS, UPDATE, PRESERVE)
    a = {tuple(r) for r in once.collect()}
    b = {tuple(r) for r in twice.collect()}
    assert a == b


def test_batch_dedup_keeps_newest(spark):
    batch = _rows(
        spark,
        [
            ("AAPL", t("2024-01-05 15:00:00"), 1.0, t("2024-01-05 15:00:00"), "UTC", t("2024-01-01 00:00:00")),
            ("AAPL", t("2024-01-05 15:00:00"), 2.0, t("2024-01-05 16:00:00"), "UTC", t("2024-01-01 00:00:00")),
        ],
    )
    out = dedup_keep_newest(batch, KEYS, ["last_refreshed"]).collect()
    assert len(out) == 1
    assert out[0].close_price == 2.0


def test_merge_null_first_key_preserves_target_values(spark):
    """eqNullSafe keys mean a NULL key value is a legal match: the target
    row (NULL, ts) matched by a batch row must still PRESERVE its
    preserve_cols (regression: presence was tested via keys[0].isNotNull,
    misclassifying this row as absent)."""
    target = _rows(
        spark,
        [(None, t("2024-01-05 15:00:00"), 100.0, t("2024-01-05 15:00:00"), "US/Eastern", t("2024-01-01 00:00:00"))],
    )
    batch = _rows(
        spark,
        [(None, t("2024-01-05 15:00:00"), 999.0, t("2024-01-05 17:00:00"), "UTC", t("2024-02-01 00:00:00"))],
    )
    out = merge_upsert(target, batch, KEYS, UPDATE, PRESERVE).collect()
    assert len(out) == 1
    row = out[0]
    assert row.close_price == 999.0  # updated from batch
    assert row.time_zone == "US/Eastern"  # preserved from target
    assert row.created_at == t("2024-01-01 00:00:00")  # preserved


def test_merge_upsert_path_atomic_swap(spark, tmp_path):
    path = str(tmp_path / "stock_data")
    b1 = _rows(
        spark,
        [("AAPL", t("2024-01-05 15:00:00"), 1.0, t("2024-01-05 15:00:00"), "UTC", t("2024-01-01 00:00:00"))],
    )
    merge_upsert_path(spark, path, b1, KEYS, UPDATE, PRESERVE, batch_order_by=["last_refreshed"])
    b2 = _rows(
        spark,
        [
            ("AAPL", t("2024-01-05 15:00:00"), 5.0, t("2024-01-05 16:00:00"), "UTC", t("2024-03-01 00:00:00")),
            ("MSFT", t("2024-01-05 15:00:00"), 9.0, t("2024-01-05 16:00:00"), "UTC", t("2024-03-01 00:00:00")),
        ],
    )
    merge_upsert_path(spark, path, b2, KEYS, UPDATE, PRESERVE, batch_order_by=["last_refreshed"])
    rows = {(r.symbol): r for r in spark.read.parquet(path).collect()}
    assert set(rows) == {"AAPL", "MSFT"}
    assert rows["AAPL"].close_price == 5.0
    assert rows["AAPL"].created_at == t("2024-01-01 00:00:00")  # preserved across swap


def test_apply_cdc_insert_update_delete(spark):
    from dockerized_data_pipeline_spark.operators.merge import apply_cdc

    target = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k long, v string"
    )
    feed = spark.createDataFrame(
        [
            ("I", 4, "d", 1),
            ("U", 2, "b2", 1),
            ("D", 3, None, 1),
            ("U", 5, "e1", 1),   # updated then deleted in the same feed
            ("D", 5, None, 2),
        ],
        "op string, k long, v string, seq long",
    )
    got = {
        r.k: r.v
        for r in apply_cdc(target, feed, ["k"], order_by=["seq"]).collect()
    }
    assert got == {1: "a", 2: "b2", 4: "d"}


def test_apply_cdc_delete_then_reinsert_keeps_newest(spark):
    from dockerized_data_pipeline_spark.operators.merge import apply_cdc

    target = spark.createDataFrame([(1, "a")], "k long, v string")
    feed = spark.createDataFrame(
        [("D", 1, None, 1), ("I", 1, "a2", 2)],
        "op string, k long, v string, seq long",
    )
    got = {r.k: r.v for r in apply_cdc(target, feed, ["k"], order_by=["seq"]).collect()}
    assert got == {1: "a2"}
