"""Partition-pruned MERGE: correctness + the scale property itself --
untouched partitions' files are byte-identical (not rewritten)."""

from __future__ import annotations

import datetime as dt
import os


from dockerized_data_pipeline_spark.operators.merge import merge_upsert_partitioned

SCHEMA = "symbol string, ts timestamp, close double, last_refreshed timestamp"
KEYS = ["symbol", "ts"]


def t(s):
    return dt.datetime.fromisoformat(s)


def _files_with_mtime(path):
    out = {}
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                p = os.path.join(root, f)
                out[p] = os.path.getmtime(p)
    return out


def test_partitioned_merge_rewrites_only_touched_partitions(spark, tmp_path):
    path = str(tmp_path / "stock")
    b1 = spark.createDataFrame(
        [
            ("AAPL", t("2024-01-05 15:00:00"), 1.0, t("2024-01-05 15:00:00")),
            ("MSFT", t("2024-01-05 15:00:00"), 2.0, t("2024-01-05 15:00:00")),
            ("GOOG", t("2024-01-05 15:00:00"), 3.0, t("2024-01-05 15:00:00")),
        ],
        SCHEMA,
    )
    stats1 = merge_upsert_partitioned(
        spark, path, b1, KEYS, "symbol", batch_order_by=["last_refreshed"]
    )
    assert stats1 == {"partitions_rewritten": 3}
    before = _files_with_mtime(path)

    # batch 2 touches only AAPL: update 15:00 + insert 16:00
    b2 = spark.createDataFrame(
        [
            ("AAPL", t("2024-01-05 15:00:00"), 9.0, t("2024-01-05 16:00:00")),
            ("AAPL", t("2024-01-05 16:00:00"), 10.0, t("2024-01-05 16:00:00")),
        ],
        SCHEMA,
    )
    stats2 = merge_upsert_partitioned(
        spark, path, b2, KEYS, "symbol", batch_order_by=["last_refreshed"]
    )
    assert stats2 == {"partitions_rewritten": 1}

    after = _files_with_mtime(path)
    untouched_before = {p: m for p, m in before.items() if "symbol=AAPL" not in p}
    untouched_after = {p: m for p, m in after.items() if "symbol=AAPL" not in p}
    assert untouched_before == untouched_after  # byte-identical: same files, same mtimes

    rows = {(r.symbol, r.ts): r.close for r in spark.read.parquet(path).collect()}
    assert rows[("AAPL", t("2024-01-05 15:00:00"))] == 9.0
    assert rows[("AAPL", t("2024-01-05 16:00:00"))] == 10.0
    assert rows[("MSFT", t("2024-01-05 15:00:00"))] == 2.0
    assert len(rows) == 4


def test_partitioned_merge_requires_partition_key(spark, tmp_path):
    import pytest

    b = spark.createDataFrame([], SCHEMA)
    with pytest.raises(ValueError):
        merge_upsert_partitioned(spark, str(tmp_path / "x"), b, ["ts"], "symbol")
