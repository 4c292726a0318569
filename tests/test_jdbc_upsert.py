"""The JDBC-variant keyed upsert sink (SURVEY S4's declared
foreachPartition mapping of the reference's psycopg2 ON CONFLICT loop,
scripts/fetch_stock_data.py:86-119).

Runs the REAL statement path (DB-API executemany of the generated
ON CONFLICT SQL) against stdlib sqlite3 -- PostgreSQL and SQLite >= 3.24
share the ON CONFLICT syntax, so nothing is mocked except the server.
"""

from __future__ import annotations

import sqlite3

import pytest

from dockerized_data_pipeline_spark.sources.jdbc_upsert import (
    jdbc_upsert,
    sqlite_connection_factory,
    upsert_statement,
)

DDL = """
CREATE TABLE IF NOT EXISTS stock_data (
  symbol TEXT NOT NULL,
  ts TEXT NOT NULL,
  close_price REAL,
  volume INTEGER,
  created_at TEXT,
  PRIMARY KEY (symbol, ts)
)
"""


def _all_rows(path: str) -> list[tuple]:
    with sqlite3.connect(path) as c:
        return sorted(
            c.execute(
                "SELECT symbol, ts, close_price, volume, created_at"
                " FROM stock_data"
            ).fetchall()
        )


@pytest.fixture()
def db(tmp_path):
    path = str(tmp_path / "target.db")
    with sqlite3.connect(path) as c:
        c.execute(DDL)
        c.execute(
            "INSERT INTO stock_data VALUES ('AAA', '2024-01-01', 10.0, 100, 'c0')"
        )
    return path


def _batch(spark):
    return spark.createDataFrame(
        [
            ("AAA", "2024-01-01", 20.0, 200, "c1"),  # key match -> UPDATE
            ("BBB", "2024-01-01", 30.0, 300, "c1"),  # new key -> INSERT
        ],
        "symbol string, ts string, close_price double, volume long,"
        " created_at string",
    )


def test_statement_shape():
    stmt = upsert_statement(
        "stock_data",
        ["symbol", "ts", "close_price", "created_at"],
        keys=["symbol", "ts"],
        update_cols=["close_price"],
    )
    assert stmt == (
        "INSERT INTO stock_data (symbol, ts, close_price, created_at)"
        " VALUES (?, ?, ?, ?) ON CONFLICT (symbol, ts)"
        " DO UPDATE SET close_price = excluded.close_price"
    )


def test_statement_rejects_bad_columns():
    with pytest.raises(ValueError):
        upsert_statement("t", ["a", "b"], keys=["a"], update_cols=["nope"])
    with pytest.raises(ValueError):
        upsert_statement("t", ["a", "b"], keys=["a"], update_cols=["a"])


def test_upsert_updates_and_inserts(spark, db):
    jdbc_upsert(
        _batch(spark),
        "stock_data",
        keys=["symbol", "ts"],
        connection_factory=sqlite_connection_factory(db),
        update_cols=["close_price", "volume"],  # created_at preserved
        num_partitions=1,
    )
    assert _all_rows(db) == [
        ("AAA", "2024-01-01", 20.0, 200, "c0"),  # updated, created_at kept
        ("BBB", "2024-01-01", 30.0, 300, "c1"),  # inserted
    ]


def test_upsert_idempotent(spark, db):
    for _ in range(2):
        jdbc_upsert(
            _batch(spark),
            "stock_data",
            keys=["symbol", "ts"],
            connection_factory=sqlite_connection_factory(db),
            num_partitions=1,
        )
    # second run is a no-op: same two rows, all columns from the batch
    assert _all_rows(db) == [
        ("AAA", "2024-01-01", 20.0, 200, "c1"),
        ("BBB", "2024-01-01", 30.0, 300, "c1"),
    ]


def test_upsert_batched_multi_partition(spark, tmp_path):
    path = str(tmp_path / "multi.db")
    with sqlite3.connect(path) as c:
        c.execute(DDL)
    n = 500
    df = spark.range(n).selectExpr(
        "concat('S', CAST(id % 7 AS STRING)) AS symbol",
        "CAST(id AS STRING) AS ts",
        "CAST(id AS DOUBLE) AS close_price",
        "id AS volume",
        "'c0' AS created_at",
    )
    jdbc_upsert(
        df,
        "stock_data",
        keys=["symbol", "ts"],
        connection_factory=sqlite_connection_factory(path),
        batch_size=64,
        num_partitions=2,
    )
    rows = _all_rows(path)
    assert len(rows) == n
    with sqlite3.connect(path) as c:
        total = c.execute("SELECT SUM(volume) FROM stock_data").fetchone()[0]
    assert total == n * (n - 1) // 2
