"""Partitioned JDBC-style read (sources/jdbc_read.py) against real
sqlite: range splits must cover every row exactly once, including rows
outside the bound hints (Spark JDBC semantics)."""

from __future__ import annotations

import sqlite3

import pytest

from dockerized_data_pipeline_spark.sources.jdbc_read import (
    jdbc_partitioned_read,
    split_ranges,
)
from dockerized_data_pipeline_spark.sources.jdbc_upsert import (
    sqlite_connection_factory,
)

SCHEMA = "id long, sym string, px double"


@pytest.fixture()
def db(tmp_path):
    path = str(tmp_path / "src.db")
    with sqlite3.connect(path) as c:
        c.execute("CREATE TABLE prices (id INTEGER PRIMARY KEY, sym TEXT, px REAL)")
        c.executemany(
            "INSERT INTO prices VALUES (?, ?, ?)",
            [(i, f"S{i % 5}", float(i) / 4) for i in range(100)],
        )
        c.commit()
    return path


def test_split_ranges_shape():
    rs = split_ranges(0, 100, 4)
    assert rs == [(None, 25), (25, 50), (50, 75), (75, None)]
    assert split_ranges(0, 100, 1) == [(None, None)]
    assert split_ranges(5, 5, 4) == [(None, None)]


def test_partitioned_read_covers_all_rows_once(spark, db):
    df = jdbc_partitioned_read(
        spark,
        sqlite_connection_factory(db),
        "prices",
        ["id", "sym", "px"],
        key_col="id",
        lower=0,
        upper=100,
        num_partitions=4,
        schema=SCHEMA,
    )
    assert df.rdd.getNumPartitions() == 4
    rows = sorted((r.id, r.sym, r.px) for r in df.collect())
    assert rows == [(i, f"S{i % 5}", i / 4) for i in range(100)]


def test_rows_outside_bound_hints_still_read(spark, db):
    """Spark JDBC semantics: lower/upper control parallelism, not
    filtering -- the first/last ranges are unbounded."""
    df = jdbc_partitioned_read(
        spark,
        sqlite_connection_factory(db),
        "prices",
        ["id", "sym", "px"],
        key_col="id",
        lower=40,
        upper=60,
        num_partitions=3,
        schema=SCHEMA,
    )
    assert df.count() == 100  # all rows, not just [40, 60)


def test_cursor_streams_in_bounded_chunks(spark, db):
    """Memory contract (ADVICE r3): the task streams the cursor via
    fetchmany, never materializing a whole range at once -- with a chunk
    size far below the range size the result is still exactly-once."""
    df = jdbc_partitioned_read(
        spark,
        sqlite_connection_factory(db),
        "prices",
        ["id", "sym", "px"],
        key_col="id",
        lower=0,
        upper=100,
        num_partitions=2,
        schema=SCHEMA,
        fetch_batch_rows=7,  # 100 rows -> ~8 chunks per range
    )
    rows = sorted((r.id, r.sym, r.px) for r in df.collect())
    assert rows == [(i, f"S{i % 5}", i / 4) for i in range(100)]


def test_empty_range_yields_no_rows(spark, db):
    """A range with no matching keys yields zero batches cleanly."""
    with sqlite3.connect(db) as c:
        c.execute("DELETE FROM prices WHERE id >= 50")
        c.commit()
    df = jdbc_partitioned_read(
        spark,
        sqlite_connection_factory(db),
        "prices",
        ["id", "sym", "px"],
        key_col="id",
        lower=0,
        upper=100,
        num_partitions=4,  # upper two ranges now empty
        schema=SCHEMA,
    )
    assert df.count() == 50


def test_single_partition_degenerate(spark, db):
    df = jdbc_partitioned_read(
        spark,
        sqlite_connection_factory(db),
        "prices",
        ["id", "sym", "px"],
        key_col="id",
        lower=0,
        upper=100,
        num_partitions=1,
        schema=SCHEMA,
    )
    assert df.count() == 100
