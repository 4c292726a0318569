"""Keyed upsert into an external SQL store via ``foreachPartition`` --
the declared JDBC variant of the S4 MERGE sink (SURVEY section 2.1).

The reference's ``store_data`` opens a psycopg2 connection and executes
``INSERT ... ON CONFLICT (symbol, timestamp) DO UPDATE SET ...`` row by row
(/root/reference/scripts/fetch_stock_data.py:86-119, connection at :86-88).
Re-expressed for Spark's execution model:

  * the upsert statement is built ONCE on the driver and shipped to
    executors as a string (same SET-list semantics: ``update_cols`` are
    overwritten from the incoming row, anything else -- the reference's
    created_at/time_zone -- keeps the target value by omission);
  * each partition opens ONE connection through an injectable zero-arg
    ``connection_factory`` (DB-API 2.0: ``.cursor()``, ``.commit()``,
    ``.close()``), not one per row, and writes in ``executemany`` batches
    -- the reference's row-at-a-time loop does not survive 100 TB;
  * idempotence is inherited from ON CONFLICT DO UPDATE: re-running the
    same batch converges to the same table state (SURVEY T3).

The factory must be picklable (a top-level function / functools.partial),
because it runs inside executor tasks. ``ON CONFLICT`` syntax is shared by
PostgreSQL and SQLite >= 3.24, so tests exercise the real statement path
against stdlib sqlite3 with no fake SQL layer.
"""

from __future__ import annotations

from collections.abc import Callable, Iterable, Iterator
from typing import Any

from pyspark.sql import DataFrame

ConnectionFactory = Callable[[], Any]


def upsert_statement(
    table: str,
    columns: list[str],
    keys: list[str],
    update_cols: list[str],
    placeholder: str = "?",
) -> str:
    """The ON CONFLICT upsert statement (reference SET list shape,
    scripts/fetch_stock_data.py:94-101). ``placeholder`` is "?" for
    sqlite/JDBC-style drivers, "%s" for psycopg2."""
    for c in keys + update_cols:
        if c not in columns:
            raise ValueError(f"column {c!r} not in {columns}")
    overlap = set(keys) & set(update_cols)
    if overlap:
        raise ValueError(f"key columns cannot be updated: {sorted(overlap)}")
    collist = ", ".join(columns)
    values = ", ".join([placeholder] * len(columns))
    conflict = ", ".join(keys)
    sets = ", ".join(f"{c} = excluded.{c}" for c in update_cols)
    return (
        f"INSERT INTO {table} ({collist}) VALUES ({values}) "
        f"ON CONFLICT ({conflict}) DO UPDATE SET {sets}"
    )


def _chunks(rows: Iterable[tuple], size: int) -> Iterator[list[tuple]]:
    buf: list[tuple] = []
    for r in rows:
        buf.append(r)
        if len(buf) >= size:
            yield buf
            buf = []
    if buf:
        yield buf


def upsert_partition(
    rows: Iterable[Any],
    columns: list[str],
    statement: str,
    connection_factory: ConnectionFactory,
    batch_size: int,
) -> None:
    """Executor-side body: one connection per partition, batched writes.
    Module-level (not a closure) so only (columns, statement, factory,
    batch_size) are captured in the task binary."""
    it = iter(rows)
    try:
        first = next(it)
    except StopIteration:
        return  # empty partition: never open a connection
    import itertools

    conn = connection_factory()
    try:
        cur = conn.cursor()
        for chunk in _chunks(
            (tuple(r[c] for c in columns) for r in itertools.chain([first], it)),
            batch_size,
        ):
            cur.executemany(statement, chunk)
        conn.commit()
    except Exception:
        # suppress rollback failures (a dead connection raises here too)
        # so the ORIGINAL write error is what reaches Spark, not the
        # rollback artifact
        try:
            conn.rollback()
        except Exception:
            pass
        raise
    finally:
        try:
            conn.close()
        except Exception:
            pass


def jdbc_upsert(
    df: DataFrame,
    table: str,
    keys: list[str],
    connection_factory: ConnectionFactory,
    update_cols: list[str] | None = None,
    batch_size: int = 500,
    placeholder: str = "?",
    num_partitions: int | None = None,
) -> None:
    """Upsert ``df`` into ``table`` keyed on ``keys`` through DB-API
    connections created per partition by ``connection_factory``.

    ``update_cols`` defaults to every non-key column (the reference updates
    all OHLCV measures + last_refreshed and preserves the rest by omission).
    ``num_partitions`` coalesces before writing -- size it to what the
    target store can absorb concurrently (a single-writer store like an
    sqlite file wants 1; a Postgres fleet takes one connection per
    partition).
    """
    columns = df.columns
    if update_cols is None:
        update_cols = [c for c in columns if c not in keys]
    stmt = upsert_statement(table, columns, keys, update_cols, placeholder)
    out = df.coalesce(num_partitions) if num_partitions else df
    out.foreachPartition(
        lambda rows: upsert_partition(
            rows, columns, stmt, connection_factory, batch_size
        )
    )


def sqlite_connection_factory(path: str, timeout: float = 30.0) -> ConnectionFactory:
    """Factory-of-factory for an SQLite target file -- the in-sandbox
    stand-in for Postgres (same ON CONFLICT dialect since 3.24). The
    timeout covers write-lock contention between concurrent partitions.
    Lives here (not in test code) so the partial pickles by module
    reference and imports cleanly inside executor tasks."""
    import functools

    return functools.partial(_connect_sqlite, path, timeout)


def _connect_sqlite(path: str, timeout: float):
    import sqlite3

    return sqlite3.connect(path, timeout=timeout)


def postgres_connection_factory(dsn: str) -> ConnectionFactory:
    """Factory-of-factory for a real Postgres target (reference connection
    params at scripts/fetch_stock_data.py:86-88). psycopg2 is imported
    lazily inside the executor task; pass ``placeholder='%s'`` to
    ``jdbc_upsert`` with this."""
    import functools

    return functools.partial(_connect_postgres, dsn)


def _connect_postgres(dsn: str):
    try:
        import psycopg2  # type: ignore[import-not-found]
    except ImportError as e:  # pragma: no cover - driver not in this image
        raise RuntimeError(
            "psycopg2 is required for the Postgres upsert target"
        ) from e
    return psycopg2.connect(dsn)
