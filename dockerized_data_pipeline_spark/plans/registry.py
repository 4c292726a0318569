"""Query registry: single source of truth for the driver contract.

Each query is a callable ``(spark, sf_dir) -> DataFrame`` plus (when
SQL-expressible) an ANSI-SQL oracle string DuckDB runs on the same parquet
tables. Column names/aliases MUST match between the two; aggregated numerics
are cast to explicit DECIMAL types on BOTH sides so value hashes are
order-independent and engine-independent (float accumulation order is not).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}

# Deterministic "now" for NOW()-relative queries (SURVEY section 7 hard part 3):
# events.ts spans 2024-01; an injected as-of keeps engine and oracle equal.
AS_OF = "2024-01-31 00:00:00"
ONE_DAY_BEFORE_AS_OF = "2024-01-30 00:00:00"


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco
