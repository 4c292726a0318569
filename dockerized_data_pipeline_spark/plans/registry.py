"""Query registry: single source of truth for the driver contract.

Each query is a callable ``(spark, sf_dir) -> DataFrame`` plus (when
SQL-expressible) an ANSI-SQL oracle string DuckDB runs on the same parquet
tables. Column names/aliases MUST match between the two.

Output-type portability contract: aggregated numerics accumulate in exact
DECIMAL internally (order-independent, engine-independent), but the FINAL
output column must be DOUBLE or BIGINT — never DECIMAL.  The differential
harness coerces DuckDB DECIMAL/HUGEINT results to float64 while Spark Decimal
values surface as ``decimal.Decimal`` objects, so a DECIMAL output column
hash-mismatches even when the values are identical.  ``decimal.Decimal`` ->
float64 is correctly rounded in both engines, so casting the same exact
decimal to DOUBLE on both sides yields bit-identical results.  The ``query``
decorator enforces the Spark half structurally (any top-level Decimal output
column is cast to double); oracle SQL must apply the matching
``CAST(... AS DOUBLE)`` / ``CAST(SUM(int) AS BIGINT)`` by hand —
``tools/audit_types.py`` sweeps for violations on both sides.
"""

from __future__ import annotations

import functools
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DecimalType

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}

# Deterministic "now" for NOW()-relative queries (SURVEY section 7 hard part 3):
# events.ts spans 2024-01; an injected as-of keeps engine and oracle equal.
AS_OF = "2024-01-31 00:00:00"
ONE_DAY_BEFORE_AS_OF = "2024-01-30 00:00:00"


def _portable_output(df: DataFrame) -> DataFrame:
    """Final-mile cast of any Decimal output column to double (see module doc)."""
    dec_cols = [f.name for f in df.schema.fields if isinstance(f.dataType, DecimalType)]
    if not dec_cols:
        return df
    return df.withColumns({c: F.col(c).cast("double") for c in dec_cols})


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")

        @functools.wraps(fn)
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            return _portable_output(fn(spark, sf_dir))

        QUERIES[name] = wrapped
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco
