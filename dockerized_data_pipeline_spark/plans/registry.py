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

DECIMAL->DOUBLE cast portability (r9, found by the sf10 scale oracle):
DuckDB's native ``CAST(DECIMAL AS DOUBLE)`` divides the unscaled integer
by 10^scale IN FLOAT ARITHMETIC, which double-rounds once the unscaled
value exceeds 2^53 (a scale-8 revenue sum crosses that at ~9e7 — q5 at
sf10 diverged from Spark in the last ulp on 2 of 5 groups). Spark's
Decimal.toDouble (BigDecimal.doubleValue) is correctly rounded. The
registry therefore rewrites every ``CAST(expr AS DOUBLE)`` in oracle SQL
to ``CAST(CAST(expr AS VARCHAR) AS DOUBLE)`` at registration: DECIMAL ->
VARCHAR is exact (all digits) and VARCHAR -> DOUBLE is correctly-rounded
strtod, matching Spark bit-for-bit; for expressions already DOUBLE or
integer the round-trip is the identity (shortest-repr print), so the
blanket rewrite is safe. This is the decimal->double mirror of the
float->DECIMAL VARCHAR round-trip rule in plans/llm.py.
"""

from __future__ import annotations

import functools
import re
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


_AS_DOUBLE_TAIL = re.compile(r"\s+AS\s+DOUBLE\s*$", re.IGNORECASE)


def roundtrip_double_casts(sql: str) -> str:
    """Rewrite every ``CAST(expr AS DOUBLE)`` to
    ``CAST(CAST(expr AS VARCHAR) AS DOUBLE)`` (see module doc: DuckDB's
    native DECIMAL->DOUBLE cast double-rounds above 2^53 unscaled;
    the VARCHAR route is correctly rounded and the identity for
    already-double/integer expressions). Balanced-paren scan; recurses
    into the cast body so nested casts are rewritten too.

    Exemption: a body referencing ``embedding`` is left alone. REAL
    (float32) -> DOUBLE must WIDEN exactly, and the VARCHAR route would
    instead parse the shortest FLOAT32 string as a double -- a different
    value (caught by x3_centroid_purity in the sweep). ``embedding`` is
    the schema's only REAL column, so the token test is exact for every
    registered oracle; a future REAL column must join the exemption."""
    out: list[str] = []
    i = 0
    upper = sql.upper()
    while True:
        j = upper.find("CAST(", i)
        if j == -1:
            out.append(sql[i:])
            return "".join(out)
        k = j + 5
        depth = 1
        while k < len(sql) and depth:
            c = sql[k]
            if c == "'":  # skip string literals ('' is the escape)
                k += 1
                while k < len(sql):
                    if sql[k] == "'":
                        if k + 1 < len(sql) and sql[k + 1] == "'":
                            k += 2
                            continue
                        break
                    k += 1
            elif c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
            k += 1
        inner = sql[j + 5 : k - 1]
        m = _AS_DOUBLE_TAIL.search(inner)
        if m and "embedding" not in inner.lower():
            expr = roundtrip_double_casts(inner[: m.start()])
            out.append(sql[i:j])
            out.append(f"CAST(CAST({expr} AS VARCHAR) AS DOUBLE)")
            i = k
        else:
            # not a double cast: emit up to the body and keep scanning
            # INSIDE it so nested double-casts are still rewritten
            out.append(sql[i : j + 5])
            i = j + 5


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")

        @functools.wraps(fn)
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            return _portable_output(fn(spark, sf_dir))

        QUERIES[name] = wrapped
        if oracle is not None:
            ORACLES[name] = roundtrip_double_casts(oracle)
        return fn

    return deco
