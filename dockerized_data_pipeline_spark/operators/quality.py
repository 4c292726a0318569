"""Data-quality checks as observe() metrics (SURVEY section 2.9 T8).

The reference documents a quality-check task ("validates data integrity and
completeness", README.md:107-108) without implementing it. Here the checks
are ``DataFrame.observe`` aggregates: they piggyback on a write/scan the job
already performs -- zero extra passes over the data, which is the only
acceptable cost at 100 TB.

Invariants mirrored from the reference's schema/upsert guarantees
(dags/stock_data_pipeline.py:25-39):
  * key columns non-null (PK columns NOT NULL)
  * high >= low per row (OHLC sanity)
  * volume >= 0
  * row count > 0 (completeness)
Key uniqueness (the PK invariant) needs a shuffle, so it is a separate
explicit check rather than an observe metric.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def observe_quality(
    df: DataFrame,
    observation: Observation,
    key_cols: list[str],
    high_col: str | None = None,
    low_col: str | None = None,
    nonneg_cols: list[str] | None = None,
) -> DataFrame:
    metrics = [F.count(F.lit(1)).alias("rows_total")]
    for k in key_cols:
        metrics.append(
            F.count(F.when(F.col(k).isNull(), 1)).alias(f"null_{k}")
        )
    if high_col and low_col:
        metrics.append(
            F.count(
                F.when(F.col(high_col) < F.col(low_col), 1)
            ).alias("high_lt_low")
        )
    for c in nonneg_cols or []:
        metrics.append(F.count(F.when(F.col(c) < 0, 1)).alias(f"neg_{c}"))
    return df.observe(observation, *metrics)


def quality_violations(observation: Observation) -> dict[str, int]:
    """Metrics that indicate violations (everything but rows_total; plus
    rows_total==0 reported as 'empty')."""
    got = observation.get
    out = {k: v for k, v in got.items() if k != "rows_total" and v}
    if got.get("rows_total", 0) == 0:
        out["empty"] = 1
    return out


def duplicate_key_count(df: DataFrame, key_cols: list[str]) -> int:
    """PK-uniqueness check (post-MERGE invariant): number of keys with >1 row."""
    return (
        df.groupBy(*key_cols)
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") > 1)
        .count()
    )
