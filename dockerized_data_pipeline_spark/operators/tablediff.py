"""Keyed table diff / reconciliation: classify every key as added, removed,
changed, or same between two snapshots -- the verification step after any
backfill, migration, or MERGE (the reference has no analog; its Makefile
eyeballs row counts. This is the operator a user actually needs to trust
an upsert pipeline, and it composes with merge_upsert for
write-audit-publish).

One full-outer join on the key columns (single shuffle per side, AQE skew
handling); change detection compares a deterministic struct of the compared
columns -- null-safe, so NULL != value counts as a change and NULL == NULL
does not.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def table_diff(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Returns one row per key present in either side with ``change_type``
    in ('added', 'removed', 'changed', 'same') -- 'added' means present
    only in ``right`` (the new snapshot). Compared columns default to all
    non-key columns shared by both sides."""
    if compare_cols is None:
        shared = [c for c in left.columns if c in set(right.columns)]
        compare_cols = [c for c in shared if c not in key_cols]

    def tagged(df: DataFrame, marker: str) -> DataFrame:
        cols = [F.col(c) for c in key_cols] + [
            F.struct(*[F.col(c) for c in compare_cols]).alias(f"__p_{marker}"),
            F.lit(True).alias(f"__in_{marker}"),
        ]
        return df.select(*cols)

    l = tagged(left, "l")
    r = tagged(right, "r")
    joined = l.join(r, key_cols, "full_outer")
    in_l = F.col("__in_l").isNotNull()
    in_r = F.col("__in_r").isNotNull()
    change: Column = (
        F.when(~in_l, F.lit("added"))
        .when(~in_r, F.lit("removed"))
        .when(F.col("__p_l").eqNullSafe(F.col("__p_r")), F.lit("same"))
        .otherwise(F.lit("changed"))
    )
    return joined.select(*key_cols, change.alias("change_type"))


def diff_summary(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Aggregate counts per change_type (the reconciliation report)."""
    return (
        table_diff(left, right, key_cols, compare_cols)
        .groupBy("change_type")
        .agg(F.count("*").cast("bigint").alias("n"))
    )
