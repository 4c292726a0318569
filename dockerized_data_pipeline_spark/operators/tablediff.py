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

    l = tagged(left, "l").alias("l")
    r = tagged(right, "r").alias("r")
    # eqNullSafe on the keys (r7, found by the property test): a NULL key
    # value is legal, and a plain-equality full outer would report the
    # same NULL-key row as BOTH 'removed' and 'added' instead of
    # comparing it -- the same null-key discipline as merge_upsert
    cond = None
    for k in key_cols:
        c = F.col(f"l.{k}").eqNullSafe(F.col(f"r.{k}"))
        cond = c if cond is None else (cond & c)
    joined = l.join(r, cond, "full_outer")
    in_l = F.col("__in_l").isNotNull()
    in_r = F.col("__in_r").isNotNull()
    change: Column = (
        F.when(~in_l, F.lit("added"))
        .when(~in_r, F.lit("removed"))
        .when(F.col("__p_l").eqNullSafe(F.col("__p_r")), F.lit("same"))
        .otherwise(F.lit("changed"))
    )
    out_keys = [
        F.coalesce(F.col(f"l.{k}"), F.col(f"r.{k}")).alias(k) for k in key_cols
    ]
    return joined.select(*out_keys, change.alias("change_type"))


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
