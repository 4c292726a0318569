"""Keyed MERGE / upsert (SURVEY section 2.1 S4, section 2.3 J1) -- the
reference's ``INSERT ... ON CONFLICT (symbol, timestamp) DO UPDATE``
(scripts/fetch_stock_data.py:90-102) re-expressed for a file-based engine.

Semantics preserved exactly:
  * batch rows matching an existing key UPDATE the listed columns
    (OHLCV + last_refreshed, SET list at scripts/fetch_stock_data.py:96-101);
  * ``preserve_cols`` (created_at, time_zone) keep the TARGET value on match
    -- the reference deliberately excludes them from the SET list;
  * unmatched batch rows INSERT;
  * re-running the same batch is a no-op (idempotence, the property that
    makes at-least-once fetch + upsert effectively-once, SURVEY T3).

Scale design: the join shuffles both sides on the merge keys once; AQE
broadcasts the batch side automatically when it is small (the common
incremental-ingest case: a few thousand new rows against a 100 TB target).
For the path-based variant, partition the target by a key prefix (e.g.
symbol or date) so a future optimization can rewrite only affected
partitions instead of the whole table; Delta/Iceberg MERGE INTO can slot in
behind the same signature when those jars are available.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .atomic import publish_table_transaction
from .skew import _contains_map

_MATCH_MARKER = "__ddp_batch_present"
_TARGET_MARKER = "__ddp_target_present"


def dedup_keep_newest(
    df: DataFrame, keys: list[str], order_by: list[str]
) -> DataFrame:
    """Collapse a batch to one row per key, keeping the newest by ``order_by``
    (descending, ties broken by all remaining columns for determinism).

    This is the window-dedup the reference gets implicitly from upserting
    rows one at a time in arrival order (scripts/fetch_stock_data.py:104-115).

    The tie-break is real, not just documented (r7): ordering by
    ``order_by`` alone leaves rows with equal order values in
    row_number()'s arbitrary partition order -- a nondeterministic pick
    that can differ across retries and partition layouts. Every remaining
    ORDERABLE non-key column (in schema order, desc, nulls last) completes
    the total order; two rows that still tie are full-content duplicates
    up to unorderable (map-containing) columns, which Spark cannot sort by
    -- for rows identical elsewhere but differing only in a map column,
    the pick among them remains arbitrary (documented caveat).
    """
    tiebreak = [
        f.name
        for f in df.schema.fields
        if f.name not in keys
        and f.name not in order_by
        and not _contains_map(f.dataType)
    ]
    w = Window.partitionBy(*keys).orderBy(
        *[F.desc_nulls_last(c) for c in [*order_by, *tiebreak]]
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def merge_upsert(
    target: DataFrame,
    batch: DataFrame,
    keys: list[str],
    update_cols: list[str] | None = None,
    preserve_cols: list[str] | None = None,
    batch_order_by: list[str] | None = None,
) -> DataFrame:
    """Return target MERGE batch on ``keys`` (pure DataFrame transform).

    update_cols: columns taken from the batch when the key matches
                 (default: every non-key column not in preserve_cols).
    preserve_cols: columns that keep the target value on match and take the
                 batch value only for brand-new keys (created_at semantics).
    batch_order_by: if given, the batch is first deduped per key keeping the
                 newest by these columns.
    """
    non_keys = [c for c in target.columns if c not in keys]
    preserve_cols = preserve_cols or []
    if update_cols is None:
        update_cols = [c for c in non_keys if c not in preserve_cols]
    if batch_order_by:
        batch = dedup_keep_newest(batch, keys, batch_order_by)

    b = batch.withColumn(_MATCH_MARKER, F.lit(True)).alias("b")
    # Presence markers on BOTH sides: the join keys are eqNullSafe (NULL
    # key values are legal), so testing a key column's isNotNull would
    # misclassify a matched target row whose first key is NULL.
    t = target.withColumn(_TARGET_MARKER, F.lit(True)).alias("t")
    joined = t.join(b, on=[F.col(f"t.{k}").eqNullSafe(F.col(f"b.{k}")) for k in keys], how="full_outer")

    matched = F.col(f"b.{_MATCH_MARKER}").isNotNull()
    in_target = F.col(f"t.{_TARGET_MARKER}").isNotNull()

    out_cols = [
        F.coalesce(F.col(f"t.{k}"), F.col(f"b.{k}")).alias(k) for k in keys
    ]
    for c in non_keys:
        if c in update_cols:
            # ON CONFLICT DO UPDATE SET c = EXCLUDED.c -- batch wins even if null.
            expr = F.when(matched, F.col(f"b.{c}")).otherwise(F.col(f"t.{c}"))
        elif c in preserve_cols:
            expr = F.when(in_target, F.col(f"t.{c}")).otherwise(F.col(f"b.{c}"))
        else:
            expr = F.coalesce(F.col(f"t.{c}"), F.col(f"b.{c}"))
        out_cols.append(expr.alias(c))
    return joined.select(*out_cols)


def merge_upsert_partitioned(
    spark: SparkSession,
    target_path: str,
    batch: DataFrame,
    keys: list[str],
    partition_col: str,
    update_cols: list[str] | None = None,
    preserve_cols: list[str] | None = None,
    batch_order_by: list[str] | None = None,
) -> dict[str, int]:
    """Partition-pruned MERGE: rewrite ONLY the partitions the batch
    touches; every other partition's files are left byte-identical.

    This is the shape that survives 100 TB: an incremental batch touching
    k partitions costs O(k partitions + batch), not O(table). The
    partition column must be one of ``keys`` (e.g. symbol, or a date
    derived from the event time).

    Mechanics: collect the batch's distinct partition values (small -- one
    value per touched partition), read the target pruned to those values,
    merge, and rewrite just those partition directories via dynamic
    partition overwrite. Returns {"partitions_rewritten": k}.
    """
    if partition_col not in keys:
        raise ValueError("partition_col must be part of the merge keys")
    if batch_order_by:
        batch = dedup_keep_newest(batch, keys, batch_order_by)

    if not os.path.exists(target_path):
        batch.write.mode("overwrite").partitionBy(partition_col).parquet(target_path)
        return {"partitions_rewritten": batch.select(partition_col).distinct().count()}

    touched = [r[0] for r in batch.select(partition_col).distinct().collect()]
    # NULL partition values are legal merge keys (eqNullSafe join): isin()
    # follows SQL three-valued logic and never matches NULL, which would
    # exclude the target's NULL-partition rows from the merge and then
    # REPLACE that partition with batch-only rows (silent data loss).
    non_null = [v for v in touched if v is not None]
    pred = (
        F.col(partition_col).isin(non_null) if non_null else F.lit(False)
    )
    if len(non_null) != len(touched):
        pred = pred | F.col(partition_col).isNull()
    target_slice = spark.read.parquet(target_path).filter(pred)
    merged = merge_upsert(target_slice, batch, keys, update_cols, preserve_cols)

    # dynamic mode replaces only the partitions present in `merged`; the
    # per-WRITER option scopes it to this one write -- no session-conf
    # flip that a concurrent query (or the next test) could observe
    merged.write.mode("overwrite").option(
        "partitionOverwriteMode", "dynamic"
    ).partitionBy(partition_col).parquet(target_path)
    return {"partitions_rewritten": len(touched)}


def merge_upsert_path(
    spark: SparkSession,
    target_path: str,
    batch: DataFrame,
    keys: list[str],
    update_cols: list[str] | None = None,
    preserve_cols: list[str] | None = None,
    batch_order_by: list[str] | None = None,
    partition_by: tuple[str, ...] = (),
) -> None:
    """MERGE a batch into a parquet table directory with a crash-safe
    atomic publish (single commit per batch, scripts/fetch_stock_data.py:117
    analog).

    The merged table is written to a hidden version directory, then the
    ``target_path`` current-pointer symlink is flipped atomically
    (operators/atomic.py) -- readers see either the old or the new table
    at every instant, including across a crash at any step.

    Concurrent MERGE writers are safe: the read-merge-write runs as a
    ``publish_table_transaction`` (optimistic concurrency), so a writer
    whose base version was superseded mid-merge re-merges its batch onto
    the winner's table instead of silently dropping it -- the file-table
    analog of the reference's single Postgres transaction per batch.
    """
    if batch_order_by:
        batch = dedup_keep_newest(batch, keys, batch_order_by)

    def compute(base_dir: str | None, version_dir: str) -> None:
        if base_dir is None:
            merged = batch
        else:
            target = spark.read.parquet(base_dir)
            merged = merge_upsert(target, batch, keys, update_cols, preserve_cols)
        writer = merged.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(version_dir)

    publish_table_transaction(target_path, compute)


def apply_cdc(
    target: DataFrame,
    changes: DataFrame,
    keys: list[str],
    op_col: str = "op",
    order_by: list[str] | None = None,
) -> DataFrame:
    """Apply a CDC changefeed (op in 'I'/'U'/'D') to a keyed snapshot:
    MERGE WHEN MATCHED AND op='D' THEN DELETE / otherwise upsert.

    With ``order_by`` the feed is first collapsed to the newest change per
    key, so a key that was updated then deleted within the feed deletes --
    per-key terminal-state semantics, the standard way to apply a
    changefeed chunk in one shot (one window + the merge full-outer join;
    no per-event replay).
    """
    if order_by:
        changes = dedup_keep_newest(changes, keys, order_by)
    deletes = changes.filter(F.col(op_col) == "D").select(*keys)
    upserts = changes.filter(F.col(op_col) != "D").drop(op_col)
    merged = merge_upsert(target, upserts, keys)
    # eqNullSafe, matching the upsert join: NULL key values are legal, and
    # a plain equality anti-join would leave NULL-key rows undeletable
    m, d = merged.alias("m"), deletes.alias("d")
    cond = None
    for k in keys:
        c = F.col(f"m.{k}").eqNullSafe(F.col(f"d.{k}"))
        cond = c if cond is None else (cond & c)
    return m.join(d, on=cond, how="left_anti")
