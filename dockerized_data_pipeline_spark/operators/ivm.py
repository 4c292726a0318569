"""Incremental view maintenance for materialized equi-join views.

The reference recomputes its analytical queries from scratch on every
Airflow tick (the SQL in its README runs against the full table each
time); at 100 TB a materialized A JOIN B view cannot be rebuilt per
batch.  For APPEND-ONLY bases the standard delta-join identity

    V_new = V_old  UNION  (dA JOIN B_new)  UNION  (A_old JOIN dB)

makes each refresh cost O(|delta| x base-probe), never O(A x B): the
delta sides are one micro-batch, so both delta joins BROADCAST the delta
and stream the base table through map-side hash probes -- no base-table
shuffle at all.  (dA JOIN dB is folded in by probing B_new = B_old + dB
rather than B_old, counting each new-new pair exactly once.)

Scope: inserts only, matching the engine's append-shaped fact tables.
Updates/deletes require counting (multiset) IVM or a MERGE-then-refresh;
route those through ``operators/merge.py`` and rebuild, as with any
insert-only changefeed consumer.

Persistence mirrors ``streaming/ingest.py``'s signature index: each
refresh lands in its own ``epoch=N`` partition directory, written with
mode("overwrite") so a replayed batch rewrites the SAME epoch instead of
duplicating rows (effectively-once under crash replay).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def join_view_delta(
    a_old: DataFrame,
    a_delta: DataFrame,
    b_old: DataFrame,
    b_delta: DataFrame,
    on: list[str],
    how: str = "inner",
) -> DataFrame:
    """Rows the view gains when ``a_delta`` / ``b_delta`` append to the
    bases.  Only inner joins are maintainable this way: outer-join deltas
    can RETRACT previously-emitted null-padded rows, which an append-only
    view cannot express."""
    if how != "inner":
        raise ValueError("join_view_delta maintains inner-join views only")
    b_new = b_old.unionByName(b_delta)
    return F.broadcast(a_delta).join(b_new, on, "inner").unionByName(
        a_old.join(F.broadcast(b_delta), on, "inner")
    )


def append_join_view_epoch(delta: DataFrame, view_path: str, epoch: int) -> None:
    """Persist one refresh as ``view_path/epoch=N`` (idempotent per epoch:
    replay overwrites, never duplicates)."""
    delta.write.mode("overwrite").parquet(
        os.path.join(view_path, f"epoch={epoch}")
    )


def read_join_view(spark: SparkSession, view_path: str) -> DataFrame:
    """The maintained view: all COMPLETE epochs, partition column dropped.

    Mirrors ``streaming.ingest._epoch_dirs_and_tag``'s completeness rule:
    an epoch dir without Spark's ``_SUCCESS`` marker is a refresh that
    crashed mid-write (its replay will overwrite it) -- reading its
    partial parquet would poison or fail the view, so it is skipped."""
    complete = [
        os.path.join(view_path, e)
        for e in sorted(os.listdir(view_path))
        if e.startswith("epoch=")
        and os.path.exists(os.path.join(view_path, e, "_SUCCESS"))
    ]
    if not complete:
        raise FileNotFoundError(f"no complete epoch= dirs under {view_path}")
    return (
        spark.read.option("basePath", view_path).parquet(*complete).drop("epoch")
    )
