"""Retention / cleanup (SURVEY section 2.2 P8): delete rows older than a
cutoff -- the reference's documented 1-year-data / 30-day-logs policy
(README.md:296-297).

On a date-partitioned layout this is partition-level: whole partitions
before the cutoff are dropped without reading them (O(partitions), not
O(rows)), and only the single boundary partition is rewritten. That is the
posture that matters at 100 TB -- a retention pass must not scan the table.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .atomic import publish_table


def retention_filter(df: DataFrame, ts_col: str, cutoff) -> DataFrame:
    """Surviving rows (>= cutoff); with a partitioned scan the predicate
    prunes at the source."""
    return df.filter(F.col(ts_col) >= F.lit(cutoff).cast("timestamp"))


def apply_retention_partitioned(
    spark: SparkSession,
    table_path: str,
    date_partition_col: str,
    cutoff_date: str,
    ts_col: str | None = None,
) -> dict[str, int]:
    """Retention on a `date_partition_col=YYYY-MM-DD`-partitioned table:
    drop whole expired partitions; rewrite only the boundary partition when
    a finer ts_col is given. Returns counts of dropped/rewritten partitions.
    """
    dropped = rewritten = 0
    prefix = f"{date_partition_col}="
    for entry in sorted(os.listdir(table_path)):
        if not entry.startswith(prefix):
            continue
        part_date = entry[len(prefix):]
        part_dir = os.path.join(table_path, entry)
        if part_date < cutoff_date:
            if os.path.islink(part_dir):  # boundary partition from a prior pass
                real = os.path.realpath(part_dir)
                os.unlink(part_dir)
                shutil.rmtree(real, ignore_errors=True)
            else:
                shutil.rmtree(part_dir)
            dropped += 1
        elif part_date == cutoff_date and ts_col is not None:
            survivors = retention_filter(
                spark.read.parquet(part_dir), ts_col, cutoff_date
            )
            # crash-safe rewrite of the single boundary partition: hidden
            # version dir + atomic pointer flip (operators/atomic.py);
            # hidden dirs are invisible to Spark partition discovery.
            publish_table(
                part_dir, lambda v: survivors.write.mode("overwrite").parquet(v)
            )
            rewritten += 1
    return {"dropped_partitions": dropped, "rewritten_partitions": rewritten}
