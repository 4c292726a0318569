"""Gap-based sessionization (engine surface; guide 'Common OLAP patterns'):
assign session ids per key from inactivity gaps -- lag + cumulative sum of
session-break flags, a pure window composition (one shuffle on the key).

The streaming twin is ``session_window(ts, gap)`` in Structured Streaming;
this batch form is oracle-checkable."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    gap_seconds: int,
    order_tiebreak: list[str] | None = None,
) -> DataFrame:
    """Adds a ``session_id`` column: 1-based per key, incremented whenever
    the gap to the previous event exceeds gap_seconds."""
    order = [F.col(ts_col)] + [F.col(c) for c in (order_tiebreak or [])]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    # unix_micros needs TIMESTAMP; session tz is UTC so the NTZ cast is exact
    ts = F.col(ts_col).cast("timestamp")
    prev_ts = F.lag(ts).over(w)
    gap_us = F.unix_micros(ts) - F.unix_micros(prev_ts)
    new_session = F.when(
        prev_ts.isNull() | (gap_us > gap_seconds * 1_000_000), 1
    ).otherwise(0)
    return df.withColumn(
        "session_id",
        F.sum(new_session).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
