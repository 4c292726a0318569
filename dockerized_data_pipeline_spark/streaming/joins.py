"""Streaming joins (SURVEY section 2.9 engine surface): stream-static
enrichment and watermarked stream-stream joins.

The reference enriches every fetched row with scalar metadata
(scripts/fetch_stock_data.py:60-66 attaches symbol/time-zone to each
OHLCV row) -- in a continuous pipeline that is a stream-static join
against a dimension snapshot. The stream-stream form (correlating two
live event feeds within a time bound) is the streaming twin of the batch
range join (operators/rangejoin.py), whose batch plan is oracle-checked
by ``range_join_click_in_purchase_window``.

Scale posture: the static side of a stream-static join is broadcast --
no per-batch shuffle of the stream. A stream-stream join keys state by
the equality columns and expires it via watermark + the time-bound
condition, so state size is bounded by (event rate x watermark horizon),
not by stream length.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def stream_static_enrich(
    stream_df: DataFrame,
    dim_df: DataFrame,
    on: list[str],
    how: str = "left",
) -> DataFrame:
    """Enrich a stream with a static dimension (broadcast hash join per
    micro-batch; the dimension is re-resolved each batch, so a replaced
    dim table is picked up without restarting the query)."""
    return stream_df.join(F.broadcast(dim_df), on=on, how=how)


def stream_stream_join(
    left_df: DataFrame,
    right_df: DataFrame,
    key_cols: list[str],
    left_ts: str,
    right_ts: str,
    max_delay: str = "1 hour",
    watermark: str = "10 minutes",
    how: str = "inner",
) -> DataFrame:
    """Watermarked stream-stream join: pair each left event with right
    events on the same key whose timestamp falls in
    ``[left_ts, left_ts + max_delay]``.

    Both sides carry a watermark and the join condition includes the
    time bound, which lets Spark drop buffered state once it can prove no
    future match exists (the unbounded-state trap of an equality-only
    stream-stream join). ``how`` may be inner / leftOuter / rightOuter /
    fullOuter; outer results emit only after the watermark passes the
    bound, per Structured Streaming semantics.
    """
    lw = left_df.withWatermark(left_ts, watermark)
    rw = right_df.withWatermark(right_ts, watermark)
    cond: Column = reduce(
        lambda a, b: a & b, [lw[k] == rw[k] for k in key_cols]
    )
    cond = (
        cond
        & (rw[right_ts] >= lw[left_ts])
        & (rw[right_ts] <= lw[left_ts] + F.expr(f"INTERVAL {max_delay}"))
    )
    return lw.join(rw, cond, how)
