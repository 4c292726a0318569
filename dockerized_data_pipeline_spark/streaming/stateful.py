"""Custom stateful streaming operator (north-star streaming surface):
per-key running aggregates via ``applyInPandasWithState``.

The reference has no stateful ops; this is the engine-surface pattern for
ones Spark lacks as built-ins (e.g. exactly-once per-key counters that
survive across micro-batches). State is a per-key (count, sum, max_ts)
triple -- the streaming twin of the A1/A4 monitoring aggregates, usable
with update output mode and GroupStateTimeout for eviction.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("event_type", StringType()),
        StructField("running_count", LongType()),
        StructField("running_sum", DoubleType()),
        StructField("latest_ts", TimestampType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("count", LongType()),
        StructField("sum", DoubleType()),
        StructField("latest_us", LongType()),
    ]
)


def _update_running(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
    (event_type,) = key
    count, total, latest_us = state.get if state.exists else (0, 0.0, 0)
    for pdf in pdfs:
        count += len(pdf)
        total += float(pdf["value"].sum())
        if len(pdf):
            batch_max = pd.to_datetime(pdf["ts"]).max().value // 1000
            latest_us = max(latest_us, int(batch_max))
    state.update((count, total, latest_us))
    yield pd.DataFrame(
        {
            "event_type": [event_type],
            "running_count": [count],
            "running_sum": [total],
            "latest_ts": [pd.Timestamp(latest_us, unit="us")],
        }
    )


def running_key_stats(stream_df: DataFrame) -> DataFrame:
    """Per-event_type running count/sum/latest across micro-batches.
    State shuffles once on the key; each batch touches only keys present in
    the batch -- the scalable shape for billions of keys."""
    return stream_df.groupBy("event_type").applyInPandasWithState(
        _update_running,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
