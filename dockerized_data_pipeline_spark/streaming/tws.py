"""Arbitrary stateful streaming via the Spark 4 ``transformWithStateInPandas``
StatefulProcessor API (the successor to ``applyInPandasWithState`` used in
``stateful.py`` -- typed per-state handles, timers, TTL).

Operator: per-key running-peak **drawdown alerting** -- the streaming analog
of the reference's stock monitoring (its alerting is a manual SQL poll,
README.md:202-226): keep each key's all-time high; whenever a new value sits
more than ``threshold_ppm`` below that peak, emit an alert row. State is a
single (peak_cents,) value per key, so at scale each micro-batch shuffles
only the keys it touches and state storage is O(keys), not O(events).

Values are integer cents and the threshold an integer ppm so alert
decisions are exact (no float accumulation across batches).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)
from pyspark.sql.types import LongType, StringType, StructField, StructType

ALERT_SCHEMA = StructType(
    [
        StructField("event_type", StringType()),
        StructField("ts_us", LongType()),
        StructField("value_cents", LongType()),
        StructField("peak_cents", LongType()),
        StructField("drawdown_ppm", LongType()),
    ]
)

_STATE_SCHEMA = StructType([StructField("peak_cents", LongType())])


class DrawdownProcessor(StatefulProcessor):
    """Emits one row per input event whose value is >= threshold_ppm below
    the key's running peak. The peak updates BEFORE the comparison, so a
    new all-time high never alerts."""

    def __init__(self, threshold_ppm: int = 200_000):
        self.threshold_ppm = threshold_ppm

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._peak = handle.getValueState("peak", _STATE_SCHEMA)

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        (event_type,) = key
        peak = self._peak.get()[0] if self._peak.exists() else 0
        out: list[tuple[str, int, int, int, int]] = []
        frames = [pdf for pdf in rows if len(pdf)]
        if frames:
            merged = pd.concat(frames).sort_values("ts_us", kind="stable")
            for ts_us, cents in zip(
                merged["ts_us"].astype("int64"), merged["value_cents"].astype("int64")
            ):
                ts_us, cents = int(ts_us), int(cents)
                peak = max(peak, cents)
                dd_ppm = (peak - cents) * 1_000_000 // peak if peak > 0 else 0
                if dd_ppm >= self.threshold_ppm:
                    out.append((event_type, ts_us, cents, peak, dd_ppm))
        self._peak.update((peak,))
        if out:
            yield pd.DataFrame(out, columns=[f.name for f in ALERT_SCHEMA.fields])

    def close(self) -> None:
        pass


def drawdown_alerts(
    stream_df: DataFrame, threshold_ppm: int = 200_000
) -> DataFrame:
    """Wire the processor: expects columns (event_type, ts_us, value_cents).
    One shuffle on the key per micro-batch; state lives in the state store
    (RocksDB on a real cluster), never on the driver."""
    return stream_df.groupBy("event_type").transformWithStateInPandas(
        statefulProcessor=DrawdownProcessor(threshold_ppm),
        outputStructType=ALERT_SCHEMA,
        outputMode="Append",
        timeMode="None",
    )
