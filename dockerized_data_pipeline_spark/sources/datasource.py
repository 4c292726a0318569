"""Python DataSource V2 for the stock REST API (SURVEY section 2.1 S1 scale
path): ``spark.read.format("stock_api")`` with one input partition per
symbol, so fetch parallelism scales with the symbol universe instead of
looping in the driver (scripts/fetch_stock_data.py:139-163).

Modes:
  * ``payload_dir`` option: offline mode -- each partition reads
    ``{payload_dir}/{symbol}.json`` (fixtures; no network). This is the
    tested path in this container.
  * no ``payload_dir``: live mode -- each partition GETs the Alpha Vantage
    endpoint (requests, 30 s timeout per scripts/fetch_stock_data.py:27).
    The ``endpoint`` option overrides the URL (self-hosted API gateways;
    also how tests/test_datasource_live.py exercises this branch against a
    loopback HTTP server with no fakes in the request path).

The source emits raw (symbol, payload, error) rows; parsing stays in
sources.parse.parse_timeseries so the typed-row logic exists exactly once.
Per-symbol failure isolation (T7): a failed fetch yields an error row, the
scan never aborts.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType

from .retry import call_with_retry

RAW_SCHEMA_DDL = "symbol string, payload string, error string"

# Public API URL (scripts/fetch_stock_data.py:14); override via .option("endpoint", ...)
DEFAULT_ENDPOINT = "https://www.alphavantage.co/query"


@dataclass
class SymbolPartition(InputPartition):
    symbol: str


class StockApiDataSource(DataSource):
    """register with spark.dataSource.register(StockApiDataSource), then
    spark.read.format("stock_api").option("symbols", "AAPL,MSFT")...load()."""

    @classmethod
    def name(cls) -> str:
        return "stock_api"

    def schema(self) -> str:
        return RAW_SCHEMA_DDL

    def reader(self, schema: StructType) -> "StockApiReader":
        return StockApiReader(self.options)

    def streamReader(self, schema: StructType) -> "StockApiStreamReader":
        return StockApiStreamReader(self.options)


class StockApiReader(DataSourceReader):
    def __init__(self, options):
        raw = options.get("symbols", "")
        self.symbols = [s.strip().upper() for s in raw.split(",") if s.strip()]
        self.payload_dir = options.get("payload_dir")
        self.api_key = options.get("api_key", "demo")
        self.endpoint = options.get("endpoint", DEFAULT_ENDPOINT)
        # T5 retry policy (options arrive as strings from .option(...)).
        # Defaults mirror PipelineConfig: 3 retries, 5-min first delay
        # (dags/stock_data_pipeline.py:19-20), exponential backoff.
        self.max_retries = int(options.get("max_retries", "3"))
        self.retry_delay_sec = float(options.get("retry_delay_sec", "300"))

    def partitions(self):
        if not self.symbols:
            raise ValueError(
                "stock_api requires a non-empty 'symbols' option, e.g. "
                ".option('symbols', 'AAPL,MSFT')"
            )
        # dedupe, preserving order: one fetch per distinct symbol
        seen = dict.fromkeys(self.symbols)
        return [SymbolPartition(s) for s in seen]

    def read(self, partition: SymbolPartition):
        sym = partition.symbol
        try:
            if self.payload_dir:
                path = f"{self.payload_dir}/{sym}.json"
                with open(path, encoding="utf-8") as fh:
                    yield (sym, fh.read(), None)
            else:
                # T5: retry transient HTTP failures with exponential
                # backoff before emitting an error row. The offline
                # payload_dir path above is NOT retried: local file errors
                # are deterministic, so retrying only burns time.
                body = call_with_retry(
                    lambda: self._get(sym),
                    max_retries=self.max_retries,
                    delay_sec=self.retry_delay_sec,
                )
                yield (sym, body, None)
        except Exception as exc:
            yield (sym, None, str(exc))

    def _get(self, sym: str) -> str:
        import requests

        resp = requests.get(
            self.endpoint,
            params={
                "function": "TIME_SERIES_INTRADAY",
                "symbol": sym,
                "interval": "60min",
                "apikey": self.api_key,
                "outputsize": "compact",
            },
            timeout=30,
        )
        resp.raise_for_status()
        return resp.text


@dataclass
class PollPartition(InputPartition):
    poll: int
    symbol: str


class StockApiStreamReader(DataSourceStreamReader):
    """Streaming twin of StockApiReader: the reference fetches on a cron
    schedule (dags/stock_data_pipeline.py:24-31 @hourly); here each poll is
    a micro-batch offset, so ``readStream.format("stock_api")`` turns the
    same API into a Structured Streaming source with exactly-once offsets
    and one input partition per (poll, symbol).

    Offline mode (tested): ``payload_dir`` holds ``poll{N}/{SYMBOL}.json``
    drops; latestOffset = number of complete poll dirs, so newly-dropped
    polls become exactly one micro-batch each and a restart replays from
    the committed offset. Live mode: every latestOffset() call advances one
    poll (each trigger fetches once, the cron analog).
    """

    def __init__(self, options):
        raw = options.get("symbols", "")
        self.symbols = list(
            dict.fromkeys(s.strip().upper() for s in raw.split(",") if s.strip())
        )
        if not self.symbols:
            raise ValueError("stock_api stream requires a 'symbols' option")
        self.payload_dir = options.get("payload_dir")
        self.api_key = options.get("api_key", "demo")
        self.endpoint = options.get("endpoint", DEFAULT_ENDPOINT)
        self.max_retries = int(options.get("max_retries", "3"))
        self.retry_delay_sec = float(options.get("retry_delay_sec", "300"))
        self._live_polls = 0

    def initialOffset(self) -> dict:
        return {"poll": 0}

    def _available_polls(self) -> int:
        import os

        if self.payload_dir is None:
            return self._live_polls
        n = 0
        while os.path.isdir(os.path.join(self.payload_dir, f"poll{n}")):
            n += 1
        return n

    def latestOffset(self) -> dict:
        if self.payload_dir is None:
            self._live_polls += 1
        return {"poll": self._available_polls()}

    def partitions(self, start: dict, end: dict):
        return [
            PollPartition(p, s)
            for p in range(start["poll"], end["poll"])
            for s in self.symbols
        ]

    def read(self, partition: PollPartition):
        sym, poll = partition.symbol, partition.poll
        try:
            if self.payload_dir:
                path = f"{self.payload_dir}/poll{poll}/{sym}.json"
                with open(path, encoding="utf-8") as fh:
                    yield (sym, fh.read(), None)
            else:
                body = call_with_retry(
                    lambda: StockApiReader._get(self, sym),
                    max_retries=self.max_retries,
                    delay_sec=self.retry_delay_sec,
                )
                yield (sym, body, None)
        except Exception as exc:
            yield (sym, None, str(exc))

    def commit(self, end: dict) -> None:
        pass


def register(spark) -> None:
    spark.dataSource.register(StockApiDataSource)
