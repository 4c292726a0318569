"""Env-driven engine configuration (SURVEY section 2.1 S8).

Mirrors the reference's configuration surface: symbols from the
STOCK_SYMBOLS CSV env var (dags/stock_data_pipeline.py:62-63,
scripts/fetch_stock_data.py:130-132) and the API key from env
(README.md:140-147), plus engine-side knobs.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

DEFAULT_SYMBOLS = ("AAPL", "GOOGL", "MSFT", "AMZN", "TSLA")  # README.md:76


def symbols_from_env(env: dict[str, str] | None = None) -> list[str]:
    """Parse STOCK_SYMBOLS CSV: split, trim, upper, drop empties
    (scripts/fetch_stock_data.py:140-142 normalization)."""
    env = env if env is not None else os.environ
    raw = env.get("STOCK_SYMBOLS", "")
    syms = [s.strip().upper() for s in raw.split(",")]
    syms = [s for s in syms if s]
    return syms or list(DEFAULT_SYMBOLS)


@dataclass
class PipelineConfig:
    symbols: list[str] = field(default_factory=symbols_from_env)
    api_key: str = field(default_factory=lambda: os.environ.get("ALPHA_VANTAGE_API_KEY", "demo"))
    # Operational envelope from the reference (BASELINE.md): 12 s
    # inter-request delay (README.md:378), 30 s timeout
    # (scripts/fetch_stock_data.py:27), 3 retries (dags:19-20).
    request_delay_sec: float = 12.0
    request_timeout_sec: float = 30.0
    max_retries: int = 3
    # Delay before the first retry; doubles each attempt (exponential
    # backoff, README.md:379; the reference's Airflow retry_delay is 5 min,
    # dags/stock_data_pipeline.py:20).
    retry_delay_sec: float = 300.0

    def validate(self) -> list[str]:
        """make validate-env analog (Makefile:141-151): non-empty,
        non-placeholder key."""
        problems = []
        if not self.api_key or self.api_key in ("demo", "your_api_key_here"):
            problems.append("ALPHA_VANTAGE_API_KEY not configured (placeholder)")
        if not self.symbols:
            problems.append("no symbols configured")
        return problems
