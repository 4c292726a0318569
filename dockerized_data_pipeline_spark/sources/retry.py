"""Fetch retry with exponential backoff (SURVEY section 2.9 T5).

The reference retries failed fetch tasks 3 times with a 5-minute delay
(dags/stock_data_pipeline.py:19-20) and documents exponential backoff for
rate-limit recovery (README.md:379). Here the policy is a pure, injectable
helper shared by the driver-loop fetcher (sources/http.py) and the
DataSource V2 scale path (sources/datasource.py), so both paths behave
identically and the policy is unit-testable without a network or a clock.
"""

from __future__ import annotations

import time
from collections.abc import Callable
from typing import TypeVar

T = TypeVar("T")


def call_with_retry(
    fn: Callable[[], T],
    *,
    max_retries: int = 3,
    delay_sec: float = 300.0,
    backoff: float = 2.0,
    sleep: Callable[[float], None] = time.sleep,
) -> T:
    """Run ``fn`` up to ``1 + max_retries`` times.

    Sleeps ``delay_sec * backoff**i`` before retry ``i`` (exponential
    backoff, README.md:379); re-raises the last exception once retries are
    exhausted. ``max_retries=0`` means a single attempt, no sleeping.
    """
    attempt = 0
    while True:
        try:
            return fn()
        except Exception:
            if attempt >= max_retries:
                raise
            if delay_sec > 0:
                sleep(delay_sec * (backoff**attempt))
            attempt += 1
