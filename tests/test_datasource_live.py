"""Live-branch coverage for the stock_api DataSource (VERDICT r2 item 6):
the no-payload_dir path (sources/datasource.py ``_get``) runs a REAL
requests.get from executor tasks -- against a loopback HTTP server, so the
only thing substituted is the hostname. Exercises per-symbol parallel
fetch, the T5 retry path (first attempt 503s, second succeeds), and T7
failure isolation (a permanently-500 symbol yields an error row while the
scan completes).
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import pytest

from dockerized_data_pipeline_spark.sources.datasource import register


class _ApiHandler(BaseHTTPRequestHandler):
    """FLAKY returns 503 once then succeeds (retry path); DEAD always 500s
    (failure-isolation path); anything else succeeds immediately."""

    lock = threading.Lock()
    attempts: dict[str, int] = {}

    def do_GET(self):  # noqa: N802 (stdlib naming)
        q = parse_qs(urlparse(self.path).query)
        sym = q.get("symbol", ["?"])[0]
        with self.lock:
            n = self.attempts[sym] = self.attempts.get(sym, 0) + 1
        if sym == "DEAD" or (sym == "FLAKY" and n == 1):
            self.send_response(503 if sym == "FLAKY" else 500)
            self.end_headers()
            return
        body = json.dumps(
            {"Meta Data": {"2. Symbol": sym}, "attempt": n}
        ).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, *args):  # quiet
        pass


@pytest.fixture()
def api_server():
    _ApiHandler.attempts = {}
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _ApiHandler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}/query"
    srv.shutdown()


def _read_live(spark, endpoint, symbols):
    register(spark)
    return (
        spark.read.format("stock_api")
        .option("symbols", symbols)
        .option("endpoint", endpoint)
        .option("retry_delay_sec", "0.01")
        .load()
        .collect()
    )


def test_live_fetch_parses_and_isolates_failures(spark, api_server):
    rows = {r.symbol: r for r in _read_live(spark, api_server, "GOOD,FLAKY,DEAD")}
    assert set(rows) == {"GOOD", "FLAKY", "DEAD"}

    good = rows["GOOD"]
    assert good.error is None
    assert json.loads(good.payload)["Meta Data"]["2. Symbol"] == "GOOD"

    # T5: FLAKY's first attempt 503'd; the retry succeeded transparently.
    flaky = rows["FLAKY"]
    assert flaky.error is None
    assert json.loads(flaky.payload)["attempt"] == 2

    # T7: DEAD exhausts retries into an error ROW; the scan never aborted.
    dead = rows["DEAD"]
    assert dead.payload is None
    assert "500" in dead.error
    assert _ApiHandler.attempts["DEAD"] == 4  # initial + 3 retries


def test_live_fetch_one_request_per_distinct_symbol(spark, api_server):
    rows = _read_live(spark, api_server, "AAA, aaa ,BBB")
    assert sorted(r.symbol for r in rows) == ["AAA", "BBB"]
    assert _ApiHandler.attempts == {"AAA": 1, "BBB": 1}
