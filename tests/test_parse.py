"""Parse-pipeline tests (SURVEY section 2.2 P1-P5, section 2.1 S2): the
Alpha-Vantage-shaped payload fixtures from FIXTURES.md section 3, including
malformed and error-taxonomy variants."""

from __future__ import annotations

import decimal
import json

from pyspark.sql import Observation

from dockerized_data_pipeline_spark.sources.parse import classify_payloads, parse_timeseries


def make_payload(symbol="AAPL", points=None, last_refreshed="2024-01-05 16:00:00"):
    points = points if points is not None else {
        "2024-01-05 16:00:00": {
            "1. open": "181.2500",
            "2. high": "182.7600",
            "3. low": "180.1700",
            "4. close": "181.9100",
            "5. volume": "62303300",
        }
    }
    return json.dumps(
        {
            "Meta Data": {
                "1. Information": "Intraday (60min) open, high, low, close prices and volume",
                "2. Symbol": symbol,
                "3. Last Refreshed": last_refreshed,
                "5. Time Zone": "US/Eastern",
            },
            "Time Series (60min)": points,
        }
    )


def _df(spark, rows):
    return spark.createDataFrame(rows, "symbol string, payload string")


def test_parse_happy_path(spark):
    df = _df(spark, [("aapl ", make_payload())])
    out = parse_timeseries(df).collect()
    assert len(out) == 1
    row = out[0]
    assert row.symbol == "AAPL"  # trim+upper (fetch_stock_data.py:140)
    assert row.open_price == decimal.Decimal("181.2500")
    assert row.volume == 62303300
    assert row.time_zone == "US/Eastern"
    assert row.timestamp.isoformat() == "2024-01-05T16:00:00"
    assert row.last_refreshed.isoformat() == "2024-01-05T16:00:00"


def test_parse_multiple_points_explode(spark):
    points = {
        f"2024-01-05 {h:02d}:00:00": {
            "1. open": "1.0",
            "2. high": "2.0",
            "3. low": "0.5",
            "4. close": "1.5",
            "5. volume": "100",
        }
        for h in range(10, 16)
    }
    out = parse_timeseries(_df(spark, [("MSFT", make_payload("MSFT", points))])).collect()
    assert len(out) == 6


def test_error_and_rate_limit_payloads_classified(spark):
    rows = [
        ("BAD", json.dumps({"Error Message": "Invalid API call"})),
        ("RL", json.dumps({"Note": "API call frequency exceeded"})),
        ("OK", make_payload("OK")),
        ("EMPTY", json.dumps({"Meta Data": {}})),
    ]
    tagged = classify_payloads(_df(spark, rows))
    statuses = {r["symbol"]: r["__status"] for r in tagged.select("symbol", "__status").collect()}
    assert statuses == {
        "BAD": "error",
        "RL": "rate_limited",
        "OK": "ok",
        "EMPTY": "empty",
    }
    # error payloads contribute no parsed rows (fetch_stock_data.py:33-38)
    assert parse_timeseries(_df(spark, rows)).count() == 1


def test_malformed_values_become_null_and_counted(spark):
    points = {
        "2024-01-05 16:00:00": {
            "1. open": "not-a-number",
            "2. high": "182.76",
            "3. low": "180.17",
            "4. close": "181.91",
            "5. volume": "62303300",
        },
        "garbage-timestamp": {
            "1. open": "1.0",
            "2. high": "1.0",
            "3. low": "1.0",
            "4. close": "1.0",
            "5. volume": "1",
        },
    }
    obs = Observation("quality")
    out = parse_timeseries(_df(spark, [("X", make_payload("X", points))]), observation=obs)
    rows = out.collect()
    # bad-timestamp row dropped; bad-open row kept with null measure
    assert len(rows) == 1
    assert rows[0].open_price is None
    assert obs.get["rows_total"] == 2
    assert obs.get["bad_timestamp"] == 1
    assert obs.get["bad_open"] == 1  # only the 'not-a-number' row
