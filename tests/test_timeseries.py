"""Unit tests for operators/timeseries.py on hand-built frames: grid
construction, LOCF carry semantics, exact interpolation arithmetic, OHLC
tie-breaking."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from dockerized_data_pipeline_spark.operators import timeseries as TS


def t(s: str) -> datetime.datetime:
    return datetime.datetime.fromisoformat(s)


def _obs(spark, rows):
    return spark.createDataFrame(rows, "key string, bucket timestamp, v bigint")


def test_time_grid_spans_min_to_max_per_key(spark):
    obs = _obs(
        spark,
        [
            ("a", t("2024-01-01 00:00:00"), 1),
            ("a", t("2024-01-01 05:00:00"), 2),
            ("b", t("2024-01-01 03:00:00"), 3),
        ],
    )
    grid = TS.time_grid(obs, ["key"], unit="hour").collect()
    a = sorted(r.bucket for r in grid if r.key == "a")
    b = [r.bucket for r in grid if r.key == "b"]
    assert len(a) == 6 and a[0] == t("2024-01-01 00:00:00") and a[-1] == t("2024-01-01 05:00:00")
    assert b == [t("2024-01-01 03:00:00")]  # single point -> single bucket


def test_gapfill_locf_carries_and_flags(spark):
    obs = _obs(
        spark,
        [
            ("a", t("2024-01-01 00:00:00"), 10),
            ("a", t("2024-01-01 03:00:00"), 40),
        ],
    )
    out = {
        r.bucket: (r.v, r.filled)
        for r in TS.gapfill_locf(obs, ["key"], ["v"], unit="hour").collect()
    }
    assert out[t("2024-01-01 00:00:00")] == (10, False)
    assert out[t("2024-01-01 01:00:00")] == (10, True)  # carried
    assert out[t("2024-01-01 02:00:00")] == (10, True)
    assert out[t("2024-01-01 03:00:00")] == (40, False)


def test_interpolate_linear_exact_thirds(spark):
    # 10 .. gap gap .. 40 over 3 hours: interp at +1h = 20, +2h = 30; and
    # a non-integral case 0..100 over 3h: +1h -> 33333 milli (trunc div)
    obs = _obs(
        spark,
        [
            ("a", t("2024-01-01 00:00:00"), 10),
            ("a", t("2024-01-01 03:00:00"), 40),
            ("b", t("2024-01-01 00:00:00"), 0),
            ("b", t("2024-01-01 03:00:00"), 100),
        ],
    )
    dense = TS.dense_join(obs, ["key"], unit="hour")
    rows = TS.interpolate_linear(dense, ["key"], "v", unit="hour", scale=1000).collect()
    got = {(r.key, r.bucket): r.interp for r in rows}
    assert got[("a", t("2024-01-01 01:00:00"))] == 20000
    assert got[("a", t("2024-01-01 02:00:00"))] == 30000
    assert got[("a", t("2024-01-01 00:00:00"))] == 10000  # observed passthrough
    assert got[("b", t("2024-01-01 01:00:00"))] == 33333  # 100000/3 truncated
    assert got[("b", t("2024-01-01 02:00:00"))] == 66666


def test_resample_last_deterministic_tiebreak(spark):
    df = spark.createDataFrame(
        [
            ("a", t("2024-01-01 00:10:00"), 1, 7),
            ("a", t("2024-01-01 00:10:00"), 2, 9),  # same ts: higher id wins
            ("a", t("2024-01-01 00:50:00"), 0, 5),  # later ts wins regardless of id
        ],
        "key string, ts timestamp, event_id bigint, v bigint",
    )
    out = TS.resample_last(df, ["key"], "ts", "v", unit="hour", tiebreak_cols=["event_id"])
    assert out.collect()[0].value == 5
    # drop the later-ts row: tie on ts resolves by event_id desc
    out2 = TS.resample_last(
        df.filter(F.col("v") != 5), ["key"], "ts", "v", unit="hour", tiebreak_cols=["event_id"]
    )
    assert out2.collect()[0].value == 9


def test_resample_ohlc_candle(spark):
    df = spark.createDataFrame(
        [
            ("a", t("2024-01-01 09:00:00"), 1, 100),
            ("a", t("2024-01-01 12:00:00"), 2, 250),
            ("a", t("2024-01-01 16:00:00"), 3, 50),
            ("a", t("2024-01-01 16:00:00"), 4, 75),  # tie: id 4 is the close
        ],
        "key string, ts timestamp, event_id bigint, v bigint",
    )
    r = TS.resample_ohlc(df, ["key"], "ts", "v", unit="day", tiebreak_cols=["event_id"]).collect()[0]
    assert (r.open, r.high, r.low, r.close, r.n_obs) == (100, 250, 50, 75, 4)
