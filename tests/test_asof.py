"""As-of join semantics: most-recent-prior payload, same-instant wins,
and deterministic resolution of duplicate right timestamps."""

from __future__ import annotations

import datetime as dt

from dockerized_data_pipeline_spark.operators.asof import asof_join


def t(s):
    return dt.datetime.fromisoformat(s)


def _asof(spark, left_rows, right_rows):
    left = spark.createDataFrame(left_rows, "id long, k string, ts timestamp")
    right = spark.createDataFrame(right_rows, "k string, r_ts timestamp, val long")
    return asof_join(
        left, right, key_cols=["k"], left_ts="ts", right_ts="r_ts", payload_cols=["val"]
    )


def test_asof_picks_most_recent_prior_and_same_instant(spark):
    out = {
        r.id: r.asof_val
        for r in _asof(
            spark,
            [
                (1, "A", t("2024-01-01 10:00:00")),  # after val=5
                (2, "A", t("2024-01-01 12:00:00")),  # exactly at val=7
                (3, "A", t("2024-01-01 09:00:00")),  # before everything
            ],
            [
                ("A", t("2024-01-01 09:30:00"), 5),
                ("A", t("2024-01-01 12:00:00"), 7),
            ],
        ).collect()
    }
    assert out == {1: 5, 2: 7, 3: None}


def test_range_join_bucketed_matches_inequality_join(spark):
    """Bucketed range join == naive inequality join, including intervals
    spanning multiple buckets and inclusive boundaries."""
    from dockerized_data_pipeline_spark.operators.rangejoin import range_join_bucketed

    points = spark.createDataFrame(
        [
            (1, "u1", t("2024-01-01 10:00:00")),  # == interval start (inclusive)
            (2, "u1", t("2024-01-01 12:30:00")),  # inside a 3h interval, 2 buckets away
            (3, "u1", t("2024-01-01 13:00:00")),  # == interval end (inclusive)
            (4, "u1", t("2024-01-01 13:00:01")),  # just past the end
            (5, "u2", t("2024-01-01 12:30:00")),  # right time, wrong key
        ],
        "pid long, k string, ts timestamp",
    )
    intervals = spark.createDataFrame(
        [(100, "u1", t("2024-01-01 10:00:00"), t("2024-01-01 13:00:00"))],
        "iid long, k string, start_ts timestamp, end_ts timestamp",
    )
    out = range_join_bucketed(
        points, intervals, "ts", "start_ts", "end_ts",
        bucket_width_sec=3600, extra_key="k",
    )
    got = sorted((r.pid, r.iid) for r in out.collect())
    assert got == [(1, 100), (2, 100), (3, 100)]

    # without extra_key: u2's point also matches
    p2 = points.drop("k")
    i2 = intervals.drop("k")
    got2 = sorted(
        (r.pid, r.iid)
        for r in range_join_bucketed(
            p2, i2, "ts", "start_ts", "end_ts", bucket_width_sec=3600
        ).collect()
    )
    assert got2 == [(1, 100), (2, 100), (3, 100), (5, 100)]


def test_asof_duplicate_right_timestamps_resolve_deterministically(spark):
    """Two right rows share (key, ts): the greatest payload tuple wins, on
    every run (the window's final tiebreak orders by payload)."""
    left_rows = [(1, "A", t("2024-01-01 10:00:00"))]
    right_rows = [
        ("A", t("2024-01-01 09:00:00"), 3),
        ("A", t("2024-01-01 09:00:00"), 11),  # duplicate ts, larger payload
        ("A", t("2024-01-01 09:00:00"), 7),
    ]
    first = _asof(spark, left_rows, right_rows).collect()[0].asof_val
    second = _asof(spark, left_rows, right_rows).collect()[0].asof_val
    assert first == second == 11


def _asof_fwd(spark, left_rows, right_rows, tolerance=None):
    left = spark.createDataFrame(left_rows, "id long, k string, ts timestamp")
    right = spark.createDataFrame(right_rows, "k string, r_ts timestamp, val long")
    return asof_join(
        left,
        right,
        key_cols=["k"],
        left_ts="ts",
        right_ts="r_ts",
        payload_cols=["val"],
        direction="forward",
        tolerance=tolerance,
    )


def test_asof_forward_picks_nearest_following(spark):
    out = {
        r.id: r.asof_val
        for r in _asof_fwd(
            spark,
            [
                (1, "A", t("2024-01-01 09:00:00")),  # before both -> val=5
                (2, "A", t("2024-01-01 09:30:00")),  # exactly at val=5
                (3, "A", t("2024-01-01 13:00:00")),  # after everything
            ],
            [
                ("A", t("2024-01-01 09:30:00"), 5),
                ("A", t("2024-01-01 12:00:00"), 7),
            ],
        ).collect()
    }
    assert out == {1: 5, 2: 5, 3: None}


def test_asof_tolerance_nulls_distant_matches(spark):
    # backward with 1h tolerance: a 2h-old right row no longer matches
    left = spark.createDataFrame(
        [(1, "A", t("2024-01-01 10:00:00")), (2, "A", t("2024-01-01 08:30:00"))],
        "id long, k string, ts timestamp",
    )
    right = spark.createDataFrame(
        [("A", t("2024-01-01 08:00:00"), 5)], "k string, r_ts timestamp, val long"
    )
    out = {
        r.id: r.asof_val
        for r in asof_join(
            left,
            right,
            key_cols=["k"],
            left_ts="ts",
            right_ts="r_ts",
            payload_cols=["val"],
            tolerance="1 hour",
        ).collect()
    }
    assert out == {1: None, 2: 5}

    # forward with tolerance
    out2 = {
        r.id: r.asof_val
        for r in _asof_fwd(
            spark,
            [(1, "A", t("2024-01-01 07:00:00")), (2, "A", t("2024-01-01 07:45:00"))],
            [("A", t("2024-01-01 08:00:00"), 5)],
            tolerance="30 minutes",
        ).collect()
    }
    assert out2 == {1: None, 2: 5}
