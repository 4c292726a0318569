"""Property test: asof_join agrees with pandas merge_asof (an independent
public reference implementation) for both directions and with tolerance,
over hypothesis-generated inputs.

Right timestamps are generated UNIQUE per key: on exact right-timestamp
ties the two implementations intentionally differ (merge_asof keeps input
order, the engine resolves by greatest payload tuple for cross-run
determinism -- see operators/asof.py), so ties are covered by the
deterministic unit test instead.
"""

from __future__ import annotations

import datetime as dt

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from dockerized_data_pipeline_spark.operators.asof import asof_join

BASE = dt.datetime(2024, 1, 1)


@st.composite
def asof_inputs(draw):
    right_offsets = draw(
        st.lists(st.integers(0, 500), unique=True, min_size=0, max_size=12)
    )
    right = [(off, draw(st.integers(-100, 100))) for off in sorted(right_offsets)]
    left = draw(st.lists(st.integers(0, 500), min_size=1, max_size=12))
    return left, right


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(asof_inputs(), st.sampled_from(["backward", "forward"]))
def test_asof_join_matches_pandas_merge_asof(spark, inputs, direction):
    left_offsets, right_rows = inputs
    tol_sec = 120

    left_pdf = pd.DataFrame(
        {
            "id": range(len(left_offsets)),
            "k": "A",
            "ts": [BASE + dt.timedelta(seconds=o) for o in left_offsets],
        }
    )
    right_pdf = pd.DataFrame(
        {
            "k": ["A"] * len(right_rows),
            "r_ts": [BASE + dt.timedelta(seconds=o) for o, _ in right_rows],
            "val": [v for _, v in right_rows],
        }
    )

    if not right_rows:
        expected_df = left_pdf.assign(val=pd.NA)
    else:
        expected_df = pd.merge_asof(
            left_pdf.sort_values("ts", kind="stable"),
            right_pdf,
            left_on="ts",
            right_on="r_ts",
            by="k",
            direction=direction,
            tolerance=pd.Timedelta(seconds=tol_sec),
        )
    expected = {
        int(r.id): (None if pd.isna(r.val) else int(r.val))
        for r in expected_df.itertuples()
    }

    left = spark.createDataFrame(left_pdf, "id long, k string, ts timestamp")
    right = (
        spark.createDataFrame(right_pdf, "k string, r_ts timestamp, val long")
        if len(right_pdf)
        else spark.createDataFrame([], "k string, r_ts timestamp, val long")
    )
    got = {
        r.id: r.asof_val
        for r in asof_join(
            left,
            right,
            key_cols=["k"],
            left_ts="ts",
            right_ts="r_ts",
            payload_cols=["val"],
            direction=direction,
            tolerance=f"{tol_sec} seconds",
        ).collect()
    }
    assert got == expected
