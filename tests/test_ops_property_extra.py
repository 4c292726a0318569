"""Property tests for sessionize and table_diff (r7 adversarial-depth
follow-on to the MERGE property suite): randomized inputs -- NULL keys,
NULL timestamps, duplicate timestamps at the tie-break, gap-boundary
events, NULL compare values -- asserted equivalent to brute-force Python
replays of the documented semantics."""

from __future__ import annotations

import datetime as dt
from collections import defaultdict

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from dockerized_data_pipeline_spark.operators.sessionize import sessionize
from dockerized_data_pipeline_spark.operators.tablediff import table_diff

_SLOW = settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)

_T0 = dt.datetime(2024, 1, 1)

# tight domains: few keys force per-key streams, a 0..12s timestamp range
# with gaps of 1/3/5 forces events exactly AT and just over the boundary,
# None timestamps exercise the NULLS FIRST prefix
sess_row = st.fixed_dictionaries(
    {
        "k": st.sampled_from(["a", "b", None]),
        "s": st.one_of(st.none(), st.integers(0, 12)),
    }
)
sess_events = st.lists(sess_row, min_size=1, max_size=14)


def oracle_sessionize(rows, gap_seconds):
    """Replay of sessionize's window: per key ordered by (ts NULLS FIRST,
    eid), session increments when the previous ts is absent/NULL or the
    microsecond gap exceeds the threshold."""
    by_key = defaultdict(list)
    for r in rows:
        by_key[r["k"]].append(r)
    out = {}
    for g in by_key.values():
        g.sort(key=lambda r: (r["ts"] is not None, r["ts"] or _T0, r["eid"]))
        sid, prev, started = 0, None, False
        for r in g:
            if not started or prev is None:
                sid += 1
            elif int((r["ts"] - prev) / dt.timedelta(microseconds=1)) > (
                gap_seconds * 1_000_000
            ):
                sid += 1
            out[r["eid"]] = sid
            prev, started = r["ts"], True
    return out


@_SLOW
@given(events=sess_events, gap=st.sampled_from([1, 3, 5]))
def test_sessionize_matches_replay(spark, events, gap):
    rows = [
        {
            "k": e["k"],
            "ts": None if e["s"] is None else _T0 + dt.timedelta(seconds=e["s"]),
            "eid": i,
        }
        for i, e in enumerate(events)
    ]
    df = spark.createDataFrame(
        [(r["k"], r["ts"], r["eid"]) for r in rows],
        "k string, ts timestamp_ntz, eid int",
    )
    got = {
        r["eid"]: r["session_id"]
        for r in sessionize(
            df, ["k"], "ts", gap, order_tiebreak=["eid"]
        ).collect()
    }
    assert got == oracle_sessionize(rows, gap)


diff_row = st.fixed_dictionaries(
    {
        "k": st.sampled_from([0, 1, 2, 3, None]),
        "v": st.one_of(st.none(), st.integers(0, 3)),
        "w": st.one_of(st.none(), st.sampled_from(["x", "y"])),
    }
)
diff_side = st.lists(diff_row, max_size=5, unique_by=lambda r: r["k"])


def oracle_diff(left, right):
    l = {r["k"]: (r["v"], r["w"]) for r in left}
    r = {x["k"]: (x["v"], x["w"]) for x in right}
    out = {}
    for k in set(l) | set(r):
        if k not in l:
            out[k] = "added"
        elif k not in r:
            out[k] = "removed"
        elif l[k] == r[k]:  # None == None, matching eqNullSafe on structs
            out[k] = "same"
        else:
            out[k] = "changed"
    return out


@_SLOW
@given(left=diff_side, right=diff_side)
def test_table_diff_matches_replay(spark, left, right):
    schema = "k int, v int, w string"

    def to_df(rows):
        return spark.createDataFrame(
            [(r["k"], r["v"], r["w"]) for r in rows], schema
        )

    got_rows = table_diff(to_df(left), to_df(right), ["k"]).collect()
    got = {r["k"]: r["change_type"] for r in got_rows}
    assert len(got) == len(got_rows), "duplicate keys in diff output"
    assert got == oracle_diff(left, right)
