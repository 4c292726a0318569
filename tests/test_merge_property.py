"""Property tests for the MERGE family (VERDICT r6 item 7): randomized
batch sequences -- overlapping keys, NULL keys, duplicate in-batch keys
with equal order-column ties, empty update_cols -- asserted equivalent to
a brute-force dict-replay oracle, at the pure-transform, path, and
partitioned variants plus the CDC applier.

The oracle replays the reference's documented upsert semantics
(scripts/fetch_stock_data.py:90-102) one row at a time in Python:
batch deduped to the newest row per key (order column desc, remaining
columns as deterministic tie-break, nulls last), matched keys take batch
values for update_cols / keep target values for preserve_cols /
coalesce(target, batch) otherwise, unmatched rows insert.
"""

from __future__ import annotations

import shutil
import tempfile

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from dockerized_data_pipeline_spark.operators.merge import (
    apply_cdc,
    merge_upsert,
    merge_upsert_partitioned,
    merge_upsert_path,
)

KEYS = ["k"]
ORDER = ["last_refreshed"]
COLS = ["k", "v", "last_refreshed", "created_at"]
SCHEMA = "k int, v int, last_refreshed int, created_at int"

# tight domains force key collisions, NULL keys, and order-column ties
key_vals = st.sampled_from([None, 0, 1, 2])
opt_int = st.one_of(st.none(), st.integers(0, 9))
row_st = st.fixed_dictionaries(
    {
        "k": key_vals,
        "v": opt_int,
        "last_refreshed": st.integers(0, 3),
        "created_at": opt_int,
    }
)
target_st = st.lists(row_st, max_size=5, unique_by=lambda r: r["k"])
batches_st = st.lists(st.lists(row_st, max_size=6), min_size=1, max_size=3)
update_mode_st = st.sampled_from(["default", "subset", "empty"])

_SLOW = settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)


def _mode_cols(mode: str):
    """(update_cols, preserve_cols) for the three merge configurations."""
    if mode == "default":
        return None, ["created_at"]
    if mode == "subset":
        return ["v"], ["created_at"]
    return [], []  # empty update_cols: match changes nothing updatable


def _rank(row, cols=COLS, keys=KEYS, order=ORDER):
    """Python twin of dedup_keep_newest's total order: order_by columns
    then every remaining non-key column (schema order), each desc with
    nulls last -- None ranks below every value."""
    rest = [c for c in cols if c not in keys and c not in order]

    def kv(v):
        return (v is not None, v if v is not None else 0)

    return tuple(kv(row[c]) for c in [*order, *rest])


def _dedup(batch_rows, cols=COLS, keys=KEYS, order=ORDER):
    best = {}
    for r in batch_rows:
        key = tuple(r[k] for k in keys)
        if key not in best or _rank(r, cols, keys, order) > _rank(
            best[key], cols, keys, order
        ):
            best[key] = r
    return best


def oracle_merge(state, batch_rows, update_cols, preserve_cols):
    """Dict-replay oracle for one merge_upsert application."""
    preserve = preserve_cols or []
    if update_cols is None:
        eff = [c for c in COLS if c not in KEYS and c not in preserve]
    else:
        eff = update_cols
    for key, b in _dedup(batch_rows).items():
        if key in state:
            t = state[key]
            new = {}
            for c in COLS:
                if c in KEYS:
                    new[c] = t[c]
                elif c in eff:
                    new[c] = b[c]
                elif c in preserve:
                    new[c] = t[c]
                else:
                    new[c] = t[c] if t[c] is not None else b[c]
            state[key] = new
        else:
            state[key] = dict(b)
    return state


def _to_df(spark, rows, schema=SCHEMA, cols=COLS):
    return spark.createDataFrame(
        [tuple(r[c] for c in cols) for r in rows], schema
    )


def _collected(df, cols=COLS, keys=KEYS):
    rows = [{c: r[c] for c in cols} for r in df.collect()]
    state = {tuple(r[k] for k in keys): r for r in rows}
    assert len(state) == len(rows), f"duplicate keys in merge output: {rows}"
    return state


@_SLOW
@given(target=target_st, batches=batches_st, mode=update_mode_st)
def test_merge_upsert_matches_dict_replay(spark, target, batches, mode):
    update_cols, preserve_cols = _mode_cols(mode)
    expected = {(r["k"],): dict(r) for r in target}
    result = _to_df(spark, target)
    for batch in batches:
        result = merge_upsert(
            result,
            _to_df(spark, batch),
            KEYS,
            update_cols=update_cols,
            preserve_cols=preserve_cols,
            batch_order_by=ORDER,
        )
        expected = oracle_merge(expected, batch, update_cols, preserve_cols)
    assert _collected(result) == expected


@_SLOW
@given(target=target_st, batches=batches_st, mode=update_mode_st)
def test_merge_upsert_path_matches_dict_replay(spark, target, batches, mode):
    update_cols, preserve_cols = _mode_cols(mode)
    tmp = tempfile.mkdtemp(prefix="merge_prop_")
    try:
        path = f"{tmp}/table"
        expected = {}
        if target:
            merge_upsert_path(spark, path, _to_df(spark, target), KEYS)
            expected = {(r["k"],): dict(r) for r in target}
        for batch in batches:
            merge_upsert_path(
                spark,
                path,
                _to_df(spark, batch),
                KEYS,
                update_cols=update_cols,
                preserve_cols=preserve_cols,
                batch_order_by=ORDER,
            )
            expected = oracle_merge(
                expected, batch, update_cols, preserve_cols
            )
        got = _collected(spark.read.parquet(path).select(*COLS))
        assert got == expected
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@_SLOW
@given(target=target_st, batches=batches_st, mode=update_mode_st)
def test_merge_upsert_partitioned_matches_dict_replay(
    spark, target, batches, mode
):
    # the partitioned table needs one guaranteed non-null partition value
    # so parquet partition-type inference never sees an all-null layout
    target = [
        {"k": 0, "v": 1, "last_refreshed": 0, "created_at": 1},
        *[r for r in target if r["k"] != 0],
    ]
    update_cols, preserve_cols = _mode_cols(mode)
    tmp = tempfile.mkdtemp(prefix="merge_prop_part_")
    try:
        path = f"{tmp}/table"
        _to_df(spark, target).write.partitionBy("k").parquet(path)
        expected = {(r["k"],): dict(r) for r in target}
        for batch in batches:
            merge_upsert_partitioned(
                spark,
                path,
                _to_df(spark, batch),
                KEYS,
                partition_col="k",
                update_cols=update_cols,
                preserve_cols=preserve_cols,
                batch_order_by=ORDER,
            )
            expected = oracle_merge(
                expected, batch, update_cols, preserve_cols
            )
        got = _collected(spark.read.parquet(path).select(*COLS))
        assert got == expected
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


CDC_COLS = ["k", "v", "last_refreshed", "created_at", "op"]
CDC_SCHEMA = SCHEMA + ", op string"
cdc_row_st = st.fixed_dictionaries(
    {
        "k": key_vals,
        "v": opt_int,
        "last_refreshed": st.integers(0, 3),
        "created_at": opt_int,
        "op": st.sampled_from(["I", "U", "D"]),
    }
)
cdc_feeds_st = st.lists(
    st.lists(cdc_row_st, max_size=6), min_size=1, max_size=3
)


def oracle_cdc(state, feed_rows):
    """Terminal-state CDC replay: newest change per key wins (same total
    order as dedup_keep_newest, op participating as a tie-break column);
    D deletes, I/U upsert with every non-key column updated."""
    for key, ch in _dedup(feed_rows, cols=CDC_COLS).items():
        if ch["op"] == "D":
            state.pop(key, None)
        else:
            row = {c: ch[c] for c in COLS}
            if key in state:
                t = state[key]
                row["k"] = t["k"]
            state[key] = row
    return state


@_SLOW
@given(target=target_st, feeds=cdc_feeds_st)
def test_apply_cdc_matches_dict_replay(spark, target, feeds):
    expected = {(r["k"],): dict(r) for r in target}
    result = _to_df(spark, target)
    for feed in feeds:
        result = apply_cdc(
            result,
            _to_df(spark, feed, CDC_SCHEMA, CDC_COLS),
            KEYS,
            order_by=ORDER,
        )
        expected = oracle_cdc(expected, feed)
    assert _collected(result) == expected
