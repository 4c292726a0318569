"""Incremental join-view maintenance (operators/ivm.py): the maintained
view must equal the full A-join-B recompute after every batch, at
O(delta)-join cost."""

from __future__ import annotations

import pytest

from dockerized_data_pipeline_spark.operators.ivm import (
    append_join_view_epoch,
    join_view_delta,
    read_join_view,
)

A_SCHEMA = "k int, a_val string"
B_SCHEMA = "k int, b_val string"


def _batches(spark):
    """Three append batches per side; keys overlap within and across
    batches so every delta-join term (dA x B_old, A_old x dB, dA x dB)
    is exercised."""
    a = [
        [(1, "a1"), (2, "a2")],
        [(2, "a3"), (3, "a4")],
        [(9, "a5")],  # no match ever
    ]
    b = [
        [(1, "b1")],
        [(1, "b2"), (3, "b3"), (3, "b4")],
        [(2, "b5")],
    ]
    return (
        [spark.createDataFrame(r, A_SCHEMA) for r in a],
        [spark.createDataFrame(r, B_SCHEMA) for r in b],
    )


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_maintained_view_equals_full_recompute(spark, tmp_path):
    a_batches, b_batches = _batches(spark)
    view = str(tmp_path / "view")
    a_old = a_batches[0].limit(0)
    b_old = b_batches[0].limit(0)
    for epoch, (da, db) in enumerate(zip(a_batches, b_batches)):
        delta = join_view_delta(a_old, da, b_old, db, on=["k"])
        append_join_view_epoch(delta, view, epoch)
        a_old = a_old.unionByName(da)
        b_old = b_old.unionByName(db)
        assert _rows(read_join_view(spark, view)) == _rows(
            a_old.join(b_old, "k", "inner")
        )


def test_epoch_replay_is_idempotent(spark, tmp_path):
    a_batches, b_batches = _batches(spark)
    view = str(tmp_path / "view")
    a_old, b_old = a_batches[0], b_batches[0]
    delta = join_view_delta(a_old, a_batches[1], b_old, b_batches[1], on=["k"])
    append_join_view_epoch(delta, view, 1)
    before = _rows(read_join_view(spark, view))
    append_join_view_epoch(delta, view, 1)  # crash-replay of the same batch
    assert _rows(read_join_view(spark, view)) == before


def test_delta_sides_are_broadcast(spark):
    """Scale contract: both delta joins hash-probe the base without
    shuffling it -- the deltas broadcast."""
    a_batches, b_batches = _batches(spark)
    delta = join_view_delta(
        a_batches[0], a_batches[1], b_batches[0], b_batches[1], on=["k"]
    )
    plan = delta._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plan


def test_partial_epoch_without_success_is_skipped(spark, tmp_path):
    """Crash-safety (ADVICE r3): an epoch dir whose refresh died mid-write
    (no _SUCCESS) must not poison the view read -- only complete epochs
    are corpus, mirroring the streaming index rule."""
    import os
    import shutil

    a_batches, b_batches = _batches(spark)
    view = str(tmp_path / "view")
    delta0 = join_view_delta(
        a_batches[0].limit(0), a_batches[0], b_batches[0].limit(0), b_batches[0],
        on=["k"],
    )
    append_join_view_epoch(delta0, view, 0)
    complete = _rows(read_join_view(spark, view))

    # simulate a refresh that crashed mid-write: epoch=1 exists with a
    # parquet fragment but no _SUCCESS marker
    crashed = os.path.join(view, "epoch=1")
    os.makedirs(crashed)
    src_part = next(
        f for f in os.listdir(os.path.join(view, "epoch=0"))
        if f.endswith(".parquet")
    )
    shutil.copy(
        os.path.join(view, "epoch=0", src_part),
        os.path.join(crashed, src_part),
    )
    assert _rows(read_join_view(spark, view)) == complete

    # no complete epoch at all -> loud failure, not an empty/partial view
    shutil.rmtree(os.path.join(view, "epoch=0"))
    with pytest.raises(FileNotFoundError):
        read_join_view(spark, view)


def test_outer_join_views_are_rejected(spark):
    a_batches, b_batches = _batches(spark)
    with pytest.raises(ValueError):
        join_view_delta(
            a_batches[0], a_batches[1], b_batches[0], b_batches[1],
            on=["k"], how="left",
        )
