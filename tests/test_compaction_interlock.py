"""Compaction <-> writer interlock (VERDICT r4 round-5 item 5).

``compact_epoch_index``'s docstring used to merely require the writing
stream stopped; nothing enforced it. Now every streaming fold holds the
index commit lock (``maintenance.index_write_guard``) for its whole
read-probe-write, compaction takes the same lock for its source listing
and rename window, the rename window aborts if the epoch set changed
during the unlocked bulk rewrite, and a ``_compacted_epochs`` log makes
a crash-replayed batch whose own epoch was consolidated fail loudly.
The contract under test: compaction racing a live ``neardup_stream``
micro-batch yields SERIALIZATION or a LOUD ERROR -- never a silently
dropped or duplicated signature."""

from __future__ import annotations

import os
import threading
import time

import pytest

from dockerized_data_pipeline_spark.operators.maintenance import (
    compact_epoch_index,
    index_write_guard,
)
from tests.test_streaming_soak import (
    DOC_SCHEMA,
    TEMPLATES,
    _crash_latest_commit,
    _run_stream_to_completion,
)


def _seed_epochs(spark, index_path, n_epochs=3):
    rows_all = []
    for e in range(n_epochs):
        rows = [(e * 10 + i, f"tag{e}", e) for i in range(3)]
        rows_all += rows
        spark.createDataFrame(
            rows, "doc long, label string, src_epoch int"
        ).coalesce(1).write.parquet(os.path.join(index_path, f"epoch=run1-{e}"))
    return sorted(rows_all)


def _index_rows(spark, index_path):
    return sorted(
        (r.doc, r.label, r.src_epoch)
        for r in spark.read.parquet(index_path)
        .select("doc", "label", "src_epoch")
        .collect()
    )


def test_compaction_waits_out_or_fails_on_live_fold_lock(spark, tmp_path):
    """A fold in flight (index_write_guard held) makes compaction fail
    loudly on lock timeout with nothing renamed; after the fold
    releases, the same call succeeds."""
    index_path = str(tmp_path / "idx")
    expected = _seed_epochs(spark, index_path)

    with index_write_guard(index_path):
        with pytest.raises(TimeoutError, match="mid-commit"):
            compact_epoch_index(spark, index_path, lock_wait=0.3)
    # nothing was renamed or trashed under the held lock
    assert _index_rows(spark, index_path) == expected
    assert sorted(
        e for e in os.listdir(index_path) if e.startswith("epoch=")
    ) == [f"epoch=run1-{e}" for e in range(3)]

    stats = compact_epoch_index(spark, index_path)
    assert stats == {"epochs_before": 3, "epochs_after": 1}
    assert _index_rows(spark, index_path) == expected


def test_compaction_aborts_when_epoch_lands_during_rewrite(spark, tmp_path):
    """A writer epoch landing during the UNLOCKED bulk rewrite (phase A)
    is caught by the under-lock re-list: compaction aborts cleanly --
    temp dropped, nothing renamed, no manifest -- and a re-run
    consolidates everything including the new epoch."""
    index_path = str(tmp_path / "idx")
    expected = _seed_epochs(spark, index_path)

    def racing_writer(phase):
        if phase == "rewrite":
            spark.createDataFrame(
                [(99, "late", 99)], "doc long, label string, src_epoch int"
            ).coalesce(1).write.parquet(
                os.path.join(index_path, "epoch=run1-3")
            )

    with pytest.raises(RuntimeError, match="changed during the rewrite"):
        compact_epoch_index(spark, index_path, fault=racing_writer)
    # clean abort: all four epochs intact, no debris
    entries = sorted(os.listdir(index_path))
    assert [e for e in entries if e.startswith("epoch=")] == [
        f"epoch=run1-{e}" for e in range(4)
    ]
    assert "_compact_manifest" not in entries
    assert "_compact_tmp" not in entries
    assert not any(e.startswith(".trash-") for e in entries)

    stats = compact_epoch_index(spark, index_path)
    assert stats == {"epochs_before": 4, "epochs_after": 1}
    assert _index_rows(spark, index_path) == sorted(
        expected + [(99, "late", 99)]
    )


def test_replay_of_compacted_epoch_fails_loudly(spark, tmp_path):
    """THE silent-duplication scenario the log exists for: batch N's
    epoch written, checkpoint commit lost (crash), stream stopped,
    compaction consolidates epoch N into a foreign tag, stream restarts
    and REPLAYS batch N -- its own signatures are now corpus. Must
    raise, not emit doubled pairs."""
    src = str(tmp_path / "src")
    index_path = str(tmp_path / "index")
    pairs_path = str(tmp_path / "pairs")
    ck = str(tmp_path / "ck")

    from dockerized_data_pipeline_spark.streaming.ingest import neardup_stream

    def run_stream():
        _run_stream_to_completion(
            lambda: neardup_stream(
                spark.readStream.schema(DOC_SCHEMA)
                .option("maxFilesPerTrigger", 1)
                .parquet(src),
                index_path,
                pairs_path,
                checkpoint_dir=ck,
            )
        )

    for i in range(3):
        rows = [
            (2 * i, TEMPLATES[i % 5] + f" tail alpha{i}"),
            (2 * i + 1, TEMPLATES[(i * 3 + 1) % 5] + f" tail beta{i}"),
        ]
        spark.createDataFrame(rows, DOC_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(src)
    run_stream()
    _crash_latest_commit(ck)  # batch 2's epoch stays, its commit is gone

    assert compact_epoch_index(spark, index_path)["epochs_after"] == 1

    from pyspark.errors.exceptions.captured import StreamingQueryException

    with pytest.raises(StreamingQueryException) as exc_info:
        run_stream()  # replays batch 2; its epoch was consolidated
    assert "consolidated by" in str(exc_info.value)


def test_live_stream_with_concurrent_compaction_never_corrupts(
    spark, tmp_path
):
    """The round-5 'Done' test: compact_epoch_index hammered from a
    background thread WHILE neardup_stream processes micro-batches. Every
    compaction attempt either serializes (success between folds) or
    errors loudly (lock timeout / epoch-set-changed abort) -- and the
    final pair set equals the batch recompute, proving no signature was
    silently dropped or duplicated under any interleaving."""
    from dockerized_data_pipeline_spark.operators.dedup import (
        minhash_neardup_pairs_native,
    )
    from dockerized_data_pipeline_spark.streaming.ingest import neardup_stream

    src = str(tmp_path / "src")
    index_path = str(tmp_path / "index")
    pairs_path = str(tmp_path / "pairs")
    ck = str(tmp_path / "ck")

    all_rows: list[tuple[int, str]] = []
    for i in range(8):
        rows = [
            (2 * i, TEMPLATES[i % 5] + f" tail alpha{i}"),
            (2 * i + 1, TEMPLATES[(i * 3 + 1) % 5] + f" tail beta{i}"),
        ]
        all_rows += rows
        spark.createDataFrame(rows, DOC_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    stop = threading.Event()
    outcomes: list[str] = []
    unexpected: list[BaseException] = []

    def compactor():
        while not stop.is_set():
            try:
                if os.path.isdir(index_path):
                    compact_epoch_index(spark, index_path, lock_wait=1.0)
                    outcomes.append("ok")
            except TimeoutError:
                outcomes.append("lock-timeout")
            except RuntimeError:
                outcomes.append("abort")
            except BaseException as exc:  # only the sanctioned loud errors
                unexpected.append(exc)
                return
            time.sleep(0.05)

    th = threading.Thread(target=compactor, daemon=True)
    th.start()
    try:
        _run_stream_to_completion(
            lambda: neardup_stream(
                spark.readStream.schema(DOC_SCHEMA)
                .option("maxFilesPerTrigger", 1)
                .parquet(src),
                index_path,
                pairs_path,
                checkpoint_dir=ck,
            )
        )
    finally:
        stop.set()
        th.join(timeout=60)
    assert outcomes, "compactor never got to run"
    assert not unexpected, f"unsanctioned compactor failure: {unexpected!r}"

    # correctness under every interleaving that occurred
    stream_pairs = {
        (r.doc_a, r.doc_b) for r in spark.read.parquet(pairs_path).collect()
    }
    full = minhash_neardup_pairs_native(
        spark.createDataFrame(all_rows, DOC_SCHEMA), "doc_id", "text"
    )
    full_pairs = {(r.doc_a, r.doc_b) for r in full.collect()}
    assert stream_pairs == full_pairs
    # index holds exactly one signature row per doc ever seen
    assert spark.read.parquet(index_path).select("doc").distinct().count() == len(
        all_rows
    )
    assert spark.read.parquet(index_path).count() == len(all_rows)
