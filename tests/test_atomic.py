"""Crash-safety tests for the versioned-table publish protocol
(operators/atomic.py): readers must find a complete table at target_path
no matter where a writer crashes."""

from __future__ import annotations

import datetime as dt
import os

import pytest

from dockerized_data_pipeline_spark.operators import atomic
from dockerized_data_pipeline_spark.operators.atomic import (
    publish_table,
    recover_table,
)
from dockerized_data_pipeline_spark.operators.merge import merge_upsert_path

SCHEMA = "symbol string, ts timestamp, close_price double"


def t(s):
    return dt.datetime.fromisoformat(s)


def _rows(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _read_prices(spark, path):
    return {r.symbol: r.close_price for r in spark.read.parquet(path).collect()}


def test_publish_creates_symlinked_version(spark, tmp_path):
    path = str(tmp_path / "tbl")
    df = _rows(spark, [("AAPL", t("2024-01-05 15:00:00"), 1.0)])
    publish_table(path, lambda v: df.write.parquet(v))
    assert os.path.islink(path)
    assert _read_prices(spark, path) == {"AAPL": 1.0}


def test_crash_before_flip_leaves_old_table_readable(spark, tmp_path, monkeypatch):
    path = str(tmp_path / "tbl")
    v1 = _rows(spark, [("AAPL", t("2024-01-05 15:00:00"), 1.0)])
    publish_table(path, lambda v: v1.write.parquet(v))

    # simulate a crash at the flip itself: os.replace raises
    def boom(src, dst):
        raise OSError("simulated crash during pointer flip")

    monkeypatch.setattr(atomic.os, "replace", boom)
    v2 = _rows(spark, [("AAPL", t("2024-01-05 15:00:00"), 2.0)])
    with pytest.raises(OSError, match="simulated crash"):
        publish_table(path, lambda v: v2.write.parquet(v))
    monkeypatch.undo()

    # readers still see the previous complete version
    assert _read_prices(spark, path) == {"AAPL": 1.0}
    # recover_table reports healthy (no repair needed)
    assert recover_table(path) is not None
    # a retried publish succeeds and GCs the orphaned version dir
    publish_table(path, lambda v: v2.write.parquet(v))
    assert _read_prices(spark, path) == {"AAPL": 2.0}
    leftover = [e for e in os.listdir(tmp_path) if e.startswith(".tbl.v-")]
    assert len(leftover) == 1  # only the current version remains


def test_recover_after_crash_in_legacy_upgrade(spark, tmp_path):
    """The one non-atomic window: upgrading a plain-directory table. A
    crash after the old dir is demoted but before the symlink exists must
    be repairable from the version dirs."""
    path = str(tmp_path / "tbl")
    old = _rows(spark, [("AAPL", t("2024-01-05 15:00:00"), 1.0)])
    old.write.parquet(path)  # legacy real directory, no symlink

    # hand-simulate the crash state: new version written, old dir demoted,
    # no symlink at target_path
    new = _rows(spark, [("AAPL", t("2024-01-05 15:00:00"), 2.0), ("MSFT", t("2024-01-05 15:00:00"), 9.0)])
    new_version = str(tmp_path / ".tbl.v-newaaaa")
    new.write.parquet(new_version)
    os.rename(path, str(tmp_path / ".tbl.v-prevbbb"))
    assert not os.path.exists(path)

    chosen = recover_table(path)
    assert chosen is not None and chosen.endswith(".tbl.v-newaaaa")
    assert _read_prices(spark, path) == {"AAPL": 2.0, "MSFT": 9.0}


def test_recover_ignores_incomplete_versions(spark, tmp_path):
    path = str(tmp_path / "tbl")
    good = _rows(spark, [("AAPL", t("2024-01-05 15:00:00"), 1.0)])
    good_version = str(tmp_path / ".tbl.v-good0000")
    good.write.parquet(good_version)
    # an incomplete (crashed mid-write) newer version: no _SUCCESS marker
    partial = str(tmp_path / ".tbl.v-partial0")
    os.makedirs(partial)
    with open(os.path.join(partial, "part-00000.parquet"), "wb") as fh:
        fh.write(b"garbage")

    chosen = recover_table(path)
    assert chosen is not None and chosen.endswith(".tbl.v-good0000")
    assert _read_prices(spark, path) == {"AAPL": 1.0}


def test_recover_with_nothing_recoverable(tmp_path):
    assert recover_table(str(tmp_path / "missing")) is None


def test_merge_upsert_path_crash_midway_then_retry(spark, tmp_path, monkeypatch):
    """End-to-end: a merge that dies at the flip leaves readers on the old
    table; re-running the same idempotent merge completes it."""
    path = str(tmp_path / "stock")
    b1 = _rows(spark, [("AAPL", t("2024-01-05 15:00:00"), 1.0)])
    merge_upsert_path(spark, path, b1, ["symbol", "ts"])

    calls = {"n": 0}
    real_replace = os.replace

    def flaky_replace(src, dst):
        calls["n"] += 1
        raise OSError("simulated crash")

    monkeypatch.setattr(atomic.os, "replace", flaky_replace)
    b2 = _rows(spark, [("MSFT", t("2024-01-05 15:00:00"), 9.0)])
    with pytest.raises(OSError):
        merge_upsert_path(spark, path, b2, ["symbol", "ts"])
    monkeypatch.setattr(atomic.os, "replace", real_replace)

    assert _read_prices(spark, path) == {"AAPL": 1.0}  # old table intact
    merge_upsert_path(spark, path, b2, ["symbol", "ts"])  # retry
    assert _read_prices(spark, path) == {"AAPL": 1.0, "MSFT": 9.0}


def test_write_audit_publish_rejects_bad_stage(spark, tmp_path):
    """A failing audit must leave the live table untouched and remove the
    staged version."""
    import glob
    import pytest

    from dockerized_data_pipeline_spark.operators.wap import (
        AuditError,
        expect_max_change,
        expect_min_rows,
        expect_unique_key,
        write_audit_publish,
    )

    target = str(tmp_path / "prices")
    v1 = spark.createDataFrame(
        [(i, float(i)) for i in range(100)], "k long, v double"
    )
    write_audit_publish(
        spark, v1, target, [expect_min_rows(50), expect_unique_key(["k"])]
    )
    assert spark.read.parquet(target).count() == 100

    current = spark.read.parquet(target)
    truncated = v1.filter("k < 5")  # upstream truncation: 95% keys removed
    with pytest.raises(AuditError, match="change volume"):
        write_audit_publish(
            spark,
            truncated,
            target,
            [expect_min_rows(1), expect_max_change(current, ["k"], 100_000)],
        )
    assert spark.read.parquet(target).count() == 100  # live table untouched
    # rejected stage removed: only the one live (hidden) version dir remains
    parent = str(tmp_path)
    versions = glob.glob(f"{parent}/.prices.v-*")
    assert len(versions) == 1

    # a sane incremental publish (3% changed) passes the same breaker
    v2 = spark.createDataFrame(
        [(i, float(i) + (1 if i < 3 else 0)) for i in range(100)],
        "k long, v double",
    )
    write_audit_publish(
        spark, v2, target, [expect_max_change(current, ["k"], 100_000)]
    )
    assert spark.read.parquet(target).filter("v != k").count() == 3


def test_write_audit_publish_null_audit(spark, tmp_path):
    import pytest

    from dockerized_data_pipeline_spark.operators.wap import (
        AuditError,
        expect_no_nulls,
        write_audit_publish,
    )

    target = str(tmp_path / "t")
    df = spark.createDataFrame([(1, "a"), (2, None)], "k long, v string")
    with pytest.raises(AuditError, match="NULL"):
        write_audit_publish(spark, df, target, [expect_no_nulls(["v"])])


def test_wap_stage_is_writer_owned_while_auditing(spark, tmp_path):
    """ADVICE r4: a WAP stage mid-audit must carry the ._ddp_staging
    writer-owned marker so a concurrent publisher's GC neither adopts it
    as published history (never-audited data entering time travel) nor
    collects it, even if the audit outlasts the grace window; and the
    marker must be cleared at the flip."""
    import os as _os

    from dockerized_data_pipeline_spark.operators import atomic as A
    from dockerized_data_pipeline_spark.operators.wap import (
        write_audit_publish,
    )

    target = str(tmp_path / "t")
    seen = {}

    def staging_probe(staged_df):
        # exactly one hidden version dir exists at this point: the stage
        parent, name = _os.path.split(target)
        import glob as _glob

        [stage] = _glob.glob(_os.path.join(parent, f".{name}.v-*"))
        seen["stage"] = stage
        seen["staging_marker"] = _os.path.exists(
            _os.path.join(stage, A._STAGING)
        )
        seen["success_marker"] = _os.path.exists(
            _os.path.join(stage, "_SUCCESS")
        )
        # a concurrent GC pass with zero grace must leave it alone; the
        # far-future floor simulates a publisher whose own new version is
        # newer than this stage (the ADVICE adoption scenario)
        plan = A._gc_plan(target, keep_versions=1, floor_key=(1, "9" * 40),
                          grace_seconds=0.0)
        seen["gc_would_delete"] = stage in plan
        seen["adopted"] = _os.path.exists(_os.path.join(stage, A._PUBLISHED))
        return None

    df = spark.createDataFrame([(1, "a")], "k long, v string")
    published = write_audit_publish(spark, df, target, [staging_probe])
    assert seen["staging_marker"], "mid-audit stage missing ._ddp_staging"
    assert seen["success_marker"]
    assert not seen["gc_would_delete"], "GC would collect an in-flight stage"
    assert not seen["adopted"]
    # flip cleared the writer-owned marker on the published version
    assert not _os.path.exists(_os.path.join(published, A._STAGING))
    assert _os.path.exists(_os.path.join(published, A._PUBLISHED))


def test_time_travel_reads_retained_versions(spark, tmp_path):
    from dockerized_data_pipeline_spark.operators.atomic import (
        list_versions,
        read_table_version,
    )

    path = str(tmp_path / "tt")
    for v in (1, 2, 3):
        df = _rows(spark, [("AAPL", t(f"2024-01-0{v} 00:00:00"), float(v))])
        publish_table(path, lambda d, df=df: df.write.parquet(d), keep_versions=3)

    assert len(list_versions(path)) == 3
    # n_back=0 == the live pointer
    assert read_table_version(spark, path, 0).collect()[0].close_price == 3.0
    assert spark.read.parquet(path).collect()[0].close_price == 3.0
    # history is intact and ordered
    assert read_table_version(spark, path, 1).collect()[0].close_price == 2.0
    assert read_table_version(spark, path, 2).collect()[0].close_price == 1.0
    with pytest.raises(IndexError):
        read_table_version(spark, path, 3)


def test_retention_rolls_old_versions_off(spark, tmp_path):
    from dockerized_data_pipeline_spark.operators.atomic import list_versions

    path = str(tmp_path / "roll")
    for v in range(4):
        df = _rows(spark, [("AAPL", t("2024-01-01 00:00:00"), float(v))])
        publish_table(path, lambda d, df=df: df.write.parquet(d), keep_versions=2)
    vs = list_versions(path)
    assert len(vs) == 2
    assert spark.read.parquet(vs[0]).collect()[0].close_price == 3.0
    assert spark.read.parquet(vs[1]).collect()[0].close_price == 2.0


def test_default_publish_keeps_single_version(spark, tmp_path):
    from dockerized_data_pipeline_spark.operators.atomic import list_versions

    path = str(tmp_path / "single")
    for v in (1, 2):
        df = _rows(spark, [("AAPL", t("2024-01-01 00:00:00"), float(v))])
        publish_table(path, lambda d, df=df: df.write.parquet(d))
    assert len(list_versions(path)) == 1


# ---------------------------------------------------------------------------
# Optimistic concurrency (VERDICT r3 item 3): CAS on the current version,
# commit-retry transactions, and the wired-through merge path.
# ---------------------------------------------------------------------------


def _write_listing(lines):
    """A writer that puts one line per row into data.txt (cheap stand-in
    for a parquet write -- the protocol is payload-agnostic)."""

    def write(version_dir):
        os.makedirs(version_dir, exist_ok=True)
        with open(os.path.join(version_dir, "data.txt"), "w") as f:
            f.write("\n".join(sorted(lines)))

    return write


def _read_listing(path):
    with open(os.path.join(path, "data.txt")) as f:
        return set(f.read().splitlines())


def test_cas_refuses_stale_base_and_discards_staging(tmp_path):
    """Writer A derives from v0; writer B publishes v1 first; A's commit
    must raise PublishConflict, leave B's version current, and remove
    A's staged dir -- nothing is silently last-write-won."""
    import glob as _glob

    from dockerized_data_pipeline_spark.operators.atomic import (
        PublishConflict,
        current_version,
        publish_table_cas,
    )

    target = str(tmp_path / "t")
    publish_table(target, _write_listing(["base"]))
    base = current_version(target)

    # B wins the race (derives from the same base and commits first)
    publish_table_cas(
        target, _write_listing(["base", "from_b"]), expected_base=base,
        keep_versions=4,
    )
    b_version = current_version(target)
    assert b_version != base

    with pytest.raises(PublishConflict):
        publish_table_cas(
            target, _write_listing(["base", "from_a"]), expected_base=base,
            keep_versions=4,
        )
    # B's publish survives; A's staged dir is gone (only b + base remain)
    assert current_version(target) == b_version
    assert _read_listing(target) == {"base", "from_b"}
    parent, name = os.path.split(target)
    staged = _glob.glob(os.path.join(parent, f".{name}.v-*"))
    assert all(_read_listing(d) != {"base", "from_a"} for d in staged)


def test_cas_none_base_means_create_only(tmp_path):
    from dockerized_data_pipeline_spark.operators.atomic import (
        PublishConflict,
        publish_table_cas,
    )

    target = str(tmp_path / "t")
    publish_table_cas(target, _write_listing(["x"]), expected_base=None)
    assert _read_listing(target) == {"x"}
    # a second create-only publish loses: the table now exists
    with pytest.raises(PublishConflict):
        publish_table_cas(target, _write_listing(["y"]), expected_base=None)
    assert _read_listing(target) == {"x"}


def test_transaction_retries_and_no_update_is_lost(tmp_path):
    """The canonical lost-update interleave: A reads base, B commits a
    full transaction while A is computing, A's CAS fails, A retries on
    the fresh base -- the final table contains BOTH writers' rows."""
    from dockerized_data_pipeline_spark.operators.atomic import (
        publish_table_transaction,
    )

    target = str(tmp_path / "t")
    publish_table(target, _write_listing(["base"]))

    calls = {"a": 0}

    def writer_b(base_dir, version_dir):
        rows = _read_listing(base_dir) if base_dir else set()
        _write_listing(rows | {"from_b"})(version_dir)

    def writer_a(base_dir, version_dir):
        calls["a"] += 1
        if calls["a"] == 1:
            # B's whole transaction lands while A is still computing
            publish_table_transaction(target, writer_b, keep_versions=4)
        rows = _read_listing(base_dir) if base_dir else set()
        _write_listing(rows | {"from_a"})(version_dir)

    publish_table_transaction(target, writer_a, keep_versions=4)
    assert calls["a"] == 2  # first attempt lost the race, second won
    assert _read_listing(target) == {"base", "from_a", "from_b"}


def test_transaction_gives_up_after_max_retries(tmp_path):
    from dockerized_data_pipeline_spark.operators.atomic import (
        PublishConflict,
        publish_table_transaction,
    )

    target = str(tmp_path / "t")
    publish_table(target, _write_listing(["base"]))

    def always_raced(base_dir, version_dir):
        # someone else commits on every attempt
        publish_table(target, _write_listing(["intruder"]), keep_versions=4)
        _write_listing(["mine"])(version_dir)

    with pytest.raises(PublishConflict, match="consecutive"):
        publish_table_transaction(target, always_raced, max_retries=2)


def test_stale_commit_lock_is_broken(tmp_path):
    """A lock left by a process that died inside the critical section
    must not wedge the table forever."""
    target = str(tmp_path / "t")
    lock = target + ".lock"
    open(lock, "w").write("99999 0\n")
    old = os.path.getmtime(lock) - 3600
    os.utime(lock, (old, old))
    publish_table(target, _write_listing(["x"]))  # breaks the stale lock
    assert _read_listing(target) == {"x"}
    assert not os.path.exists(lock)


def test_held_commit_lock_times_out(tmp_path):
    from dockerized_data_pipeline_spark.operators.atomic import _commit_lock

    target = str(tmp_path / "t")
    with _commit_lock(target):
        with pytest.raises(TimeoutError):
            with _commit_lock(target, wait=0.2):
                pass


def test_concurrent_merge_upsert_path_threads(spark, tmp_path):
    """Two real threads interleave merge_upsert_path batches with
    overlapping timing on the SAME table: every key from both writers
    must survive (the transaction re-merges losers onto winners)."""
    import threading

    target = str(tmp_path / "prices")
    merge_upsert_path(
        spark, target, _rows(spark, [("SEED", t("2024-01-01T00:00:00"), 1.0)]),
        keys=["symbol"],
    )

    errors = []

    def writer(tag):
        try:
            for i in range(3):
                batch = _rows(
                    spark, [(f"{tag}{i}", t("2024-01-02T00:00:00"), float(i))]
                )
                merge_upsert_path(spark, target, batch, keys=["symbol"])
        except Exception as exc:  # noqa: BLE001
            errors.append(exc)

    threads = [threading.Thread(target=writer, args=(tag,)) for tag in "AB"]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errors, errors
    got = set(_read_prices(spark, target))
    assert got == {"SEED", "A0", "A1", "A2", "B0", "B1", "B2"}


def test_wap_publish_conflicts_when_table_moves_during_audit(spark, tmp_path):
    """WAP audits judge the staged data against the version current at
    staging time; if the table moves before the flip, the verdict is
    stale and the publish must refuse."""
    from dockerized_data_pipeline_spark.operators.atomic import PublishConflict
    from dockerized_data_pipeline_spark.operators.wap import (
        expect_min_rows,
        write_audit_publish,
    )

    target = str(tmp_path / "t")
    write_audit_publish(
        spark, _rows(spark, [("S0", t("2024-01-01T00:00:00"), 1.0)]), target, []
    )

    moved = {"done": False}

    def audit_that_races(staged):
        if not moved["done"]:
            moved["done"] = True
            # a concurrent writer publishes mid-audit
            merge_upsert_path(
                spark, target,
                _rows(spark, [("S1", t("2024-01-02T00:00:00"), 2.0)]),
                keys=["symbol"],
            )
        return expect_min_rows(1)(staged)

    with pytest.raises(PublishConflict):
        write_audit_publish(
            spark, _rows(spark, [("S2", t("2024-01-03T00:00:00"), 3.0)]),
            target, [audit_that_races],
        )
    # the concurrent writer's publish is intact, the refused stage is gone
    assert set(_read_prices(spark, target)) == {"S0", "S1"}


def test_pre_marker_tables_stay_readable_and_retained(tmp_path):
    """Upgrade path (review r4): a table written before the published
    marker existed (complete version dirs, no ._ddp_published anywhere)
    must stay fully readable -- current at index 0, time-travel intact --
    and its retained history must be ADOPTED by the next publish's GC,
    not destroyed as staging debris."""
    import glob as _glob

    from dockerized_data_pipeline_spark.operators.atomic import (
        _PUBLISHED,
        list_versions,
    )

    target = str(tmp_path / "t")
    # simulate the pre-marker layout: three complete versions + symlink,
    # no markers, stamps old enough to be outside the GC grace window
    parent, name = os.path.split(target)
    old_dirs = []
    base_ns = (int(__import__("time").time()) - 3600) * 1_000_000_000
    for i, rows in enumerate((["v0"], ["v0", "v1"], ["v0", "v1", "v2"])):
        d = os.path.join(parent, f".{name}.v-{base_ns + i:020d}-legacy{i}")
        os.makedirs(d)
        with open(os.path.join(d, "data.txt"), "w") as f:
            f.write("\n".join(rows))
        open(os.path.join(d, "_SUCCESS"), "a").close()
        old_dirs.append(d)
    os.symlink(os.path.basename(old_dirs[-1]), target)

    # readable NOW, before any new publish: current is index 0
    vs = list_versions(target)
    assert vs and vs[0] == os.path.abspath(old_dirs[-1])

    # first post-upgrade publish with retention: old history adopted
    publish_table(target, _write_listing(["v0", "v1", "v2", "v3"]),
                  keep_versions=4)
    survivors = sorted(_glob.glob(os.path.join(parent, f".{name}.v-*")))
    assert set(map(os.path.abspath, old_dirs)) <= set(
        map(os.path.abspath, survivors)
    ), "pre-upgrade history was destroyed by GC"
    for d in old_dirs:
        assert os.path.exists(os.path.join(d, _PUBLISHED))  # adopted
    # and the keep rule now applies to the adopted history
    assert len(list_versions(target)) == 4


def test_transaction_chains_compute_failure_into_conflict(tmp_path):
    """A compute bug that coincides with contention must surface the
    ORIGINAL exception chained into the PublishConflict, not be masked
    as pure contention."""
    from dockerized_data_pipeline_spark.operators.atomic import (
        PublishConflict,
        publish_table_transaction,
    )

    target = str(tmp_path / "t")
    publish_table(target, _write_listing(["base"]))

    class ComputeBug(RuntimeError):
        pass

    def broken_compute(base_dir, version_dir):
        # someone else publishes every attempt, then the compute "fails"
        publish_table(target, _write_listing(["intruder"]), keep_versions=4)
        raise ComputeBug("schema mismatch")

    with pytest.raises(PublishConflict) as exc_info:
        publish_table_transaction(target, broken_compute, max_retries=1)
    chain = []
    e = exc_info.value
    while e is not None:
        chain.append(e)
        e = e.__cause__
    assert any(isinstance(c, ComputeBug) for c in chain), (
        "original compute failure lost from the exception chain"
    )


def test_stale_lock_break_is_atomic_rename(tmp_path):
    """Breaking a stale lock renames it to a tombstone (exactly one
    breaker can win) rather than unlinking blind; the tombstone is swept
    by the next successful commit."""
    import glob as _glob

    target = str(tmp_path / "t")
    lock = target + ".lock"
    open(lock, "w").write("99999 deadbeef 0\n")
    old = os.path.getmtime(lock) - 3600
    os.utime(lock, (old, old))
    publish_table(target, _write_listing(["x"]))
    assert _read_listing(target) == {"x"}
    assert not os.path.exists(lock)
    assert not _glob.glob(lock + ".broken-*")  # tombstone swept


def test_gc_never_adopts_a_writer_owned_stage(tmp_path):
    """Review r4.2: a staged dir whose audit/CAS is still pending (staging
    marker present) must be neither adopted as published history nor
    collected, even past the grace window -- adoption would serve
    never-audited data as time travel. A stage abandoned past the stale
    horizon is debris."""
    import glob as _glob
    import os as _os
    import time as _time

    from dockerized_data_pipeline_spark.operators import atomic as A

    target = str(tmp_path / "t")
    publish_table(target, _write_listing(["base"]))

    # a writer-owned stage stamped well past the grace window
    parent, name = _os.path.split(target)
    old_ns = (int(_time.time()) - 3600) * 1_000_000_000
    stage = _os.path.join(parent, f".{name}.v-{old_ns:020d}-wapstage")
    _write_listing(["staged"])(stage)
    A._finish_stage(stage)

    publish_table(target, _write_listing(["base", "more"]), keep_versions=2)
    assert _os.path.isdir(stage), "in-flight stage was collected"
    assert not _os.path.exists(_os.path.join(stage, A._PUBLISHED)), (
        "in-flight stage was adopted as published history"
    )
    assert _os.path.abspath(stage) not in A.list_versions(target)
    # recover_table must not promote it either
    _os.unlink(target)
    assert A.recover_table(target) != _os.path.abspath(stage)

    # abandoned past the stale-staging horizon -> debris
    ancient_ns = (int(_time.time()) - 200_000) * 1_000_000_000
    dead = _os.path.join(parent, f".{name}.v-{ancient_ns:020d}-deadstage")
    _write_listing(["dead"])(dead)
    A._finish_stage(dead)
    publish_table(target, _write_listing(["base", "more", "x"]))
    assert not _os.path.exists(dead), "abandoned stage never collected"


def test_commit_clears_staging_marker_on_publish(tmp_path):
    import os as _os

    from dockerized_data_pipeline_spark.operators import atomic as A

    target = str(tmp_path / "t")
    v = publish_table(target, _write_listing(["x"]))
    assert not _os.path.exists(_os.path.join(v, A._STAGING))
    assert _os.path.exists(_os.path.join(v, A._PUBLISHED))
