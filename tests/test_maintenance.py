"""Maintenance operator tests: compaction preserves data and shrinks file
count; clustering produces disjoint per-file ranges (data skipping);
incremental rollup equals the from-scratch aggregate after multiple
batches."""

from __future__ import annotations

import datetime as dt
import os

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from dockerized_data_pipeline_spark.catalog import load_table
from dockerized_data_pipeline_spark.operators.maintenance import (
    cluster_table,
    compact_table,
    incremental_rollup,
)


def _parquet_files(path):
    return [
        os.path.join(r, f)
        for r, _d, fs in os.walk(path)
        for f in fs
        if f.endswith(".parquet")
    ]


def test_compact_many_small_files(spark, sf_dir, tmp_path):
    path = str(tmp_path / "frag")
    ev = load_table(spark, sf_dir, "events")
    ev.repartition(20).write.parquet(path)  # simulate micro-batch fragmentation
    assert len(_parquet_files(path)) >= 20
    before_rows = spark.read.parquet(path).count()
    stats = compact_table(spark, path)
    assert stats["files_after"] < stats["files_before"]
    assert stats["files_after"] == 1  # tiny table -> single target file
    assert spark.read.parquet(path).count() == before_rows


def test_cluster_table_gives_disjoint_file_ranges(spark, sf_dir, tmp_path):
    path = str(tmp_path / "clustered")
    load_table(spark, sf_dir, "orders").repartition(8).write.parquet(path)
    cluster_table(spark, path, ["o_orderkey"], num_files=4)
    ranges = []
    for f in _parquet_files(path):
        md = pq.read_metadata(f)
        col_idx = md.schema.names.index("o_orderkey")
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(col_idx).statistics
            mins.append(st.min)
            maxs.append(st.max)
        ranges.append((min(mins), max(maxs)))
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2  # disjoint: a point predicate prunes all but 1 file
    assert spark.read.parquet(path).count() == 1500  # all rows preserved


def test_incremental_rollup_matches_full_recompute(spark, tmp_path):
    rollup = str(tmp_path / "rollup")
    schema = "ts timestamp, event_type string, value double"
    b1 = spark.createDataFrame(
        [
            (dt.datetime(2024, 1, 1, 10, 5), "click", 1.0),
            (dt.datetime(2024, 1, 1, 10, 45), "click", 2.0),
            (dt.datetime(2024, 1, 1, 11, 5), "view", 7.0),
        ],
        schema,
    )
    b2 = spark.createDataFrame(
        [
            (dt.datetime(2024, 1, 1, 10, 59), "click", 4.0),  # same bucket as b1
            (dt.datetime(2024, 1, 1, 12, 0), "click", 9.0),  # new bucket
        ],
        schema,
    )
    incremental_rollup(spark, rollup, b1, ["event_type"], "ts")
    incremental_rollup(spark, rollup, b2, ["event_type"], "ts")

    full = (
        b1.unionByName(b2)
        .groupBy(F.window("ts", "1 hour").getField("start").alias("bucket_start"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(20,4)")).alias("sum_value"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
    )
    got = {tuple(r) for r in spark.read.parquet(rollup).collect()}
    want = {tuple(r) for r in full.collect()}
    assert got == want


def test_zorder_table_narrows_both_columns(spark, tmp_path):
    from dockerized_data_pipeline_spark.operators.maintenance import zorder_table

    # two independent uniform keys: 1-D clustering on x leaves y spanning
    # the full domain in every file; the Morton curve narrows both
    path = str(tmp_path / "zordered")
    df = spark.range(0, 20000).select(
        (F.xxhash64("id") % 10000).alias("x").cast("long"),
        (F.xxhash64("id", F.lit(1)) % 10000).alias("y").cast("long"),
        F.col("id").alias("payload"),
    )
    df.repartition(8).write.parquet(path)
    before_rows = spark.read.parquet(path).count()

    zorder_table(spark, path, ["x", "y"], bits=4, num_files=16)
    assert spark.read.parquet(path).count() == before_rows

    spans = []
    for f in _parquet_files(path):
        md = pq.read_metadata(f)
        mins_x, maxs_x, mins_y, maxs_y = [], [], [], []
        for rg in range(md.num_row_groups):
            row_group = md.row_group(rg)
            for ci in range(row_group.num_columns):
                col = row_group.column(ci)
                name = col.path_in_schema
                if name == "x":
                    mins_x.append(col.statistics.min)
                    maxs_x.append(col.statistics.max)
                elif name == "y":
                    mins_y.append(col.statistics.min)
                    maxs_y.append(col.statistics.max)
        spans.append(
            (max(maxs_x) - min(mins_x), max(maxs_y) - min(mins_y))
        )
    # global span of each key is ~20000 (values in [-10000, 10000)); with
    # 16 z-ordered files both per-file spans shrink well below it for the
    # typical file. Assert on the median so curve-boundary files (which
    # legitimately straddle quadrants) don't mask the win.
    spans_x = sorted(s[0] for s in spans)
    spans_y = sorted(s[1] for s in spans)
    assert spans_x[len(spans_x) // 2] < 12000
    assert spans_y[len(spans_y) // 2] < 12000
    # and the worst file still never spans the whole domain on BOTH keys
    assert all(sx < 20000 or sy < 20000 for sx, sy in spans)


def test_vacuum_removes_stale_versions_and_debris(spark, tmp_path):
    import os

    from dockerized_data_pipeline_spark.operators.atomic import publish_table
    from dockerized_data_pipeline_spark.operators.maintenance import vacuum_table

    target = str(tmp_path / "t")
    df = spark.createDataFrame([(1, "a")], "k long, v string")
    publish_table(target, lambda v: df.write.parquet(v))

    # simulate crash leftovers: a stale version dir, a flip temp, debris
    stale = str(tmp_path / ".t.v-deadbeef")
    os.makedirs(stale)
    open(os.path.join(stale, "_SUCCESS"), "a").close()
    os.symlink(".t.v-deadbeef", target + ".flip-junk")
    live = os.path.realpath(target)
    os.makedirs(os.path.join(live, "_temporary"))
    open(os.path.join(live, ".orphan.parquet.crc"), "a").close()

    report = vacuum_table(target, dry_run=True)
    assert stale in report["versions"] and os.path.isdir(stale)  # dry run

    report = vacuum_table(target)
    assert not os.path.isdir(stale)
    assert not os.path.exists(target + ".flip-junk")
    assert not os.path.exists(os.path.join(live, "_temporary"))
    assert not os.path.exists(os.path.join(live, ".orphan.parquet.crc"))
    # live table untouched and readable
    assert spark.read.parquet(target).count() == 1


# ---------------------------------------------------------------------------
# Streaming epoch-index compaction (round 4): consolidation must preserve
# the corpus EXACTLY (a dedup index with duplicated or lost signatures
# silently emits wrong pairs) and survive a crash at every phase.
# ---------------------------------------------------------------------------


def _seed_epoch_index(spark, index_path, n_epochs=6):
    import os

    rows_all = []
    for e in range(n_epochs):
        rows = [(e * 10 + i, f"tag{e}", e) for i in range(3)]
        rows_all += rows
        spark.createDataFrame(
            rows, "doc long, label string, src_epoch int"
        ).coalesce(1).write.parquet(
            os.path.join(index_path, f"epoch=run1-{e}")
        )
    return rows_all


def _index_rows(spark, index_path):
    return sorted(
        (r.doc, r.label, r.src_epoch)
        for r in spark.read.parquet(index_path)
        .select("doc", "label", "src_epoch")
        .collect()
    )


def test_compact_epoch_index_preserves_rows_exactly(spark, tmp_path):
    import os

    from dockerized_data_pipeline_spark.operators.maintenance import (
        compact_epoch_index,
    )

    index_path = str(tmp_path / "idx")
    expected = sorted(_seed_epoch_index(spark, index_path))
    stats = compact_epoch_index(spark, index_path)
    assert stats == {"epochs_before": 6, "epochs_after": 1}
    dirs = [d for d in os.listdir(index_path) if d.startswith("epoch=")]
    assert len(dirs) == 1 and dirs[0].startswith("epoch=compact")
    assert _index_rows(spark, index_path) == expected
    # idempotent re-run: nothing to do
    assert compact_epoch_index(spark, index_path)["epochs_after"] == 1


def test_compacted_index_remains_corpus_for_future_stream_runs(spark, tmp_path):
    """The consolidated dir is foreign-tagged: any stream run -- same
    checkpoint continuing, or a fresh one -- reads it as prior corpus."""
    import os

    from dockerized_data_pipeline_spark.operators.maintenance import (
        compact_epoch_index,
    )
    from dockerized_data_pipeline_spark.streaming.ingest import (
        _epoch_dirs_and_tag,
    )

    index_path = str(tmp_path / "idx")
    _seed_epoch_index(spark, index_path)
    compact_epoch_index(spark, index_path)
    for ck in ("ckA", "ckB"):
        prior, _ = _epoch_dirs_and_tag(index_path, str(tmp_path / ck), 0)
        assert len(prior) == 1 and "epoch=compact" in prior[0]


def test_compact_epoch_index_crash_at_every_phase_recovers(spark, tmp_path):
    """Kill the compaction before each rename phase; a re-run must land
    on the exact same final corpus with no duplicate and no lost row."""
    import os

    import pytest as _pytest

    from dockerized_data_pipeline_spark.operators.maintenance import (
        compact_epoch_index,
    )

    class Boom(RuntimeError):
        pass

    for phase in ("commit", "trash", "flip"):
        index_path = str(tmp_path / f"idx_{phase}")
        expected = sorted(_seed_epoch_index(spark, index_path))

        calls = {"n": 0}

        def fault(step, _phase=phase, _calls=calls):
            if step == _phase:
                _calls["n"] += 1
                # for 'trash': crash midway through the loop (3rd rename)
                if step != "trash" or _calls["n"] == 3:
                    raise Boom(step)

        with _pytest.raises(Boom):
            compact_epoch_index(spark, index_path, fault=fault)
        # crashed state may be mid-protocol; re-run recovers + completes
        stats = compact_epoch_index(spark, index_path)
        assert stats["epochs_after"] == 1, phase
        assert _index_rows(spark, index_path) == expected, phase
        leftovers = [
            e for e in os.listdir(index_path)
            if e.startswith((".trash-", "_compact"))
            and e != "_compacted_epochs"  # the log is permanent, not debris
        ]
        assert leftovers == [], (phase, leftovers)
        # the consolidated sources are on the log no matter where the
        # first attempt crashed (replay-protection for live streams)
        from dockerized_data_pipeline_spark.operators.maintenance import (
            compacted_epochs,
        )

        assert {f"epoch=run1-{e}" for e in range(6)} <= compacted_epochs(
            index_path
        ), phase


def test_compact_epoch_index_preserves_partitioning(spark, tmp_path):
    """The semantic index is partitioned by cluster_id so probes prune;
    compaction must preserve that layout."""
    import os

    from dockerized_data_pipeline_spark.operators.maintenance import (
        compact_epoch_index,
    )

    index_path = str(tmp_path / "idx")
    for e in range(3):
        spark.createDataFrame(
            [(e * 10 + i, i % 2, e) for i in range(4)],
            "vec_id long, cluster_id int, src_epoch int",
        ).coalesce(1).write.partitionBy("cluster_id").parquet(
            os.path.join(index_path, f"epoch=run1-{e}")
        )
    compact_epoch_index(spark, index_path, partition_by="cluster_id")
    target = next(
        d for d in os.listdir(index_path) if d.startswith("epoch=compact")
    )
    subdirs = sorted(
        d for d in os.listdir(os.path.join(index_path, target))
        if d.startswith("cluster_id=")
    )
    assert subdirs == ["cluster_id=0", "cluster_id=1"]
    assert spark.read.parquet(index_path).count() == 12
