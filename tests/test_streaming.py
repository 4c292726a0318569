"""Streaming ingest tests (SURVEY section 2.9): AvailableNow drain,
foreachBatch idempotent MERGE (exactly-once), empty-batch guard, watermarked
windowed aggregation."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import types as T

from dockerized_data_pipeline_spark.streaming.ingest import (
    ingest_stream,
    stream_events,
    windowed_event_counts,
)

SCHEMA = T.StructType(
    [
        T.StructField("symbol", T.StringType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("close_price", T.DoubleType()),
        T.StructField("last_refreshed", T.TimestampType()),
    ]
)


def t(s):
    return dt.datetime.fromisoformat(s)


def _write_batch(spark, path, rows):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("append").parquet(path)


def test_stream_ingest_merges_batches_exactly_once(spark, tmp_path):
    src = str(tmp_path / "src")
    target = str(tmp_path / "target")
    ckpt = str(tmp_path / "ckpt")

    _write_batch(
        spark,
        src,
        [
            ("AAPL", t("2024-01-05 15:00:00"), 100.0, t("2024-01-05 15:00:00")),
            ("AAPL", t("2024-01-05 16:00:00"), 101.0, t("2024-01-05 16:00:00")),
        ],
    )
    stream = stream_events(spark, src, SCHEMA)
    q = ingest_stream(
        stream,
        target,
        keys=["symbol", "ts"],
        order_by=["last_refreshed"],
        checkpoint_dir=ckpt,
    )
    q.awaitTermination(120)
    assert spark.read.parquet(target).count() == 2

    # overlapping re-fetch: one update (newer last_refreshed) + one new key
    _write_batch(
        spark,
        src,
        [
            ("AAPL", t("2024-01-05 16:00:00"), 999.0, t("2024-01-05 17:00:00")),
            ("AAPL", t("2024-01-05 17:00:00"), 102.0, t("2024-01-05 17:00:00")),
        ],
    )
    q2 = ingest_stream(
        stream_events(spark, src, SCHEMA),
        target,
        keys=["symbol", "ts"],
        order_by=["last_refreshed"],
        checkpoint_dir=ckpt,
    )
    q2.awaitTermination(120)
    out = {r.ts: r.close_price for r in spark.read.parquet(target).collect()}
    assert len(out) == 3
    assert out[t("2024-01-05 16:00:00")] == 999.0  # updated, not duplicated
    assert out[t("2024-01-05 15:00:00")] == 100.0  # untouched


def test_stream_ingest_with_partitioned_merge(spark, tmp_path):
    src = str(tmp_path / "src")
    target = str(tmp_path / "target")
    _write_batch(
        spark,
        src,
        [
            ("AAPL", t("2024-01-05 15:00:00"), 100.0, t("2024-01-05 15:00:00")),
            ("MSFT", t("2024-01-05 15:00:00"), 200.0, t("2024-01-05 15:00:00")),
        ],
    )
    q = ingest_stream(
        stream_events(spark, src, SCHEMA),
        target,
        keys=["symbol", "ts"],
        order_by=["last_refreshed"],
        checkpoint_dir=str(tmp_path / "ckpt"),
        partition_col="symbol",
    )
    q.awaitTermination(120)
    import os

    assert sorted(
        d for d in os.listdir(target) if d.startswith("symbol=")
    ) == ["symbol=AAPL", "symbol=MSFT"]
    assert spark.read.parquet(target).count() == 2


def test_stream_dedup_drops_redeliveries(spark, tmp_path):
    from dockerized_data_pipeline_spark.streaming.ingest import stream_dedup

    src = str(tmp_path / "src")
    rows = [
        ("AAPL", t("2024-01-05 15:00:00"), 1.0, t("2024-01-05 15:00:00")),
        ("AAPL", t("2024-01-05 15:00:00"), 1.0, t("2024-01-05 15:00:00")),  # dup
        ("MSFT", t("2024-01-05 15:01:00"), 2.0, t("2024-01-05 15:01:00")),
    ]
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("append").parquet(src)
    stream = stream_events(spark, src, SCHEMA)
    q = (
        stream_dedup(stream, ["symbol", "ts"])
        .writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    try:
        out = spark.sql("SELECT symbol, ts FROM dedup_out").collect()
        assert sorted((r.symbol, r.ts) for r in out) == [
            ("AAPL", t("2024-01-05 15:00:00")),
            ("MSFT", t("2024-01-05 15:01:00")),
        ]
    finally:
        spark.catalog.dropTempView("dedup_out")


def test_windowed_counts_batch_equivalence(spark, sf_dir):
    """The watermarked streaming agg over a bounded source equals the batch
    window aggregation (no late data beyond watermark in the fixture)."""
    from dockerized_data_pipeline_spark.catalog import load_table

    ev = load_table(spark, sf_dir, "events")
    batch = (
        windowed_event_counts(ev)  # same plan builder works on batch DF
        .collect()
    )
    assert len(batch) > 0
    total = sum(r.n_events for r in batch)
    assert total == ev.count()


def test_stream_static_enrich_broadcasts_dim(spark, tmp_path):
    from dockerized_data_pipeline_spark.streaming.joins import stream_static_enrich

    src = str(tmp_path / "src")
    _write_batch(
        spark,
        src,
        [
            ("AAPL", t("2024-01-05 15:00:00"), 100.0, t("2024-01-05 15:00:00")),
            ("MSFT", t("2024-01-05 15:00:00"), 200.0, t("2024-01-05 15:00:00")),
            ("NOPE", t("2024-01-05 15:00:00"), 1.0, t("2024-01-05 15:00:00")),
        ],
    )
    dim = spark.createDataFrame(
        [("AAPL", "NASDAQ"), ("MSFT", "NASDAQ"), ("IBM", "NYSE")],
        "symbol string, exchange string",
    )
    q = (
        stream_static_enrich(stream_events(spark, src, SCHEMA), dim, on=["symbol"])
        .writeStream.format("memory")
        .queryName("enrich_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    try:
        out = {r.symbol: r.exchange for r in spark.sql("SELECT * FROM enrich_out").collect()}
        # left join: unmatched stream rows survive with NULL exchange
        assert out == {"AAPL": "NASDAQ", "MSFT": "NASDAQ", "NOPE": None}
    finally:
        spark.catalog.dropTempView("enrich_out")


def test_stream_stream_join_time_bounded(spark, tmp_path):
    from pyspark.sql import types as T

    from dockerized_data_pipeline_spark.streaming.joins import stream_stream_join

    click_schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("click_ts", T.TimestampType()),
            T.StructField("page", T.StringType()),
        ]
    )
    buy_schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("purchase_ts", T.TimestampType()),
            T.StructField("amount", T.DoubleType()),
        ]
    )
    clicks_dir = str(tmp_path / "clicks")
    buys_dir = str(tmp_path / "buys")
    spark.createDataFrame(
        [
            (1, t("2024-01-05 10:00:00"), "home"),
            (2, t("2024-01-05 10:05:00"), "search"),
            (3, t("2024-01-05 10:10:00"), "home"),
        ],
        click_schema,
    ).coalesce(1).write.parquet(clicks_dir)
    spark.createDataFrame(
        [
            (1, t("2024-01-05 10:30:00"), 9.99),   # within 1h of user 1's click
            (2, t("2024-01-05 12:00:00"), 5.00),   # too late for user 2
            (9, t("2024-01-05 10:30:00"), 1.00),   # no matching click
        ],
        buy_schema,
    ).coalesce(1).write.parquet(buys_dir)

    clicks = spark.readStream.schema(click_schema).parquet(clicks_dir)
    buys = spark.readStream.schema(buy_schema).parquet(buys_dir)
    joined = stream_stream_join(
        clicks,
        buys,
        key_cols=["user_id"],
        left_ts="click_ts",
        right_ts="purchase_ts",
        max_delay="1 hour",
    ).select(clicks["user_id"], "page", "amount")
    q = (
        joined.writeStream.format("memory")
        .queryName("ss_join_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    try:
        out = [
            (r.user_id, r.page, r.amount)
            for r in spark.sql("SELECT * FROM ss_join_out").collect()
        ]
        assert out == [(1, "home", 9.99)]
    finally:
        spark.catalog.dropTempView("ss_join_out")


def test_rollup_stream_equals_batch_rollup(spark, sf_dir, tmp_path):
    """Streaming the events fixture through the continuous rollup (two
    micro-batch groups) yields the same table as one batch
    incremental_rollup over everything."""
    from pyspark.sql import functions as F

    from dockerized_data_pipeline_spark.catalog import load_table
    from dockerized_data_pipeline_spark.operators.maintenance import (
        incremental_rollup,
    )
    from dockerized_data_pipeline_spark.streaming.ingest import rollup_stream

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "event_type", "value"
    )
    src = str(tmp_path / "src")
    # several files so availableNow processes multiple micro-batches
    ev.repartition(4).write.parquet(src)

    stream = spark.readStream.schema(
        spark.read.parquet(src).schema
    ).option("maxFilesPerTrigger", 2).parquet(src)
    q = rollup_stream(
        stream,
        str(tmp_path / "rollup_s"),
        key_cols=["event_type"],
        checkpoint_dir=str(tmp_path / "ck"),
    )
    q.awaitTermination(180)

    incremental_rollup(
        spark, str(tmp_path / "rollup_b"), ev, key_cols=["event_type"], ts_col="ts"
    )
    a = {
        (r.bucket_start, r.event_type): (r.n_events, r.sum_value, r.min_value, r.max_value)
        for r in spark.read.parquet(str(tmp_path / "rollup_s")).collect()
    }
    b = {
        (r.bucket_start, r.event_type): (r.n_events, r.sum_value, r.min_value, r.max_value)
        for r in spark.read.parquet(str(tmp_path / "rollup_b")).collect()
    }
    assert a == b


def test_transform_with_state_drawdown_alerts(spark, tmp_path):
    """Spark 4 transformWithStateInPandas: per-key peak persists across
    micro-batches; only drops >= 20% below the running peak alert.

    Requires protobuf (the TWS state-server wire protocol) -- not baked
    into this container, so the test skips there; the operator itself is
    plain pandas + typed handles and imports without it."""
    import pytest

    pytest.importorskip("google.protobuf")
    from pyspark.sql import types as T

    from dockerized_data_pipeline_spark.streaming.tws import drawdown_alerts

    schema = T.StructType(
        [
            T.StructField("event_type", T.StringType()),
            T.StructField("ts_us", T.LongType()),
            T.StructField("value_cents", T.LongType()),
        ]
    )
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def run_batch(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode("append").parquet(src)
        stream = spark.readStream.schema(schema).parquet(src)
        q = (
            drawdown_alerts(stream, threshold_ppm=200_000)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_batch(
        [
            ("AAPL", 1, 100_00),   # sets peak
            ("AAPL", 2, 95_00),    # -5%: no alert
            ("AAPL", 3, 70_00),    # -30%: alert
            ("MSFT", 4, 50_00),    # sets peak, no alert
        ]
    )
    first = {(r.event_type, r.ts_us): r for r in spark.read.parquet(out).collect()}
    assert set(first) == {("AAPL", 3)}
    assert first[("AAPL", 3)].drawdown_ppm == 300_000

    # batch 2: peak must have survived in state (AAPL peak 100_00)
    run_batch([("AAPL", 5, 79_00), ("MSFT", 6, 49_00)])  # -21% vs stored peak; MSFT -2%
    rows = {(r.event_type, r.ts_us) for r in spark.read.parquet(out).collect()}
    assert rows == {("AAPL", 3), ("AAPL", 5)}


def test_fanout_stream_feeds_two_sinks_from_one_read(spark, tmp_path):
    from pyspark.sql import functions as F

    from dockerized_data_pipeline_spark.operators.merge import merge_upsert_path
    from dockerized_data_pipeline_spark.streaming.ingest import fanout_stream

    src = str(tmp_path / "src")
    table = str(tmp_path / "table")
    errlog = str(tmp_path / "errors")
    ckpt = str(tmp_path / "ckpt")

    _write_batch(
        spark,
        src,
        [
            ("AAPL", t("2024-01-05 15:00:00"), 100.0, t("2024-01-05 15:00:00")),
            ("FAIL", t("2024-01-05 15:00:00"), -1.0, t("2024-01-05 15:00:00")),
        ],
    )

    def merge_sink(batch_df, epoch_id):
        merge_upsert_path(
            spark, table, batch_df.filter(F.col("close_price") > 0),
            keys=["symbol", "ts"], batch_order_by=["last_refreshed"],
        )

    def error_sink(batch_df, epoch_id):
        bad = batch_df.filter(F.col("close_price") <= 0)
        if not bad.isEmpty():
            bad.write.mode("append").parquet(errlog)

    q = fanout_stream(
        stream_events(spark, src, SCHEMA), [merge_sink, error_sink], checkpoint_dir=ckpt
    )
    q.awaitTermination(120)
    assert spark.read.parquet(table).count() == 1
    assert spark.read.parquet(errlog).count() == 1


def test_max_files_per_trigger_rate_limits_batches(spark, tmp_path):
    """T6 streaming analog: maxFilesPerTrigger=1 makes each file its own
    micro-batch -- the back-pressure knob for a bursty source."""
    src = str(tmp_path / "src")
    for i in range(3):
        spark.createDataFrame(
            [(f"S{i}", t("2024-01-05 15:00:00"), float(i), t("2024-01-05 15:00:00"))],
            SCHEMA,
        ).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    batches = []

    def sink(batch_df, epoch_id):
        batches.append(batch_df.count())

    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert sum(batches) == 3
    assert len(batches) == 3 and all(b == 1 for b in batches)


def test_neardup_stream_builds_index_and_pairs(spark, tmp_path):
    """Streaming incremental near-dup: batch 2 docs probe the index built
    from batch 1 (batch_corpus pairs) and each other (batch_batch pairs);
    the signature index ends up covering every doc ever seen."""
    import time as _time

    from dockerized_data_pipeline_spark.streaming.ingest import neardup_stream

    base = (
        "the quick brown fox jumps over the lazy dog while the cat watches "
        "the bird fly over the green field near the old barn"
    )
    twin_a = base.replace("barn", "shed") + " extra tail alpha"
    twin_b = base.replace("barn", "shed") + " extra tail omega"
    src = str(tmp_path / "docs_src")
    doc_schema = "doc_id long, text string"
    spark.createDataFrame(
        [(1, base), (2, "unrelated corpus prose about shuffle partitions and catalyst rules")],
        doc_schema,
    ).coalesce(1).write.mode("append").parquet(src)
    _time.sleep(1.1)  # distinct mtimes: file source processes oldest first
    spark.createDataFrame(
        [(10, base.replace("green", "blue")), (11, twin_a), (12, twin_b)],
        doc_schema,
    ).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(doc_schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    index_path = str(tmp_path / "sig_index")
    pairs_path = str(tmp_path / "pairs")
    q = neardup_stream(
        stream, index_path, pairs_path, checkpoint_dir=str(tmp_path / "ck")
    )
    q.awaitTermination(180)

    pairs = {
        (r.doc_a, r.doc_b): r.pair_type
        for r in spark.read.parquet(pairs_path).collect()
    }
    assert pairs.get((1, 10)) == "batch_corpus"
    assert pairs.get((11, 12)) == "batch_batch"
    assert (1, 2) not in pairs
    index = spark.read.parquet(index_path)
    assert {r.doc for r in index.select("doc").collect()} == {1, 2, 10, 11, 12}
    assert "mh15" in index.columns


def test_neardup_stream_crash_replay_excludes_own_epoch(spark, tmp_path):
    """Effectively-once under crash replay (ADVICE r2): if a run crashed
    AFTER writing index_path/epoch=0 but BEFORE the checkpoint committed,
    the replayed batch 0 must not read its own signatures back as corpus --
    that would emit duplicate pairs and relabel batch_batch pairs as
    batch_corpus. Simulated by pre-seeding THIS RUN's epoch-0 directory
    (epoch tags derive from the checkpoint dir, so the crashed write and
    the replay share a tag) with the exact signatures batch 0 is about to
    write."""
    from dockerized_data_pipeline_spark.operators.dedup import minhash_signatures
    from dockerized_data_pipeline_spark.streaming.ingest import (
        _epoch_dirs_and_tag,
        neardup_stream,
    )

    base = (
        "the quick brown fox jumps over the lazy dog while the cat watches "
        "the bird fly over the green field near the old barn"
    )
    batch = [(11, base + " extra tail alpha"), (12, base + " extra tail omega")]
    doc_schema = "doc_id long, text string"
    src = str(tmp_path / "docs_src")
    spark.createDataFrame(batch, doc_schema).coalesce(1).write.parquet(src)

    index_path = str(tmp_path / "sig_index")
    ck = str(tmp_path / "ck")
    _, tag = _epoch_dirs_and_tag(index_path, ck, 0)
    # the "crashed run" already wrote this batch's own signatures as its
    # tagged epoch 0
    minhash_signatures(
        spark.createDataFrame(batch, doc_schema), "doc_id", "text", 3, 16
    ).write.parquet(f"{index_path}/epoch={tag}-0")

    pairs_path = str(tmp_path / "pairs")
    q = neardup_stream(
        spark.readStream.schema(doc_schema).parquet(src),
        index_path,
        pairs_path,
        checkpoint_dir=ck,  # same checkpoint -> same tag -> replays epoch 0
    )
    q.awaitTermination(180)

    rows = spark.read.parquet(pairs_path).collect()
    # exactly one pair, still batch_batch -- no self-corpus contamination
    assert [(r.doc_a, r.doc_b, r.pair_type) for r in rows] == [
        (11, 12, "batch_batch")
    ]


def test_orphaned_future_epoch_raises(tmp_path):
    """ADVICE r3: a same-tag epoch numbered AHEAD of the current batch can
    only mean the checkpoint was reset in place while the index was kept
    -- its rows would be silently skipped by corpus reads yet visible to
    wholesale spark.read.parquet(index_path) consumers. Fail loudly."""
    import os

    import pytest as _pytest

    from dockerized_data_pipeline_spark.streaming.ingest import _epoch_dirs_and_tag

    index_path = str(tmp_path / "idx")
    ck = str(tmp_path / "ck")
    _, tag = _epoch_dirs_and_tag(index_path, ck, 0)

    def seed(name):
        d = os.path.join(index_path, name)
        os.makedirs(d, exist_ok=True)
        open(os.path.join(d, "_SUCCESS"), "w").close()

    # foreign-tag epoch 5: prior run's corpus, fine at any batch id
    seed("epoch=other001-5")
    prior, _ = _epoch_dirs_and_tag(index_path, ck, 0)
    assert len(prior) == 1

    # own-tag epoch 0 at batch 0: the normal crash-replay overwrite target
    seed(f"epoch={tag}-0")
    prior, _ = _epoch_dirs_and_tag(index_path, ck, 0)
    assert all("epoch=other001-5" in p or f"{tag}-0" not in p for p in prior)

    # own-tag epoch 5 at batch 0: orphaned future-numbered epoch -> loud
    seed(f"epoch={tag}-5")
    with _pytest.raises(RuntimeError, match="orphaned"):
        _epoch_dirs_and_tag(index_path, ck, 0)


def test_semantic_dedup_stream_builds_index_and_pairs(spark, tmp_path):
    """Streaming incremental SEMANTIC dedup: batch-2 vectors probe the
    assignment index from batch 1 (origin 'corpus') and each other
    (origin 'batch'); the index accumulates every vector, partitioned by
    cluster."""
    import math
    import time as _time

    from dockerized_data_pipeline_spark.streaming.ingest import (
        semantic_dedup_stream,
    )

    def vec(axis, eps=0.0):
        v = [0.0] * 8
        v[axis] = 1.0
        v[(axis + 1) % 8] = eps
        n = math.sqrt(1 + eps * eps)
        return [x / n for x in v]

    cents = [vec(0), vec(3), vec(6)]
    schema = "vec_id long, embedding array<double>"
    src = str(tmp_path / "vec_src")
    spark.createDataFrame(
        [(0, vec(0)), (1, vec(0, 0.01)), (20, vec(6))], schema
    ).coalesce(1).write.mode("append").parquet(src)
    _time.sleep(1.1)
    spark.createDataFrame(
        [(100, vec(0, 0.02)), (101, vec(0, 0.021)), (102, vec(6, 0.5))], schema
    ).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    index_path = str(tmp_path / "sem_index")
    pairs_path = str(tmp_path / "sem_pairs")
    q = semantic_dedup_stream(
        stream,
        cents,
        index_path,
        pairs_path,
        checkpoint_dir=str(tmp_path / "ck"),
        threshold=0.95,
    )
    q.awaitTermination(180)

    got = {
        (r.id_a, r.id_b): r.origin
        for r in spark.read.parquet(pairs_path).collect()
    }
    # batch-2 near-dups of batch-1 vectors 0/1 tag 'corpus'
    assert got.get((0, 100)) == "corpus" and got.get((1, 100)) == "corpus"
    assert got.get((0, 101)) == "corpus" and got.get((1, 101)) == "corpus"
    # batch-2 internal near-dup pair tags 'batch'
    assert got.get((100, 101)) == "batch"
    # sub-threshold same-cluster neighbor never pairs
    assert not any(102 in p for p in got)
    index = spark.read.parquet(index_path)
    assert {r.vec_id for r in index.collect()} == {0, 1, 20, 100, 101, 102}
    assert "cluster_id" in index.columns and "u" in index.columns


def test_semantic_dedup_stream_replay_excludes_own_epoch(spark, tmp_path):
    """Crash replay: epoch=0 pre-seeded with the exact assignments batch 0
    is about to write must NOT be read back as corpus -- pairs stay
    'batch'-tagged and un-duplicated."""
    import math

    from dockerized_data_pipeline_spark.operators.similarity import unit_assigned
    from dockerized_data_pipeline_spark.streaming.ingest import (
        semantic_dedup_stream,
    )

    def vec(axis, eps=0.0):
        v = [0.0] * 8
        v[axis] = 1.0
        v[(axis + 1) % 8] = eps
        n = math.sqrt(1 + eps * eps)
        return [x / n for x in v]

    cents = [vec(0), vec(3), vec(6)]
    schema = "vec_id long, embedding array<double>"
    batch_rows = [(11, vec(0, 0.01)), (12, vec(0, 0.02))]
    src = str(tmp_path / "vec_src")
    spark.createDataFrame(batch_rows, schema).coalesce(1).write.mode(
        "append"
    ).parquet(src)

    index_path = str(tmp_path / "sem_index")
    ck = str(tmp_path / "ck")
    from dockerized_data_pipeline_spark.streaming.ingest import _epoch_dirs_and_tag

    _, tag = _epoch_dirs_and_tag(index_path, ck, 0)
    # simulate the crash leftovers: this run's epoch 0 already holds
    # batch 0's rows
    unit_assigned(
        spark.createDataFrame(batch_rows, schema), cents
    ).write.partitionBy("cluster_id").mode("overwrite").parquet(
        f"{index_path}/epoch={tag}-0"
    )

    stream = spark.readStream.schema(schema).parquet(src)
    pairs_path = str(tmp_path / "sem_pairs")
    q = semantic_dedup_stream(
        stream,
        cents,
        index_path,
        pairs_path,
        checkpoint_dir=ck,
        threshold=0.95,
    )
    q.awaitTermination(180)

    rows = spark.read.parquet(pairs_path).collect()
    assert [(r.id_a, r.id_b, r.origin) for r in rows] == [(11, 12, "batch")]


def test_semantic_dedup_stream_fresh_checkpoint_keeps_prior_run_as_corpus(
    spark, tmp_path
):
    """Deliberate restart with a NEW checkpoint (the documented codebook-
    rotation path): micro-batch numbering restarts at 0, but the previous
    run's epochs must stay corpus -- neither shadowed (pairs against them
    still emit) nor overwritten (their index rows survive)."""
    import math

    from dockerized_data_pipeline_spark.streaming.ingest import (
        semantic_dedup_stream,
    )

    def vec(axis, eps=0.0):
        v = [0.0] * 8
        v[axis] = 1.0
        v[(axis + 1) % 8] = eps
        n = math.sqrt(1 + eps * eps)
        return [x / n for x in v]

    cents = [vec(0), vec(3), vec(6)]
    schema = "vec_id long, embedding array<double>"
    index_path = str(tmp_path / "sem_index")
    pairs_path = str(tmp_path / "sem_pairs")

    # run 1: indexes vectors 0 and 20
    src1 = str(tmp_path / "src1")
    spark.createDataFrame([(0, vec(0)), (20, vec(6))], schema).coalesce(
        1
    ).write.parquet(src1)
    q1 = semantic_dedup_stream(
        spark.readStream.schema(schema).parquet(src1),
        cents,
        index_path,
        pairs_path,
        checkpoint_dir=str(tmp_path / "ck1"),
        threshold=0.95,
    )
    q1.awaitTermination(180)

    # run 2: FRESH checkpoint, batch numbering restarts at 0
    src2 = str(tmp_path / "src2")
    spark.createDataFrame([(100, vec(0, 0.01))], schema).coalesce(
        1
    ).write.parquet(src2)
    q2 = semantic_dedup_stream(
        spark.readStream.schema(schema).parquet(src2),
        cents,
        index_path,
        pairs_path,
        checkpoint_dir=str(tmp_path / "ck2"),
        threshold=0.95,
    )
    q2.awaitTermination(180)

    got = {
        (r.id_a, r.id_b): r.origin
        for r in spark.read.parquet(pairs_path).collect()
    }
    # the cross-RUN near-dup pair is found, tagged corpus
    assert got.get((0, 100)) == "corpus"
    # run 1's index rows survived run 2's epoch-0 write
    index_ids = {r.vec_id for r in spark.read.parquet(index_path).collect()}
    assert index_ids == {0, 20, 100}


def test_neardup_stream_legacy_untagged_epoch_treated_as_own(spark, tmp_path):
    """Upgrade continuity: a pre-tag-scheme run crashed after writing the
    untagged epoch=0; replaying batch 0 with the SAME checkpoint under
    the tagged scheme must still exclude that write (legacy dirs belong
    to this stream), or every in-batch pair duplicates."""
    from dockerized_data_pipeline_spark.operators.dedup import minhash_signatures
    from dockerized_data_pipeline_spark.streaming.ingest import neardup_stream

    base = (
        "the quick brown fox jumps over the lazy dog while the cat watches "
        "the bird fly over the green field near the old barn"
    )
    batch = [(11, base + " extra tail alpha"), (12, base + " extra tail omega")]
    doc_schema = "doc_id long, text string"
    src = str(tmp_path / "docs_src")
    spark.createDataFrame(batch, doc_schema).coalesce(1).write.parquet(src)

    index_path = str(tmp_path / "sig_index")
    minhash_signatures(
        spark.createDataFrame(batch, doc_schema), "doc_id", "text", 3, 16
    ).write.parquet(f"{index_path}/epoch=0")  # legacy untagged crash leftover

    pairs_path = str(tmp_path / "pairs")
    q = neardup_stream(
        spark.readStream.schema(doc_schema).parquet(src),
        index_path,
        pairs_path,
        checkpoint_dir=str(tmp_path / "ck"),
    )
    q.awaitTermination(180)
    rows = spark.read.parquet(pairs_path).collect()
    assert [(r.doc_a, r.doc_b, r.pair_type) for r in rows] == [
        (11, 12, "batch_batch")
    ]


def test_semantic_stream_ignores_incomplete_foreign_epoch(spark, tmp_path):
    """A previous run that died mid-write leaves a foreign-tagged epoch
    dir without _SUCCESS; it must never count as corpus (partial parquet
    would poison every future batch)."""
    import math
    import os

    from dockerized_data_pipeline_spark.streaming.ingest import (
        semantic_dedup_stream,
    )

    def vec(axis, eps=0.0):
        v = [0.0] * 8
        v[axis] = 1.0
        v[(axis + 1) % 8] = eps
        n = math.sqrt(1 + eps * eps)
        return [x / n for x in v]

    cents = [vec(0), vec(3), vec(6)]
    schema = "vec_id long, embedding array<double>"
    src = str(tmp_path / "src")
    spark.createDataFrame([(11, vec(0, 0.01)), (12, vec(0, 0.02))], schema).coalesce(
        1
    ).write.parquet(src)

    index_path = str(tmp_path / "sem_index")
    # foreign crashed epoch: right layout, junk payload, NO _SUCCESS
    junk = os.path.join(index_path, "epoch=deadbeef-3", "cluster_id=0")
    os.makedirs(junk)
    with open(os.path.join(junk, "part-00000.parquet"), "wb") as f:
        f.write(b"not parquet at all")

    pairs_path = str(tmp_path / "pairs")
    q = semantic_dedup_stream(
        spark.readStream.schema(schema).parquet(src),
        cents,
        index_path,
        pairs_path,
        checkpoint_dir=str(tmp_path / "ck"),
        threshold=0.95,
    )
    q.awaitTermination(180)
    rows = spark.read.parquet(pairs_path).collect()
    # the stream ran (did not choke on the corrupt dir) and found only
    # the in-batch pair
    assert [(r.id_a, r.id_b, r.origin) for r in rows] == [(11, 12, "batch")]


def test_legacy_untagged_future_epoch_does_not_wedge_fresh_checkpoint(tmp_path):
    """Review r4: an UNTAGGED legacy epoch numbered ahead of a freshly
    rotated checkpoint's batch id is the docstring's sanctioned
    degraded case (coverage loss only) -- it must not raise; only a
    TAGGED same-run future epoch (checkpoint reset in place) wedges."""
    import os

    from dockerized_data_pipeline_spark.streaming.ingest import _epoch_dirs_and_tag

    index_path = str(tmp_path / "idx")

    def seed(name):
        d = os.path.join(index_path, name)
        os.makedirs(d, exist_ok=True)
        open(os.path.join(d, "_SUCCESS"), "w").close()

    seed("epoch=5")  # legacy untagged, written by the pre-tag scheme
    # a deliberately-rotated FRESH checkpoint starts at batch 0: legacy
    # epoch 5 is treated as this stream's own (safe default) and merely
    # excluded from corpus -- never an error
    prior, _ = _epoch_dirs_and_tag(index_path, str(tmp_path / "fresh_ck"), 0)
    assert prior == []
    # and once numbering passes it, it becomes corpus again
    prior, _ = _epoch_dirs_and_tag(index_path, str(tmp_path / "fresh_ck"), 6)
    assert len(prior) == 1


def test_legacy_untagged_future_epoch_warns_but_does_not_wedge(tmp_path):
    """The ambiguous legacy case (untagged dir ahead of the batch id)
    cannot raise without breaking the documented rotation contract, but
    must not pass silently either: a warning names both readings."""
    import os
    import warnings

    from dockerized_data_pipeline_spark.streaming.ingest import _epoch_dirs_and_tag

    index_path = str(tmp_path / "idx")
    d = os.path.join(index_path, "epoch=5")
    os.makedirs(d)
    open(os.path.join(d, "_SUCCESS"), "w").close()

    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        prior, _ = _epoch_dirs_and_tag(index_path, str(tmp_path / "ck"), 0)
    assert prior == []
    assert any("legacy untagged epoch" in str(w.message) for w in caught)
