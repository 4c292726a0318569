"""Streaming soak with randomized crash injection (VERDICT r3 item 6):
drive ``neardup_stream`` and ``semantic_dedup_stream`` through ~50
micro-batches, killing the checkpoint commit at random epoch boundaries
(the index write survived, the commit did not -- Spark's replay
contract), and assert the final pair set equals the batch recompute over
the whole corpus and the index holds exactly one row per item.

The crash is injected the way a real crash manifests: the newest
``commits/<n>`` marker is deleted while ``offsets/<n>`` and the epoch's
parquet both remain, so the next start REPLAYS batch n -- the epoch
tagging (streaming/ingest.py::_epoch_dirs_and_tag) must overwrite the
crashed write and exclude it from the corpus, at every one of the ~15
randomized injection points, not just the depth-2 cases the unit tests
pin."""

from __future__ import annotations

import os
import random
import time

N_BATCHES = 50
CRASH_P = 0.3

DOC_SCHEMA = "doc_id long, text string"
TEMPLATES = [
    "the quick brown fox jumps over the lazy dog while the cat watches the bird fly over the green field near the old barn",
    "distributed query engines shuffle partitioned data across executors while the optimizer prunes columns and pushes filters into scans",
    "a long corpus document about training data curation with deduplication quality filtering and careful source mixture weighting",
    "streaming pipelines checkpoint their offsets so that crash recovery replays the last uncommitted batch exactly once downstream",
    "vector similarity search partitions the embedding space with a coarse codebook and probes only the nearest inverted lists",
]


def _run_stream_to_completion(make_query):
    """Start an availableNow query, wait for self-termination, then wait
    for the checkpoint's active-query registration to clear: it
    deregisters asynchronously, and a rapid restart loop would otherwise
    hit SparkConcurrentModificationException on the commits dir.

    The active-query poll reads the QUERY'S OWN session -- calling
    get_session() here would re-apply the default builder confs
    (app name, 32 shuffle partitions) onto the shared 8-partition test
    session via getOrCreate, which is exactly the cross-test conf drift
    the conftest leak detector exists to catch."""
    from pyspark.sql import SparkSession

    q = make_query()
    assert q.awaitTermination(300)
    q.stop()
    streams = SparkSession.getActiveSession().streams
    deadline = time.monotonic() + 30
    while any(aq.id == q.id for aq in streams.active):
        if time.monotonic() > deadline:
            raise TimeoutError("query did not deregister")
        time.sleep(0.05)


def _crash_latest_commit(checkpoint_dir: str) -> int:
    """Simulate a crash between the epoch write and the checkpoint
    commit: remove the newest commit marker (offsets stay), so the next
    start replays that batch."""
    cdir = os.path.join(checkpoint_dir, "commits")
    ids = sorted(int(f) for f in os.listdir(cdir) if f.isdigit())
    os.remove(os.path.join(cdir, str(ids[-1])))
    # the local-FS checksum sidecar must go with it (a real crash writes
    # neither; leaving it breaks the replayed commit's rename)
    crc = os.path.join(cdir, f".{ids[-1]}.crc")
    if os.path.exists(crc):
        os.remove(crc)
    return ids[-1]


def test_neardup_stream_soak_random_crash_replays(spark, tmp_path):
    from dockerized_data_pipeline_spark.operators.dedup import (
        minhash_neardup_pairs_native,
    )
    from dockerized_data_pipeline_spark.streaming.ingest import neardup_stream

    rng = random.Random(20260814)
    src = str(tmp_path / "src")
    index_path = str(tmp_path / "index")
    pairs_path = str(tmp_path / "pairs")
    ck = str(tmp_path / "ck")

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

    all_rows: list[tuple[int, str]] = []
    crashes = 0
    for i in range(N_BATCHES):
        rows = [
            (2 * i, TEMPLATES[i % 5] + f" tail alpha{i}"),
            (2 * i + 1, TEMPLATES[(i * 3 + 1) % 5] + f" tail beta{i}"),
        ]
        all_rows += rows
        spark.createDataFrame(rows, DOC_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        run_stream()
        if rng.random() < CRASH_P:
            _crash_latest_commit(ck)
            crashes += 1
    run_stream()  # drain: replays the final injected crash if any
    assert crashes >= 10  # the soak actually tortured the replay path

    stream_rows = spark.read.parquet(pairs_path).collect()
    stream_typed = {(r.doc_a, r.doc_b): r.pair_type for r in stream_rows}
    # a replay that read its own epoch back as corpus emits DUPLICATE pair
    # rows and relabels batch_batch as batch_corpus -- neither changes the
    # pair-KEY set, so pin row count and the exact type of every pair:
    # docs 2i/2i+1 share a batch, everything else is cross-epoch corpus
    assert len(stream_rows) == len(stream_typed), "duplicate pair rows"
    assert stream_typed == {
        (a, b): ("batch_batch" if a // 2 == b // 2 else "batch_corpus")
        for (a, b) in stream_typed
    }
    full = minhash_neardup_pairs_native(
        spark.createDataFrame(all_rows, DOC_SCHEMA), "doc_id", "text"
    )
    full_pairs = {(r.doc_a, r.doc_b) for r in full.collect()}
    assert set(stream_typed) == full_pairs
    assert len(full_pairs) > 50  # the fixture plants real cross-epoch dups
    assert any(t == "batch_batch" for t in stream_typed.values())
    assert any(t == "batch_corpus" for t in stream_typed.values())

    # effectively-once state: exactly one signature row per doc ever seen
    idx = spark.read.parquet(index_path)
    assert idx.count() == len(all_rows)
    assert idx.select("doc").distinct().count() == len(all_rows)


def test_semantic_dedup_stream_soak_random_crash_replays(spark, tmp_path):
    import math

    from dockerized_data_pipeline_spark.operators.similarity import (
        semantic_dedup_pairs,
    )
    from dockerized_data_pipeline_spark.streaming.ingest import (
        semantic_dedup_stream,
    )

    def vec(axis: int, eps: float) -> list[float]:
        v = [0.0] * 8
        v[axis] = 1.0
        v[(axis + 1) % 8] = eps
        n = math.sqrt(1 + eps * eps)
        return [x / n for x in v]

    cents = [vec(0, 0.0), vec(3, 0.0), vec(6, 0.0)]
    schema = "vec_id long, embedding array<double>"

    rng = random.Random(99731)
    src = str(tmp_path / "vsrc")
    index_path = str(tmp_path / "vindex")
    pairs_path = str(tmp_path / "vpairs")
    ck = str(tmp_path / "vck")

    def run_stream():
        _run_stream_to_completion(
            lambda: semantic_dedup_stream(
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(src),
                cents,
                index_path,
                pairs_path,
                checkpoint_dir=ck,
                threshold=0.95,
            )
        )

    all_rows: list[tuple[int, list[float]]] = []
    crashes = 0
    for i in range(N_BATCHES):
        rows = [
            # tight family: pairwise cos ~ 1 within an axis (cross-epoch dups)
            (2 * i, vec((i % 3) * 3, 0.001 * i)),
            # loose family: cos < 0.95 vs tights, ~ 1 vs other looses
            (2 * i + 1, vec((i % 3) * 3, 0.6 + 0.01 * i)),
        ]
        all_rows += rows
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        run_stream()
        if rng.random() < CRASH_P:
            _crash_latest_commit(ck)
            crashes += 1
    run_stream()
    assert crashes >= 10

    stream_rows = spark.read.parquet(pairs_path).collect()
    stream_typed = {(r.id_a, r.id_b): r.origin for r in stream_rows}
    assert len(stream_rows) == len(stream_typed), "duplicate pair rows"
    assert stream_typed == {
        (a, b): ("batch" if a // 2 == b // 2 else "corpus")
        for (a, b) in stream_typed
    }
    full = semantic_dedup_pairs(
        spark.createDataFrame(all_rows, schema), cents, threshold=0.95
    )
    full_pairs = {(r.id_a, r.id_b) for r in full.collect()}
    assert set(stream_typed) == full_pairs
    assert len(full_pairs) > 100  # both families pair within their axes

    idx = spark.read.parquet(index_path)
    assert idx.count() == len(all_rows)
    assert idx.select("vec_id").distinct().count() == len(all_rows)


def test_neardup_stream_survives_mid_run_compaction(spark, tmp_path):
    """Operational loop: batches -> stop stream -> compact_epoch_index ->
    more batches. The consolidated foreign-tagged epoch stays corpus, so
    post-compaction batches still pair against pre-compaction docs and
    the final pair set equals the full recompute."""
    from dockerized_data_pipeline_spark.operators.dedup import (
        minhash_neardup_pairs_native,
    )
    from dockerized_data_pipeline_spark.operators.maintenance import (
        compact_epoch_index,
    )
    from dockerized_data_pipeline_spark.streaming.ingest import neardup_stream

    src = str(tmp_path / "src")
    index_path = str(tmp_path / "index")
    pairs_path = str(tmp_path / "pairs")
    ck = str(tmp_path / "ck")

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

    all_rows: list[tuple[int, str]] = []
    for i in range(4):
        rows = [(2 * i, TEMPLATES[i % 5] + f" tail alpha{i}"),
                (2 * i + 1, TEMPLATES[(i * 3 + 1) % 5] + f" tail beta{i}")]
        all_rows += rows
        spark.createDataFrame(rows, DOC_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(src)
    run_stream()

    stats = compact_epoch_index(spark, index_path)
    assert stats["epochs_after"] == 1

    for i in range(4, 8):
        rows = [(2 * i, TEMPLATES[i % 5] + f" tail alpha{i}"),
                (2 * i + 1, TEMPLATES[(i * 3 + 1) % 5] + f" tail beta{i}")]
        all_rows += rows
        spark.createDataFrame(rows, DOC_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(src)
    run_stream()

    stream_pairs = {
        (r.doc_a, r.doc_b)
        for r in spark.read.parquet(pairs_path).collect()
    }
    full = minhash_neardup_pairs_native(
        spark.createDataFrame(all_rows, DOC_SCHEMA), "doc_id", "text"
    )
    full_pairs = {(r.doc_a, r.doc_b) for r in full.collect()}
    assert stream_pairs == full_pairs
    # cross-compaction pairs exist: a post-compaction doc paired with a
    # pre-compaction one through the consolidated epoch
    assert any(a < 8 <= b for a, b in stream_pairs)
    idx = spark.read.parquet(index_path)
    assert idx.select("doc").distinct().count() == len(all_rows)
