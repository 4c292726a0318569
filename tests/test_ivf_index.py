"""Disk-backed IVF index (operators/similarity.py): partition-pruned ANN
probes must equal the inline IVF plan while reading only n_probe/n_lists
of the index files."""

from __future__ import annotations

from dockerized_data_pipeline_spark.operators.similarity import (
    build_ivf_index,
    ivf_topk,
    ivf_topk_indexed,
    rank_probe_clusters,
    read_ivf_codebook,
)


def _vectors(spark, n=60, dim=8):
    rows = []
    for i in range(n):
        # three well-separated lobes plus deterministic jitter
        axis = i % 3
        v = [0.0] * dim
        v[axis] = 1.0
        v[(axis + 3) % dim] = ((i * 7) % 10) / 100.0
        rows.append((i, v))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


CENTS = [
    [1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0],
    [0.0, 1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0],
    [0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 0.0, 0.0],
]
PROBE_VEC = [0.9, 0.1, 0.0, 0.05, 0.0, 0.0, 0.0, 0.0]


def test_indexed_probe_equals_inline_ivf(spark, tmp_path):
    df = _vectors(spark)
    idx = str(tmp_path / "ivf")
    build_ivf_index(df, CENTS, idx)
    assert read_ivf_codebook(idx) == CENTS
    inline = ivf_topk(df, PROBE_VEC, CENTS, k=10, n_probe=2).collect()
    indexed = ivf_topk_indexed(spark, idx, PROBE_VEC, k=10, n_probe=2).collect()
    assert [(r.vec_id, r.cos_sim) for r in inline] == [
        (r.vec_id, r.cos_sim) for r in indexed
    ]


def test_probe_reads_only_matching_partitions(spark, tmp_path):
    df = _vectors(spark)
    idx = str(tmp_path / "ivf")
    build_ivf_index(df, CENTS, idx)
    probe = rank_probe_clusters(PROBE_VEC, CENTS, 2)
    assert probe == [0, 1]
    scored = ivf_topk_indexed(spark, idx, PROBE_VEC, k=10, n_probe=2)
    # inputFiles() lists the relation pre-pruning; the pruning contract
    # lives in the scan's PartitionFilters (applied at physical planning,
    # so only cluster_id IN probe directories are ever opened)
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        scored.explain("formatted")
    plan = buf.getvalue()
    pf = [l for l in plan.splitlines() if "PartitionFilters" in l]
    assert pf, plan
    assert any("cluster_id" in l and " IN " in l.upper() for l in pf), pf


def test_index_republish_is_atomic_and_visible(spark, tmp_path):
    df = _vectors(spark)
    idx = str(tmp_path / "ivf")
    build_ivf_index(df, CENTS, idx)
    before = ivf_topk_indexed(spark, idx, PROBE_VEC, k=5, n_probe=3).collect()
    # grow the corpus and republish under the same path
    import pyspark.sql.functions as F

    df2 = df.unionByName(
        df.limit(5).select((F.col("vec_id") + 1000).alias("vec_id"), "embedding")
    )
    build_ivf_index(df2, CENTS, idx)
    after = ivf_topk_indexed(spark, idx, PROBE_VEC, k=5, n_probe=3).collect()
    assert len(before) == 5 and len(after) == 5  # readable pre- and post-flip
    assert spark.read.parquet(idx).count() == 65  # the flip exposed the grown corpus


def test_incremental_semantic_dedup_equals_full_recompute(spark, tmp_path):
    """Pairs touching the batch from the O(batch) index probe must equal
    the full-corpus semantic_dedup_pairs restricted to batch-touching
    pairs (same codebook)."""
    import math

    from dockerized_data_pipeline_spark.operators.similarity import (
        semantic_dedup_incremental,
        semantic_dedup_pairs,
    )

    def vec(axis, eps=0.0):
        v = [0.0] * 8
        v[axis] = 1.0
        v[(axis + 1) % 8] = eps
        n = math.sqrt(1 + eps * eps)
        return [x / n for x in v]

    corpus_rows = [(0, vec(0)), (1, vec(0, 0.01)), (10, vec(3)), (20, vec(6))]
    batch_rows = [
        (100, vec(0, 0.02)),   # near-dup of corpus 0/1
        (101, vec(3, 0.015)),  # near-dup of corpus 10
        (102, vec(0, 0.021)),  # near-dup of batch 100 AND corpus 0/1
        (103, vec(6, 0.5)),    # same cluster as 20, below threshold
    ]
    schema = "vec_id long, embedding array<double>"
    corpus = spark.createDataFrame(corpus_rows, schema)
    batch = spark.createDataFrame(batch_rows, schema)
    cents = [vec(0), vec(3), vec(6)]

    from dockerized_data_pipeline_spark.operators.similarity import build_ivf_index

    idx = str(tmp_path / "semidx")
    build_ivf_index(corpus, cents, idx)

    inc = semantic_dedup_incremental(spark, idx, batch, threshold=0.95)
    got = {(r.id_a, r.id_b, r.origin) for r in inc.collect()}

    batch_ids = {r[0] for r in batch_rows}
    full = semantic_dedup_pairs(
        corpus.unionByName(batch), cents, threshold=0.95
    ).collect()
    want_pairs = {
        (r.id_a, r.id_b)
        for r in full
        if r.id_a in batch_ids or r.id_b in batch_ids
    }
    assert {(a, b) for a, b, _ in got} == want_pairs
    # origins: corpus rows tag 'corpus', batch-batch pairs tag 'batch'
    for a, b, origin in got:
        expected = "batch" if (a in batch_ids and b in batch_ids) else "corpus"
        assert origin == expected, (a, b, origin)
    # scores are fixed-point and above the cut
    assert all(r.cos_fp >= 9500 for r in inc.collect())


def test_fixture_cache_publish_is_atomic(spark, tmp_path):
    """Two sessions building the same cache never interleave writes: the
    build lands in a private staging dir and os.rename's into place; a
    loser whose rename fails discards its staging copy and reads the
    winner's."""
    import os
    import uuid

    from dockerized_data_pipeline_spark.plans.llm import _fixture_cache

    sf_dir = str(tmp_path)
    open(os.path.join(sf_dir, "documents.parquet"), "wb").write(b"x" * 10)
    ns = f"testns-{uuid.uuid4().hex[:8]}"
    calls = []

    def build(staging):
        os.makedirs(staging, exist_ok=True)
        calls.append(staging)
        open(os.path.join(staging, "artifact"), "w").write("v1")

    out1 = _fixture_cache(sf_dir, "documents", ns, build)
    assert open(os.path.join(out1, "artifact")).read() == "v1"
    # second call: cache hit, build not re-run
    out2 = _fixture_cache(sf_dir, "documents", ns, build)
    assert out2 == out1 and len(calls) == 1

    # loser path: a concurrent winner published while we were building
    def racing_build(staging):
        os.makedirs(staging, exist_ok=True)
        calls.append(staging)
        open(os.path.join(staging, "artifact"), "w").write("loser")

    ns2 = f"testns-{uuid.uuid4().hex[:8]}"

    def winner_then_build(staging):
        # simulate the other session finishing first
        _fixture_cache(sf_dir, "documents", ns2, build)
        racing_build(staging)

    out3 = _fixture_cache(sf_dir, "documents", ns2, winner_then_build)
    assert open(os.path.join(out3, "artifact")).read() == "v1"  # winner's copy
    # the loser's staging dir was discarded
    parent = os.path.dirname(out3)
    assert [d for d in os.listdir(parent) if ".build-" in d] == []
