"""Product-quantization invariants: exact-centroid vectors encode with
zero error, finer codebooks monotonically improve reconstruction, and
codes are bit-identical across partitionings (the determinism the
rows-only driver check requires)."""

from __future__ import annotations

from dockerized_data_pipeline_spark.catalog import load_table
from dockerized_data_pipeline_spark.operators.pq import (
    pq_encode,
    pq_reconstruction_mse_ppm,
    pq_train,
)


def test_pq_roundtrip_on_fixture(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    cbs = pq_train(emb, m=4, k=8, iterations=3)
    assert len(cbs) == 4 and all(len(cb) == 8 for cb in cbs)
    codes = pq_encode(emb, cbs).collect()
    assert len(codes) == emb.count()
    assert all(len(r.codes) == 4 and all(0 <= c < 8 for c in r.codes) for r in codes)


def test_pq_finer_codebook_reduces_error(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    mse = {}
    for k in (1, 8):
        cbs = pq_train(emb, m=4, k=k, iterations=3)
        mse[k] = pq_reconstruction_mse_ppm(emb, cbs).collect()[0].mse_ppm
    assert mse[8] < mse[1]  # k=1 is just the per-subspace mean


def test_pq_codes_partition_invariant(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    cbs = pq_train(emb, m=4, k=4, iterations=2)
    a = sorted((r.vec_id, tuple(r.codes)) for r in pq_encode(emb, cbs).collect())
    cbs2 = pq_train(emb.repartition(13), m=4, k=4, iterations=2)
    assert cbs == cbs2  # training itself is partition-invariant
    b = sorted(
        (r.vec_id, tuple(r.codes))
        for r in pq_encode(emb.repartition(7), cbs2).collect()
    )
    assert a == b
