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
    err = {}
    for k in (1, 8):
        cbs = pq_train(emb, m=4, k=k, iterations=3)
        err[k] = pq_reconstruction_mse_ppm(emb, cbs).collect()[0].total_err_fp6
    assert err[8] < err[1]  # k=1 is just the per-subspace mean


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


def test_ivfpq_recall_and_exactness_at_full_probe(spark, sf_dir):
    from dockerized_data_pipeline_spark.operators import kmeans as KM
    from dockerized_data_pipeline_spark.operators.pq import ivfpq_topk
    from dockerized_data_pipeline_spark.operators.similarity import cosine_topk

    emb = load_table(spark, sf_dir, "embeddings")
    qv = list(emb.orderBy("vec_id").first().embedding)
    coarse = KM.kmeans_fit(emb, k=4, iterations=2)
    cbs = pq_train(emb, m=4, k=8, iterations=2)

    exact = [r.vec_id for r in cosine_topk(emb, qv, k=10).collect()]
    # probing every list with a rerank pool >= corpus = exact answer
    full = [
        r.vec_id
        for r in ivfpq_topk(
            emb, qv, coarse, cbs, k=10, n_probe=4, rerank=10_000
        ).collect()
    ]
    assert full == exact

    # realistic pruning still recovers most of the true top-10 (and is
    # deterministic run-to-run)
    pruned1 = [
        r.vec_id
        for r in ivfpq_topk(emb, qv, coarse, cbs, k=10, n_probe=2, rerank=50).collect()
    ]
    pruned2 = [
        r.vec_id
        for r in ivfpq_topk(emb, qv, coarse, cbs, k=10, n_probe=2, rerank=50).collect()
    ]
    assert pruned1 == pruned2
    assert len(set(pruned1) & set(exact)) >= 5
