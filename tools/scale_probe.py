"""Scale probe: run the heavy dedup/similarity paths -- and the real
media codec stages -- on an N-fold union of the sf0.1 fixtures to check
for parallelism cliffs that the per-query bench cannot see (single-task
stages, projection-collapse re-evaluation, hot buckets, super-linear
per-blob decode cost). Prints one JSON line.

Usage: python tools/scale_probe.py [multiplier] [section]
  multiplier  fixture fan-out factor (default 10)
  section     "llm" | "media" | "all" (default all)

The media section times ONLY the decode stage (blob synthesis is
materialized first into a 32-partition localCheckpoint, the layout a
32-file parquet media table would scan as) and reports per-blob
milliseconds -- the number that must stay FLAT across 10x/50x for the
"scan-bound, embarrassingly parallel" claim to hold.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.1"


def planted_docs(spark, n_fams: int, tokens: int = 60, vocab: int = 1_000_000):
    """Constant-multiplicity near-dup corpus (VERDICT r6 item 2): every
    family is 3 documents -- a base text of ``tokens`` random hash-derived
    words plus two variants each differing in exactly ONE token position.

    Planted pair output is therefore 3 * n_fams: LINEAR in corpus size at
    every multiplier, unlike the old N-fold fixture union where every doc
    had (mult-1) exact twins and candidate pairs grew quadratically in the
    multiplier -- so wall time measured output size, not operator scaling.
    Cross-family shingle overlap is ~0 (random tokens from a 1M vocab).
    Pure-expression generation: no driver-side data, no Python workers.

    doc_id = fam * 3 + variant."""
    from pyspark.sql import functions as F

    d = spark.range(n_fams).select(
        F.col("id").alias("fam"),
        F.explode(F.array(F.lit(0), F.lit(1), F.lit(2))).alias("v"),
    )
    pos = F.pmod(F.col("v") * 17 + F.col("fam"), F.lit(tokens))
    text = F.array_join(
        F.transform(
            F.sequence(F.lit(0), F.lit(tokens - 1)),
            lambda i: F.concat(
                F.lit("w"),
                F.pmod(
                    F.xxhash64(
                        F.col("fam"),
                        i,
                        F.when((F.col("v") > 0) & (i == pos), F.col("v"))
                        .otherwise(F.lit(0)),
                    ),
                    F.lit(vocab),
                ).cast("string"),
            ),
        ),
        " ",
    )
    return d.select(
        (F.col("fam") * 3 + F.col("v")).alias("doc_id"), text.alias("text")
    )


def planted_vecs(spark, n_fams: int, dim: int = 32):
    """Constant-multiplicity embedding corpus: per family one base vector
    (components uniform in [-1, 1] from xxhash64) and two variants with
    <=0.02 per-component perturbations -- within-family cosine >= 0.999,
    cross-family cosine ~ N(0, 1/sqrt(dim)). Planted pairs = 3 * n_fams.
    vec_id = fam * 3 + variant."""
    from pyspark.sql import functions as F

    d = spark.range(n_fams).select(
        F.col("id").alias("fam"),
        F.explode(F.array(F.lit(0), F.lit(1), F.lit(2))).alias("v"),
    )
    emb = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda j: (
            (F.pmod(F.xxhash64(F.col("fam"), j), F.lit(2001)) - 1000)
            / F.lit(1000.0)
            + F.when(
                F.col("v") > 0,
                F.pmod(F.xxhash64(F.col("fam"), j, F.col("v")), F.lit(1000))
                / F.lit(50_000.0),
            ).otherwise(F.lit(0.0))
        ).cast("double"),
    )
    return d.select(
        (F.col("fam") * 3 + F.col("v")).alias("vec_id"),
        emb.alias("embedding"),
        F.pmod(F.col("fam"), F.lit(10)).cast("int").alias("label"),
    )


def _llm_stages(spark, results: dict, mult: int) -> int:
    from pyspark.sql import functions as F

    from dockerized_data_pipeline_spark.functions import text as TX
    from dockerized_data_pipeline_spark.operators import dedup as DD
    from dockerized_data_pipeline_spark.operators import similarity as SIM

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    big = docs
    for i in range(1, mult):
        big = big.unionByName(
            docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * 1_000_000))
        )
    big = big.repartition(32).localCheckpoint()
    n_docs = big.count()

    # pair-producing stages run on the PLANTED corpus (3 docs per family,
    # exactly 3 near-dup pairs per family at any scale)
    planted = planted_docs(spark, n_docs // 3).repartition(32).localCheckpoint()
    n_planted = planted.count()
    planted_pairs = 3 * (n_planted // 3)

    t0 = time.time()
    found = DD.minhash_neardup_pairs_native(planted, "doc_id", "text").count()
    dt = time.time() - t0
    results["minhash_pairs"] = round(dt, 2)
    results["minhash_pairs_found"] = found
    results["minhash_recall_pct"] = round(100.0 * found / planted_pairs, 1)
    results["minhash_ms_per_doc"] = round(dt * 1000.0 / n_planted, 3)
    results["minhash_ms_per_pair"] = round(dt * 1000.0 / max(found, 1), 3)
    assert found >= 0.8 * planted_pairs, (
        f"minhash recall collapsed: {found}/{planted_pairs}"
    )

    t0 = time.time()
    TX.winnow_exploded(big, "doc_id", "text").count()
    results["winnow_exploded"] = round(time.time() - t0, 2)

    t0 = time.time()
    DD.exact_dedup(big, ["text"]).count()
    results["exact_dedup"] = round(time.time() - t0, 2)

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    bige = emb
    for i in range(1, mult):
        bige = bige.unionByName(
            emb.withColumn("vec_id", F.col("vec_id") + F.lit(i * 10_000_000))
        )
    bige = bige.repartition(32).localCheckpoint()
    probe = emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    t0 = time.time()
    SIM.cosine_topk(bige, probe, k=10).count()
    results["cosine_topk"] = round(time.time() - t0, 2)

    # Incremental dedup on the planted corpus: each family's v2 doc
    # arrives as the batch and has exactly 2 partners (v0, v1) in the
    # index -- batch-vs-corpus pair output is 2 per family, linear.
    p_corpus = planted.filter(F.col("doc_id") % 3 != 2)
    p_batch = planted.filter(F.col("doc_id") % 3 == 2)
    corpus_sig = DD.minhash_signatures(
        p_corpus, "doc_id", "text", n=3, num_hashes=16
    ).localCheckpoint()
    _ = corpus_sig.count()  # index build excluded: it is the persisted state
    t0 = time.time()
    inc_found = DD.incremental_neardup_pairs(
        corpus_sig, p_batch, "doc_id", "text"
    ).count()
    dt = time.time() - t0
    results["incremental_neardup"] = round(dt, 2)
    results["incremental_neardup_found"] = inc_found
    results["incremental_neardup_ms_per_batch_doc"] = round(
        dt * 1000.0 / max(p_batch.count(), 1), 3
    )

    # Centroid purity: component explode + broadcast dot join at 10x vectors
    # (same plan as the registered x3_centroid_purity, driven off the union).
    t0 = time.time()
    SIM.centroid_purity(bige).count()
    results["centroid_purity"] = round(time.time() - t0, 2)

    # SemDeDup pairs at Nx vectors on the PLANTED embeddings (3 planted
    # pairs per family, linear in n): must track sum(c_i^2) over clusters,
    # never n^2. The documented 100 TB posture scales k WITH the corpus so
    # per-list sizes stay bounded (sum c_i^2 ~ n^2/k: linear-in-n cost
    # needs k ~ n) -- the probe does the same.
    pvecs = planted_vecs(spark, n_docs // 3).repartition(32).localCheckpoint()
    n_pvecs = pvecs.count()
    pv_pairs = 3 * (n_pvecs // 3)
    n_lists = max(32, 32 * mult // 10)
    cents = [
        list(r[0])
        for r in pvecs.filter(F.col("vec_id") % 3 == 0)
        .orderBy("vec_id").limit(n_lists).select("embedding").collect()
    ]
    t0 = time.time()
    sem_found = SIM.semantic_dedup_pairs(pvecs, cents, threshold=0.95).count()
    dt = time.time() - t0
    results["semantic_pairs"] = round(dt, 2)
    results["semantic_pairs_found"] = sem_found
    results["semantic_recall_pct"] = round(100.0 * sem_found / pv_pairs, 1)
    results["semantic_ms_per_vec"] = round(dt * 1000.0 / n_pvecs, 3)
    results["semantic_ms_per_pair"] = round(dt * 1000.0 / max(sem_found, 1), 3)

    # Incremental semantic dedup: each family's v2 vector arrives as the
    # batch and probes the persisted disk IVF index of v0+v1 (index build
    # excluded: persisted state) -- partition-pruned corpus read +
    # batch-touching pairs only; 2 planted pairs per family, linear.
    import tempfile

    ecorpus = pvecs.filter(F.col("vec_id") % 3 != 2)
    ebatch = pvecs.filter(F.col("vec_id") % 3 == 2)
    idx = tempfile.mkdtemp(prefix="scale_probe_") + "/ivf"
    SIM.build_ivf_index(ecorpus, cents, idx)
    t0 = time.time()
    inc_sem = SIM.semantic_dedup_incremental(
        spark, idx, ebatch, threshold=0.95
    ).count()
    dt = time.time() - t0
    results["incremental_semantic"] = round(dt, 2)
    results["incremental_semantic_found"] = inc_sem
    results["incremental_semantic_ms_per_batch_vec"] = round(
        dt * 1000.0 / max(n_pvecs // 3, 1), 3
    )

    # n-gram LM (r5 operator): count-table build over 90% of the UNION
    # corpus (real text, where vocabulary saturates -- the sublinearity
    # claim is about realistic token distributions, so the planted
    # random-token corpus would be the wrong fixture here), then
    # stupid-backoff scoring of the 10% batch against the persisted model.
    from dockerized_data_pipeline_spark.operators import ngramlm as LM

    corpus = big.filter(F.col("doc_id") % 10 != 0)
    batch = big.filter(F.col("doc_id") % 10 == 0)
    t0 = time.time()
    uni, bi, total = LM.train_bigram_lm(corpus)
    uni = uni.localCheckpoint()
    bi = bi.localCheckpoint()
    total = total.localCheckpoint()
    results["lm_train"] = round(time.time() - t0, 2)
    t0 = time.time()
    LM.score_documents(batch, uni, bi, total).count()
    results["lm_score_batch"] = round(time.time() - t0, 2)
    return n_docs


def _media_stages(spark, results: dict, mult: int) -> int:
    """Per-codec decode cost at mult-x blob counts. Each codec's blobs
    are synthesized once into a 32-partition in-memory checkpoint; the
    timed stage is decode ONLY. A flat <codec>_per_blob_ms across
    multipliers = linear scaling (VERDICT r4 round-5 item 6)."""
    from pyspark.sql import functions as F

    from dockerized_data_pipeline_spark.functions import multimodal as MM

    ids = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id")
    big = ids
    for i in range(1, mult):
        big = big.unionByName(
            ids.withColumn("doc_id", F.col("doc_id") + F.lit(i * 1_000_000))
        )
    big = big.repartition(32).localCheckpoint()
    n_blobs = big.count()

    codecs = [
        ("jpeg", MM.jpeg_media, MM.decode_jpeg),
        ("jpeg_dc_thumb", MM.jpeg_media, MM.decode_jpeg_thumbnail),
        ("jpeg_color", MM.jpeg_color_media, MM.decode_jpeg_color),
        ("jpeg_progressive", MM.jpeg_progressive_media, MM.decode_jpeg_progressive),
        ("png", MM.png_media, MM.decode_png),
        ("y4m_motion", MM.y4m_media, MM.y4m_frame_motion),
    ]
    blobs_cache: dict = {}
    for name, make_media, decode in codecs:
        key = make_media.__name__
        if key not in blobs_cache:
            blobs_cache[key] = make_media(big).localCheckpoint()
            blobs_cache[key].count()  # materialize: synthesis excluded
        media = blobs_cache[key]
        t0 = time.time()
        decode(media).count()
        dt = time.time() - t0
        results[name] = round(dt, 2)
        results[f"{name}_per_blob_ms"] = round(dt * 1000.0 / n_blobs, 3)
    for df in blobs_cache.values():
        df.unpersist()
    return n_blobs


def main() -> int:
    mult = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    section = sys.argv[2] if len(sys.argv) > 2 else "all"

    from dockerized_data_pipeline_spark.session import get_session

    spark = get_session("scale-probe")
    spark.sparkContext.setLogLevel("ERROR")

    results: dict[str, float] = {}
    n_docs = 0
    if section in ("all", "llm"):
        n_docs = _llm_stages(spark, results, mult)
    n_blobs = 0
    if section in ("all", "media"):
        n_blobs = _media_stages(spark, results, mult)

    print(
        json.dumps(
            {
                "metric": "scale_probe_total",
                "value": round(
                    sum(
                        v
                        for k, v in results.items()
                        if not (
                            k.endswith(("_ms", "_found", "_pct"))
                            or "_ms_per_" in k
                        )
                    ),
                    2,
                ),
                "unit": "sec",
                "stages": results,
                "n_docs": n_docs,
                "n_blobs": n_blobs,
                "multiplier": mult,
                "section": section,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
