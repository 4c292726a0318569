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

    t0 = time.time()
    DD.minhash_neardup_pairs_native(big, "doc_id", "text").count()
    results["minhash_pairs"] = round(time.time() - t0, 2)

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

    # Incremental dedup: 10% of the big corpus arrives as today's batch and
    # probes the signature index of the other 90% -- must cost O(batch).
    corpus = big.filter(F.col("doc_id") % 10 != 0)
    batch = big.filter(F.col("doc_id") % 10 == 0)
    corpus_sig = DD.minhash_signatures(
        corpus, "doc_id", "text", n=3, num_hashes=16
    ).localCheckpoint()
    _ = corpus_sig.count()  # index build excluded: it is the persisted state
    t0 = time.time()
    DD.incremental_neardup_pairs(corpus_sig, batch, "doc_id", "text").count()
    results["incremental_neardup"] = round(time.time() - t0, 2)

    # Centroid purity: component explode + broadcast dot join at 10x vectors
    # (same plan as the registered x3_centroid_purity, driven off the union).
    t0 = time.time()
    SIM.centroid_purity(bige).count()
    results["centroid_purity"] = round(time.time() - t0, 2)

    # SemDeDup pairs at Nx vectors: must track sum(c_i^2) over clusters,
    # never n^2. The documented 100 TB posture scales k WITH the corpus so
    # per-list sizes stay bounded (sum c_i^2 ~ n^2/k: linear-in-n cost
    # needs k ~ n) -- the probe does the same.
    n_lists = max(32, 32 * mult // 10)
    cents = [
        list(r[0])
        for r in emb.filter(F.col("vec_id") < n_lists).orderBy("vec_id")
        .select("embedding").collect()
    ]
    t0 = time.time()
    SIM.semantic_dedup_pairs(bige, cents, threshold=0.35).count()
    results["semantic_pairs"] = round(time.time() - t0, 2)

    # Incremental semantic dedup: 10% arriving batch probes the persisted
    # disk IVF index of the other 90% (index build excluded: persisted
    # state) -- partition-pruned corpus read + batch-touching pairs only.
    import tempfile

    ecorpus = bige.filter(F.col("vec_id") % 10 != 0)
    ebatch = bige.filter(F.col("vec_id") % 10 == 0)
    idx = tempfile.mkdtemp(prefix="scale_probe_") + "/ivf"
    SIM.build_ivf_index(ecorpus, cents, idx)
    t0 = time.time()
    SIM.semantic_dedup_incremental(spark, idx, ebatch, threshold=0.35).count()
    results["incremental_semantic"] = round(time.time() - t0, 2)

    # n-gram LM (r5 operator): count-table build over the 90% corpus, then
    # stupid-backoff scoring of the 10% batch against the persisted model
    # -- the vocab-keyed-join shape whose Python-side constants (if any)
    # would surface at this tier.
    from dockerized_data_pipeline_spark.operators import ngramlm as LM

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
                    sum(v for k, v in results.items() if not k.endswith("_ms")),
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
