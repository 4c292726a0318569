"""Media-tier scale probe (VERDICT r9 task 5).

The x4 codec family (7 real codecs) had no evidence above sf0.1 -- the
only family with zero sf1+ measurements. This probe runs the three
heaviest codecs (baseline-color JPEG, progressive JPEG, Y4M video)
across three scaling axes and records per-blob / per-byte decode cost:

  * blob count: sf0.1 docs (5k blobs) vs the generated sf1 tier
    (50k blobs) -- the "more files" axis of a real media corpus
  * blob size: SPARK_GRAFT_MEDIA_DIM_SCALE in {1, 2, 4} at sf0.1
    (payload grows ~scale^2; per-BYTE cost must be flat-or-falling)
  * Arrow batch size: spark.sql.execution.arrow.maxRecordsPerBatch in
    {64, 1024, 10000} for the y4m decode (batching-overhead sensitivity)

Each configuration runs in its OWN subprocess (the dim-scale knob and
Arrow conf are read at import/session start). Correctness inside the
scaled series: the oracle covers dim scale 1 (the registered queries);
at scale 2/4 the REAL container parsers verify structure (a dims bug
breaks the parse), and the y4m plane sums are additionally checked
against an independent numpy re-derivation for a sample of blobs.

Usage: python tools/media_scale_probe.py            # full matrix
       python tools/media_scale_probe.py --single <json-config>
Output: MEDIA_SCALE_r10.json at the repo root.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF1_TIER = "/tmp/spark_graft_scale/sf1"

QUERIES = {
    "jpeg_color": "x4_jpeg_color_decode",
    "jpeg_progressive": "x4_jpeg_progressive_decode",
    "y4m": "x4_y4m_decode",
}


def _run_single(cfg: dict) -> None:
    sys.path.insert(0, REPO)
    from pyspark.sql import SparkSession

    b = SparkSession.builder.master(
        f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
    ).config("spark.sql.shuffle.partitions", "32").config(
        "spark.ui.enabled", "false"
    ).config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    if cfg.get("arrow_batch"):
        b = b.config(
            "spark.sql.execution.arrow.maxRecordsPerBatch", str(cfg["arrow_batch"])
        )
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry_mod

    fn = entry_mod.queries()[QUERIES[cfg["codec"]]]
    sf_dir = cfg["sf_dir"]

    def materialize():
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()

    materialize()  # warm: codegen + python worker fleet
    times = []
    for _ in range(cfg.get("reps", 2)):
        t0 = time.perf_counter()
        materialize()
        times.append(round(time.perf_counter() - t0, 3))

    import duckdb

    doc_path = os.path.join(sf_dir, "documents.parquet")
    if os.path.isdir(doc_path):
        doc_path = os.path.join(doc_path, "*.parquet")
    n_blobs = duckdb.sql(
        f"SELECT COUNT(*) FROM read_parquet('{doc_path}')"
    ).fetchone()[0]

    result = {**cfg, "n_blobs": int(n_blobs), "times_sec": times,
              "best_sec": min(times)}

    # y4m numpy self-check at scaled dims: decode stats for a 32-blob
    # sample must equal the independent plane re-derivation
    if cfg["codec"] == "y4m" and cfg.get("dim_scale", 1) != 1:
        import numpy as np

        from dockerized_data_pipeline_spark.functions import multimodal as MM

        rows = (
            fn(spark, sf_dir).filter("media_id < 32").orderBy("media_id").collect()
        )
        checked = 0
        for r in rows:
            w, h = MM._y4m_dims(r.media_id)
            n = MM._y4m_frame_count(r.media_id)
            ys = uvs = 0
            for t in range(n):
                y, u, v = MM._y4m_planes(r.media_id, t)
                ys += int(y.astype(np.int64).sum())
                uvs += int(u.astype(np.int64).sum() + v.astype(np.int64).sum())
            assert (r.width, r.height, r.n_frames) == (w, h, n), r
            assert (r.y_sum, r.uv_sum) == (ys, uvs), r
            checked += 1
        result["y4m_selfcheck_blobs"] = checked
    print("RESULT " + json.dumps(result), flush=True)
    spark.stop()


def _run_mb(cfg: dict) -> None:
    """MB-blob tier (r11, VERDICT task 9): real media corpora carry
    MB-scale blobs, where Arrow batch sizing is what bounds executor
    memory (a 10k-row default batch of 2 MB blobs is 20 GB in flight).
    Generates N y4m blobs at SPARK_GRAFT_MEDIA_DIM_SCALE large enough
    for MB payloads, decodes through the SAME mapInPandas path the
    registered queries use, under a CONSTRAINED driver heap + small
    maxRecordsPerBatch -- proving the spill/memory floor holds and
    per-byte decode cost stays flat as blobs grow 3 orders of magnitude
    past the fixture sizes. Blob bytes are derived analytically from the
    deterministic generator (no double-encode)."""
    sys.path.insert(0, REPO)
    from pyspark.sql import SparkSession

    b = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", cfg.get("driver_mem", "6g"))
        .config(
            "spark.sql.execution.arrow.maxRecordsPerBatch",
            str(cfg.get("arrow_batch", 16)),
        )
    )
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    from dockerized_data_pipeline_spark.functions import multimodal as MM

    n = cfg["n_blobs"]
    ids = spark.range(n).withColumnRenamed("id", "doc_id")
    media = MM.y4m_media(ids, "doc_id")

    def materialize():
        MM.decode_y4m(media).write.format("noop").mode("overwrite").save()

    total_bytes = 0
    for mid in range(n):
        w, h = MM._y4m_dims(mid)
        total_bytes += MM._y4m_frame_count(mid) * (w * h * 3 // 2 + 6)
    materialize()  # warm
    times = []
    for _ in range(cfg.get("reps", 2)):
        t0 = time.perf_counter()
        materialize()
        times.append(round(time.perf_counter() - t0, 3))
    # numpy self-check on a small sample (same as the dims axis)
    import numpy as np

    rows = MM.decode_y4m(media.filter("media_id < 8")).orderBy("media_id").collect()
    for r in rows:
        w, h = MM._y4m_dims(r.media_id)
        nf = MM._y4m_frame_count(r.media_id)
        ys = uvs = 0
        for t in range(nf):
            y, u, v = MM._y4m_planes(r.media_id, t)
            ys += int(y.astype(np.int64).sum())
            uvs += int(u.astype(np.int64).sum() + v.astype(np.int64).sum())
        assert (r.width, r.height, r.n_frames) == (w, h, nf), r
        assert (r.y_sum, r.uv_sum) == (ys, uvs), r
    result = {
        **cfg,
        "total_mb": round(total_bytes / 1e6, 1),
        "avg_blob_mb": round(total_bytes / n / 1e6, 3),
        "times_sec": times,
        "best_sec": min(times),
        "mb_per_sec": round(total_bytes / 1e6 / min(times), 1),
        "selfcheck_blobs": len(rows),
    }
    print("RESULT " + json.dumps(result), flush=True)
    spark.stop()


MB_CONFIGS = [
    # ~1.5 MB avg blobs, ~600 MB corpus, 6g heap, tiny batches
    {"mode": "mb", "n_blobs": 400, "dim_scale": 64, "arrow_batch": 8,
     "driver_mem": "6g", "label": "mb1.5-batch8"},
    # same tier, 64-row batches: ~32 blobs x 1.5 MB in flight per slot
    {"mode": "mb", "n_blobs": 400, "dim_scale": 64, "arrow_batch": 64,
     "driver_mem": "6g", "label": "mb1.5-batch64"},
    # ~6 MB avg blobs -- the "single large asset" regime. 192 blobs =
    # 6 per local[32] slot: a 100-blob first run read 183 MB/s purely
    # from slot under-fill (3 blobs/slot, dim-skewed), not decode cost.
    {"mode": "mb", "n_blobs": 192, "dim_scale": 128, "arrow_batch": 4,
     "driver_mem": "6g", "label": "mb6-batch4"},
    # same tier, 16-row batches (110 MB Arrow batches): separates
    # per-batch transfer overhead from per-byte decode cost
    {"mode": "mb", "n_blobs": 192, "dim_scale": 128, "arrow_batch": 16,
     "driver_mem": "6g", "label": "mb6-batch16"},
]


def main() -> int:
    if "--single" in sys.argv:
        cfg = json.loads(sys.argv[sys.argv.index("--single") + 1])
        if cfg.get("mode") == "mb":
            _run_mb(cfg)
        else:
            _run_single(cfg)
        return 0
    if "--mb" in sys.argv:
        results = []
        for cfg in MB_CONFIGS:
            env = dict(os.environ)
            env["SPARK_GRAFT_MEDIA_DIM_SCALE"] = str(cfg["dim_scale"])
            p = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--single",
                 json.dumps(cfg)],
                stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
                env=env, timeout=3600,
            )
            line = next(
                (ln for ln in p.stdout.splitlines() if ln.startswith("RESULT ")),
                None,
            )
            if line is None:
                results.append({**cfg, "error": f"rc={p.returncode}"})
                print(f"FAIL {cfg}", flush=True)
                continue
            r = json.loads(line[len("RESULT "):])
            results.append(r)
            print(f"OK {r['label']}: {r['best_sec']}s ({r['mb_per_sec']} MB/s, "
                  f"{r['avg_blob_mb']} MB/blob)", flush=True)
        out = os.path.join(REPO, "MEDIA_MB_r11.json")
        with open(out, "w") as f:
            json.dump({"results": results}, f, indent=1)
        print(f"written {out}")
        return 0

    configs = []
    for codec in QUERIES:
        configs.append({"codec": codec, "sf_dir": "/root/testdata/sf0.1",
                        "axis": "count", "label": "sf0.1"})
        if os.path.isdir(SF1_TIER):
            configs.append({"codec": codec, "sf_dir": SF1_TIER,
                            "axis": "count", "label": "sf1"})
    for scale in (2, 4):
        configs.append({"codec": "y4m", "sf_dir": "/root/testdata/sf0.1",
                        "axis": "dims", "dim_scale": scale,
                        "label": f"sf0.1-dims{scale}x"})
        configs.append({"codec": "jpeg_color", "sf_dir": "/root/testdata/sf0.1",
                        "axis": "dims", "dim_scale": scale,
                        "label": f"sf0.1-dims{scale}x"})
    for ab in (64, 1024, 10000):
        configs.append({"codec": "y4m", "sf_dir": "/root/testdata/sf0.1",
                        "axis": "arrow_batch", "arrow_batch": ab,
                        "label": f"sf0.1-arrow{ab}"})

    results = []
    for cfg in configs:
        env = dict(os.environ)
        if cfg.get("dim_scale"):
            env["SPARK_GRAFT_MEDIA_DIM_SCALE"] = str(cfg["dim_scale"])
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--single",
             json.dumps(cfg)],
            stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
            env=env, timeout=3600,
        )
        line = next(
            (ln for ln in p.stdout.splitlines() if ln.startswith("RESULT ")),
            None,
        )
        if line is None:
            results.append({**cfg, "error": f"rc={p.returncode}"})
            print(f"FAIL {cfg}", flush=True)
            continue
        r = json.loads(line[len("RESULT "):])
        r["per_blob_us"] = round(r["best_sec"] * 1e6 / r["n_blobs"], 1)
        results.append(r)
        print(f"OK {r['codec']} {r['label']}: {r['best_sec']}s "
              f"({r['per_blob_us']}us/blob)", flush=True)

    out = os.path.join(REPO, "MEDIA_SCALE_r10.json")
    with open(out, "w") as f:
        json.dump({"results": results}, f, indent=1)
    print(f"written {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
