"""Streaming long-horizon probe (VERDICT r8 item 5).

Batch scaling is measured (tools/scale_validate.py) but streaming STATE
growth was not: a continuously-merging pipeline can look flat for 50
batches and degrade once the target table / sketch state accumulates.
This probe drives a REAL Structured Streaming query (file source,
maxFilesPerTrigger=1, Trigger.AvailableNow) through 200+ micro-batches
of the engine's signature sink pattern:

  foreachBatch -> merge_upsert_partitioned (keyed, partition-pruned)
               -> incremental portable-HLL register append
               -> register compaction every COMPACT_EVERY batches

with a GROWING keyspace: each batch updates a few hot symbols and
introduces new ones, so the target table's partition count and the HLL
state both grow linearly across the run -- per-batch cost must NOT.

Per batch it records wall latency, partitions rewritten, target
file/byte footprint, and register-state footprint; at the end it fits
the latency trend (last-quartile mean / second-quartile mean) and
CROSS-CHECKS correctness: merged target row count == exact expectation,
and the compacted HLL estimate equals the single-pass batch estimate
over all data BIT-EXACTLY (register max-merge is associative).

Usage: python tools/stream_soak_probe.py [n_batches] [out_json]
Writes STREAM_SOAK_r9.json (committed per round).
"""

from __future__ import annotations

import datetime as dt
import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F
from pyspark.sql import types as T

from dockerized_data_pipeline_spark.operators import hll
from dockerized_data_pipeline_spark.operators.merge import merge_upsert_partitioned
from dockerized_data_pipeline_spark.session import get_session

SCHEMA = T.StructType(
    [
        T.StructField("symbol", T.StringType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("close_price", T.DoubleType()),
        T.StructField("last_refreshed", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
    ]
)

ROWS_PER_BATCH = 400
HOT_SYMBOLS = 3          # every batch touches these (updates)
NEW_SYMBOLS_EVERY = 2    # a new symbol appears every N batches
COMPACT_EVERY = 25


def batch_rows(i: int):
    """Batch i: updates to 3 hot symbols + appends to the newest cold
    symbol; keyspace (symbols AND users) grows with i."""
    base = dt.datetime(2024, 1, 1) + dt.timedelta(hours=i)
    rows = []
    n_sym = HOT_SYMBOLS + i // NEW_SYMBOLS_EVERY + 1
    syms = [f"HOT{j}" for j in range(HOT_SYMBOLS)] + [f"SYM{n_sym:04d}"]
    for r in range(ROWS_PER_BATCH):
        sym = syms[r % len(syms)]
        rows.append(
            (
                sym,
                base + dt.timedelta(seconds=(r // len(syms)) * 60),
                100.0 + (i * 31 + r) % 97,
                base,
                # users: overlapping, slowly-growing population
                (i * 137 + r * 11) % (5_000 + i * 40),
            )
        )
    return rows


def dir_stats(path: str) -> tuple[int, int]:
    files = bytes_ = 0
    for root, _dirs, names in os.walk(path):
        for n in names:
            if n.startswith(("_", ".")):
                continue
            files += 1
            bytes_ += os.path.getsize(os.path.join(root, n))
    return files, bytes_


def main() -> int:
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 220
    out_json = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        REPO, "STREAM_SOAK_r9.json"
    )
    work = "/tmp/spark_graft_stream_soak"
    shutil.rmtree(work, ignore_errors=True)
    src = os.path.join(work, "src")
    target = os.path.join(work, "target")
    regdir = os.path.join(work, "hll_regs")
    ckpt = os.path.join(work, "ckpt")
    os.makedirs(regdir, exist_ok=True)

    spark = get_session("stream-soak", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    # Pre-write one parquet file per micro-batch.
    print(f"writing {n_batches} source files ...", flush=True)
    for i in range(n_batches):
        spark.createDataFrame(batch_rows(i), SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(src)
    # one file per trigger => exactly n_batches micro-batches
    n_src_files = len(
        [f for f in os.listdir(src) if f.endswith(".parquet")]
    )
    assert n_src_files == n_batches, n_src_files

    metrics: list[dict] = []

    def write_batch(bdf, epoch_id: int) -> None:
        if bdf.isEmpty():
            return
        t0 = time.perf_counter()
        bdf = bdf.localCheckpoint(eager=True)  # source read out of the timing split
        res = merge_upsert_partitioned(
            spark,
            target,
            bdf,
            keys=["symbol", "ts"],
            partition_col="symbol",
            batch_order_by=["last_refreshed"],
        )
        t_merge = time.perf_counter()
        hll.hll_registers(bdf, "user_id", ["symbol"]).write.mode(
            "append"
        ).parquet(regdir)
        compacted = False
        if (epoch_id + 1) % COMPACT_EVERY == 0:
            # max-merge every snapshot into one register table; atomic swap
            merged = (
                spark.read.parquet(regdir)
                .groupBy("symbol", "reg_idx")
                .agg(F.max("reg").alias("reg"))
            )
            tmp = regdir + ".compact"
            shutil.rmtree(tmp, ignore_errors=True)
            merged.coalesce(1).write.parquet(tmp)
            old = regdir + ".old"
            os.rename(regdir, old)
            os.rename(tmp, regdir)
            shutil.rmtree(old)
            compacted = True
        t_end = time.perf_counter()
        tf, tb = dir_stats(target)
        rf, rb = dir_stats(regdir)
        metrics.append(
            {
                "batch": int(epoch_id),
                "latency_sec": round(t_end - t0, 3),
                "merge_sec": round(t_merge - t0, 3),
                "hll_sec": round(t_end - t_merge, 3),
                "partitions_rewritten": res["partitions_rewritten"],
                "compacted": compacted,
                "target_files": tf,
                "target_mb": round(tb / 1e6, 2),
                "reg_files": rf,
                "reg_mb": round(rb / 1e6, 3),
            }
        )

    q = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(write_batch)
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    t_run0 = time.perf_counter()
    q.awaitTermination()
    wall = time.perf_counter() - t_run0
    assert len(metrics) == n_batches, (len(metrics), n_batches)

    # ---- correctness cross-checks -------------------------------------
    all_src = spark.read.parquet(src)
    expected_keys = all_src.select("symbol", "ts").distinct().count()
    got_rows = spark.read.parquet(target).count()
    assert got_rows == expected_keys, (got_rows, expected_keys)

    # compacted+appended registers == single-pass registers, bit-exact
    inc_est = {
        tuple(r)
        for r in hll.hll_estimate(
            spark.read.parquet(regdir)
            .groupBy("symbol", "reg_idx")
            .agg(F.max("reg").alias("reg")),
            ["symbol"],
        ).collect()
    }
    batch_est = {
        tuple(r) for r in hll.hll_distinct(all_src, "user_id", ["symbol"]).collect()
    }
    assert inc_est == batch_est, "incremental HLL diverged from single-pass"

    # ---- flatness analysis --------------------------------------------
    lats = [m["latency_sec"] for m in metrics if not m["compacted"]]
    quart = len(lats) // 4
    q2 = sum(lats[quart : 2 * quart]) / quart
    q4 = sum(lats[-quart:]) / quart
    ratio = q4 / q2
    n_syms_final = HOT_SYMBOLS + (n_batches - 1) // NEW_SYMBOLS_EVERY + 1
    report = {
        "n_batches": n_batches,
        "rows_per_batch": ROWS_PER_BATCH,
        "final_symbols": n_syms_final,
        "final_target_rows": got_rows,
        "wall_sec": round(wall, 1),
        "latency_q2_mean_sec": round(q2, 3),
        "latency_q4_mean_sec": round(q4, 3),
        "q4_over_q2": round(ratio, 3),
        "flat": ratio < 1.3,
        "hll_incremental_equals_batch": True,
        "target_rows_exact": True,
        "per_batch": metrics,
    }
    with open(out_json, "w") as f:
        json.dump(report, f, indent=1)
    head = {k: v for k, v in report.items() if k != "per_batch"}
    print(json.dumps(head, indent=1))
    return 0 if report["flat"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
