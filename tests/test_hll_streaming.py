"""Incremental maintenance of the portable HLL (operators/hll.py) under
Structured Streaming: each micro-batch appends its own register table
(at most m rows per group -- control-plane sized), and the estimate is
re-derived any time by max-merging all snapshots. This is the 100 TB
daily-rollup pattern: raw data is touched once per batch, distinct
counts for ANY union of batches come from the tiny register tables.

Equivalence is asserted BIT-EXACTLY against the single-pass batch
estimate over the union of all batches -- valid because register
max-merge is commutative/associative and the estimator is a pure
function of the merged registers (exact decimal harmonic sum)."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from dockerized_data_pipeline_spark.operators import hll

SCHEMA = T.StructType(
    [
        T.StructField("g", T.StringType()),
        T.StructField("k", T.LongType()),
    ]
)


def _rows(lo, hi):
    # overlapping key ranges across batches exercise the max-merge
    return [("a", i) for i in range(lo, hi)] + [("b", i * 7) for i in range(lo, hi)]


def _drain(spark, src, regdir, ckpt):
    stream = spark.readStream.schema(SCHEMA).parquet(src)

    def upd(bdf, _bid):
        if bdf.isEmpty():
            return
        hll.hll_registers(bdf, "k", ["g"]).write.mode("append").parquet(regdir)

    q = (
        stream.writeStream.foreachBatch(upd)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "availableNow drain timed out"


def test_hll_streaming_registers_equal_batch(spark, tmp_path):
    src = str(tmp_path / "src")
    regdir = str(tmp_path / "regs")
    ckpt = str(tmp_path / "ckpt")

    b1 = spark.createDataFrame(_rows(0, 400), SCHEMA)
    b2 = spark.createDataFrame(_rows(300, 900), SCHEMA)  # 100 overlapping
    b1.coalesce(1).write.mode("append").parquet(src)
    _drain(spark, src, regdir, ckpt)
    b2.coalesce(1).write.mode("append").parquet(src)
    _drain(spark, src, regdir, ckpt)

    merged = (
        spark.read.parquet(regdir)
        .groupBy("g", "reg_idx")
        .agg(F.max("reg").alias("reg"))
    )
    streamed = {
        tuple(r) for r in hll.hll_estimate(merged, ["g"]).collect()
    }
    batch = {
        tuple(r)
        for r in hll.hll_distinct(b1.unionByName(b2), "k", ["g"]).collect()
    }
    assert streamed == batch
    # and the estimate is actually close: exact distincts are 900 per group
    for _, est, _zero in streamed:
        assert abs(est - 900) / 900 <= 0.20, est
