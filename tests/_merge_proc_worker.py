"""Subprocess worker for tests/test_merge_contention.py.

Runs a REAL ``merge_upsert_path`` (Spark read-merge-write + versioned
CAS publish) from its own OS process with its own SparkSession/JVM --
the two-pipelines-one-table ops reality (VERDICT r9 task 7). The parent
starts two of these racing on the same target; the transaction protocol
must re-merge the loser's batch onto the winner's table so neither
batch is lost.

Not a pytest file (no ``test_`` prefix): invoked as
``python _merge_proc_worker.py <target> <tag> <overlap_value> <go_file>``.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(target: str, tag: str, overlap_value: str, go_file: str) -> None:
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[2]")
        .appName(f"merge-writer-{tag}")
        .config("spark.sql.shuffle.partitions", "2")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "1g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from dockerized_data_pipeline_spark.operators.merge import merge_upsert_path

    # 3 writer-private keys + the shared contended key "X"
    rows = [(f"{tag}_{i}", f"v_{tag}_{i}") for i in range(3)]
    rows.append(("X", overlap_value))
    batch = spark.createDataFrame(rows, "k string, v string")

    # barrier: both workers finish Spark startup BEFORE either merges,
    # so the merge/publish windows actually overlap
    while not os.path.exists(go_file):
        time.sleep(0.01)

    merge_upsert_path(spark, target, batch, keys=["k"])
    print(f"DONE {tag}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main(*sys.argv[1:])
