"""Targeted query timer for perf bisects: times a named subset of registry
queries at $SPARK_GRAFT_SF_DIR (default sf0.1) with the same warmup +
median-of-3 protocol as bench.py, without the full headline sweep.

Usage: python tools/time_queries.py q1 q2 ...  [env SPARK_GRAFT_REPEAT=N]
Prints one JSON line {name: median_sec} plus raw runs on stderr.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dockerized_data_pipeline_spark import plans
from dockerized_data_pipeline_spark.session import get_session


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    repeat = int(os.environ.get("SPARK_GRAFT_REPEAT", "3"))
    spark = get_session("ddp-time-queries")
    materialize(spark.range(1_000_000).selectExpr("sum(id) as s"))
    materialize(spark.read.parquet(os.path.join(sf_dir, "region.parquet")))

    def _passthrough(it):
        for pdf in it:
            yield pdf

    width = spark.sparkContext.defaultParallelism
    materialize(
        spark.range(width * 4).repartition(width).mapInPandas(_passthrough, "id long")
    )
    # one throwaway execution of each target query (codegen/IO warm)
    for name in names:
        materialize(plans.QUERIES[name](spark, sf_dir))

    out: dict[str, float] = {}
    raw: dict[str, list[float]] = {}
    for name in names:
        runs = []
        for _ in range(repeat):
            t0 = time.perf_counter()
            materialize(plans.QUERIES[name](spark, sf_dir))
            runs.append(round(time.perf_counter() - t0, 3))
        raw[name] = runs
        out[name] = sorted(runs)[len(runs) // 2]
    print(json.dumps(raw), file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
