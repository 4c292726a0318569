"""One-shot timing sweep of EVERY registered query at $SPARK_GRAFT_SF_DIR.

Purpose (r11): find non-headline queries with pathological cost. One
noop-sink run per query (plus one untimed global warmup), bracketed every
10 queries by a small fixed CPU probe so ambient-load windows are visible.
Prints JSON {query: sec} to stdout, probe list to stderr.
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
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_session("ddp-time-all")
    materialize(spark.range(1_000_000).selectExpr("sum(id) as s"))

    def _passthrough(it):
        for pdf in it:
            yield pdf

    width = spark.sparkContext.defaultParallelism
    materialize(
        spark.range(width * 4).repartition(width).mapInPandas(_passthrough, "id long")
    )

    def probe() -> float:
        t0 = time.perf_counter()
        materialize(spark.range(500_000_000).selectExpr("sum(xxhash64(id) % 7) s"))
        return round(time.perf_counter() - t0, 3)

    out: dict[str, float] = {}
    probes: list[float] = [probe()]
    names = sys.argv[1:] or sorted(plans.QUERIES)
    for i, name in enumerate(names):
        fn = plans.QUERIES[name]
        try:
            t0 = time.perf_counter()
            materialize(fn(spark, sf_dir))
            out[name] = round(time.perf_counter() - t0, 3)
        except Exception as e:  # noqa: BLE001 -- sweep must finish
            out[name] = -1.0
            print(f"ERROR {name}: {e}", file=sys.stderr)
        if (i + 1) % 10 == 0:
            probes.append(probe())
    probes.append(probe())
    print(json.dumps({"probes": probes}), file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
