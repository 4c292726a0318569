"""Dump .explain("formatted") for named registry queries to files.

Usage: python tools/dump_plans.py <outdir> <suffix> [query ...]
       (no queries -> the bench HEADLINE list)

Writes <outdir>/<query>_<suffix>.txt for each query. These are the
committed evidence artifacts for optimization rounds (plans/r11/...).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dockerized_data_pipeline_spark import plans
from dockerized_data_pipeline_spark.session import get_session


def main() -> None:
    outdir = sys.argv[1]
    suffix = sys.argv[2]
    names = sys.argv[3:]
    if not names:
        import bench

        names = list(bench.HEADLINE)
    os.makedirs(outdir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_session("ddp-dump-plans")
    for name in names:
        df = plans.QUERIES[name](spark, sf_dir)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(txt)
        print(f"wrote {path} ({len(txt)} bytes)")


if __name__ == "__main__":
    main()
