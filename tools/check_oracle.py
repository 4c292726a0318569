"""Local replica of the driver's oracle-differential check.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` counterpart
on DuckDB at the given scale factor, then compares row count, column names,
and an order-insensitive multiset of normalized row values.

Driver-faithful normalization (VERDICT r2 item 2): the driver coerces DuckDB
DECIMAL and HUGEINT result columns to float64 (pandas-style) while Spark
Decimal values surface as ``decimal.Decimal`` objects, so the two sides are
normalized ASYMMETRICALLY here — duck-side Decimal/HUGEINT become float64,
spark-side Decimal keeps a distinct ``dec:`` tag.  Consequence: a query whose
Spark output contains a Decimal column can never hash-match, which is exactly
the driver's behavior (all 10 CORRECTNESS_r02 reds).  Such queries are also
flagged explicitly as PORT (portability) failures even when values agree.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import datetime
import decimal
import math
import os
import sys
import time
import traceback

sys.path.insert(0, "/root/repo")

import duckdb

SF_DIR = "/root/testdata/sf0.01"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def norm_value(v, duck=False):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, decimal.Decimal):
        # Driver semantics: DuckDB DECIMAL results are coerced to float64;
        # Spark Decimal objects are NOT (they stay distinct -> hash mismatch).
        return repr(float(v)) if duck else f"dec:{v}"
    if isinstance(v, datetime.datetime):
        if v.tzinfo is not None:
            v = v.astimezone(datetime.timezone.utc).replace(tzinfo=None)
        return v.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, bool):
        return f"bool:{v}"
    if isinstance(v, (list, tuple)):
        return tuple(norm_value(x, duck) for x in v)
    return v


def rows_multiset(cols, rows, duck=False, float_cols=frozenset()):
    import collections

    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return collections.Counter(
        tuple(
            norm_value(
                float(r[i])
                if i in float_cols and r[i] is not None and not isinstance(r[i], float)
                else r[i],
                duck,
            )
            for i in idx
        )
        for r in rows
    ), [cols[i] for i in idx]


def main() -> int:
    args = sys.argv[1:]
    sf_dir = SF_DIR
    if args and "/" in args[0]:
        sf_dir, args = args[0], args[1:]

    import __spark_entry__ as entry_mod
    from dockerized_data_pipeline_spark.session import get_session

    spark = get_session("oracle-check")
    con = duckdb.connect()
    # Scale-tier safety (used by tools/scale_oracle.py): an unbounded
    # DuckDB happily grows to ~80% of RAM on a heavy CTE replay (observed
    # 106 GB at sf1), starving the Spark JVM on the same box. With a cap +
    # temp_directory it spills instead.
    duck_mem = os.environ.get("SPARK_GRAFT_DUCK_MEM")
    if duck_mem:
        spill = os.environ.get("SPARK_GRAFT_DUCK_TEMP", "/tmp/duck_spill")
        os.makedirs(spill, exist_ok=True)
        con.execute(f"SET memory_limit='{duck_mem}'")
        con.execute(f"SET temp_directory='{spill}'")
    # DuckDB 1.0's PARALLEL window operator returns nondeterministically
    # WRONG results when partition/order keys contain NULLs (observed on
    # the r10 NULL-injected tier: 6 runs of the same windowed CTE -> 6
    # different outputs; single-threaded execution is stable and honors
    # NULLS FIRST). NULL-bearing tiers must set SPARK_GRAFT_DUCK_THREADS=1.
    duck_threads = os.environ.get("SPARK_GRAFT_DUCK_THREADS")
    if duck_threads:
        con.execute(f"SET threads={int(duck_threads)}")
    for t in TABLES:
        # gen_scale tiers store each table as a DIRECTORY of part files;
        # the driver fixtures are single files. Glob directories for duck.
        path = f"{sf_dir}/{t}.parquet"
        src = f"{path}/*.parquet" if os.path.isdir(path) else path
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    names = args or list(qs)
    n_pass = n_fail = n_rowsonly = 0
    for name in names:
        t0 = time.time()
        try:
            sdf = qs[name](spark, sf_dir)
            s_cols = sdf.columns
            s_port = [
                f.name for f in sdf.schema.fields
                if "decimal" in f.dataType.simpleString()
            ]
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception:
            print(f"FAIL  {name}: spark error")
            traceback.print_exc(limit=3)
            n_fail += 1
            continue
        s_sec = time.time() - t0
        if name not in oracles:
            if s_port:
                print(f"FAIL  {name}: PORT spark decimal output {s_port}")
                n_fail += 1
            else:
                print(
                    f"ROWS  {name}: {len(s_rows)} rows (no oracle)"
                    f" [{time.time()-t0:.1f}s]"
                )
                n_rowsonly += 1
            continue
        t1 = time.time()
        try:
            rel = con.sql(oracles[name])
            d_cols = [c.lower() for c in rel.columns]
            d_types = [str(t).upper() for t in rel.types]
            d_port = [
                f"{c}:{t}" for c, t in zip(d_cols, d_types)
                if "DECIMAL" in t or "HUGEINT" in t
            ]
            # Driver semantics: DECIMAL/HUGEINT duck columns arrive as float64.
            d_float_cols = frozenset(
                i for i, t in enumerate(d_types) if "DECIMAL" in t or "HUGEINT" in t
            )
            d_rows = rel.fetchall()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {e}")
            n_fail += 1
            continue
        d_sec = time.time() - t1
        s_ms, s_sorted_cols = rows_multiset([c.lower() for c in s_cols], s_rows)
        d_ms, d_sorted_cols = rows_multiset(
            d_cols, d_rows, duck=True, float_cols=d_float_cols
        )
        problems = []
        if s_port:
            problems.append(f"PORT spark decimal output {s_port}")
        if d_port:
            problems.append(f"PORT duck decimal/hugeint output {d_port}")
        if len(s_rows) != len(d_rows):
            problems.append(f"rowcount spark={len(s_rows)} duck={len(d_rows)}")
        if s_sorted_cols != d_sorted_cols:
            problems.append(f"cols spark={s_sorted_cols} duck={d_sorted_cols}")
        elif s_ms != d_ms:
            only_s = list((s_ms - d_ms).keys())[:2]
            only_d = list((d_ms - s_ms).keys())[:2]
            problems.append(f"values differ; spark-only={only_s} duck-only={only_d}")
        if problems:
            print(f"FAIL  {name}: " + "; ".join(problems))
            n_fail += 1
        else:
            # spark= / duck= split (VERDICT r8 item 4): attributes sweep
            # wall time per engine so heavy entries can be trimmed on the
            # right side.
            print(
                f"PASS  {name}: {len(s_rows)} rows "
                f"[{time.time()-t0:.1f}s spark={s_sec:.1f}s duck={d_sec:.1f}s]"
            )
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
