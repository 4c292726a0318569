"""Output-type portability audit (VERDICT r2 item 1).

The driver's hash compare coerces DuckDB DECIMAL/HUGEINT results to float64
(pandas-style) while Spark Decimal values stay ``decimal.Decimal`` -> repr
mismatch -> hash_match false even when values are identical.  Portable output
contract: no DECIMAL column in a Spark result, no DECIMAL/HUGEINT column in a
DuckDB oracle result.  This tool lists every violator so the fix sweep is
exhaustive, not sample-driven.

Usage: python tools/audit_types.py [sf_dir]
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import duckdb

SF_DIR = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _spark_class(dt_simple: str) -> str:
    s = dt_simple
    if "decimal" in s:
        return "DECIMAL!"
    if s in ("tinyint", "smallint", "int", "bigint"):
        return "int"
    if s in ("float", "double"):
        return "float"
    if s == "boolean":
        return "bool"
    if s.startswith("array"):
        return "array"
    if s.startswith(("map", "struct")):
        return "nested"
    if "timestamp" in s:
        return "timestamp"
    if s == "date":
        return "date"
    return "str" if s in ("string", "varchar") else s


def _duck_class(t: str) -> str:
    s = str(t).upper()
    if "DECIMAL" in s:
        return "DECIMAL!"
    if "HUGEINT" in s:
        return "HUGEINT!"
    if s in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT", "UTINYINT", "USMALLINT",
             "UINTEGER", "UBIGINT"):
        return "int"
    if s in ("FLOAT", "DOUBLE", "REAL"):
        return "float"
    if s == "BOOLEAN":
        return "bool"
    if s.endswith("[]") or s.startswith("LIST"):
        return "array"
    if s.startswith(("MAP", "STRUCT")):
        return "nested"
    if "TIMESTAMP" in s:
        return "timestamp"
    if s == "DATE":
        return "date"
    return "str" if s == "VARCHAR" else s


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else SF_DIR

    import __spark_entry__ as entry_mod
    from dockerized_data_pipeline_spark.session import get_session

    spark = get_session("type-audit")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    bad = []
    for name in sorted(qs):
        problems = []
        err = None
        s_classes = {}
        try:
            sdf = qs[name](spark, sf_dir)
            for f in sdf.schema.fields:
                s_classes[f.name.lower()] = _spark_class(f.dataType.simpleString())
        except Exception as e:  # noqa: BLE001
            err = f"spark: {type(e).__name__}: {e}"
        problems += [f"spark {c}={k}" for c, k in s_classes.items() if k.endswith("!")]
        if name in oracles and err is None:
            try:
                rel = con.sql(oracles[name])
                d_classes = {
                    c.lower(): _duck_class(t) for c, t in zip(rel.columns, rel.types)
                }
                problems += [f"duck {c}={k}" for c, k in d_classes.items()
                             if k.endswith("!")]
                for c in sorted(set(s_classes) & set(d_classes)):
                    if (s_classes[c] != d_classes[c]
                            and not (s_classes[c].endswith("!")
                                     or d_classes[c].endswith("!"))):
                        problems.append(
                            f"class-mismatch {c}: spark={s_classes[c]}"
                            f" duck={d_classes[c]}")
            except Exception as e:  # noqa: BLE001
                err = f"duck: {type(e).__name__}: {e}"
        if problems or err:
            bad.append(name)
            print(f"BAD   {name}: {'; '.join(problems)} err={err}")
    print(f"\n{len(bad)} / {len(qs)} queries with non-portable output types")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
