"""Generate the NULL-injected fixture tier (VERDICT r9 task 1).

Every column of every driver fixture table is 100% NULL-free
(judge-verified at r9), so none of the 231 oracle hash-matches had ever
pushed a NULL through the engine — and that exact class produced four
real bugs across r8/r9 (null-parity fixes, the NULLS FIRST/LAST
histogram divergence). This tool clones a fixture tier with a
deterministic ~5% NULL rate in every nullable column so the FULL oracle
sweep can run on NULL-bearing data:

    python tools/gen_nulls.py [src_dir] [out_dir] [rate]
    python tools/check_oracle.py fixtures/sf0.01-nulls

Injection rule: per (table, column), a numpy RandomState seeded by
crc32("table:column") draws a uniform mask; rows with draw < rate get
NULL. Fully deterministic — re-running reproduces the tier bit-for-bit,
so the committed parquet is reproducible evidence, not opaque data.

Exempt columns (PK semantics): the row-identity keys
(r_regionkey n_nationkey c_custkey s_suppkey p_partkey o_orderkey
l_orderkey+l_linenumber event_id doc_id vec_id). FOREIGN keys are NOT
exempt — NULL join keys are precisely the semantics worth differential
testing (NULL never equals NULL in a join; both engines must agree on
the dropped rows).

Implementation note: masks are applied with pyarrow ``if_else`` against
a typed null scalar, NOT pandas ``where`` — pandas turns None into NaN
for float columns, and NaN-vs-NULL is itself one of the divergence
classes this tier exists to probe.
"""

from __future__ import annotations

import os
import sys
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

# Row-identity keys: never NULL (PK semantics). Everything else is fair game.
EXEMPT = {
    "region": {"r_regionkey"},
    "nation": {"n_nationkey"},
    "customer": {"c_custkey"},
    "supplier": {"s_suppkey"},
    "part": {"p_partkey"},
    "orders": {"o_orderkey"},
    "lineitem": {"l_orderkey", "l_linenumber"},
    "events": {"event_id"},
    "documents": {"doc_id"},
    "embeddings": {"vec_id"},
}


def null_mask(table: str, column: str, n: int, rate: float) -> np.ndarray:
    seed = zlib.crc32(f"{table}:{column}".encode())
    rng = np.random.RandomState(seed)
    return rng.uniform(size=n) < rate


def inject(table: str, src_path: str, out_path: str, rate: float) -> dict[str, int]:
    t = pq.read_table(src_path)
    exempt = EXEMPT[table]
    cols = []
    injected: dict[str, int] = {}
    for field in t.schema:
        col = t.column(field.name)
        if field.name in exempt:
            cols.append(col)
            continue
        mask = null_mask(table, field.name, len(t), rate)
        combined = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        out = pc.if_else(
            pa.array(mask), pa.scalar(None, type=field.type), combined
        )
        injected[field.name] = int(mask.sum())
        cols.append(out)
    result = pa.table(cols, schema=pa.schema(
        [pa.field(f.name, f.type, nullable=True) for f in t.schema]
    ))
    pq.write_table(result, out_path)
    return injected


def main() -> int:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(os.path.dirname(os.path.dirname(__file__)) or ".",
                          "fixtures", "sf0.01-nulls")
    )
    rate = float(sys.argv[3]) if len(sys.argv) > 3 else 0.05
    os.makedirs(out, exist_ok=True)
    for table in TABLES:
        src_path = os.path.join(src, f"{table}.parquet")
        out_path = os.path.join(out, f"{table}.parquet")
        counts = inject(table, src_path, out_path, rate)
        total = pq.read_metadata(out_path).num_rows
        summary = " ".join(f"{c}={n}" for c, n in counts.items())
        print(f"{table}: {total} rows; nulls: {summary}")
    print(f"written to {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
