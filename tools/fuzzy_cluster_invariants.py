"""sf1 evidence for fuzzy_name_clusters WITHOUT the RECURSIVE replay
(VERDICT r10 task 5).

The straightforward DuckDB oracle for connected components is a
RECURSIVE reach(n, r) closure -- it materializes every (node, reachable
ancestor) pair, which is quadratic in cluster size and OOMed at 22.3 GB
on the sf1 tier (an oracle resource limit, not an engine check). This
tool replaces it with an INDEPENDENT small-memory formulation: iterative
min-label propagation to fixpoint, each pass a bounded temp-table swap
(cost O(edges) per pass, passes ~ graph diameter), driven from Python.

Checks performed at the given tier (default: the generated sf1 tier):

  1. FULL ASSIGNMENT EQUALITY -- the Spark (id, cluster_id) result
     multiset equals the DuckDB fixpoint labels exactly (stronger than
     the invariant summary alone).
  2. min-member invariant -- every Spark cluster_id equals MIN(id) of
     its members.
  3. edge consistency -- every capped verified fuzzy pair (Spark side)
     lands in one cluster.
  4. histogram -- cluster-size histogram printed from both engines.

The DuckDB edge set reuses the SAME capped deletion-key + codepoint
one-edit SQL the hash-matched fuzzy_name_pairs_capped oracle uses, so
edges themselves are already cross-engine-verified; what this adds is
the closure. Usage:

    python tools/fuzzy_cluster_invariants.py [sf_dir] [out_file]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import duckdb

from dockerized_data_pipeline_spark.plans.eventflow import (  # noqa: E402
    _cp_one_edit,
    _FZ_KEY_CAP,
)


def duck_fixpoint_labels(con: duckdb.DuckDBPyConnection, max_passes: int = 64):
    """(rep, label) fixpoint via min propagation over rep-level edges.
    Tables `dn` and `edges` must exist. Returns pass count."""
    con.execute("CREATE OR REPLACE TEMP TABLE labels AS SELECT rep, rep AS label FROM dn")
    for p in range(1, max_passes + 1):
        con.execute(
            """
            CREATE OR REPLACE TEMP TABLE labels2 AS
            SELECT l.rep, LEAST(l.label, COALESCE(MIN(ln.label), l.label)) AS label
            FROM labels l
            LEFT JOIN edges e ON l.rep = e.s
            LEFT JOIN labels ln ON e.t = ln.rep
            GROUP BY l.rep, l.label
            """
        )
        changed = con.execute(
            "SELECT COUNT(*) FROM labels l JOIN labels2 n ON l.rep = n.rep "
            "WHERE l.label != n.label"
        ).fetchone()[0]
        con.execute("DROP TABLE labels")
        con.execute("ALTER TABLE labels2 RENAME TO labels")
        if changed == 0:
            return p
    raise RuntimeError(f"no fixpoint after {max_passes} passes")


def main() -> int:
    if len(sys.argv) > 1:
        sf_dir = sys.argv[1]
    else:
        from tools.scale_oracle import ensure_tier

        sf_dir = ensure_tier(1.0)
    out_file = sys.argv[2] if len(sys.argv) > 2 else None
    lines: list[str] = []

    def emit(s: str) -> None:
        print(s, flush=True)
        lines.append(s)

    t0 = time.time()
    con = duckdb.connect()
    con.execute(f"SET memory_limit='{os.environ.get('SPARK_GRAFT_DUCK_MEM', '24GB')}'")
    con.execute(f"SET threads={int(os.environ.get('SPARK_GRAFT_DUCK_THREADS', '8'))}")
    cust = os.path.join(sf_dir, "customer.parquet")
    con.execute(f"CREATE VIEW customer AS SELECT * FROM read_parquet('{cust}/*.parquet')"
                if os.path.isdir(cust)
                else f"CREATE VIEW customer AS SELECT * FROM read_parquet('{cust}')")
    con.execute(
        "CREATE TEMP TABLE dn AS SELECT c_name AS name, MIN(c_custkey) AS rep "
        "FROM customer WHERE c_name IS NOT NULL GROUP BY c_name"
    )
    con.execute(
        f"""
        CREATE TEMP TABLE ne AS
        WITH k AS (
          SELECT name, rep,
                 unnest(list_distinct(list_prepend(name,
                   list_transform(range(1, LENGTH(name) + 1),
                     i -> SUBSTRING(name, 1, i - 1) || SUBSTRING(name, i + 1)
                   )))) AS key
          FROM dn
        ),
        kk AS (
          SELECT name, rep, key FROM k
          QUALIFY COUNT(*) OVER (PARTITION BY key) <= {_FZ_KEY_CAP}
        )
        SELECT DISTINCT a.rep AS rx, b.rep AS ry, a.name AS nx, b.name AS ny
        FROM kk a JOIN kk b ON a.key = b.key AND a.name < b.name
        """
    )
    con.execute(
        f"CREATE TEMP TABLE ver AS SELECT rx, ry FROM ne WHERE {_cp_one_edit('nx', 'ny')}"
    )
    con.execute(
        "CREATE TEMP TABLE edges AS SELECT rx AS s, ry AS t FROM ver "
        "UNION SELECT ry, rx FROM ver"
    )
    n_edges = con.execute("SELECT COUNT(*) FROM edges").fetchone()[0]
    passes = duck_fixpoint_labels(con)
    emit(f"duck: {n_edges} directed edges, fixpoint in {passes} passes "
         f"[{time.time()-t0:.0f}s]")
    duck_assign = con.execute(
        """
        SELECT c.c_custkey AS id, COALESCE(l.label, c.c_custkey) AS cluster_id
        FROM customer c
        LEFT JOIN dn ON c.c_name = dn.name
        LEFT JOIN labels l ON dn.rep = l.rep
        ORDER BY id
        """
    ).fetchall()
    duck_hist = con.execute(
        """
        SELECT sz, COUNT(*) FROM (
          SELECT cluster_id, COUNT(*) AS sz FROM (
            SELECT c.c_custkey AS id, COALESCE(l.label, c.c_custkey) AS cluster_id
            FROM customer c
            LEFT JOIN dn ON c.c_name = dn.name
            LEFT JOIN labels l ON dn.rep = l.rep
          ) GROUP BY cluster_id
        ) GROUP BY sz ORDER BY sz
        """
    ).fetchall()

    # ---- Spark side ----
    from dockerized_data_pipeline_spark import plans
    from dockerized_data_pipeline_spark.session import get_session
    from pyspark.sql import functions as F

    spark = get_session("fuzzy-invariants")
    t1 = time.time()
    sdf = plans.QUERIES["fuzzy_name_clusters"](spark, sf_dir).cache()
    spark_assign = [(r[0], r[1]) for r in sdf.orderBy("id").collect()]
    emit(f"spark: {len(spark_assign)} assignments [{time.time()-t1:.0f}s]")

    ok = True
    # 1. full assignment equality
    if spark_assign == [(a, b) for a, b in duck_assign]:
        emit(f"PASS assignment-equality: {len(spark_assign)} (id, cluster_id) "
             "rows identical to the duck fixpoint")
    else:
        diff = set(spark_assign) ^ {(a, b) for a, b in duck_assign}
        emit(f"FAIL assignment-equality: {len(diff)} differing rows, "
             f"e.g. {sorted(diff)[:5]}")
        ok = False
    # 2. min-member invariant
    bad_min = (
        sdf.groupBy("cluster_id").agg(F.min("id").alias("m"))
        .filter(F.col("m") != F.col("cluster_id")).count()
    )
    emit(("PASS" if bad_min == 0 else "FAIL")
         + f" min-member: {bad_min} clusters whose id != min member id")
    ok = ok and bad_min == 0
    # 3. every capped verified pair is same-cluster
    pairs = plans.QUERIES["fuzzy_name_pairs_capped"](spark, sf_dir)
    lab = sdf.select(F.col("id"), F.col("cluster_id"))
    joined = (
        pairs.join(lab.withColumnRenamed("id", "id_a").withColumnRenamed("cluster_id", "ca"), "id_a")
        .join(lab.withColumnRenamed("id", "id_b").withColumnRenamed("cluster_id", "cb"), "id_b")
    )
    split_pairs = joined.filter(F.col("ca") != F.col("cb")).count()
    emit(("PASS" if split_pairs == 0 else "FAIL")
         + f" edge-consistency: {split_pairs} verified capped pairs split "
         "across clusters")
    ok = ok and split_pairs == 0
    # 4. histograms
    spark_hist = sorted(
        (r[0], r[1])
        for r in sdf.groupBy("cluster_id").count()
        .groupBy(F.col("count").alias("sz")).count()
        .select("sz", F.col("count").alias("n")).collect()
    )
    emit(f"spark cluster-size histogram: {spark_hist}")
    emit(f"duck  cluster-size histogram: {sorted((a, b) for a, b in duck_hist)}")
    ok = ok and spark_hist == sorted((a, b) for a, b in duck_hist)
    sdf.unpersist()
    emit(("OK" if ok else "NOT OK") + f" total {time.time()-t0:.0f}s")
    if out_file:
        with open(out_file, "w") as f:
            f.write("\n".join(lines) + "\n")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
