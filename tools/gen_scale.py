"""Deterministic TPC-H-shaped scale generator (VERDICT r7 item 4).

The driver fixtures stop at sf0.1 (600k lineitem), so the relational
headline queries have never run above that. This generates an
sf1-EQUIVALENT (~6M lineitem) -- and, critically, a same-generator
sf0.1-equivalent -- so `tools/scale_validate.py` can measure each
query's scaling exponent between two datasets that differ ONLY in size
(comparing the hand-made fixture against a generated sf1 would confound
generator distributions with scale).

Design:
  * seeded + content-addressed: every column is a pure function of the
    row id via xxhash64(id, salt) -- no RNG state, no partition-order
    dependence; re-running reproduces byte-identical values.
  * schemas match the driver fixtures exactly (names, types, including
    FLOAT[] embeddings), and value ranges/categories mirror the fixture
    distributions (status/priority/segment uniform, acctbal
    [-1000, 10000), dates 1995-2001, JSON props, 64-dim embeddings)
    so plan shapes and selectivities carry over.
  * PERFORMANCE fixture, not a correctness fixture: the per-value
    streams differ from the driver's seed-42 data; oracle checks keep
    using /root/testdata.

Usage: python tools/gen_scale.py <out_dir> <sf> [files_per_table]
       (e.g. gen_scale.py /tmp/spark_graft_scale/sf1 1.0 32)
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
TYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
ETYPES = ["click", "error", "purchase", "signup", "view"]
LANGS = ["en", "en", "en", "en", "zh", "es", "fr", "de"]  # ~50% en
# Mix of content words AND the engine's STOPWORDS list: without
# stopwords every generated document fails the corpus-prep quality gate
# (stopword-ratio >= 2%), which turned the x5/x7 pipelines into
# empty-input no-ops at the scale tiers (and exposed the kmeans
# empty-fit crash the sf1 scale-oracle run found). Roughly 1/4
# stopwords matches a plausible prose ratio.
WORDS = [
    "spark", "line", "column", "order", "batch", "part", "sort", "fast",
    "value", "scan", "query", "agg", "table", "hash", "key", "group",
    "stream", "filter", "customer", "slow", "vector", "small", "join",
    "index", "shuffle", "plan", "cache", "row",
    "the", "and", "of", "to", "a", "in", "is", "it", "for", "on",
]

GEN_VERSION = 2  # bump when generated CONTENT changes (forces re-gen)


def _h(col, salt: str):
    return F.xxhash64(col, F.lit(salt))


def _u(col, salt: str, m: int):
    """Uniform BIGINT in [0, m) -- pmod handles the negative hash half."""
    return F.pmod(_h(col, salt), F.lit(m))


def _ud(col, salt: str):
    """Uniform DOUBLE in [0, 1)."""
    return _u(col, salt, 1_000_000_007) / F.lit(1_000_000_007.0)


def _choice(col, salt: str, values: list[str]):
    return F.element_at(
        F.array(*[F.lit(v) for v in values]), (_u(col, salt, len(values)) + 1).cast("int")
    )


def _money(col, salt: str, lo: float, hi: float):
    return F.round(F.lit(lo) + _ud(col, salt) * F.lit(hi - lo), 2)


def _date(col, salt: str, start: str, days: int):
    return F.to_timestamp(
        F.date_add(F.lit(start).cast("date"), _u(col, salt, days).cast("int"))
    )


def generate(spark: SparkSession, out_dir: str, sf: float, files: int = 32) -> None:
    n_cust = int(150_000 * sf)
    n_supp = int(10_000 * sf)
    n_part = int(200_000 * sf)
    n_ord = int(1_500_000 * sf)
    n_li = int(6_000_000 * sf)
    n_ev = int(1_000_000 * sf)
    n_doc = int(50_000 * sf)
    n_emb = int(20_000 * sf)
    n_users = max(1, int(15_000 * sf))
    os.makedirs(out_dir, exist_ok=True)

    def write(df: DataFrame, name: str, n_files: int = files) -> None:
        df.repartition(n_files).write.mode("overwrite").parquet(
            os.path.join(out_dir, f"{name}.parquet")
        )

    region = spark.createDataFrame(
        [(i, r) for i, r in enumerate(REGIONS)], "r_regionkey int, r_name string"
    )
    write(region, "region", 1)

    nation = spark.range(25).select(
        F.col("id").cast("int").alias("n_nationkey"),
        F.concat(F.lit("NATION_"), F.col("id")).alias("n_name"),
        (F.col("id") % 5).cast("int").alias("n_regionkey"),
    )
    write(nation, "nation", 1)

    ids = spark.range(n_cust)
    customer = ids.select(
        F.col("id").alias("c_custkey"),
        F.format_string("Customer#%09d", F.col("id")).alias("c_name"),
        _u(F.col("id"), "cn", 25).cast("int").alias("c_nationkey"),
        _money(F.col("id"), "cb", -1000.0, 10_000.0).alias("c_acctbal"),
        _choice(F.col("id"), "cm", SEGMENTS).alias("c_mktsegment"),
    )
    write(customer, "customer", max(1, files // 4))

    supplier = spark.range(n_supp).select(
        F.col("id").alias("s_suppkey"),
        F.format_string("Supplier#%09d", F.col("id")).alias("s_name"),
        _u(F.col("id"), "sn", 25).cast("int").alias("s_nationkey"),
        _money(F.col("id"), "sb", -1000.0, 10_000.0).alias("s_acctbal"),
    )
    write(supplier, "supplier", 1)

    part = spark.range(n_part).select(
        F.col("id").alias("p_partkey"),
        F.concat_ws(
            " ",
            _choice(F.col("id"), "pw1", WORDS),
            _choice(F.col("id"), "pw2", WORDS),
        ).alias("p_name"),
        F.concat(F.lit("Brand#"), (_u(F.col("id"), "pb", 25) + 1)).alias("p_brand"),
        _choice(F.col("id"), "pt", TYPES).alias("p_type"),
        (_u(F.col("id"), "ps", 50) + 1).cast("int").alias("p_size"),
        F.round(F.lit(900.0) + _u(F.col("id"), "pr", 1000) / F.lit(10.0), 1).alias(
            "p_retailprice"
        ),
    )
    write(part, "part", max(1, files // 4))

    orders = spark.range(n_ord).select(
        F.col("id").alias("o_orderkey"),
        _u(F.col("id"), "oc", n_cust).alias("o_custkey"),
        _choice(F.col("id"), "os", ["F", "O", "P"]).alias("o_orderstatus"),
        _money(F.col("id"), "ot", 1000.0, 500_000.0).alias("o_totalprice"),
        _date(F.col("id"), "od", "1995-01-01", 2400).alias("o_orderdate"),
        _choice(F.col("id"), "op", PRIORITIES).alias("o_orderpriority"),
    )
    write(orders, "orders")

    lineitem = spark.range(n_li).select(
        _u(F.col("id"), "lo", n_ord).alias("l_orderkey"),
        _u(F.col("id"), "lp", n_part).alias("l_partkey"),
        _u(F.col("id"), "ls", n_supp).alias("l_suppkey"),
        (_u(F.col("id"), "ln", 7) + 1).cast("int").alias("l_linenumber"),
        (_u(F.col("id"), "lq", 50) + 1).cast("double").alias("l_quantity"),
        _money(F.col("id"), "le", 900.0, 105_000.0).alias("l_extendedprice"),
        (_u(F.col("id"), "ld", 11) / F.lit(100.0)).alias("l_discount"),
        (_u(F.col("id"), "lt", 9) / F.lit(100.0)).alias("l_tax"),
        _choice(F.col("id"), "lr", ["A", "N", "R"]).alias("l_returnflag"),
        _choice(F.col("id"), "ll", ["F", "O"]).alias("l_linestatus"),
        _date(F.col("id"), "lsd", "1995-01-02", 2500).alias("l_shipdate"),
    )
    write(lineitem, "lineitem")

    # roughly time-ordered like the fixture: a monotone base + jitter
    span_us = 30 * 24 * 3600 * 1_000_000
    events = spark.range(n_ev).select(
        F.col("id").alias("event_id"),
        F.timestamp_micros(
            F.unix_micros(F.lit("2024-01-01 00:00:00").cast("timestamp"))
            + (F.col("id") * F.lit(span_us // max(n_ev, 1)))
            + _u(F.col("id"), "ej", 60_000_000)
        ).alias("ts"),
        _u(F.col("id"), "eu", n_users).alias("user_id"),
        _choice(F.col("id"), "et", ETYPES).alias("event_type"),
        _money(F.col("id"), "ev", 0.0, 560.0).alias("value"),
        F.concat(F.lit('{"k": '), _u(F.col("id"), "ek", 100), F.lit("}")).alias(
            "props"
        ),
    )
    write(events, "events", max(1, files // 2))

    documents = spark.range(n_doc).select(
        F.col("id").alias("doc_id"),
        F.array_join(
            F.transform(
                F.sequence(F.lit(1), (_u(F.col("id"), "dl", 70) + 8).cast("int")),
                lambda i: F.element_at(
                    F.array(*[F.lit(w) for w in WORDS]),
                    (F.pmod(F.xxhash64(F.col("id"), i, F.lit("dw")),
                            F.lit(len(WORDS))) + 1).cast("int"),
                ),
            ),
            " ",
        ).alias("text"),
        _choice(F.col("id"), "dg", LANGS).alias("lang"),
        F.concat(F.lit("src"), _u(F.col("id"), "ds", 20)).alias("source"),
    ).withColumn("n_chars", F.length("text").cast("bigint"))
    write(documents, "documents", max(1, files // 4))

    embeddings = spark.range(n_emb).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(63)),
            lambda j: (
                (F.pmod(F.xxhash64(F.col("id"), j, F.lit("em")), F.lit(2_000_001))
                 / F.lit(1_000_000.0) - F.lit(1.0)) * F.lit(0.4)
            ).cast("float"),
        ).alias("embedding"),
        _u(F.col("id"), "el", 10).cast("int").alias("label"),
    )
    write(embeddings, "embeddings", max(1, files // 8))


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_scale/sf1"
    sf = float(sys.argv[2]) if len(sys.argv) > 2 else 1.0
    files = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    from dockerized_data_pipeline_spark.session import get_session

    spark = get_session("gen-scale")
    generate(spark, out_dir, sf, files)
    print(f"generated sf={sf} at {out_dir}")


if __name__ == "__main__":
    main()
