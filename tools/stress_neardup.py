"""Scale stress for the near-dup dedup pipeline (X2 end-to-end).

The bench fixtures max out at 5k documents, which measures plan shape, not
scaling. This tool synthesizes a FACTOR-times corpus from the sf fixtures:

  * every original document appears once;
  * docs with doc_id % 20 == 0 get 3 near-duplicate variants (one token
    replaced -> n-gram Jaccard stays high): planted families of size 4;
  * the rest of the blow-up is DISTINCT filler -- every 3rd token is
    suffixed with the replica index, which destroys almost all 4-gram
    shingles, so filler must not produce candidate pairs.

It then runs verified_neardup_pairs -> collapse_neardups and reports one
JSON line: corpus size, wall seconds per stage, candidate/verified pair
counts, and planted-family recall (fraction of planted variants removed by
the collapse). Recall must be 1.0; cross-replica false pairs must be 0
(same-replica pairs are the base corpus's natural near-dups, inherited by
every replica).

Usage: python tools/stress_neardup.py [sf_dir] [factor]
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dockerized_data_pipeline_spark.catalog import load_table  # noqa: E402
from dockerized_data_pipeline_spark.operators.dedup import (  # noqa: E402
    collapse_neardups,
    verified_neardup_pairs,
)

NEARDUP_EVERY = 20  # doc_id % 20 == 0 -> planted family
FAMILY_VARIANTS = 3


def build_corpus(spark: SparkSession, sf_dir: str, factor: int):
    base = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    n_base = base.count()
    parts = [base]
    # near-dup variants: replace the first token with a marker token
    fam = base.filter(F.col("doc_id") % NEARDUP_EVERY == 0)
    for v in range(1, FAMILY_VARIANTS + 1):
        parts.append(
            fam.select(
                (F.col("doc_id") + F.lit(v * 10_000_000)).alias("doc_id"),
                F.concat(F.lit(f"variant{v} "), F.substring_index(F.col("text"), " ", -400)).alias("text"),
            )
        )
    # distinct filler: suffix every 3rd token with the replica index
    n_fill = factor - 1
    for k in range(1, n_fill + 1):
        parts.append(
            base.select(
                (F.col("doc_id") + F.lit((FAMILY_VARIANTS + k) * 10_000_000)).alias("doc_id"),
                F.array_join(
                    F.transform(
                        F.split(F.col("text"), " "),
                        lambda t, i: F.when(i % 3 == 0, F.concat(t, F.lit(f"f{k}"))).otherwise(t),
                    ),
                    " ",
                ).alias("text"),
            )
        )
    corpus = parts[0]
    for p in parts[1:]:
        corpus = corpus.unionByName(p)
    return corpus.repartition(32).localCheckpoint(eager=True), n_base


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    corpus, n_base = build_corpus(spark, sf_dir, factor)
    n_docs = corpus.count()

    t0 = time.monotonic()
    pairs = verified_neardup_pairs(corpus, "doc_id", "text").localCheckpoint(
        eager=True
    )
    n_pairs = pairs.count()
    t_pairs = time.monotonic() - t0

    t1 = time.monotonic()
    survivors = collapse_neardups(corpus, pairs)
    n_survivors = survivors.count()
    t_collapse = time.monotonic() - t1

    # recall: every planted variant (id >= 10M, < (FAMILY_VARIANTS+1)*10M)
    # must be collapsed into its original
    planted = corpus.filter(
        (F.col("doc_id") >= 10_000_000)
        & (F.col("doc_id") < (FAMILY_VARIANTS + 1) * 10_000_000)
    ).count()
    planted_surviving = survivors.filter(
        (F.col("doc_id") >= 10_000_000)
        & (F.col("doc_id") < (FAMILY_VARIANTS + 1) * 10_000_000)
    ).count()
    # precision: a verified pair crossing two different FILLER replicas (or
    # filler<->base) would be a false positive -- filler mutations destroy
    # every cross-replica shingle. Same-replica pairs are legitimate: each
    # replica inherits the base corpus's natural near-dups.
    rep_a = (F.col("doc_a") / 10_000_000).cast("long")
    rep_b = (F.col("doc_b") / 10_000_000).cast("long")
    cross_filler_pairs = pairs.filter(
        (rep_a != rep_b)
        & ((rep_a > FAMILY_VARIANTS) | (rep_b > FAMILY_VARIANTS))
    ).count()
    natural_pairs = pairs.filter(
        (rep_a == rep_b) | ((rep_a <= FAMILY_VARIANTS) & (rep_b <= FAMILY_VARIANTS))
    ).count() - pairs.filter(
        (rep_a <= FAMILY_VARIANTS)
        & (rep_b <= FAMILY_VARIANTS)
        & (rep_a != rep_b)
    ).count()

    print(
        json.dumps(
            {
                "metric": "neardup_stress",
                "sf_dir": sf_dir,
                "factor": factor,
                "n_docs": n_docs,
                "n_base": n_base,
                "verified_pairs": n_pairs,
                "survivors": n_survivors,
                "pairs_sec": round(t_pairs, 2),
                "collapse_sec": round(t_collapse, 2),
                "planted_removed": planted - planted_surviving,
                "planted_total": planted,
                "cross_replica_false_pairs": cross_filler_pairs,
                "same_replica_natural_pairs": natural_pairs,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
