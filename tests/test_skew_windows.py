"""Equivalence tests for the skew-safe two-phase window forms
(operators/skew.py): bucketed top-k and bucketed running sum must produce
EXACTLY the plain single-window answer -- the rewrite changes the physical
shape, never the semantics."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from dockerized_data_pipeline_spark.catalog import load_table
from dockerized_data_pipeline_spark.operators.skew import (
    bucketed_running_sum,
    bucketed_topk,
)


def test_bucketed_topk_equals_plain_window(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderstatus", "o_orderkey", "o_totalprice"
    )
    order_by = [F.desc("o_totalprice"), F.asc("o_orderkey")]
    plain = (
        orders.withColumn(
            "rk", F.row_number().over(Window.partitionBy("o_orderstatus").orderBy(*order_by))
        )
        .filter(F.col("rk") <= 5)
    )
    bucketed = bucketed_topk(
        orders, ["o_orderstatus"], order_by, k=5, buckets=8, rank_col="rk"
    )
    assert {tuple(r) for r in plain.collect()} == {
        tuple(r) for r in bucketed.select(*plain.columns).collect()
    }


def test_bucketed_running_sum_equals_plain_window(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    val = F.col("value").cast("decimal(12,4)")
    w = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    plain = ev.select(
        "event_id", F.sum(val).over(w).cast("decimal(38,4)").alias("run")
    )
    bucketed = bucketed_running_sum(
        ev,
        partition_cols=["event_type"],
        order_cols=["ts", "event_id"],
        value=val,
        bucket=F.to_date("ts"),
        out_col="run",
    ).select("event_id", F.col("run").cast("decimal(38,4)").alias("run"))
    a = {(r.event_id, r.run) for r in plain.collect()}
    b = {(r.event_id, r.run) for r in bucketed.collect()}
    assert a == b


def test_salted_join_bounds_hot_key_task_skew(spark):
    """Zipf-torture regression (VERDICT r3 item 4), deterministic proxy
    for task-time skew: rows-per-post-shuffle-partition. A plain shuffle
    join lands ALL hot-key rows in one partition (one straggler task
    doing ~60% of the probe work); hot_key_salted_join must spread them
    over >= salt_buckets-2 partitions and bound max/median partition
    rows <= 4 -- the no-straggler criterion (tools/skew_probe.py
    re-checks the same bound on real executor task times at 20M rows)."""
    import statistics

    from dockerized_data_pipeline_spark.operators.skew import hot_key_salted_join

    # hot key = 60% of rows; 50 cold keys carry 200 each
    hot = spark.range(15_000).selectExpr("'HOT' AS k", "id AS payload")
    cold = spark.range(10_000).selectExpr(
        "concat('c', CAST(id % 50 AS STRING)) AS k", "id AS payload"
    )
    fact = hot.unionByName(cold)
    dim = fact.select("k").distinct().withColumn("label", F.upper("k"))

    confs = {
        "spark.sql.adaptive.enabled": "false",  # isolate from AQE splits
        "spark.sql.autoBroadcastJoinThreshold": "-1",  # force shuffle join
    }
    old = {c: spark.conf.get(c) for c in confs}
    try:
        for c, v in confs.items():
            spark.conf.set(c, v)

        def hot_partition_spread(df):
            per_part = (
                df.filter(F.col("k") == "HOT")
                .withColumn("__pid", F.spark_partition_id())
                .groupBy("__pid")
                .count()
                .collect()
            )
            return len(per_part)

        plain = fact.join(dim, "k")
        assert hot_partition_spread(plain) == 1  # the straggler baseline

        salted = hot_key_salted_join(
            fact, dim, on="k", hot_threshold=5_000, salt_buckets=8
        )
        assert salted.count() == fact.count()  # no row lost or duplicated
        assert hot_partition_spread(salted) >= 6

        # rows-per-partition balance across the WHOLE salted output:
        # max <= 4x median over non-empty partitions
        sizes = [
            r["count"]
            for r in salted.withColumn("__pid", F.spark_partition_id())
            .groupBy("__pid").count().collect()
        ]
        assert max(sizes) <= 4 * statistics.median(sizes), sizes
    finally:
        for c, v in old.items():
            spark.conf.set(c, v)
