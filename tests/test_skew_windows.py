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
