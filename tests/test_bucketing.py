"""Bucketed co-located join: same results as the plain join, and the
physical plan contains no shuffle exchange on the join path."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from pyspark.sql import functions as F

from dockerized_data_pipeline_spark.catalog import load_table
from dockerized_data_pipeline_spark.operators.bucketing import read_table, write_bucketed


def test_bucketed_join_is_shuffle_free_and_correct(spark, sf_dir, tmp_path):
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    write_bucketed(orders, "orders_b", str(tmp_path / "ob"), "o_orderkey", 8)
    write_bucketed(
        li.withColumnRenamed("l_orderkey", "o_orderkey"),
        "lineitem_b",
        str(tmp_path / "lb"),
        "o_orderkey",
        8,
    )
    try:
        joined = (
            read_table(spark, "orders_b")
            .join(read_table(spark, "lineitem_b"), "o_orderkey")
            .groupBy("o_orderstatus")
            .agg(F.count("*").alias("n"))
        )
        buf = io.StringIO()
        with redirect_stdout(buf):
            joined.explain("formatted")
        plan = buf.getvalue()
        join_section = plan.split("HashAggregate")[0]
        assert "Exchange hashpartitioning" not in join_section

        expected = {
            (r.o_orderstatus, r.n)
            for r in orders.join(li, orders.o_orderkey == li.l_orderkey)
            .groupBy("o_orderstatus")
            .agg(F.count("*").alias("n"))
            .collect()
        }
        assert {(r.o_orderstatus, r.n) for r in joined.collect()} == expected
    finally:
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS lineitem_b")
