"""Tests: Python DataSource V2 offline mode, salted-join equivalence,
sketch accuracy vs exact."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from dockerized_data_pipeline_spark.catalog import load_table
from dockerized_data_pipeline_spark.operators.skew import salted_join
from dockerized_data_pipeline_spark.sources.datasource import register
from dockerized_data_pipeline_spark.sources.parse import parse_timeseries


def _payload(sym):
    return json.dumps(
        {
            "Meta Data": {"3. Last Refreshed": "2024-01-05 16:00:00", "5. Time Zone": "UTC"},
            "Time Series (60min)": {
                "2024-01-05 16:00:00": {
                    "1. open": "1", "2. high": "2", "3. low": "0.5",
                    "4. close": "1.5", "5. volume": "100",
                }
            },
        }
    )


def test_datasource_v2_offline_partition_per_symbol(spark, tmp_path):
    for sym in ("AAPL", "MSFT"):
        (tmp_path / f"{sym}.json").write_text(_payload(sym))
    register(spark)
    raw = (
        spark.read.format("stock_api")
        .option("symbols", "aapl, msft, MISSING")
        .option("payload_dir", str(tmp_path))
        .load()
    )
    assert raw.rdd.getNumPartitions() == 3  # one partition per symbol
    rows = {r.symbol: r for r in raw.collect()}
    assert rows["AAPL"].payload and rows["AAPL"].error is None
    assert rows["MISSING"].payload is None and rows["MISSING"].error  # isolated (T7)

    ok = raw.filter(F.col("payload").isNotNull())
    parsed = parse_timeseries(ok, symbol_col="symbol", payload_col="payload")
    assert parsed.count() == 2  # composes with the shared parse path


def test_salted_join_equals_plain_join(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    nation_sized = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_name"
    )
    plain = orders.join(nation_sized, "o_custkey").select("o_orderkey", "c_name")
    salted = salted_join(orders, nation_sized, "o_custkey").select("o_orderkey", "c_name")
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_sketches_close_to_exact(spark, sf_dir):
    from dockerized_data_pipeline_spark.plans.sketches import (
        sketch_approx_distinct,
        sketch_approx_percentiles,
    )

    for r in sketch_approx_distinct(spark, sf_dir).collect():
        assert abs(r.approx_customers - r.exact_customers) <= max(3, 0.05 * r.exact_customers)
    for r in sketch_approx_percentiles(spark, sf_dir).collect():
        q = r.price_quartiles
        assert len(q) == 4 and q == sorted(q)


def test_stream_reader_polls_become_microbatches(spark, tmp_path):
    """Each payload_dir poll{N}/ drop is exactly one micro-batch; offsets
    resume after restart (no re-read of committed polls)."""
    import json

    from dockerized_data_pipeline_spark.sources.datasource import register

    register(spark)
    src = tmp_path / "drops"
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    for poll in (0, 1):
        d = src / f"poll{poll}"
        d.mkdir(parents=True)
        for sym in ("AAPL", "MSFT"):
            (d / f"{sym}.json").write_text(json.dumps({"poll": poll, "sym": sym}))

    def drain():
        stream = (
            spark.readStream.format("stock_api")
            .option("symbols", "AAPL,MSFT")
            .option("payload_dir", str(src))
            .load()
        )
        q = (
            stream.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    drain()
    rows = spark.read.parquet(out).collect()
    assert len(rows) == 4 and all(r.error is None for r in rows)

    # drop a third poll; restart drains ONLY the new one
    d = src / "poll2"
    d.mkdir()
    for sym in ("AAPL", "MSFT"):
        (d / f"{sym}.json").write_text(json.dumps({"poll": 2, "sym": sym}))
    drain()
    rows = spark.read.parquet(out).collect()
    assert len(rows) == 6
    import json as _j

    polls = sorted(_j.loads(r.payload)["poll"] for r in rows)
    assert polls == [0, 0, 1, 1, 2, 2]


def test_hot_key_salted_join_equals_plain_join(spark):
    import pytest as _pytest
    from pyspark.sql import functions as F

    from dockerized_data_pipeline_spark.operators.skew import hot_key_salted_join

    # 90% of large-side rows land on key 1 (the hot key); rest spread.
    large = spark.range(5000).select(
        F.when(F.col("id") < 4500, F.lit(1))
        .otherwise(F.col("id") % 37)
        .alias("k"),
        F.col("id").alias("v"),
    )
    small = spark.range(37).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("w")
    )
    # key 40 on the large side has no small match: exercises left-join nulls
    large = large.unionByName(
        spark.range(3).select(F.lit(40).alias("k"), F.col("id").alias("v"))
    )
    for how in ("inner", "left"):
        got = hot_key_salted_join(large, small, "k", hot_threshold=100, how=how)
        want = large.join(small, "k", how)
        assert got.exceptAll(want).count() == 0
        assert want.exceptAll(got).count() == 0

    # precomputed hot-key set path
    hot = spark.createDataFrame([(1,)], "k long")
    got = hot_key_salted_join(large, small, "k", how="inner", hot_keys=hot)
    want = large.join(small, "k", "inner")
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0

    with _pytest.raises(ValueError):
        hot_key_salted_join(large, small, "k", how="full")
