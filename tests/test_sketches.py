"""Self-validation of the sketch queries: approximate answers must sit
within their documented error bounds of the exact answers computed over
the same input (SURVEY: sketches are the 100 TB substitutes for exact
distinct/percentile, so the error bound IS the contract)."""

from __future__ import annotations

from dockerized_data_pipeline_spark.plans import registry


def test_approx_distinct_within_rsd_bound(spark, sf_dir):
    rows = registry.QUERIES["sketch_approx_distinct"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        rel_err = abs(r.approx_customers - r.exact_customers) / r.exact_customers
        # rsd=1%; allow 5 sigma so the test is deterministic-signal, not flaky
        assert rel_err <= 0.05, (r.o_orderstatus, rel_err)


def test_approx_percentiles_within_tolerance(spark, sf_dir):
    rows = registry.QUERIES["sketch_approx_percentiles"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        for approx, exact in zip(r.price_quartiles, r.exact_quartiles):
            # GK accuracy=10000 -> rank error <= n/10000; on these
            # distributions that is well under 1% value error
            assert abs(approx - exact) / exact <= 0.01, (r.l_returnflag, approx, exact)


def test_count_min_never_undercounts_and_bounded(spark, sf_dir):
    rows = registry.QUERIES["sketch_count_min_freq"](spark, sf_dir).collect()
    assert rows
    n_total = sum(r.exact_count for r in rows)
    for r in rows:
        # CMS estimates are one-sided: never below the true count ...
        assert r.cm_estimate >= r.exact_count, (r.o_orderpriority, r)
        # ... and over by at most (e/width)*N w.h.p. (width=256; allow 2x
        # margin so the fixed-seed result stays a deterministic signal)
        assert r.cm_estimate - r.exact_count <= 2 * 2.72 / 256 * n_total, r


def test_count_min_deterministic(spark, sf_dir):
    q = registry.QUERIES["sketch_count_min_freq"]
    a = {tuple(r) for r in q(spark, sf_dir).collect()}
    b = {tuple(r) for r in q(spark, sf_dir).collect()}
    assert a == b


def test_approx_top_k_matches_exact_heavy_hitters(spark, sf_dir):
    """Spark 4's approx_top_k (datasketches frequent-items) vs the exact
    top-k: on a 5-value key every value is a heavy hitter, so the sketch
    must recover the exact set AND exact counts (guaranteed when the
    sketch never evicts). Kept test-only: sketch merge order is not
    provably deterministic across partitionings, unlike HLL/GK."""
    from dockerized_data_pipeline_spark.catalog import load_table

    from dockerized_data_pipeline_spark.catalog import scoped_views

    ev = load_table(spark, sf_dir, "events")
    with scoped_views(spark, ev_topk=ev):
        approx = {
            r.item: r.n_est
            for r in spark.sql(
                "SELECT inline(approx_top_k(event_type, 5)) AS (item, n_est) FROM ev_topk"
            ).collect()
        }
    exact = {
        r.event_type: r.n
        for r in ev.groupBy("event_type").count().withColumnRenamed("count", "n").collect()
    }
    assert approx == exact


def test_hll_mergeable_rollup_matches_exact(spark, sf_dir):
    """Merged daily sketches must estimate the per-type distinct user
    count within HLL error (default lgConfigK=12 -> ~1.6% rsd; assert 5%)."""
    from dockerized_data_pipeline_spark import plans
    from dockerized_data_pipeline_spark.catalog import load_table
    from pyspark.sql import functions as F

    got = {
        r.event_type: r.approx_users
        for r in plans.QUERIES["sketch_hll_mergeable_rollup"](spark, sf_dir).collect()
    }
    exact = {
        r.event_type: r.n
        for r in load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(got) == set(exact)
    for k, est in got.items():
        assert abs(est - exact[k]) / exact[k] <= 0.05, (k, est, exact[k])
