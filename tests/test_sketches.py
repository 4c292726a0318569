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
