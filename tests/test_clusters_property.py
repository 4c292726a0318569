"""Connected-components dedup clustering tests + hypothesis property tests
for the MERGE operator's invariants (idempotence, key uniqueness)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from dockerized_data_pipeline_spark.operators.dedup import (
    collapse_neardups,
    neardup_clusters,
)
from dockerized_data_pipeline_spark.operators.merge import merge_upsert
from dockerized_data_pipeline_spark.operators.quality import duplicate_key_count


def test_neardup_clusters_transitive_chain(spark):
    # chain 1-2-3-4 plus isolated pair 10-11: two clusters
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "doc_a long, doc_b long"
    )
    got = {r.doc: r.cluster_id for r in neardup_clusters(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_neardup_clusters_long_chain_converges_logarithmically(spark):
    # a 33-node path has diameter 32; pointer jumping must converge well
    # inside 8 rounds (~log2(32) + slack), far under plain propagation's 32
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 33)], "doc_a long, doc_b long"
    )
    got = {r.doc: r.cluster_id for r in neardup_clusters(pairs, max_iterations=8).collect()}
    assert set(got.values()) == {1}
    assert len(got) == 33


def test_neardup_clusters_raises_when_not_converged(spark):
    import pytest

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 33)], "doc_a long, doc_b long"
    )
    with pytest.raises(RuntimeError, match="did not reach a fixpoint"):
        neardup_clusters(pairs, max_iterations=1)


def test_collapse_keeps_canonical_and_untouched(spark):
    docs = spark.createDataFrame(
        [(i, f"text{i}") for i in (1, 2, 3, 4, 10, 11, 99)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "doc_a long, doc_b long"
    )
    kept = sorted(r.doc_id for r in collapse_neardups(docs, pairs).collect())
    assert kept == [1, 10, 99]


# Property: for ANY target/batch, merge is idempotent and key-unique.
rows_strategy = st.lists(
    st.tuples(
        st.sampled_from(["A", "B", "C"]),          # key part 1
        st.integers(min_value=0, max_value=3),     # key part 2
        st.integers(min_value=0, max_value=100),   # value
        st.integers(min_value=0, max_value=9),     # recency
    ),
    max_size=8,
)


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(target_rows=rows_strategy, batch_rows=rows_strategy)
def test_merge_idempotent_and_unique_property(spark, target_rows, batch_rows):
    schema = "k1 string, k2 long, value long, rec long"
    t = spark.createDataFrame(target_rows, schema) if target_rows else spark.createDataFrame([], schema)
    b = spark.createDataFrame(batch_rows, schema) if batch_rows else spark.createDataFrame([], schema)
    # targets must be key-unique to start (the table invariant)
    from dockerized_data_pipeline_spark.operators.merge import dedup_keep_newest

    t = dedup_keep_newest(t, ["k1", "k2"], ["rec", "value"]) if target_rows else t
    once = merge_upsert(t, b, keys=["k1", "k2"], batch_order_by=["rec", "value"])
    assert duplicate_key_count(once, ["k1", "k2"]) == 0
    twice = merge_upsert(once, b, keys=["k1", "k2"], batch_order_by=["rec", "value"])
    assert {tuple(r) for r in once.collect()} == {tuple(r) for r in twice.collect()}
