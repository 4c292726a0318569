"""Physical-plan regression tests (SURVEY section 4 scale posture): assert
the optimizations we rely on at 100 TB actually appear in the plans --
predicate pushdown to the parquet scan, column pruning, broadcast joins for
dims, distributed top-k, and no Python row-UDFs on relational paths."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from dockerized_data_pipeline_spark import plans


def _formatted_plan(spark, sf_dir, name):
    df = plans.QUERIES[name](spark, sf_dir)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_q1_filter_pushdown_and_column_pruning(spark, sf_dir):
    plan = _formatted_plan(spark, sf_dir, "q1_pricing_summary")
    assert "PushedFilters" in plan
    assert "LessThanOrEqual(l_shipdate" in plan
    # pruned scan: only the 6 needed columns, not all 11
    read_schema = next(l for l in plan.splitlines() if "ReadSchema" in l)
    assert "l_orderkey" not in read_schema
    assert "l_quantity" in read_schema
    # two-phase hash aggregation (map-side partials)
    assert plan.count("HashAggregate") >= 2


def test_q5_dims_are_broadcast(spark, sf_dir):
    plan = _formatted_plan(spark, sf_dir, "q5_region_nation_revenue")
    assert plan.count("BroadcastHashJoin") >= 5
    assert "SortMergeJoin" not in plan


def test_o1_topk_is_take_ordered(spark, sf_dir):
    plan = _formatted_plan(spark, sf_dir, "o1_latest_orders_top10")
    assert "TakeOrderedAndProject" in plan
    assert "Exchange" not in plan.split("TakeOrderedAndProject")[0]


def test_p7_time_filter_pushed_to_scan(spark, sf_dir):
    """Time filters on the nano-timestamp events table must push the
    equivalent raw-nanos predicate to the parquet scan (load_events_range);
    filtering the converted column would read the whole table."""
    plan = _formatted_plan(spark, sf_dir, "p7_time_range_filter")
    assert "PushedFilters" in plan and "GreaterThanOrEqual(ts" in plan


def test_q7_dims_broadcast_and_filter_pushed(spark, sf_dir):
    """The two nation roles + supplier broadcast; the l_shipdate range
    reaches the lineitem scan; only fact-fact joins may shuffle."""
    plan = _formatted_plan(spark, sf_dir, "q7_nation_trade_volume")
    assert plan.count("BroadcastHashJoin") >= 3
    assert "PushedFilters" in plan
    assert "GreaterThanOrEqual(l_shipdate" in plan


def test_q15_joinback_broadcasts_scalar_max(spark, sf_dir):
    """The 1-row max and the supplier dim must broadcast -- the only
    shuffle is the revenue aggregation itself."""
    plan = _formatted_plan(spark, sf_dir, "q15_top_supplier")
    assert plan.count("BroadcastHashJoin") + plan.count("BroadcastNestedLoopJoin") >= 2
    assert plan.count("Exchange hashpartitioning") <= 2


# The only queries allowed an unbounded cartesian: the cross-join gallery
# (two tiny dims by construction) and the quadratic exact-cosine baseline
# (kept solely to verify the LSH scale path against).
_CARTESIAN_ALLOWED = {"join_cross_region_status", "x3_cosine_neardup_pairs"}


# The only queries sanctioned to cross the JVM->Python boundary at all
# (Arrow-batched stages: MapInPandas / MapInArrow / ArrowEvalPython /
# FlatMapGroupsInPandas). Everything relational must stay whole-stage
# codegen; an Arrow stage appearing anywhere else is a plan regression.
_ARROW_ALLOWED_PREFIXES = ("x4_",)  # media codecs (stdlib decode)
_ARROW_ALLOWED = {
    "x5_unicode_nfc",  # Python unicodedata.normalize, no JVM equivalent
    "x5_bpe_train",  # BPE merge-table fold (driver-iterative by design)
    "x5_bpe_tokenize",  # BPE apply: broadcast ranks into Arrow batches
    "x7_multimodal_dedup_census",  # composite over the x4 codec decoders
}
_ARROW_NODES = (
    "ArrowEvalPython",
    "MapInPandas",
    "MapInArrow",
    "FlatMapGroupsInPandas",
)


def test_no_python_row_udfs_or_cartesians_anywhere(spark, sf_dir):
    """One sweep over every registered plan: BatchEvalPython (row-at-a-time
    Python UDF) must not appear anywhere; Arrow-batched Python stages only
    on the allowlisted codec/NFC/BPE queries; CartesianProduct only on the
    two documented exceptions (scalar crossJoins must plan as broadcast,
    not cartesian)."""
    for name in plans.QUERIES:
        plan = _formatted_plan(spark, sf_dir, name)
        assert "BatchEvalPython" not in plan, name
        if not (
            name.startswith(_ARROW_ALLOWED_PREFIXES)
            or name in _ARROW_ALLOWED
        ):
            for node in _ARROW_NODES:
                assert node not in plan, f"{name}: unsanctioned {node}"
        if name not in _CARTESIAN_ALLOWED:
            assert "CartesianProduct" not in plan, name


def test_merge_plan_has_single_shuffle_per_side(spark, sf_dir):
    plan = _formatted_plan(spark, sf_dir, "s4_merge_upsert_events")
    # full-outer merge: at most one exchange per input branch plus AQE reads
    assert plan.count("Exchange hashpartitioning") <= 4


def test_q11_single_agg_shuffle_broadcast_total(spark, sf_dir):
    """The global total must ride a 1-row broadcast over the grouped
    values -- never a second lineitem pass or a shuffle join."""
    plan = _formatted_plan(spark, sf_dir, "q11_important_stock")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_q21_no_cartesian_and_supplier_broadcast(spark, sf_dir):
    """One per-order aggregate instead of correlated self-joins: no
    cartesian product; the supplier dim broadcasts."""
    plan = _formatted_plan(spark, sf_dir, "q21_waiting_supplier")
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan


def test_x8_split_is_single_scan_single_shuffle(spark, sf_dir):
    """Hash-split assignment is a per-row expression: exactly the one
    aggregation shuffle, no join, no extra pass over documents."""
    plan = _formatted_plan(spark, sf_dir, "x8_hash_split_summary")
    assert plan.count("Exchange hashpartitioning") <= 1
    assert "Join" not in plan


def test_top_ngrams_is_take_ordered_two_phase(spark, sf_dir):
    """The n-gram census must partial-aggregate map-side and finish with a
    distributed top-k, never a global sort of the full frequency table."""
    plan = _formatted_plan(spark, sf_dir, "x5_top_ngrams")
    assert "TakeOrderedAndProject" in plan
    assert plan.count("HashAggregate") >= 2
    assert "Sort " not in plan.split("TakeOrderedAndProject")[0]


def test_scalar_threshold_queries_broadcast_the_one_row_side(spark, sf_dir):
    """t8_skew_audit / x5_length_trim join a 1-row aggregate back over the
    scan: that side must broadcast; a shuffle join (or worse, a cartesian)
    on the big side would be a 100 TB scale bug."""
    for name in ("t8_skew_audit", "x5_length_trim"):
        plan = _formatted_plan(spark, sf_dir, name)
        assert (
            "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
        ), name
        assert "CartesianProduct" not in plan, name
        assert "SortMergeJoin" not in plan, name


def test_source_cap_never_single_partitions(spark, sf_dir):
    """bucketed_topk's final window must shuffle by key, not funnel the
    corpus through one partition."""
    plan = _formatted_plan(spark, sf_dir, "x8_source_cap")
    assert "Exchange SinglePartition" not in plan


def test_aqe_coalesces_small_shuffles(spark, sf_dir):
    """The session enables AQE; after execution the adaptive final plan
    must show coalesced shuffle reads on a small aggregation -- 32
    configured shuffle partitions would otherwise schedule 32 near-empty
    tasks per stage at every scale."""
    from dockerized_data_pipeline_spark import plans

    df = plans.QUERIES["a1_records_per_key"](spark, sf_dir)
    df.collect()  # AQE finalizes the plan only on execution
    final = df._jdf.queryExecution().executedPlan().toString()
    assert "AQEShuffleRead" in final and "coalesced" in final


def test_ts_gapfill_plan_shape(spark, sf_dir):
    """Gap-fill: grid explode is narrow (Generate after the span agg, no
    cartesian), the grid-observation join is a hash join, and the LOCF
    carry is a single Window."""
    plan = _formatted_plan(spark, sf_dir, "ts_hourly_gapfill_locf")
    assert "Generate" in plan and "explode" in plan
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan
    # exactly two windows: the resample dedup + the LOCF carry. The grid
    # branch must NOT re-run the resample window (spans come from the raw
    # bucketed scan) -- a third Window here means the span source regressed.
    assert plan.count("Window (") == 2


def test_winnow_overlap_is_hash_join_on_fingerprint(spark, sf_dir):
    """Overlap detection must bucket-join on the fingerprint (equi-join),
    never compare documents all-pairs."""
    plan = _formatted_plan(spark, sf_dir, "x8_winnow_overlap")
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    assert ("SortMergeJoin" in plan) or ("ShuffledHashJoin" in plan) or (
        "BroadcastHashJoin" in plan
    )


def test_variant_props_single_agg_shuffle(spark, sf_dir):
    plan = _formatted_plan(spark, sf_dir, "x6_variant_props")
    assert "BatchEvalPython" not in plan
    # partial + final aggregation, one exchange on the group key
    assert plan.count("Exchange hashpartitioning") <= 2


def test_runtime_bloom_filter_prunes_fact_scan(spark, sf_dir):
    """Scale posture: with a selective dim-side filter and a shuffle join,
    Catalyst injects a runtime bloom filter (bloom_filter_agg on the dim
    keys, might_contain on the fact scan) so the fact side drops non-
    joining rows BEFORE the shuffle. Size thresholds keep it off at test
    scale, so this test lowers them to prove the machinery engages -- at
    100 TB the defaults (10MB creation side) trigger on their own."""
    from pyspark.sql import functions as F

    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "10GB",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        o = spark.read.parquet(f"{sf_dir}/orders.parquet").filter(
            F.col("o_orderstatus") == "P"
        )
        j = (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .groupBy("o_orderstatus")
            .count()
        )
        import io
        from contextlib import redirect_stdout

        buf = io.StringIO()
        with redirect_stdout(buf):
            j.explain("formatted")
        plan = buf.getvalue()
        assert "bloom_filter_agg" in plan
        assert "might_contain" in plan
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def test_feature_hash_sparse_is_one_shuffle(spark, sf_dir):
    """The hashing-trick embedding must be explode -> two-phase hash-agg:
    exactly one exchange (keyed on doc,bucket), no join, no window."""
    import re

    plan = _formatted_plan(spark, sf_dir, "x5_feature_hash_sparse")
    # formatted output lists each node twice (tree + detail): count details
    assert len(re.findall(r"^\(\d+\) Exchange", plan, re.M)) == 1
    assert plan.count("HashAggregate") >= 2  # map-side partials
    assert "Join" not in plan
    assert "BatchEvalPython" not in plan


def test_centroid_purity_broadcasts_centroids(spark, sf_dir):
    """r11 shape: the per-label codebook collapses to ONE broadcast row
    (a BroadcastExchange feeding a single-row cross join -- bounded, not
    a real cartesian); the dot products are per-row array folds, so there
    is no sort-merge join and no n_vecs x dim x n_labels dot-join
    shuffle; the quantized corpus is materialized once (one checkpoint
    RDD feeds both the centroid build and the scoring pass)."""
    plan = _formatted_plan(spark, sf_dir, "x3_centroid_purity")
    assert "BroadcastExchange" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    # exactly two explodes: the centroid component stream + the tiny
    # per-row codebook explode (the r10 plan had four corpus explodes);
    # ") Generate" counts the details section, one entry per operator
    assert plan.count(") Generate") == 2


def test_shared_openings_dedups_before_self_join(spark, sf_dir):
    """The contamination matrix must aggregate (fp, source) down to a
    distinct set BEFORE the self-join -- the join input is the slim
    fingerprint table, never raw documents x documents."""
    plan = _formatted_plan(spark, sf_dir, "x8_shared_openings")
    pre_join = plan.split("Join")[0]
    assert "HashAggregate" in pre_join  # distinct runs upstream of the join
    assert "CartesianProduct" not in plan


def test_dynamic_partition_pruning_on_partitioned_fact(spark, sf_dir, tmp_path):
    """Scale posture: a fact table partitioned on the join key scans ONLY
    the partitions the filtered dim actually joins to -- Catalyst inserts
    a dynamic-pruning subquery into the fact's partition filters, so at
    100 TB a one-nation query reads 1/25th of the files instead of all of
    them. (Static pruning can't do this: the nation keys come from the
    dim filter at runtime.)"""
    from pyspark.sql import functions as F

    fact_path = str(tmp_path / "cust_by_nation")
    spark.read.parquet(f"{sf_dir}/customer.parquet").write.partitionBy(
        "c_nationkey"
    ).parquet(fact_path)
    fact = spark.read.parquet(fact_path)
    dim = spark.read.parquet(f"{sf_dir}/nation.parquet").filter(
        F.col("n_name") == "CHINA"
    )
    j = fact.join(dim, fact.c_nationkey == dim.n_nationkey).groupBy(
        "n_name"
    ).agg(F.count("*").alias("n"))

    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        j.explain("formatted")
    plan = buf.getvalue()
    assert "dynamicpruning" in plan.lower()
    # and the pruning actually lands on the fact scan's partition filters
    pf = [l for l in plan.splitlines() if "PartitionFilters" in l]
    assert pf and any("dynamicpruning" in l.lower() for l in pf)


def test_bigram_lift_takeordered_and_broadcast(spark, sf_dir):
    """Top-20 bigram selection must be distributed top-k, and the unigram
    join sides must broadcast the tiny 20-row side -- never sort-merge."""
    plan = _formatted_plan(spark, sf_dir, "x5_bigram_lift")
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_int8_quantize_is_single_scan_no_shuffle(spark, sf_dir):
    """Quantization is pure per-row expressions: zero exchanges."""
    plan = _formatted_plan(spark, sf_dir, "x3_int8_quantize")
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_range_window_partitions_by_user(spark, sf_dir):
    """The trailing-hour RANGE frame keys on high-cardinality user_id --
    one hash exchange for the window, nothing global."""
    plan = _formatted_plan(spark, sf_dir, "window_range_1h_sum")
    assert "hashpartitioning(user_id" in plan
    # no empty-frame global window (single-partition sort)
    assert "SinglePartition" not in plan


def test_epoch_upsample_explode_no_shuffle_before_agg(spark, sf_dir):
    """The copy explosion is engine-side row multiplication (Generate);
    the only exchanges are the two census aggregations + their join."""
    plan = _formatted_plan(spark, sf_dir, "x8_epoch_upsample")
    assert "Generate explode" in plan or "Generate" in plan
    assert "BatchEvalPython" not in plan
