"""r10 fuzzy-join additions: hot-key cap accounting and cluster output
(operators/fuzzyjoin.py -- the VERDICT task-4 rewrite; the distinct-name
pair path itself is pinned by the brute-force property test in
test_new_ops_property.py and the 4-tier oracle)."""

from __future__ import annotations

from pyspark.sql import functions as F

from dockerized_data_pipeline_spark.operators.fuzzyjoin import (
    deletion_key_profile,
    symspell_clusters,
    symspell_pairs,
)


def _df(spark, names):
    return spark.createDataFrame(
        [(i, n) for i, n in enumerate(names)], "id long, name string"
    )


def test_cap_drops_only_hot_key_pairs_and_profile_accounts(spark):
    # "aa".."aj": every cross pair's ONLY shared deletion key is the
    # hot "a" bucket (10 distinct names), so a cap of 5 drops every
    # cross pair -- the recall tradeoff at its starkest. Exact
    # duplicates ("zz" x2) never enter the key join and must survive
    # any cap.
    names = [c1 + c2 for c1 in "a" for c2 in "abcdefghij"] + ["zz", "zz"]
    df = _df(spark, names)
    full = {
        (r.id_a, r.id_b) for r in symspell_pairs(df, "id", "name").collect()
    }
    capped = {
        (r.id_a, r.id_b)
        for r in symspell_pairs(
            df, "id", "name", max_key_bucket_size=5
        ).collect()
    }
    assert capped <= full
    assert capped == {(10, 11)}, capped  # the duplicate-name pair only
    # drop accounting: the profile must show a bucket of 10 (> cap) and
    # mark it dropped
    prof = {
        (r.bucket_size, r.n_keys, r.dropped_at_cap)
        for r in deletion_key_profile(df, "name", 5).collect()
    }
    assert any(bs == 10 and dropped for bs, _n, dropped in prof), prof
    assert any(not dropped for _bs, _n, dropped in prof), prof


def test_clusters_collapse_transitive_chain_and_null_names(spark):
    # chain ab ~ ac ~ dc (ab~dc are distance 2, connected only
    # transitively); xx isolated; two NULL-named rows are singletons
    df = spark.createDataFrame(
        [(1, "ab"), (2, "ac"), (3, "dc"), (4, "xx"), (5, None), (6, None)],
        "id long, name string",
    )
    got = {
        r.id: r.cluster_id
        for r in symspell_clusters(df, "id", "name").collect()
    }
    assert got[1] == got[2] == got[3] == 1  # min id of the component
    assert got[4] == 4
    assert got[5] == 5 and got[6] == 6  # NULL names never fuzzy-match
    # exact duplicates share their name group's min id even with no edges
    df2 = _df(spark, ["zz", "zz", "zz"])
    got2 = {
        r.id: r.cluster_id for r in symspell_clusters(df2, "id", "name").collect()
    }
    assert got2 == {0: 0, 1: 0, 2: 0}


def test_pairs_identical_names_distance_zero(spark):
    df = _df(spark, ["same", "same", "samf"])
    rows = {
        (r.id_a, r.id_b, r.distance)
        for r in symspell_pairs(df, "id", "name").collect()
    }
    assert rows == {(0, 1, 0), (0, 2, 1), (1, 2, 1)}
