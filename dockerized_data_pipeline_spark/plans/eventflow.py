"""Event-flow analytics over the ``events`` fixture: conversion funnels and
weekly retention cohorts -- the product-analytics queries a consumer of the
reference's event store would run next (the reference exposes only plain
per-key counts, README.md:202-226; these compose its building blocks).

Everything is counts + exact integer week arithmetic: no floats anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from .registry import query

@query(
    "funnel_view_click_purchase",
    oracle="""
    WITH v AS (
      SELECT user_id, MIN(ts) AS t_view FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ), c AS (
      SELECT e.user_id, MIN(e.ts) AS t_click
      FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'click' AND e.ts > v.t_view
      GROUP BY e.user_id
    ), p AS (
      SELECT e.user_id, MIN(e.ts) AS t_purchase
      FROM events e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.t_click
      GROUP BY e.user_id
    )
    SELECT 1 AS step, 'view' AS step_name,
           CAST((SELECT COUNT(*) FROM v) AS BIGINT) AS users
    UNION ALL
    SELECT 2, 'click', CAST((SELECT COUNT(*) FROM c) AS BIGINT)
    UNION ALL
    SELECT 3, 'purchase', CAST((SELECT COUNT(*) FROM p) AS BIGINT)
    """,
)
def funnel_view_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel: users who viewed, then clicked strictly
    after their first view, then purchased strictly after that first
    click. Three keyed aggregates chained by join -- each stage shuffles on
    user_id only (and reuses the same partitioning, so AQE collapses the
    exchanges); no window over the whole event log."""
    ev = load_table(spark, sf_dir, "events")

    def first_after(step: str, prev: DataFrame, prev_col: str, out_col: str) -> DataFrame:
        e = ev.filter(F.col("event_type") == step)
        return (
            e.join(prev, "user_id")
            .filter(F.col("ts") > F.col(prev_col))
            .groupBy("user_id")
            .agg(F.min("ts").alias(out_col))
        )

    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    c = first_after("click", v, "t_view", "t_click")
    p = first_after("purchase", c, "t_click", "t_purchase")

    def step_row(i: int, name: str, df: DataFrame) -> DataFrame:
        return df.agg(
            F.lit(i).alias("step"),
            F.lit(name).alias("step_name"),
            F.count("*").cast("bigint").alias("users"),
        )

    return (
        step_row(1, "view", v)
        .unionByName(step_row(2, "click", c))
        .unionByName(step_row(3, "purchase", p))
    )


@query(
    "cohort_weekly_retention",
    oracle="""
    WITH firsts AS (
      SELECT user_id, CAST(date_trunc('week', MIN(ts)) AS TIMESTAMP) AS cohort_week
      FROM events GROUP BY user_id
    ), activity AS (
      SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS TIMESTAMP) AS week
      FROM events
    )
    SELECT f.cohort_week,
           CAST((epoch_us(a.week) - epoch_us(f.cohort_week))
                // 604800000000 AS BIGINT) AS week_no,
           CAST(COUNT(*) AS BIGINT) AS active_users
    FROM activity a JOIN firsts f ON a.user_id = f.user_id
    GROUP BY f.cohort_week, week_no
    """,
)
def cohort_weekly_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly retention cohorts: users grouped by first-seen week, counted
    in each later week they were active. Two keyed aggregates + one join on
    user_id; week offsets in exact integer microsecond arithmetic."""
    ev = load_table(spark, sf_dir, "events")
    week = F.date_trunc("week", F.col("ts"))
    firsts = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    activity = ev.select("user_id", week.alias("week")).distinct()
    week_no = (
        (F.unix_micros(F.col("week")) - F.unix_micros(F.col("cohort_week")))
        / F.lit(604_800_000_000)
    ).cast("long")
    return (
        activity.join(firsts, "user_id")
        .groupBy("cohort_week", week_no.alias("week_no"))
        .agg(F.count("*").cast("bigint").alias("active_users"))
    )


@query(
    "graph_triangle_count",
    oracle="""
    WITH e AS (
      SELECT DISTINCT x.l_suppkey AS a, y.l_suppkey AS b
      FROM lineitem x JOIN lineitem y
        ON x.l_orderkey = y.l_orderkey AND x.l_suppkey < y.l_suppkey
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles
    FROM e e1
    JOIN e e2 ON e2.a = e1.b
    JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
    """,
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle count on the supplier co-order graph (edge = two suppliers
    appear in the same order), oriented a < b so each triangle counts
    once. r8: the Spark side switched from the ordered-edge 3-join to
    bitset adjacency intersection (operators/graph.py) -- this graph is
    DENSE (sf0.1: 1,000 nodes carrying 91% of all possible edges, 138M
    wedges), so the 3-join materialized 138M rows for a 1-row answer
    (13s); the mask intersection does 453k x 16 word ops (~0.5s). The
    DuckDB oracle keeps the 3-join formulation -- same count, and it
    documents the sparse-graph fallback plan."""
    from ..operators.graph import triangle_count_bitset

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    # per-order supplier sets + in-array pair expansion: one aggregation
    # shuffle instead of a lineitem self-join (2x faster at sf0.1, and the
    # per-order pair fanout is bounded by order size, not join hash builds)
    sets = li.groupBy("l_orderkey").agg(
        F.array_sort(F.collect_set("l_suppkey")).alias("ss")
    )
    edges = (
        sets.select(
            F.explode(
                F.expr(
                    "flatten(transform(ss, (v, i) -> "
                    "transform(slice(ss, i + 2, size(ss)), w -> struct(v as a, w as b))))"
                )
            ).alias("p")
        )
        .select("p.a", "p.b")
        .distinct()
        # materialized once: the edge table feeds the node dictionary,
        # the mask build, and the probe side (at real scale this is
        # "write the edge table", exactly like the winnow fingerprint
        # stage in x8_winnow_overlap)
        .localCheckpoint(eager=True)
    )
    return triangle_count_bitset(edges)


@query(
    "diff_orders_snapshot",
    oracle="""
    WITH v2 AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 100 = 0
                  THEN o_totalprice + 1 ELSE o_totalprice END AS o_totalprice,
             o_orderstatus
      FROM orders WHERE o_orderkey % 97 <> 0
    ), ins AS (
      SELECT -o_orderkey AS o_orderkey, o_totalprice, o_orderstatus
      FROM orders WHERE o_orderkey % 101 = 0
    ), snap AS (
      SELECT * FROM v2 UNION ALL SELECT * FROM ins
    ), d AS (
      SELECT COALESCE(o.o_orderkey, s.o_orderkey) AS k,
        CASE
          WHEN o.o_orderkey IS NULL THEN 'added'
          WHEN s.o_orderkey IS NULL THEN 'removed'
          WHEN o.o_totalprice IS NOT DISTINCT FROM s.o_totalprice
               AND o.o_orderstatus IS NOT DISTINCT FROM s.o_orderstatus
               THEN 'same'
          ELSE 'changed'
        END AS change_type
      FROM orders o FULL OUTER JOIN snap s ON o.o_orderkey = s.o_orderkey
    )
    SELECT change_type, CAST(COUNT(*) AS BIGINT) AS n
    FROM d GROUP BY change_type
    """,
)
def diff_orders_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reconciliation report between orders and a deterministically mutated
    snapshot (every 97th key removed, every 100th price bumped, negated
    every-101st keys inserted) via operators/tablediff.py: one full-outer
    join on the key, null-safe struct comparison, count per change_type."""
    from ..operators.tablediff import diff_summary

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    v2 = o.filter(F.col("o_orderkey") % 97 != 0).withColumn(
        "o_totalprice",
        F.when(
            F.col("o_orderkey") % 100 == 0, F.col("o_totalprice") + 1
        ).otherwise(F.col("o_totalprice")),
    )
    ins = o.filter(F.col("o_orderkey") % 101 == 0).withColumn(
        "o_orderkey", -F.col("o_orderkey")
    )
    snap = v2.unionByName(ins)
    return diff_summary(o, snap, ["o_orderkey"])


def _cp_one_edit(x: str, y: str) -> str:
    """Codepoint-exact ``levenshtein(x, y) <= 1`` as portable DuckDB SQL
    (r11, VERDICT task 4): DuckDB's ``levenshtein`` is BYTE-based while
    Spark's is CODEPOINT-based (pinned: lev('中文处理','中文処理') = 2 in
    duck, 1 in Spark; NFC 'café' vs NFD = 3 vs 2), so the Unicode-names
    tier needs the verification predicate rebuilt from primitives both
    engines agree on -- SUBSTRING and LENGTH are codepoint-indexed in
    both (verified, incl. combining marks and ZWJ emoji).
    Uses the standard one-edit identity:
    dist(x,y) <= 1  <=>  |len(x)-len(y)| <= 1  AND
                         lcp(x,y) + lcs(x,y) >= max(len) - 1
    where lcp/lcs are longest common prefix/suffix in codepoints, found
    via list_position of the first mismatch. Exact, not approximate --
    candidates already share a deletion key, and the identity is
    airtight for every string pair. NULLIF guard: DuckDB 1.0
    list_position returns 0 (not NULL) when the element is absent, so
    an all-match prefix must map to mn via NULLIF(pos, 0)."""
    mn = f"LEAST(LENGTH({x}), LENGTH({y}))"
    lcp = (
        f"COALESCE(NULLIF(list_position(list_transform(range(1, {mn} + 1), "
        f"i -> SUBSTRING({x}, i, 1) = SUBSTRING({y}, i, 1)), false), 0) - 1, {mn})"
    )
    lcs = (
        f"COALESCE(NULLIF(list_position(list_transform(range(1, {mn} + 1), "
        f"i -> SUBSTRING({x}, LENGTH({x}) - i + 1, 1) = "
        f"SUBSTRING({y}, LENGTH({y}) - i + 1, 1)), false), 0) - 1, {mn})"
    )
    return (
        f"(ABS(LENGTH({x}) - LENGTH({y})) <= 1 AND "
        f"{lcp} + {lcs} >= GREATEST(LENGTH({x}), LENGTH({y})) - 1)"
    )


@query(
    "fuzzy_name_pairs",
    oracle=f"""
    WITH k AS (
      SELECT c_custkey AS id, c_name AS name,
             unnest(list_prepend(c_name,
               list_transform(range(1, LENGTH(c_name) + 1),
                 i -> SUBSTRING(c_name, 1, i - 1) || SUBSTRING(c_name, i + 1)
               ))) AS key
      FROM customer
    ), cand AS (
      SELECT DISTINCT a.id AS id_a, b.id AS id_b,
                      a.name AS name_a, b.name AS name_b
      FROM k a JOIN k b ON a.key = b.key AND a.id < b.id
    )
    SELECT id_a, id_b, name_a, name_b,
           CAST(CASE WHEN name_a = name_b THEN 0 ELSE 1 END AS BIGINT) AS distance
    FROM cand WHERE {_cp_one_edit('name_a', 'name_b')}
    """,
)
def fuzzy_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution: customer-name pairs within edit distance 1 via
    the SymSpell deletion-neighborhood join (operators/fuzzyjoin.py) --
    recall-complete for one edit, no cross join. r10: the key join runs
    over DISTINCT names only (the r9 row-level form was the scale
    report's one super-linear entry -- 21.9x time for 12x output at
    sf10, quadratic in name-duplicate density); identical-name pairs
    come from a direct name-equality join (pure output
    materialization), so join cost tracks distinct names, output cost
    tracks the answer."""
    from ..operators.fuzzyjoin import symspell_pairs

    c = load_table(spark, sf_dir, "customer")
    return symspell_pairs(c, "c_custkey", "c_name", max_distance=1).select(
        F.col("id_a"), F.col("id_b"), "name_a", "name_b", "distance"
    )


# Deletion keys of the distinct-name table, Spark-equivalent dedup
# (array_union) included -- shared by the three capped/cluster oracles.
_FZ_KEYS_CTE = """
    dn AS (
      SELECT c_name AS name, MIN(c_custkey) AS rep
      FROM customer WHERE c_name IS NOT NULL GROUP BY c_name
    ),
    k AS (
      SELECT name, rep,
             unnest(list_distinct(list_prepend(name,
               list_transform(range(1, LENGTH(name) + 1),
                 i -> SUBSTRING(name, 1, i - 1) || SUBSTRING(name, i + 1)
               )))) AS key
      FROM dn
    )"""

_FZ_KEY_CAP = 8  # drops the hottest zero-padded-prefix deletion buckets
# at sf0.01 (sizes 24/29) while keeping digit-substitution keys -- real
# drop accounting on the driver fixture, not a no-op cap


@query(
    "fuzzy_name_pairs_capped",
    oracle=f"""
    WITH {_FZ_KEYS_CTE},
    kk AS (
      SELECT name, key FROM k
      QUALIFY COUNT(*) OVER (PARTITION BY key) <= {_FZ_KEY_CAP}
    ),
    ne AS (
      SELECT DISTINCT a.name AS nx, b.name AS ny
      FROM kk a JOIN kk b ON a.key = b.key AND a.name < b.name
    ),
    ver AS (
      SELECT nx, ny, CAST(1 AS BIGINT) AS distance
      FROM ne WHERE {_cp_one_edit('nx', 'ny')}
    ),
    intra AS (
      SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
             a.c_name AS name_a, b.c_name AS name_b,
             CAST(0 AS BIGINT) AS distance
      FROM customer a JOIN customer b
        ON a.c_name = b.c_name AND a.c_custkey < b.c_custkey
    ),
    crossed AS (
      SELECT LEAST(x.c_custkey, y.c_custkey) AS id_a,
             GREATEST(x.c_custkey, y.c_custkey) AS id_b,
             CASE WHEN x.c_custkey < y.c_custkey THEN v.nx ELSE v.ny END AS name_a,
             CASE WHEN x.c_custkey < y.c_custkey THEN v.ny ELSE v.nx END AS name_b,
             v.distance
      FROM ver v
      JOIN customer x ON x.c_name = v.nx
      JOIN customer y ON y.c_name = v.ny
    )
    SELECT * FROM intra UNION ALL SELECT * FROM crossed
    """,
)
def fuzzy_name_pairs_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hot-key-capped fuzzy join (r10, VERDICT task 4): deletion keys
    shared by more than {cap} distinct names are dropped before the key
    join, bounding it at n_keys * cap^2 however degenerately names
    collide (the zero-padded fixture prefix is itself such a
    degeneracy). Recall tradeoff, never precision; drops are first-class
    observable via fuzzy_key_bucket_profile."""
    from ..operators.fuzzyjoin import symspell_pairs

    c = load_table(spark, sf_dir, "customer")
    return symspell_pairs(
        c, "c_custkey", "c_name", max_distance=1,
        max_key_bucket_size=_FZ_KEY_CAP,
    ).select(F.col("id_a"), F.col("id_b"), "name_a", "name_b", "distance")


@query(
    "fuzzy_key_bucket_profile",
    oracle=f"""
    WITH {_FZ_KEYS_CTE}
    SELECT CAST(bs AS BIGINT) AS bucket_size,
           CAST(COUNT(*) AS BIGINT) AS n_keys,
           bs > {_FZ_KEY_CAP} AS dropped_at_cap
    FROM (SELECT COUNT(*) AS bs FROM k GROUP BY key)
    GROUP BY bs
    """,
)
def fuzzy_key_bucket_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(bucket_size, n_keys, dropped_at_cap) histogram of the
    distinct-name deletion-key table -- the drop-accounting diagnostic
    paired with fuzzy_name_pairs_capped (same design as
    x2_lsh_bucket_skew_profile)."""
    from ..operators.fuzzyjoin import deletion_key_profile

    c = load_table(spark, sf_dir, "customer")
    return deletion_key_profile(c, "c_name", _FZ_KEY_CAP)


@query(
    "fuzzy_name_clusters",
    oracle=f"""
    WITH RECURSIVE {_FZ_KEYS_CTE},
    kk AS (
      SELECT name, rep, key FROM k
      QUALIFY COUNT(*) OVER (PARTITION BY key) <= {_FZ_KEY_CAP}
    ),
    ne AS (
      SELECT DISTINCT a.rep AS rx, b.rep AS ry, a.name AS nx, b.name AS ny
      FROM kk a JOIN kk b ON a.key = b.key AND a.name < b.name
    ),
    ver AS (SELECT rx, ry FROM ne WHERE {_cp_one_edit('nx', 'ny')}),
    edges AS (
      SELECT rx AS s, ry AS t FROM ver UNION SELECT ry, rx FROM ver
    ),
    reach(n, r) AS (
      SELECT rep, rep FROM dn
      UNION
      SELECT reach.n, e.t FROM reach JOIN edges e ON reach.r = e.s
    ),
    labels AS (SELECT n AS rep, MIN(r) AS root FROM reach GROUP BY n)
    SELECT c.c_custkey AS id, COALESCE(l.root, c.c_custkey) AS cluster_id
    FROM customer c
    LEFT JOIN dn ON c.c_name = dn.name
    LEFT JOIN labels l ON dn.rep = l.rep
    """,
)
def fuzzy_name_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear-output entity resolution (r10, VERDICT task 4): connected
    components over the NAME edge graph -- one (id, cluster_id) row per
    customer, cluster_id = min custkey of the fuzzy-connected group.
    The 100-TB posture for dense-duplicate corpora: pair output is
    quadratic in duplicate density, cluster output never materializes
    pairs at all (operators/fuzzyjoin.py symspell_clusters +
    operators/dedup.py neardup_clusters min-label propagation). Runs
    WITH the hot-key cap (r10: the uncapped name-edge set OOMed a 32g
    heap at sf10 -- the zero-padded fixture prefix makes deletion-key
    buckets grow linearly with the corpus, so candidate generation must
    be bounded for the cluster form to BE the scale path; the capped
    edge graph is what production would cluster, drops accounted by
    fuzzy_key_bucket_profile)."""
    from ..operators.fuzzyjoin import symspell_clusters

    c = load_table(spark, sf_dir, "customer")
    return symspell_clusters(
        c, "c_custkey", "c_name", max_distance=1,
        max_key_bucket_size=_FZ_KEY_CAP,
    )


@query(
    "ab_test_conversion",
    oracle="""
    WITH assign AS (
      SELECT DISTINCT user_id,
             CASE WHEN SUBSTRING(md5(CAST(user_id AS VARCHAR)), 1, 1)
                       IN ('0','1','2','3','4','5','6','7')
                  THEN 'A' ELSE 'B' END AS variant
      FROM events
    ), v AS (
      SELECT user_id, MIN(ts) AS t_view FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ), conv AS (
      SELECT DISTINCT e.user_id
      FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'purchase' AND e.ts > v.t_view
    )
    SELECT a.variant,
           CAST(COUNT(*) AS BIGINT) AS n_exposed,
           CAST(COUNT(c.user_id) AS BIGINT) AS n_converted
    FROM assign a
    JOIN v ON a.user_id = v.user_id
    LEFT JOIN conv c ON a.user_id = c.user_id
    GROUP BY a.variant
    """,
)
def ab_test_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Experiment readout: users hash-assigned to variants (first md5 hex
    nibble -- the same content-addressed split discipline as
    x8_hash_split), exposure = has a view, conversion = purchase strictly
    after the first view. Exact counts per variant; significance math is
    the consumer's job. All joins are keyed on user_id and reuse one
    partitioning."""
    ev = load_table(spark, sf_dir, "events")
    assign = ev.select("user_id").distinct().withColumn(
        "variant",
        F.when(
            F.substring(F.md5(F.col("user_id").cast("string")), 1, 1).isin(
                *"01234567"
            ),
            F.lit("A"),
        ).otherwise(F.lit("B")),
    )
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    conv = (
        ev.filter(F.col("event_type") == "purchase")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .select("user_id")
        .distinct()
        .withColumn("__c", F.lit(1))
    )
    return (
        assign.join(v, "user_id")
        .join(conv, "user_id", "left")
        .groupBy("variant")
        .agg(
            F.count("*").cast("bigint").alias("n_exposed"),
            F.count("__c").cast("bigint").alias("n_converted"),
        )
    )


@query(
    "s4_cdc_apply",
    oracle="""
    WITH target AS (
      SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
    ), feed AS (
      SELECT 'D' AS op, o_orderkey, o_orderstatus, o_totalprice, 1 AS seq
      FROM orders WHERE o_orderkey % 7 = 0
      UNION ALL
      SELECT 'U', o_orderkey, 'X', o_totalprice + 1, 2
      FROM orders WHERE o_orderkey % 5 = 0
      UNION ALL
      SELECT 'I', -o_orderkey, 'N', o_totalprice, 1
      FROM orders WHERE o_orderkey % 11 = 0
    ), newest AS (
      SELECT op, o_orderkey, o_orderstatus, o_totalprice FROM feed
      QUALIFY ROW_NUMBER() OVER (PARTITION BY o_orderkey
                                 ORDER BY seq DESC, op DESC) = 1
    ), merged AS (
      SELECT COALESCE(t.o_orderkey, u.o_orderkey) AS o_orderkey,
             COALESCE(u.o_orderstatus, t.o_orderstatus) AS o_orderstatus,
             COALESCE(u.o_totalprice, t.o_totalprice) AS o_totalprice
      FROM target t
      FULL OUTER JOIN (SELECT * FROM newest WHERE op <> 'D') u
        ON t.o_orderkey = u.o_orderkey
    )
    SELECT m.o_orderkey, m.o_orderstatus,
           CAST(ROUND(m.o_totalprice * 100) AS BIGINT) AS cents
    FROM merged m
    ANTI JOIN (SELECT o_orderkey FROM newest WHERE op = 'D') d
      ON m.o_orderkey = d.o_orderkey
    """,
)
def s4_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC changefeed application as a pure transform (operators/merge.py
    apply_cdc): a deterministic derived feed deletes every 7th key,
    updates every 5th (status 'X', price +1), and inserts negated copies
    of every 11th; per-key terminal state wins (a key both updated and
    deleted deletes -- seq then op 'U' > 'D' > 'I' as the tiebreak). The
    oracle replays the same dedup + upsert + anti-join in SQL."""
    from ..operators.merge import apply_cdc

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    feed = (
        o.filter(F.col("o_orderkey") % 7 == 0)
        .select(
            F.lit("D").alias("op"), "o_orderkey", "o_orderstatus",
            "o_totalprice", F.lit(1).alias("seq"),
        )
        .unionByName(
            o.filter(F.col("o_orderkey") % 5 == 0).select(
                F.lit("U").alias("op"), "o_orderkey",
                F.lit("X").alias("o_orderstatus"),
                (F.col("o_totalprice") + 1).alias("o_totalprice"),
                F.lit(2).alias("seq"),
            )
        )
        .unionByName(
            o.filter(F.col("o_orderkey") % 11 == 0).select(
                F.lit("I").alias("op"),
                (-F.col("o_orderkey")).alias("o_orderkey"),
                F.lit("N").alias("o_orderstatus"),
                "o_totalprice", F.lit(1).alias("seq"),
            )
        )
    )
    applied = apply_cdc(o, feed, ["o_orderkey"], order_by=["seq", "op"])
    return applied.select(
        "o_orderkey",
        "o_orderstatus",
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
