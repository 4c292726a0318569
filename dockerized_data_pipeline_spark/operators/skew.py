"""Skew-resilient operators (100 TB posture): salting for hot join keys,
and composite-key ("bucketed") windows for low-cardinality partition keys.

A window partitioned by a 3-value key is three single-task sorts: correct
at any scale Spark can hold one partition's rows in, then a straggler,
then an OOM. The bucketed variants below split each window partition by a
composite key, compute locally, and merge with a provably-equivalent
second phase over bounded data.

AQE's skew-join handling (on by default in session.py) splits oversized
sort-merge partitions at runtime and is the first line of defense. Salting
is the explicit fallback for pathological keys or non-SMJ plans: the skewed
(large) side gets a deterministic content-hash salt in [0, salt_buckets);
the small side is replicated across all buckets; the join key becomes
(key, salt), spreading one hot key over salt_buckets tasks.

Correctness: every large-side row joins exactly once (its salt matches
exactly one replica), so results equal the unsalted join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _contains_map(dt: T.DataType) -> bool:
    if isinstance(dt, T.MapType):
        return True
    if isinstance(dt, T.ArrayType):
        return _contains_map(dt.elementType)
    if isinstance(dt, T.StructType):
        return any(_contains_map(f.dataType) for f in dt.fields)
    return False


def _hashable_cols(df: DataFrame) -> list[str]:
    """Columns xxhash64 accepts: Spark rejects MapType (at any nesting
    depth) because map iteration order makes the hash non-deterministic
    (spark.sql.legacy.allowHashOnMapType gates it off)."""
    return [f.name for f in df.schema.fields if not _contains_map(f.dataType)]


def _free_name(base: str, *dfs: DataFrame) -> str:
    """``base`` or the first numbered variant colliding with no input
    column, so internal working columns never clobber user data."""
    taken = {c for df in dfs for c in df.columns}
    name, i = base, 0
    while name in taken:
        i += 1
        name = f"{base}{i}"
    return name


def salt_expr(df: DataFrame, salt_buckets: int, seed: int = 42) -> Column:
    """Deterministic per-row salt in [0, salt_buckets): a content hash of
    every hashable column plus the seed (MapType columns are skipped --
    xxhash64 rejects them since map iteration order is undefined).

    Unlike ``F.rand`` this is stable under task retry (a re-executed task
    re-derives the same salts, so the (key, salt) join keys a downstream
    stage already consumed cannot change) and independent of partition
    layout. Rows that are full-content duplicates share a salt, which only
    narrows the spread when one (key, payload) pair dominates -- not a skew
    shape salting can help with anyway. A frame whose every column is
    map-typed degrades to a constant salt: the join stays correct, the
    spread is lost -- project a hashable discriminator column first.
    """
    cols = _hashable_cols(df)
    return F.pmod(
        F.xxhash64(F.lit(seed), *cols), F.lit(salt_buckets)
    ).cast("int")


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: str,
    salt_buckets: int = 8,
    how: str = "inner",
    seed: int = 42,
) -> DataFrame:
    """Equi-join large><small on ``on`` with the large side salted.

    ``small`` is replicated salt_buckets times -- use only when small is
    genuinely the smaller side (dimension-sized).

    The operator's spread guarantee is per SALT BUCKET: a hot key's rows
    split across ``salt_buckets`` distinct (key, salt) join keys. How those
    buckets map onto physical shuffle partitions is the partitioner's
    business (two buckets legally hash into one partition at small
    partition counts); size assertions belong on bucket counts, not
    ``spark_partition_id()``.
    """
    salt = _free_name("__salt", large, small)
    salted_large = large.withColumn(salt, salt_expr(large, salt_buckets, seed))
    replicated_small = small.withColumn(
        salt, F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    out = salted_large.join(replicated_small, [on, salt], how)
    return out.drop(salt)


def bucketed_topk(
    df: DataFrame,
    partition_cols: list[str],
    order_by: list[Column],
    k: int,
    buckets: int = 32,
    rank_col: str = "rk",
) -> DataFrame:
    """Top-k rows per partition key without a single-task sort.

    Phase 1 hashes every row into one of ``buckets`` sub-buckets and
    takes the local top-k within (partition, bucket) -- each sort touches
    ~1/buckets of the key's rows. Phase 2 ranks only the surviving
    buckets*k rows per key, a bounded input regardless of corpus size.
    Equivalent to a plain row_number window because each global top-k row
    is necessarily in the top-k of its own bucket. ``order_by`` must be a
    deterministic total order (include a unique tiebreak column).
    """
    bkt = _free_name("__bkt", df)
    lrk = _free_name("__lrk", df)
    d = df.withColumn(
        bkt, F.pmod(F.xxhash64(F.lit(0), *_hashable_cols(df)), F.lit(buckets))
    )
    w_local = Window.partitionBy(*partition_cols, bkt).orderBy(*order_by)
    survivors = (
        d.withColumn(lrk, F.row_number().over(w_local))
        .filter(F.col(lrk) <= k)
        .drop(lrk, bkt)
    )
    w_final = Window.partitionBy(*partition_cols).orderBy(*order_by)
    return survivors.withColumn(rank_col, F.row_number().over(w_final)).filter(
        F.col(rank_col) <= k
    )


def bucketed_running_sum(
    df: DataFrame,
    partition_cols: list[str],
    order_cols: list[str],
    value: Column,
    bucket: Column,
    out_col: str = "running_value",
) -> DataFrame:
    """Running (prefix) sum per partition key without a single-task sort.

    ``bucket`` must be a coarse expression MONOTONE NON-DECREASING in the
    ordering (e.g. ``to_date(ts)`` when ordering by ts): then a row's
    running sum = (sum of all earlier buckets) + (running sum within its
    own bucket). Phase 1 windows over (partition, bucket) -- bounded
    sorts; phase 2 prefix-sums the per-bucket totals (one tiny row per
    bucket) and broadcast-joins the offsets back. Use DECIMAL values: the
    merge re-associates additions, which is exact for decimals only.
    """
    bkt = _free_name("__bkt", df)
    loc = _free_name("__local", df)
    off = _free_name("__off", df)
    d = df.withColumn(bkt, bucket)
    w_local = (
        Window.partitionBy(*partition_cols, bkt)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = d.withColumn(loc, F.sum(value).over(w_local))
    totals = d.groupBy(*partition_cols, bkt).agg(F.sum(value).alias("__tot"))
    w_off = (
        Window.partitionBy(*partition_cols)
        .orderBy(bkt)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # eqNullSafe join (r10, found by the NULL-injected oracle tier): the
    # partition key and the bucket are both nullable (NULL event_type
    # partitions; to_date(NULL ts) buckets), and a plain-equality join
    # drops their offset rows -- every NULL-keyed running sum silently
    # restarted at 0 (the repo-wide NULL-key discipline; see merge.py).
    keys = [*partition_cols, bkt]
    ren = {c: _free_name(f"__o{i}", df) for i, c in enumerate(keys)}
    offsets = totals.withColumn(off, F.sum("__tot").over(w_off)).select(
        *[F.col(c).alias(ren[c]) for c in keys], off
    )
    cond = F.lit(True)
    for c in keys:
        cond = cond & F.col(c).eqNullSafe(F.col(ren[c]))
    joined = local.join(F.broadcast(offsets), cond, "left").drop(
        *ren.values()
    )
    zero = F.lit(0).cast(dict(offsets.dtypes)[off])  # exact type match
    # NULL-value semantics (r10, found by the NULL-injected oracle tier):
    # a plain-window running SUM is NULL only while the frame holds NO
    # non-NULL value yet. The split form must reproduce that: `loc` is
    # NULL whenever the row's in-bucket prefix is all-NULL (even though
    # earlier BUCKETS contributed real values), so `off + loc` poisoned
    # the total to NULL mid-partition. NULL only when BOTH parts are.
    run = F.when(
        F.col(off).isNull() & F.col(loc).isNull(),
        F.lit(None).cast(dict(offsets.dtypes)[off]),
    ).otherwise(F.coalesce(F.col(off), zero) + F.coalesce(F.col(loc), zero))
    return joined.withColumn(out_col, run).drop(bkt, loc, off)


def hot_key_salted_join(
    large: DataFrame,
    small: DataFrame,
    on: str,
    hot_threshold: int = 1_000_000,
    salt_buckets: int = 8,
    how: str = "inner",
    seed: int = 42,
    hot_keys: DataFrame | None = None,
) -> DataFrame:
    """Partial salting: salt ONLY the hot keys, join the cold majority
    plain.

    Full salting replicates the entire small side salt_buckets times --
    at 100 TB that multiplies the broadcast/shuffle for every key to fix
    a handful. Here keys whose large-side row count exceeds
    ``hot_threshold`` are split onto the salted path; everything else
    takes the ordinary join untouched, so the replication cost is
    O(hot keys), not O(small side).

    ``hot_keys``: pass a precomputed one-column DataFrame of hot key
    values (e.g. from the t8_skew_audit query or table statistics) to
    skip the detection aggregate; by default one count-per-key pass over
    the large side finds them. The hot-key set must be broadcast-sized --
    that is the premise of skew (few pathological keys).

    Correctness: the two branches partition the large side's rows by key
    (semi/anti on the same hot set), each branch equals the plain join
    restricted to its keys, and their union is the plain join. Supports
    how='inner' and how='left' (right/full would drop unmatched small
    rows at the branch boundary).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"hot_key_salted_join supports inner/left, got {how!r}")
    if hot_keys is None:
        hot_keys = (
            large.groupBy(on)
            .agg(F.count("*").alias("__n"))
            .filter(F.col("__n") > hot_threshold)
            .select(on)
        )
    hot_keys = F.broadcast(hot_keys)
    large_hot = large.join(hot_keys, on, "left_semi")
    large_cold = large.join(hot_keys, on, "left_anti")
    small_hot = small.join(hot_keys, on, "left_semi")
    cold = large_cold.join(small, on, how)
    hot = salted_join(large_hot, small_hot, on, salt_buckets, how, seed)
    return cold.unionByName(hot)
