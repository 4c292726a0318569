"""Fuzzy (approximate-string) self-join via the SymSpell deletion
neighborhood: entity resolution / near-duplicate name matching without the
O(n^2) cross join.

For edit distance <= 1, two strings match only if they share a key in
{s} ∪ {s minus one character}: a substitution at position i makes the two
i-deletions equal; an insertion/deletion makes one string a deletion
variant of the other. Joining on that key set is therefore RECALL-COMPLETE
for distance <= 1 (unlike frequency-capped q-gram blocking, which silently
drops pairs in low-entropy regions -- e.g. names sharing a long constant
prefix).

Scale design (r10, VERDICT task 4 -- the one plan marked weak). Two
costs are unbounded in the uncapped pair enumeration, with a guard for
each, mirroring the r9 LSH design:

  * hot deletion keys (the zero-padded fixture prefix makes digit-
    deletion buckets grow LINEARLY with the corpus, so the bucket join
    grows quadratically -- the measured sf1->sf10 21.9x) ->
    ``max_key_bucket_size`` drops keys shared by more than the cap
    (recall tradeoff, never precision; sf10 capped: 36s vs 952s
    uncapped in r9), observable via ``deletion_key_profile``;
  * the PAIR OUTPUT itself is quadratic in duplicate density (inherent
    to pair semantics) -> ``symspell_clusters`` is the linear-output
    form: connected components over the name-edge graph, one
    (id, cluster_id) row per input row (sf10: 54s).

The capped and cluster paths work at NAME granularity: collapse rows to
distinct names (one hash-agg), deletion-key self-join + exact
``levenshtein`` verification per distinct NAME PAIR, then expand back by
name-keyed joins -- join cost tracks distinct names (cap semantics are
defined on them), expansion is output-bound, and identical-name pairs
never enter the key join at all (pure output materialization). The
UNCAPPED pair form keeps the direct row-level join: on low-duplicate
corpora it avoids the expansion joins entirely (sf1: 43s vs 112s
measured for the name-collapsed form), and on dense-duplicate corpora
its output is quadratic anyway -- it is the exhaustive verification
baseline, the same role x3_cosine_neardup_pairs plays for ANN; the
capped/cluster forms are the 100 TB paths.

All built-in expressions; no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _deletion_keys(col: F.Column) -> F.Column:
    """{s} ∪ {s with character i removed}, as a deduplicated array."""
    deletions = F.transform(
        F.sequence(F.lit(1), F.length(col)),
        lambda i: F.concat(
            F.substring(col, F.lit(1), i - 1),
            col.substr(i + 1, F.length(col)),
        ),
    )
    return F.array_union(F.array(col), deletions)


def _distinct_names(base: DataFrame) -> DataFrame:
    """(name, rep) -- distinct non-NULL names with their minimum id as
    representative. NULL names never fuzzy-match anything (SQL equality
    semantics, same as the r9 row-level form where a NULL name exploded
    to zero keys)."""
    return (
        base.filter(F.col("name").isNotNull())
        .groupBy("name")
        .agg(F.min("id").alias("rep"))
    )


def _keyed_names(dn: DataFrame, max_key_bucket_size: int | None) -> DataFrame:
    """Deletion-key table over distinct names: (name, rep, key), one row
    per (name, key) -- ``_deletion_keys`` dedups within a name, so a
    per-key row count IS a distinct-name bucket size. With a cap, keys
    shared by more distinct names are dropped (see module doc)."""
    keyed = dn.select(
        "name", "rep", F.explode(_deletion_keys(F.col("name"))).alias("key")
    )
    if max_key_bucket_size is not None:
        # lazy materialization: hot-list agg is a second consumer of the
        # explode subtree next to the join's two sides (repo-wide
        # self-join rule); eager=False keeps build-no-actions.
        keyed = keyed.localCheckpoint(eager=False)
        hot = (
            keyed.groupBy("key")
            .count()
            .filter(F.col("count") > max_key_bucket_size)
            .select("key")
        )
        keyed = keyed.join(hot, ["key"], "left_anti")
    return keyed


def _name_edges(
    base: DataFrame, max_distance: int, max_key_bucket_size: int | None
) -> DataFrame:
    """Name-level fuzzy edges (name_x < name_y, distance in 1..max):
    deletion-key join over distinct names, deduplicated at name
    granularity, exact levenshtein verification."""
    dn = _distinct_names(base)
    keyed = _keyed_names(dn, max_key_bucket_size)
    # NO materialization of the uncapped keyed table: the explode is a
    # cheap, narrow map over the (already tiny) distinct-name agg, and
    # checkpointing ~(L+1) x names rows costs more I/O than recomputing
    # the explode per join side (the repo's self-join rule targets
    # EXPENSIVE subtrees; measured: materializing here was the
    # difference between 43s and 110s+ at sf1). The capped path still
    # materializes inside _keyed_names -- there the hot-list agg is a
    # third consumer.
    a, b = keyed.alias("a"), keyed.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.key") == F.col("b.key"))
            & (F.col("a.name") < F.col("b.name")),
        )
        .select(
            F.col("a.name").alias("name_x"),
            F.col("a.rep").alias("rep_x"),
            F.col("b.name").alias("name_y"),
            F.col("b.rep").alias("rep_y"),
        )
        .distinct()
    )
    dist = F.levenshtein(F.col("name_x"), F.col("name_y"))
    return cand.withColumn("distance", dist.cast("bigint")).filter(
        F.col("distance") <= max_distance
    )


def _row_level_pairs(base: DataFrame, max_distance: int) -> DataFrame:
    """The direct (uncapped) form: explode deletion keys per ROW, bucket
    self-join, dedup candidates, exact levenshtein -- see the module doc
    for when this beats the name-collapsed form and why the capped/
    cluster forms replace it at scale."""
    keyed = base.select(
        F.col("id"),
        F.col("name"),
        F.explode(_deletion_keys(F.col("name"))).alias("key"),
    )
    a, b = keyed.alias("a"), keyed.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.key") == F.col("b.key"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.name").alias("name_a"),
            F.col("b.name").alias("name_b"),
        )
        .distinct()
    )
    dist = F.levenshtein(F.col("name_a"), F.col("name_b"))
    return cand.filter(dist <= max_distance).withColumn(
        "distance", dist.cast("bigint")
    )


def symspell_pairs(
    df: DataFrame,
    id_col: str,
    name_col: str,
    max_distance: int = 1,
    max_key_bucket_size: int | None = None,
) -> DataFrame:
    """Distinct pairs (id_a < id_b) whose names are within ``max_distance``
    edits (only 1 supported: the deletion-neighborhood guarantee is per
    edit, deeper distances need recursive deletions). Columns:
    (id_a, id_b, name_a, name_b, distance BIGINT).

    ``max_key_bucket_size``: optional hot-key cap -- deletion keys shared
    by more distinct names than the cap are dropped from candidate
    generation (bounds the key join at n_keys * cap^2 on degenerate name
    distributions; pairs whose ONLY shared key was dropped are lost --
    recall, never precision). Run ``deletion_key_profile`` on the same
    input for first-class drop accounting.
    """
    if max_distance != 1:
        raise ValueError("symspell_pairs supports max_distance=1")
    # rename first: if the input column is already called "name"/"id", an
    # expression referencing it next to the same-named alias resolves as a
    # lateral column alias and trips an analyzer bug inside the transform
    # lambda (Resolved plan should not contain LateralColumnAliasReference)
    base = df.select(F.col(id_col).alias("id"), F.col(name_col).alias("name"))
    if max_key_bucket_size is None:
        return _row_level_pairs(base, max_distance)
    edges = _name_edges(base, max_distance, max_key_bucket_size)

    ba, bb = base.alias("ba"), base.alias("bb")
    # identical names: pure output materialization, never in the key join
    intra = ba.join(
        bb,
        (F.col("ba.name") == F.col("bb.name"))
        & (F.col("ba.id") < F.col("bb.id")),
    ).select(
        F.col("ba.id").alias("id_a"),
        F.col("bb.id").alias("id_b"),
        F.col("ba.name").alias("name_a"),
        F.col("bb.name").alias("name_b"),
        F.lit(0).cast("bigint").alias("distance"),
    )
    # cross-name expansion: name-keyed joins, output-bound
    lt = F.col("ba.id") < F.col("bb.id")
    cross = (
        edges.join(ba, F.col("ba.name") == F.col("name_x"))
        .join(bb, F.col("bb.name") == F.col("name_y"))
        .select(
            F.least(F.col("ba.id"), F.col("bb.id")).alias("id_a"),
            F.greatest(F.col("ba.id"), F.col("bb.id")).alias("id_b"),
            F.when(lt, F.col("name_x")).otherwise(F.col("name_y")).alias("name_a"),
            F.when(lt, F.col("name_y")).otherwise(F.col("name_x")).alias("name_b"),
            F.col("distance"),
        )
    )
    return intra.unionByName(cross)


def deletion_key_profile(
    df: DataFrame, name_col: str, max_key_bucket_size: int
) -> DataFrame:
    """(bucket_size, n_keys, dropped_at_cap) histogram of the distinct-name
    deletion-key table -- the drop-accounting diagnostic paired with
    ``max_key_bucket_size`` (same shape as the LSH band_bucket_profile).
    Tiny output; one map-side-combined aggregation chain."""
    base = df.select(F.col(name_col).alias("name")).filter(
        F.col("name").isNotNull()
    ).distinct()
    keyed = base.select(
        F.explode(_deletion_keys(F.col("name"))).alias("key")
    )
    return (
        keyed.groupBy("key")
        .count()
        .groupBy(F.col("count").alias("bucket_size"))
        .agg(F.count("*").alias("n_keys"))
        .withColumn(
            "dropped_at_cap", F.col("bucket_size") > max_key_bucket_size
        )
    )


def symspell_clusters(
    df: DataFrame,
    id_col: str,
    name_col: str,
    max_distance: int = 1,
    max_key_bucket_size: int | None = None,
) -> DataFrame:
    """Linear-output form of the fuzzy self-join: connected components
    over the NAME edge graph, expanded to one (id, cluster_id) row per
    input row. cluster_id is the minimum id across the component (rows
    with no fuzzy neighbor -- including NULL names -- are their own
    singleton... cluster_id = min id of their exact-name group, or the
    row id for NULL names).

    This is the 100-TB posture for dense-duplicate corpora: the pair
    form's output is quadratic in duplicate density; the cluster form
    never materializes pairs at all -- component labels propagate over
    the name-REPRESENTATIVE graph (one node per distinct name), then a
    single name-keyed join stamps every row.
    """
    if max_distance != 1:
        raise ValueError("symspell_clusters supports max_distance=1")
    from .dedup import neardup_clusters

    base = df.select(F.col(id_col).alias("id"), F.col(name_col).alias("name"))
    edges = _name_edges(base, max_distance, max_key_bucket_size)
    rep_pairs = edges.select(
        F.least(F.col("rep_x"), F.col("rep_y")).alias("rep_a"),
        F.greatest(F.col("rep_x"), F.col("rep_y")).alias("rep_b"),
    )
    labels = neardup_clusters(rep_pairs, "rep_a", "rep_b")  # (doc=rep, cluster_id)
    dn = _distinct_names(base)
    return (
        base.join(dn, ["name"], "left")
        .join(labels, F.col("rep") == F.col("doc"), "left")
        .select(
            "id",
            F.coalesce(F.col("cluster_id"), F.col("rep"), F.col("id")).alias(
                "cluster_id"
            ),
        )
    )
