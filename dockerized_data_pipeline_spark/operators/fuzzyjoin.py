"""Fuzzy (approximate-string) self-join via the SymSpell deletion
neighborhood: entity resolution / near-duplicate name matching without the
O(n^2) cross join.

For edit distance <= 1, two strings match only if they share a key in
{s} ∪ {s minus one character}: a substitution at position i makes the two
i-deletions equal; an insertion/deletion makes one string a deletion
variant of the other. Joining on that key set is therefore RECALL-COMPLETE
for distance <= 1 (unlike frequency-capped q-gram blocking, which silently
drops pairs in low-entropy regions -- e.g. names sharing a long constant
prefix). Bucket sizes stay small because each key is a near-full string.

Cost: n * (L+1) exploded keys, one equi-join on the key, exact
``levenshtein`` verification on the candidates. All built-in expressions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _deletion_keys(col: F.Column) -> F.Column:
    """{s} ∪ {s with character i removed}, as an array of strings."""
    deletions = F.transform(
        F.sequence(F.lit(1), F.length(col)),
        lambda i: F.concat(
            F.substring(col, F.lit(1), i - 1),
            col.substr(i + 1, F.length(col)),
        ),
    )
    return F.array_union(F.array(col), deletions)


def symspell_pairs(
    df: DataFrame,
    id_col: str,
    name_col: str,
    max_distance: int = 1,
) -> DataFrame:
    """Distinct pairs (id_a < id_b) whose names are within ``max_distance``
    edits (only 1 supported: the deletion-neighborhood guarantee is per
    edit, deeper distances need recursive deletions)."""
    if max_distance != 1:
        raise ValueError("symspell_pairs supports max_distance=1")
    # rename first: if the input column is already called "name"/"id", an
    # expression referencing it next to the same-named alias resolves as a
    # lateral column alias and trips an analyzer bug inside the transform
    # lambda (Resolved plan should not contain LateralColumnAliasReference)
    base = df.select(
        F.col(id_col).alias("__fz_id"), F.col(name_col).alias("__fz_name")
    )
    keyed = base.select(
        F.col("__fz_id").alias("id"),
        F.col("__fz_name").alias("name"),
        F.explode(_deletion_keys(F.col("__fz_name"))).alias("key"),
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
