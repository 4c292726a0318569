"""Skew-resilient join (100 TB posture): salting for hot keys.

AQE's skew-join handling (on by default in session.py) splits oversized
sort-merge partitions at runtime and is the first line of defense. Salting
is the explicit fallback for pathological keys or non-SMJ plans: the skewed
(large) side gets a random salt in [0, salt_buckets); the small side is
replicated across all buckets; the join key becomes (key, salt), spreading
one hot key over salt_buckets tasks.

Correctness: every large-side row joins exactly once (its salt matches
exactly one replica), so results equal the unsalted join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


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
    """
    salted_large = large.withColumn(
        "__salt", (F.rand(seed) * salt_buckets).cast("int")
    )
    replicated_small = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    out = salted_large.join(replicated_small, [on, "__salt"], how)
    return out.drop("__salt")
