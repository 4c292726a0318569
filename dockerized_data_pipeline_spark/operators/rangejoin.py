"""Range (interval-containment) join -- engine-surface operator Spark lacks
natively (SURVEY section 2.3 note; the 'custom operators' mandate).

A naive ``point BETWEEN start AND end`` join has no equi-key, so Spark
plans BroadcastNestedLoopJoin -- O(n*m) compares and a broadcast that
breaks once the interval side outgrows the driver. The scalable form here
buckets time into fixed-width chunks:

  * each POINT row maps to exactly one bucket;
  * each INTERVAL row is exploded into every bucket it overlaps
    (``sequence(floor(start/w), floor(end/w))``) -- for intervals shorter
    than the bucket width that is 1-2 rows of amplification;
  * the join becomes an EQUI-join on the bucket id (hash shuffle both
    sides, AQE-skew-splittable), followed by the exact containment filter.

Result is identical to the naive inequality join; cost is
O(points + intervals * avg_buckets_per_interval) shuffled rows. Pick
``bucket_width_sec`` near the typical interval length so amplification
stays ~2x while buckets stay selective.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join_bucketed(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_ts: str,
    end_ts: str,
    bucket_width_sec: int = 3600,
    extra_key: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Join each point row to every interval row with
    ``start_ts <= point_ts <= end_ts`` (optionally also matching on
    ``extra_key``, e.g. a user id, which tightens the shuffle key).

    Columns from both inputs are preserved; name collisions must be
    resolved by the caller beforehand.
    """
    def bkt(col: str):
        # NTZ-safe: pin to UTC instants (session tz is UTC); floor-div is
        # exact for post-epoch seconds
        secs = F.unix_timestamp(F.col(col).cast("timestamp"))
        return F.floor(secs / F.lit(bucket_width_sec)).cast("long")

    p_bkt, i_lo, i_hi = bkt(point_ts), bkt(start_ts), bkt(end_ts)

    p = points.withColumn("__bkt", p_bkt)
    i = intervals.withColumn("__bkt", F.explode(F.sequence(i_lo, i_hi)))

    on = [p["__bkt"] == i["__bkt"]]
    if extra_key is not None:
        on.append(p[extra_key] == i[extra_key])
    joined = p.join(i, on, how).filter(
        (p[point_ts] >= i[start_ts]) & (p[point_ts] <= i[end_ts])
    )
    drop_cols = [p["__bkt"], i["__bkt"]] + ([i[extra_key]] if extra_key else [])
    return joined.drop(*drop_cols)
