"""As-of (point-in-time) join -- engine-surface operator Spark lacks
natively (SURVEY section 2.3 note; guide 'Common OLAP patterns').

Implementation: the union + keyed-window pattern, NOT a per-group pandas
merge_asof -- one shuffle on the key, sort within partitions, last_value
with ignoreNulls carries the most recent right-side payload forward:

    union(left tagged 0, right tagged 1)
      -> Window.partitionBy(key).orderBy(time, right-first)
      -> last(payload, ignorenulls=True) over rows unbounded..current
      -> keep left rows

At 100 TB this scales like any keyed window: one exchange per side, no
driver involvement, AQE handles key skew. Semantics: for each left row,
the right row with the greatest right_ts <= left_ts (ties: right row wins
over the left row at the same instant; duplicate right timestamps resolve
deterministically to the greatest payload tuple -- the payload columns are
the final window-order tiebreak, so repeated runs and engine/oracle
comparisons always pick the same row; payload columns must therefore be
orderable types)."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    left_ts: str,
    right_ts: str,
    payload_cols: list[str],
    payload_prefix: str = "asof_",
) -> DataFrame:
    """Left as-of-join right: every left row + the payload of the most
    recent right row (right_ts <= left_ts) for the same key."""
    lcols = left.columns
    l = left.select(
        *[F.col(c) for c in lcols],
        F.col(left_ts).alias("__t"),
        F.lit(0).alias("__is_right"),
        *[F.lit(None).cast(dict(right.dtypes)[p]).alias(f"__p_{p}") for p in payload_cols],
    )
    r = right.select(
        *[F.lit(None).cast(dict(left.dtypes).get(c, "string")).alias(c) if c not in key_cols else F.col(c) for c in lcols],
        F.col(right_ts).alias("__t"),
        F.lit(1).alias("__is_right"),
        *[F.col(p).alias(f"__p_{p}") for p in payload_cols],
    )
    u = l.unionByName(r)
    w = (
        Window.partitionBy(*key_cols)
        # deterministic tiebreak: among right rows sharing (key, ts), the
        # greatest payload tuple sorts last and is the one last() carries.
        .orderBy(
            F.col("__t"),
            F.desc("__is_right"),
            *[F.col(f"__p_{p}") for p in payload_cols],
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u.select(
        *lcols,
        "__is_right",
        *[
            F.last(F.col(f"__p_{p}"), ignorenulls=True).over(w).alias(f"{payload_prefix}{p}")
            for p in payload_cols
        ],
    )
    return carried.filter(F.col("__is_right") == 0).drop("__is_right")
