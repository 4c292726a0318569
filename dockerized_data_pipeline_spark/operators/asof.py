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
the right row with the greatest right_ts <= left_ts (``direction
="backward"``, default) or the smallest right_ts >= left_ts
(``direction="forward"``); ties at the same instant match (the right row
is eligible), and duplicate right timestamps resolve deterministically to
the greatest payload tuple -- the payload columns are the final
window-order tiebreak, so repeated runs and engine/oracle comparisons
always pick the same row; payload columns must therefore be orderable
types. An optional ``tolerance`` (SQL interval string, e.g. "2 hours")
nulls the carried payload when the matched right row is further than the
tolerance from the left timestamp -- pandas ``merge_asof(tolerance=...)``
semantics, applied post-carry so it adds zero extra shuffles."""

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
    direction: str = "backward",
    tolerance: str | None = None,
) -> DataFrame:
    """Left as-of-join right: every left row + the payload of the nearest
    right row at-or-before (backward) / at-or-after (forward) its
    timestamp for the same key, optionally within ``tolerance``."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward or forward: {direction}")
    lcols = left.columns
    rtypes = dict(right.dtypes)
    ltypes = dict(left.dtypes)
    l = left.select(
        *[F.col(c) for c in lcols],
        F.col(left_ts).alias("__t"),
        F.lit(0).alias("__is_right"),
        *[F.lit(None).cast(rtypes[p]).alias(f"__p_{p}") for p in payload_cols],
    )
    # SQL join-key semantics (r10 NULL tier): a right row with a NULL key
    # or NULL timestamp can never be the as-of match (NULL = NULL is not
    # true in a join; DuckDB's native ASOF agrees), so it is excluded
    # before the union -- otherwise the keyed window would happily carry
    # NULL-key right payloads onto NULL-key left rows.
    r_src = right
    for k in key_cols:
        r_src = r_src.filter(F.col(k).isNotNull())
    r_src = r_src.filter(F.col(right_ts).isNotNull())
    r = r_src.select(
        *[
            F.lit(None).cast(ltypes.get(c, "string")).alias(c)
            if c not in key_cols
            else F.col(c)
            for c in lcols
        ],
        F.col(right_ts).alias("__t"),
        F.lit(1).alias("__is_right"),
        *[F.col(p).alias(f"__p_{p}") for p in payload_cols],
    )
    u = l.unionByName(r)
    # backward scans time ascending (carry = most recent right at-or-before);
    # forward scans descending (carry = nearest right at-or-after). In both
    # orders __is_right desc puts same-instant right rows before the left row
    # (inclusive match) and the ascending payload tuple makes the greatest
    # payload the last -- and therefore carried -- among duplicate timestamps.
    t_order = F.col("__t") if direction == "backward" else F.col("__t").desc()
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(
            t_order,
            F.desc("__is_right"),
            *[F.col(f"__p_{p}") for p in payload_cols],
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # Carry the whole payload as ONE struct (r10, found by the NULL tier):
    # per-column last(ignorenulls) skipped a matched right row's
    # legitimately-NULL payload column and substituted the PREVIOUS right
    # row's value -- a silent cross-row chimera. The when() wrapper makes
    # left rows NULL (skipped), while every right row carries a non-NULL
    # struct whose fields may be NULL -- exactly the matched row, whole.
    #
    # r11 perf: the matched timestamp rides INSIDE the same struct, so the
    # window computes exactly ONE running aggregate (r9 ran N payload
    # aggs + one ts agg; r10 ran struct + ts). The struct is materialized
    # once in its own projection and fields are extracted in the next one
    # -- Catalyst dedupes the repeated window expression either way, but
    # the explicit split keeps the executed plan at a single Window node
    # with a single last() regardless of payload arity.
    pay_struct = F.last(
        F.when(
            F.col("__is_right") == 1,
            F.struct(
                F.col("__t").alias("__mt"),
                *[F.col(f"__p_{p}").alias(p) for p in payload_cols],
            ),
        ),
        ignorenulls=True,
    ).over(w)
    carried = u.select(
        *lcols, "__t", "__is_right", pay_struct.alias("__carry")
    ).filter(F.col("__is_right") == 0)
    # A left row with a NULL timestamp is always unmatched (its ts
    # inequality is unknowable). Backward order already guarantees this
    # (NULLS FIRST -> nothing carried yet); forward order sorts NULL ts
    # last, where the window would wrongly carry the earliest right row.
    # Mask the carried STRUCT once (one CASE per row, not one per output
    # column -- subexpression elimination shares the repeated getFields).
    masked = F.when(F.col("__t").isNotNull(), F.col("__carry"))
    out = carried.select(
        *lcols,
        "__t",
        "__is_right",
        masked.getField("__mt").alias("__match_t"),
        *[masked.getField(p).alias(f"{payload_prefix}{p}") for p in payload_cols],
    )
    if tolerance is not None:
        bound = F.expr(f"INTERVAL {tolerance}")
        in_tol = (
            (F.col("__t") - F.col("__match_t") <= bound)
            if direction == "backward"
            else (F.col("__match_t") - F.col("__t") <= bound)
        )
        out = out.select(
            *lcols,
            "__t",
            "__is_right",
            "__match_t",
            *[
                F.when(in_tol, F.col(f"{payload_prefix}{p}")).alias(
                    f"{payload_prefix}{p}"
                )
                for p in payload_cols
            ],
        )
    return out.drop("__t", "__is_right", "__match_t")
