"""Time-series resampling, gap filling, LOCF, and linear interpolation.

The reference stores one row per (symbol, trading timestamp) and leaves
"what about missing hours?" to the consumer (stock_data has no dense time
axis; README.md:202-226 queries simply skip gaps). A real analytics engine
needs the dense form: resample to a fixed grid, fill gaps, carry or
interpolate values. All built-in expressions -- no Python UDFs:

- ``resample_last``  : one row per (key, bucket) with the last value in the
  bucket (deterministic tiebreak) -- an "hourly close".
- ``resample_ohlc``  : open/high/low/close candles per (key, bucket).
- ``time_grid``      : per-key dense bucket axis via ``sequence`` + explode
  (span-bounded, no cross join).
- ``gapfill_locf``   : grid LEFT JOIN observed + last-observation-carried-
  forward window.
- ``interpolate_linear``: exact integer interpolation between the previous
  and next observed grid points.

Scale notes: resample shuffles once on (key, bucket) -- at 100 TB that is
the natural partitioning and AQE handles bucket-count skew. The LOCF /
interpolation windows partition by key only: each key's grid is one task's
sort, which is the right layout when keys are numerous (thousands of
symbols) and each key's grid is span-bounded (years x 24x365 rows); it
degrades only when a single key's grid itself exceeds a task, at which
point range-partitioned segmented scans (carry the last value across
segment boundaries via a tiny per-segment summary join) are the known
remedy -- see tests/test_skew_windows.py for the posture.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_BUCKET_SECONDS = {"hour": 3600, "day": 86400, "week": 604800}


def _bucket(ts_col: str, unit: str) -> Column:
    if unit not in _BUCKET_SECONDS:
        raise ValueError(f"unsupported bucket unit: {unit!r}")
    return F.date_trunc(unit, F.col(ts_col)).alias("bucket")


def resample_last(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    value_col: str,
    unit: str = "hour",
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Last value per (key, bucket), ordered by event time with a
    deterministic tiebreak (asof.py learned this lesson: ties on the
    timestamp must not depend on partitioning)."""
    order = [F.col(ts_col).desc()] + [
        F.col(c).desc() for c in (tiebreak_cols or [])
    ]
    w = Window.partitionBy(*key_cols, "bucket").orderBy(*order)
    return (
        df.withColumn("bucket", _bucket(ts_col, unit))
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(*key_cols, "bucket", F.col(value_col).alias("value"))
    )


def resample_ohlc(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    value_col: str,
    unit: str = "day",
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Open/high/low/close candle per (key, bucket): single partial+final
    hash aggregation, open/close via min_by/max_by on a composite order
    (event time, tiebreaks) so ties resolve identically on every run."""
    tb = tiebreak_cols or []
    ord_struct = F.struct(F.col(ts_col), *[F.col(c) for c in tb])
    v = F.col(value_col)
    return (
        df.withColumn("bucket", _bucket(ts_col, unit))
        .groupBy(*key_cols, "bucket")
        .agg(
            F.min_by(v, ord_struct).alias("open"),
            F.max(v).alias("high"),
            F.min(v).alias("low"),
            F.max_by(v, ord_struct).alias("close"),
            F.count("*").alias("n_obs"),
        )
    )


def time_grid(
    observed: DataFrame,
    key_cols: list[str],
    unit: str = "hour",
    bucket_col: str = "bucket",
) -> DataFrame:
    """Per-key dense bucket axis spanning each key's min..max observed
    bucket. ``sequence`` + ``explode`` is narrow after the min/max
    aggregate -- the grid never materializes on the driver and its length
    is bounded by the key's time span, not the row count."""
    step = F.expr(f"interval {_BUCKET_SECONDS[unit]} seconds")
    spans = observed.groupBy(*key_cols).agg(
        F.min(bucket_col).alias("__b0"), F.max(bucket_col).alias("__b1")
    )
    return spans.select(
        *key_cols,
        F.explode(F.sequence(F.col("__b0"), F.col("__b1"), step)).alias(
            bucket_col
        ),
    )


def dense_join(
    observed: DataFrame,
    key_cols: list[str],
    unit: str = "hour",
    bucket_col: str = "bucket",
    spans_from: DataFrame | None = None,
) -> DataFrame:
    """Per-key dense grid LEFT JOINed with the observations: one row per
    (key, grid bucket), value columns NULL at gaps. The building block for
    both LOCF and interpolation.

    ``spans_from``: optional cheaper source for the grid span (same keys +
    bucket column). Without it the grid branch re-evaluates the whole
    ``observed`` subplan -- for a resampled input that means running the
    dedup window twice; passing the raw bucketed scan instead turns the
    grid branch into a plain min/max partial aggregate (same span, since
    every observation lands in a bucket)."""
    grid = time_grid(
        spans_from if spans_from is not None else observed,
        key_cols,
        unit=unit,
        bucket_col=bucket_col,
    )
    return grid.join(observed, [*key_cols, bucket_col], "left")


def gapfill_locf(
    observed: DataFrame,
    key_cols: list[str],
    value_cols: list[str],
    unit: str = "hour",
    bucket_col: str = "bucket",
    spans_from: DataFrame | None = None,
) -> DataFrame:
    """Dense per-key grid with missing buckets filled by the last observed
    value (LOCF). Adds boolean ``filled`` (true where the bucket had no
    observation). Join shuffles on (key, bucket); the carry window sorts
    each key's span-bounded grid once."""
    joined = dense_join(
        observed, key_cols, unit=unit, bucket_col=bucket_col, spans_from=spans_from
    )
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(bucket_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = F.col(value_cols[0]).isNull()
    out = joined.withColumn("filled", filled)
    for c in value_cols:
        out = out.withColumn(c, F.last(F.col(c), ignorenulls=True).over(w))
    return out


def interpolate_linear(
    gapfilled_grid: DataFrame,
    key_cols: list[str],
    value_col: str,
    bucket_col: str = "bucket",
    unit: str = "hour",
    scale: int = 1000,
) -> DataFrame:
    """Exact linear interpolation on a dense grid whose ``value_col`` is an
    integer (e.g. cents) and NULL at gap rows. Emits ``interp`` = the
    interpolated value x ``scale``, computed entirely in integer arithmetic
    (num/den are whole bucket counts because every point sits on the grid),
    so engine and oracle agree bit-for-bit -- no float division.

    interp = (v0*(den-num) + v1*num) * scale div den, where num = buckets
    since the previous observation and den = buckets between the two
    surrounding observations. Observed rows pass through as value*scale.
    Bucket counts (not raw microseconds) keep the int64 products small:
    cents x month-of-hours x scale ~ 1.5e10, far from overflow.
    """
    w_back = (
        Window.partitionBy(*key_cols)
        .orderBy(bucket_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_fwd = (
        Window.partitionBy(*key_cols)
        .orderBy(bucket_col)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    step_us = F.lit(_BUCKET_SECONDS[unit] * 1_000_000)
    v = F.col(value_col)
    known_bucket = F.when(v.isNotNull(), F.col(bucket_col))
    prev_v = F.last(v, ignorenulls=True).over(w_back)
    prev_t = F.last(known_bucket, ignorenulls=True).over(w_back)
    next_v = F.first(v, ignorenulls=True).over(w_fwd)
    next_t = F.first(known_bucket, ignorenulls=True).over(w_fwd)
    us = F.unix_micros
    # exact: grid-aligned timestamps make both quotients whole numbers,
    # and micros diffs (<2^42) are exactly representable in double
    num = ((us(F.col(bucket_col)) - us(prev_t)) / step_us).cast("long")
    den = ((us(next_t) - us(prev_t)) / step_us).cast("long")
    interp = (
        F.when(v.isNotNull(), v * F.lit(scale))
        .when(
            prev_v.isNotNull() & next_v.isNotNull(),
            F.expr(
                "(__prev_v * (__den - __num) + __next_v * __num) "
                f"* {scale} div __den"
            ),
        )
        .otherwise(F.lit(None))
    )
    return (
        gapfilled_grid.withColumn("__prev_v", prev_v)
        .withColumn("__next_v", next_v)
        .withColumn("__num", num)
        .withColumn("__den", den)
        .withColumn("interp", interp)
        .drop("__prev_v", "__next_v", "__num", "__den")
    )
