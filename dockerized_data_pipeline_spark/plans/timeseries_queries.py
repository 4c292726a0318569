"""Time-series queries: resample / OHLC candles / gap-fill / LOCF /
linear interpolation over the ``events`` fixture (entity key ``event_type``
~ the reference's ``symbol``, event time ``ts`` ~ ``timestamp``).

The reference's stock_data table is exactly this shape (README.md:143-152:
symbol, timestamp, open/high/low/close, volume) but stores only observed
rows; these queries add the dense-time-axis operations a consumer needs.
All value arithmetic is integer cents (CAST(ROUND(value*100) AS BIGINT)) so
engine and oracle hashes agree bit-for-bit -- no float accumulation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators import timeseries as TS
from .registry import query

def _cents() -> F.Column:
    # column construction deferred: no active session at import time
    return F.round(F.col("value") * 100).cast("bigint")


def _ts_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events restricted to rows WITH a timestamp (r10 NULL-tier policy:
    a time series is indexed by time -- a row with NULL ts has no
    position on the axis, and every bucketing/windowing query here would
    otherwise manufacture a meaningless NULL bucket). Oracles carry the
    matching WHERE ts IS NOT NULL. Also sidesteps DuckDB 1.0's broken
    non-NULL inference for date_trunc (see plans/relational.py)."""
    return load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())


def _hourly_closes(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _ts_events(spark, sf_dir).withColumn("cents", _cents())
    return TS.resample_last(
        events, ["event_type"], "ts", "cents", unit="hour", tiebreak_cols=["event_id"]
    ).withColumnRenamed("value", "close_cents")


def _raw_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cheap span source for the grid branch: a narrow scan + min/max
    partial agg instead of re-running the resample window (same span --
    every event lands in a bucket)."""
    return _ts_events(spark, sf_dir).select(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("bucket")
    )


# Shared oracle CTE: hourly close per event_type + its dense hourly grid.
_ORACLE_OBS_GRID = """
    WITH obs AS (
      SELECT event_type, date_trunc('hour', ts) AS bucket,
             CAST(ROUND(value * 100) AS BIGINT) AS close_cents
      FROM events WHERE ts IS NOT NULL
      QUALIFY ROW_NUMBER() OVER (
          PARTITION BY event_type, date_trunc('hour', ts)
          ORDER BY ts DESC, event_id DESC) = 1
    ),
    spans AS (
      SELECT event_type, MIN(bucket) AS b0, MAX(bucket) AS b1
      FROM obs GROUP BY event_type
    ),
    grid AS (
      SELECT event_type,
             UNNEST(generate_series(b0, b1, INTERVAL 1 HOUR)) AS bucket
      FROM spans
    ),
    j AS (
      SELECT g.event_type, g.bucket, o.close_cents
      FROM grid g
      LEFT JOIN obs o ON g.event_type = o.event_type AND g.bucket = o.bucket
    )
"""


@query(
    "ts_hourly_gapfill_locf",
    oracle=_ORACLE_OBS_GRID
    + """
    SELECT event_type, bucket,
           LAST_VALUE(close_cents IGNORE NULLS) OVER (
             PARTITION BY event_type ORDER BY bucket
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS close_cents,
           close_cents IS NULL AS filled
    FROM j
    """,
)
def ts_hourly_gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense hourly close series per event_type: resample to hourly closes
    (deterministic last-in-bucket), build the per-key hourly grid, carry the
    last close across gaps (LOCF). Single (key,bucket) shuffle for the
    resample + join; one span-bounded sort per key for the carry."""
    closes = _hourly_closes(spark, sf_dir)
    return TS.gapfill_locf(
        closes,
        ["event_type"],
        ["close_cents"],
        unit="hour",
        spans_from=_raw_buckets(spark, sf_dir),
    ).select("event_type", "bucket", "close_cents", "filled")


@query(
    "ts_hourly_interpolate",
    oracle=_ORACLE_OBS_GRID
    + """
    , m AS (
      SELECT event_type, bucket, close_cents,
        LAST_VALUE(close_cents IGNORE NULLS) OVER w_back AS pv,
        LAST_VALUE(CASE WHEN close_cents IS NOT NULL THEN bucket END
                   IGNORE NULLS) OVER w_back AS pt,
        FIRST_VALUE(close_cents IGNORE NULLS) OVER w_fwd AS nv,
        FIRST_VALUE(CASE WHEN close_cents IS NOT NULL THEN bucket END
                    IGNORE NULLS) OVER w_fwd AS nt
      FROM j
      WINDOW
        w_back AS (PARTITION BY event_type ORDER BY bucket
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        w_fwd AS (PARTITION BY event_type ORDER BY bucket
                  ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT event_type, bucket,
      CASE
        WHEN close_cents IS NOT NULL THEN close_cents * 1000
        WHEN pv IS NOT NULL AND nv IS NOT NULL THEN
          (pv * ((epoch_us(nt) - epoch_us(bucket)) // 3600000000)
           + nv * ((epoch_us(bucket) - epoch_us(pt)) // 3600000000)) * 1000
          // ((epoch_us(nt) - epoch_us(pt)) // 3600000000)
      END AS interp
    FROM m
    """,
)
def ts_hourly_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear interpolation across gaps in the hourly close series, in
    exact integer arithmetic (milli-cents): num/den are whole hour counts,
    so engine and oracle agree bit-for-bit with zero float division."""
    closes = _hourly_closes(spark, sf_dir)
    dense = TS.dense_join(
        closes, ["event_type"], unit="hour", spans_from=_raw_buckets(spark, sf_dir)
    )
    return TS.interpolate_linear(
        dense, ["event_type"], "close_cents", unit="hour", scale=1000
    ).select("event_type", "bucket", "interp")


@query(
    "ts_daily_ohlc",
    oracle="""
    WITH c AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket,
             CAST(ROUND(value * 100) AS BIGINT) AS cents,
             ROW_NUMBER() OVER (PARTITION BY event_type, CAST(date_trunc('day', ts) AS TIMESTAMP)
                                ORDER BY ts, event_id) AS rn_a,
             ROW_NUMBER() OVER (PARTITION BY event_type, CAST(date_trunc('day', ts) AS TIMESTAMP)
                                ORDER BY ts DESC, event_id DESC) AS rn_d
      FROM events WHERE ts IS NOT NULL
    )
    SELECT event_type, bucket,
           MAX(CASE WHEN rn_a = 1 THEN cents END) AS open,
           MAX(cents) AS high,
           MIN(cents) AS low,
           MAX(CASE WHEN rn_d = 1 THEN cents END) AS close,
           COUNT(*) AS n_obs
    FROM c
    GROUP BY event_type, bucket
    """,
)
def ts_daily_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily OHLC candles per event_type -- the reference's stock_data row
    shape (README.md:143-152) derived from raw ticks in one partial+final
    hash aggregation; open/close picked by min_by/max_by on (ts, event_id)
    so ties are deterministic."""
    events = _ts_events(spark, sf_dir).withColumn("cents", _cents())
    return TS.resample_ohlc(
        events, ["event_type"], "ts", "cents", unit="day", tiebreak_cols=["event_id"]
    )


@query(
    "ts_drawdown_alerts",
    oracle="""
    WITH c AS (
      SELECT event_type, ts, event_id,
             CAST(ROUND(value * 100) AS BIGINT) AS cents
      FROM events WHERE ts IS NOT NULL
    ), p AS (
      SELECT event_type, ts, cents,
             MAX(cents) OVER (PARTITION BY event_type ORDER BY ts, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                             ) AS peak
      FROM c
    )
    SELECT event_type, ts, cents AS value_cents, peak AS peak_cents,
           CASE WHEN peak > 0
                THEN (peak - cents) * 1000000 // peak
                ELSE 0 END AS drawdown_ppm
    FROM p
    WHERE CASE WHEN peak > 0
               THEN (peak - cents) * 1000000 // peak
               ELSE 0 END >= 200000
    """,
)
def ts_drawdown_alerts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of streaming/tws.py DrawdownProcessor: events whose value
    sits >= 20% below the key's running peak (running MAX window + exact
    ppm arithmetic). The streaming version holds the peak in the state
    store; this one recovers it with a single per-key ordered window."""
    from pyspark.sql import Window

    events = _ts_events(spark, sf_dir).withColumn("cents", _cents())
    w = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    peak = F.max("cents").over(w)
    dd = F.when(
        peak > 0,
        F.floor(((peak - F.col("cents")) * 1_000_000) / peak),
    ).otherwise(F.lit(0)).cast("long")
    return (
        events.withColumn("peak_cents", peak)
        .withColumn("drawdown_ppm", dd)
        .filter(F.col("drawdown_ppm") >= 200_000)
        .select(
            "event_type",
            "ts",
            F.col("cents").alias("value_cents"),
            "peak_cents",
            "drawdown_ppm",
        )
    )


@query(
    "ts_pair_comovement",
    oracle=_ORACLE_OBS_GRID + """  -- (grid/j CTEs unused here)
    SELECT a.event_type AS type_a, b.event_type AS type_b,
           CAST(COUNT(*) AS BIGINT) AS n_hours,
           CAST(COUNT(*) * SUM(a.close_cents * b.close_cents)
                - SUM(a.close_cents) * SUM(b.close_cents) AS BIGINT
           ) AS comove_num
    FROM obs a JOIN obs b
      ON a.bucket = b.bucket AND a.event_type < b.event_type
    GROUP BY a.event_type, b.event_type
    """,
)
def ts_pair_comovement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise co-movement of hourly close series (pairs-trading signal):
    for each pair of keys, over hours where BOTH have a close, the exact
    integer covariance numerator n*sum(xy) - sum(x)*sum(y) (the sign and
    relative magnitude of covariance without float division; cents *
    month-of-hours stays well inside int64). Equi-join on the hour bucket
    -- pair count is keys^2 but the join itself is bucket-partitioned."""
    closes = _hourly_closes(spark, sf_dir)
    a, b = closes.alias("a"), closes.alias("b")
    xa, xb = F.col("a.close_cents"), F.col("b.close_cents")
    return (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(
            F.count("*").cast("bigint").alias("n_hours"),
            (
                F.count("*") * F.sum(xa * xb) - F.sum(xa) * F.sum(xb)
            )
            .cast("bigint")
            .alias("comove_num"),
        )
    )


@query(
    "ts_rolling_channel",
    oracle=_ORACLE_OBS_GRID + """  -- (spans/grid/j CTEs unused here)
    , w AS (
      SELECT event_type, bucket, close_cents,
             MIN(close_cents) OVER ch AS ch_low,
             MAX(close_cents) OVER ch AS ch_high,
             COUNT(*) OVER ch AS n_win
      FROM obs
      WINDOW ch AS (PARTITION BY event_type ORDER BY bucket
                    ROWS BETWEEN 23 PRECEDING AND CURRENT ROW)
    )
    SELECT event_type, bucket, close_cents, ch_low, ch_high,
           CASE WHEN ch_high > ch_low
                THEN (close_cents - ch_low) * 1000000 // (ch_high - ch_low)
                ELSE 500000 END AS channel_pos_ppm
    FROM w WHERE n_win = 24
    """,
)
def ts_rolling_channel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """24-hour rolling min/max (Donchian) channel over the hourly closes,
    plus the close's position inside the channel in exact ppm (degenerate
    flat channel pins to the midpoint). Rows without a full 24-observation
    history are excluded so the frame is always well-defined. One window
    over the per-key ordered closes -- a bounded ROWS frame, so Spark keeps
    a running deque, not the whole partition, per frame evaluation."""
    from pyspark.sql import Window

    closes = _hourly_closes(spark, sf_dir)
    ch = (
        Window.partitionBy("event_type")
        .orderBy("bucket")
        .rowsBetween(-23, Window.currentRow)
    )
    lo, hi = F.min("close_cents").over(ch), F.max("close_cents").over(ch)
    pos = F.when(
        hi > lo,
        F.floor(
            (F.col("close_cents") - lo) * 1_000_000 / (hi - lo)
        ),
    ).otherwise(F.lit(500_000)).cast("bigint")
    return (
        closes.withColumn("ch_low", lo)
        .withColumn("ch_high", hi)
        .withColumn("n_win", F.count("*").over(ch))
        .withColumn("channel_pos_ppm", pos)
        .filter(F.col("n_win") == 24)
        .select(
            "event_type", "bucket", "close_cents", "ch_low", "ch_high",
            "channel_pos_ppm",
        )
    )


_EWMA_LAGS = 10  # alpha = 1/2 over the last 10 observations; den = 2^10 - 1


@query(
    "ts_ewma_halflife",
    oracle=_ORACLE_OBS_GRID + """  -- (spans/grid/j CTEs unused here)
    , w AS (
      SELECT event_type, bucket, close_cents,
             COUNT(*) OVER h AS n_win,
             """
    + "\n             + ".join(
        f"COALESCE(LAG(close_cents, {k}) OVER "
        f"(PARTITION BY event_type ORDER BY bucket), 0) * {1 << (10 - 1 - k)}"
        for k in range(10)
    )
    + """ AS ewma_num
      FROM obs
      WINDOW h AS (PARTITION BY event_type ORDER BY bucket
                   ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)
    )
    SELECT event_type, bucket, close_cents,
           ewma_num, ewma_num * 1000 // 1023 AS ewma_milli
    FROM w WHERE n_win = 10
    """,
)
def ts_ewma_halflife(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Half-life EWMA (alpha = 1/2) over the last 10 hourly closes, exact:
    weights are powers of two, so ewma = sum(v_{t-k} * 2^(9-k)) / 1023 is
    plain int64 arithmetic (emitted as the raw numerator plus truncated
    milli value). Ten lag() terms in one window pass -- no UDAF, no float
    recurrence; rows without full history are excluded so the denominator
    is the constant 1023."""
    from pyspark.sql import Window

    closes = _hourly_closes(spark, sf_dir)
    w = Window.partitionBy("event_type").orderBy("bucket")
    num = None
    for k in range(_EWMA_LAGS):
        term = F.coalesce(
            F.lag("close_cents", k).over(w), F.lit(0)
        ) * F.lit(1 << (_EWMA_LAGS - 1 - k))
        num = term if num is None else num + term
    h = w.rowsBetween(-(_EWMA_LAGS - 1), Window.currentRow)
    return (
        closes.withColumn("ewma_num", num.cast("bigint"))
        .withColumn("n_win", F.count("*").over(h))
        .filter(F.col("n_win") == _EWMA_LAGS)
        .select(
            "event_type", "bucket", "close_cents", "ewma_num",
            F.expr("ewma_num * 1000 div 1023").alias("ewma_milli"),
        )
    )


@query(
    "ts_seasonal_profile",
    oracle=_ORACLE_OBS_GRID + """  -- (spans/grid/j CTEs unused here)
    SELECT event_type,
           CAST(EXTRACT(hour FROM bucket) AS BIGINT) AS hour_of_day,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(close_cents) AS BIGINT) AS sum_cents,
           CAST(SUM(close_cents) * 1000 // COUNT(*) AS BIGINT) AS mean_milli
    FROM obs
    GROUP BY event_type, EXTRACT(hour FROM bucket)
    """,
)
def ts_seasonal_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-day seasonal profile per key (the 'seasonal' component of a
    classical decomposition): mean hourly close per (key, hour-of-day) in
    exact truncated milli-cents. One partial+final aggregate over the
    resampled closes."""
    closes = _hourly_closes(spark, sf_dir)
    hod = F.hour(F.col("bucket")).cast("bigint")
    return (
        closes.groupBy("event_type", hod.alias("hour_of_day"))
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum("close_cents").cast("bigint").alias("sum_cents"),
        )
        .withColumn(
            "mean_milli", F.expr("sum_cents * 1000 div n").cast("bigint")
        )
    )


@query(
    "ts_seasonal_residual",
    oracle=_ORACLE_OBS_GRID + """  -- (spans/grid/j CTEs unused here)
    , prof AS (
      SELECT event_type, EXTRACT(hour FROM bucket) AS hod,
             SUM(close_cents) * 1000 // COUNT(*) AS mean_milli
      FROM obs GROUP BY event_type, EXTRACT(hour FROM bucket)
    )
    SELECT o.event_type, o.bucket,
           CAST(o.close_cents * 1000 - p.mean_milli AS BIGINT) AS residual_milli
    FROM obs o
    JOIN prof p ON o.event_type = p.event_type
                AND EXTRACT(hour FROM o.bucket) = p.hod
    """,
)
def ts_seasonal_residual(spark: SparkSession, sf_dir: str) -> DataFrame:
    """De-seasonalized residual: close minus its key's hour-of-day mean
    (exact milli-cents). The profile is a tiny aggregate (keys x 24 rows)
    broadcast back over the series -- no second shuffle of the facts."""
    closes = _hourly_closes(spark, sf_dir)
    hod = F.hour(F.col("bucket")).cast("bigint")
    prof = (
        closes.groupBy("event_type", hod.alias("hod"))
        .agg(F.expr("sum(close_cents) * 1000 div count(*)").alias("mean_milli"))
    )
    withh = closes.withColumn("hod", hod)
    return (
        withh.join(F.broadcast(prof), ["event_type", "hod"])
        .select(
            "event_type",
            "bucket",
            (F.col("close_cents") * 1000 - F.col("mean_milli"))
            .cast("bigint")
            .alias("residual_milli"),
        )
    )


@query(
    "ts_pair_spearman",
    oracle=_ORACLE_OBS_GRID + """  -- (spans/grid/j CTEs unused here)
    , matched AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             a.bucket,
             a.close_cents AS ca, b.close_cents AS cb
      FROM obs a JOIN obs b
        ON a.bucket = b.bucket AND a.event_type < b.event_type
    ), ranked AS (
      SELECT type_a, type_b,
             ROW_NUMBER() OVER (PARTITION BY type_a, type_b
                                ORDER BY ca NULLS FIRST, bucket) AS ra,
             ROW_NUMBER() OVER (PARTITION BY type_a, type_b
                                ORDER BY cb NULLS FIRST, bucket) AS rb
      FROM matched
    )
    SELECT type_a, type_b,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM((ra - rb) * (ra - rb)) AS BIGINT) AS sum_d2
    FROM ranked GROUP BY type_a, type_b
    """,
)
def ts_pair_spearman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank-correlation ingredients per key pair over matched
    hours: n and the exact sum of squared rank differences (rho = 1 -
    6*sum_d2/(n(n^2-1)) -- the division is left to the consumer so the
    emitted values stay exact int64). Ties broken by bucket so ranks are a
    deterministic permutation in both engines. Complements
    ts_pair_comovement (Pearson numerator) with the rank-based measure."""
    from pyspark.sql import Window

    closes = _hourly_closes(spark, sf_dir)
    a, b = closes.alias("a"), closes.alias("b")
    matched = a.join(
        b,
        (F.col("a.bucket") == F.col("b.bucket"))
        & (F.col("a.event_type") < F.col("b.event_type")),
    ).select(
        F.col("a.event_type").alias("type_a"),
        F.col("b.event_type").alias("type_b"),
        F.col("a.bucket").alias("bucket"),
        F.col("a.close_cents").alias("ca"),
        F.col("b.close_cents").alias("cb"),
    )
    wp = Window.partitionBy("type_a", "type_b")
    ra = F.row_number().over(wp.orderBy("ca", "bucket"))
    rb = F.row_number().over(wp.orderBy("cb", "bucket"))
    d = (ra - rb).cast("bigint")
    return (
        matched.withColumn("d2", d * d)
        .groupBy("type_a", "type_b")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum("d2").cast("bigint").alias("sum_d2"),
        )
    )


@query(
    "ts_data_islands",
    oracle=_ORACLE_OBS_GRID + """  -- (spans/grid/j CTEs unused here)
    , tagged AS (
      SELECT event_type, bucket,
             bucket - INTERVAL (ROW_NUMBER() OVER (
               PARTITION BY event_type ORDER BY bucket)) HOUR AS anchor
      FROM obs
    )
    SELECT event_type,
           MIN(bucket) AS island_start,
           MAX(bucket) AS island_end,
           CAST(COUNT(*) AS BIGINT) AS n_hours
    FROM tagged
    GROUP BY event_type, anchor
    """,
)
def ts_data_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: contiguous runs of observed hours per key (the
    dual of the gap-fill view -- which stretches of the series are solid).
    The classic anchor trick: bucket minus row_number hours is constant
    within a contiguous run, so one window + one aggregate, both
    partitioned by key."""
    from pyspark.sql import Window

    closes = _hourly_closes(spark, sf_dir)
    w = Window.partitionBy("event_type").orderBy("bucket")
    anchor = F.col("bucket") - F.expr(
        "make_interval(0, 0, 0, 0, rn, 0, 0)"
    )
    return (
        closes.withColumn("rn", F.row_number().over(w))
        .withColumn("anchor", anchor)
        .groupBy("event_type", "anchor")
        .agg(
            F.min("bucket").alias("island_start"),
            F.max("bucket").alias("island_end"),
            F.count("*").cast("bigint").alias("n_hours"),
        )
        .drop("anchor")
        .select("event_type", "island_start", "island_end", "n_hours")
    )


@query(
    "ts_realized_volatility",
    oracle=_ORACLE_OBS_GRID + """  -- (spans/grid/j CTEs unused here)
    , deltas AS (
      SELECT event_type,
             CAST(date_trunc('day', bucket) AS TIMESTAMP) AS day,
             close_cents - LAG(close_cents) OVER (
               PARTITION BY event_type ORDER BY bucket) AS d
      FROM obs
    )
    SELECT event_type, day,
           CAST(COUNT(d) AS BIGINT) AS n_moves,
           CAST(SUM(d * d) AS BIGINT) AS realized_var_cents2,
           CAST(MAX(ABS(d)) AS BIGINT) AS max_abs_move_cents
    FROM deltas WHERE d IS NOT NULL
    GROUP BY event_type, day
    """,
)
def ts_realized_volatility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily realized volatility per key: the sum of squared hour-to-hour
    close moves (plus the largest single move) in exact cents^2 integers
    -- absolute moves, not log returns, precisely so no transcendental
    float enters the pipeline. One lag window partitioned by key, then a
    per-(key, day) aggregate."""
    from pyspark.sql import Window

    closes = _hourly_closes(spark, sf_dir)
    w = Window.partitionBy("event_type").orderBy("bucket")
    d = (F.col("close_cents") - F.lag("close_cents").over(w)).alias("d")
    deltas = closes.select(
        "event_type", F.date_trunc("day", F.col("bucket")).alias("day"), d
    ).filter(F.col("d").isNotNull())
    return deltas.groupBy("event_type", "day").agg(
        F.count("d").cast("bigint").alias("n_moves"),
        F.sum(F.col("d") * F.col("d")).cast("bigint").alias("realized_var_cents2"),
        F.max(F.abs(F.col("d"))).cast("bigint").alias("max_abs_move_cents"),
    )


@query(
    "ts_top_movers",
    oracle="""
    WITH closes AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
             CAST(ROUND(value * 100) AS BIGINT) AS cents
      FROM events WHERE ts IS NOT NULL
      QUALIFY ROW_NUMBER() OVER (
        PARTITION BY event_type, date_trunc('day', ts)
        ORDER BY ts DESC, event_id DESC) = 1
    ), moves AS (
      SELECT event_type, day, cents,
             LAG(cents) OVER (PARTITION BY event_type ORDER BY day) AS prev
      FROM closes
    ), ranked AS (
      SELECT event_type, day,
             (cents - prev) * 1000000 // prev AS move_ppm,
             ABS((cents - prev) * 1000000 // prev) AS mag
      FROM moves WHERE prev IS NOT NULL AND prev > 0
    )
    SELECT day, event_type, CAST(move_ppm AS BIGINT) AS move_ppm,
           CAST(rk AS BIGINT) AS rk
    FROM (
      SELECT day, event_type, move_ppm,
             ROW_NUMBER() OVER (PARTITION BY day
                                ORDER BY mag DESC, event_type) AS rk
      FROM ranked
    ) WHERE rk <= 3
    """,
)
def ts_top_movers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily top-3 movers by absolute close-to-close change (exact signed
    ppm; integer floor division matches across engines for the magnitude
    ranking because ABS is applied after the signed division on both
    sides). Daily close resample -> lag -> per-day ranking."""
    from pyspark.sql import Window

    events = _ts_events(spark, sf_dir).withColumn("cents", _cents())
    closes = TS.resample_last(
        events, ["event_type"], "ts", "cents", unit="day", tiebreak_cols=["event_id"]
    ).withColumnRenamed("value", "cents").withColumnRenamed("bucket", "day")
    w = Window.partitionBy("event_type").orderBy("day")
    prev = F.lag("cents").over(w)
    moves = (
        closes.withColumn("prev", prev)
        .filter(F.col("prev").isNotNull() & (F.col("prev") > 0))
        .withColumn(
            "move_ppm",
            F.expr("(cents - prev) * 1000000 div prev").cast("bigint"),
        )
        .withColumn("mag", F.abs(F.col("move_ppm")))
    )
    wd = Window.partitionBy("day").orderBy(F.col("mag").desc(), F.col("event_type"))
    return (
        moves.withColumn("rk", F.row_number().over(wd).cast("bigint"))
        .filter(F.col("rk") <= 3)
        .select("day", "event_type", "move_ppm", "rk")
    )
