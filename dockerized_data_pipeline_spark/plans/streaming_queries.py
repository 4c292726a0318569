"""Batch-equivalent plans of the streaming operators (SURVEY section 2.9):
tumbling-window aggregation over event time, oracle-checked via DuckDB
time_bucket. The live streaming path (readStream + foreachBatch MERGE) is
exercised in tests/test_streaming.py."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from .registry import query


@query(
    "t_tumbling_window_hourly",
    oracle="""
    SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(12,4))) AS DOUBLE) AS sum_value
    FROM events WHERE ts IS NOT NULL GROUP BY 1, 2
    """,
)
def t_tumbling_window_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour window aggregate -- identical plan shape to the
    watermarked streaming version (streaming.ingest.windowed_event_counts);
    in batch the window is just a computed grouping column."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(12,4)")).cast("decimal(38,4)").alias("sum_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


@query(
    "t_session_window_counts",
    oracle="""
    WITH marked AS (
      SELECT user_id, ts, event_id,
             CASE WHEN LAG(ts) OVER w IS NULL
                    OR ts - LAG(ts) OVER w >= INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_sess
      FROM events WHERE ts IS NOT NULL
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sess AS (
      SELECT user_id, ts,
             SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS sess_id
      FROM marked
    )
    SELECT user_id, MIN(ts) AS session_start, COUNT(*) AS n_events
    FROM sess GROUP BY user_id, sess_id
    """,
)
def t_session_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's native session_window (30-minute inactivity gap) in batch
    mode -- the same operator drives watermarked streaming sessionization.
    A new session starts when the gap since the previous event is >= the
    timeout (Spark's session end is last_ts + gap, exclusive); the oracle
    says the same thing as gaps-and-islands SQL. Cross-checks the manual
    sessionize operator (plans/extras.py sessionize_user_events)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            "n_events",
        )
    )


@query(
    "t_sliding_window_counts",
    oracle="""
    SELECT window_start, event_type, COUNT(*) AS n_events FROM (
      SELECT UNNEST([
               time_bucket(INTERVAL '1 hour', ts),
               time_bucket(INTERVAL '1 hour', ts - INTERVAL '30 minutes')
                 + INTERVAL '30 minutes'
             ]) AS window_start,
             event_type
      FROM events WHERE ts IS NOT NULL
    ) GROUP BY 1, 2
    """,
)
def t_sliding_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window (1 hour, 30 min slide): each event lands in two
    overlapping windows -- Spark's window() generator; UNNEST of the two
    candidate buckets in the oracle."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes"), "event_type")
        .agg(F.count("*").alias("n_events"))
        .select(F.col("window.start").alias("window_start"), "event_type", "n_events")
    )
