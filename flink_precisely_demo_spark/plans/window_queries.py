"""Sliding and session window queries (beyond the reference's single
tumbling window — SURVEY.md §2.2 scope additions) with DuckDB
oracles built from explicit window arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.windowed_agg import sum_exact
from ..sources.parquet import load_table
from .queries import query


@query(
    "sliding_window_events",
    oracle="""
    WITH starts AS (
      SELECT *, make_timestamp((epoch_us(ts) // 300000000) * 300000000) AS w_start
      FROM events
      UNION ALL
      SELECT *, make_timestamp((epoch_us(ts) // 300000000) * 300000000
                               - 300000000) AS w_start
      FROM events
    )
    SELECT w_start AS window_start, event_type,
           CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS total_value,
           COUNT(*) AS n_events
    FROM starts
    GROUP BY 1, 2
    """,
)
def _sliding_window_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10-minute windows sliding every 5: each row lands in exactly
    two windows (start = its 5-min bucket, and the one before)."""
    ev = load_table(spark, sf_dir, "events")
    grouped = (ev.groupBy(F.window("ts", "10 minutes", "5 minutes"),
                          "event_type")
                 .agg(sum_exact("value").alias("total_value"),
                      F.count(F.lit(1)).alias("n_events")))
    return grouped.select(
        F.col("window.start").alias("window_start"),
        "event_type", "total_value", "n_events")


@query(
    "session_window_events",
    oracle="""
    WITH marked AS (
      SELECT user_id, event_id, ts, value,
             CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w <= 1800000000
                  THEN 0 ELSE 1 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sessions AS (
      -- event_id tiebreak: duplicate-ts rows must accumulate in the
      -- same order the session marks were computed in
      SELECT user_id, ts, value,
             SUM(new_session) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS sid
      FROM marked
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) + INTERVAL 30 MINUTE AS session_end,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS session_value
    FROM sessions
    GROUP BY user_id, sid
    """,
)
def _session_window_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native session windows (F.session_window, 30-min gap): window
    end = last event + gap; equivalent to the lag/cumsum
    sessionization but expressed with the built-in operator (which is
    also the streaming-capable form)."""
    ev = load_table(spark, sf_dir, "events")
    grouped = (ev.groupBy("user_id", F.session_window("ts", "30 minutes"))
                 .agg(F.count(F.lit(1)).alias("n_events"),
                      sum_exact("value").alias("session_value")))
    return grouped.select(
        "user_id",
        F.col("session_window.start").alias("session_start"),
        F.col("session_window.end").alias("session_end"),
        "n_events", "session_value")
