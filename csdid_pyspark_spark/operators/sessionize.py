"""Event-stream batch operators: sessionization + time-window rollups.

Sessionization is the lag-gap pattern: a window over (user, ts) marks
session starts where the gap exceeds the timeout, and a running sum
assigns session ids. One shuffle keyed by user — the same plan shape
Spark uses for any per-entity ordered scan, and it parallelizes across
users at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: float = 30.0,
) -> DataFrame:
    """Assign ``session_id`` (1-based per user) to each event."""
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col), F.col("event_id"))
    # integer microseconds so the gap comparison is exact (no float tz/epoch
    # representation differences vs the SQL oracle)
    gap_us = F.unix_micros(F.col(ts_col)) - F.unix_micros(F.lag(F.col(ts_col)).over(w))
    is_new = F.when(gap_us.isNull() | (gap_us > int(gap_minutes * 60_000_000)), 1).otherwise(0)
    return events.withColumn("session_id", F.sum(is_new).over(w).cast("bigint"))


def session_stats(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: float = 30.0,
) -> DataFrame:
    """Per-user session count and mean session length (events)."""
    s = sessionize(events, user_col, ts_col, gap_minutes)
    per_session = s.groupBy(user_col, "session_id").agg(F.count("*").alias("n_events"))
    return per_session.groupBy(user_col).agg(
        F.count("*").cast("bigint").alias("n_sessions"),
        F.round(F.avg("n_events"), 6).alias("avg_events_per_session"),
    )


def tumbling_window_agg(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    duration: str = "1 hour",
) -> DataFrame:
    """Tumbling-window aggregate via built-in ``F.window`` (the same
    operator Structured Streaming uses — identical semantics batch vs
    stream). Window start is emitted as a string for oracle portability."""
    return (
        events.groupBy(F.window(F.col(ts_col), duration).alias("w"), F.col(key_col))
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            key_col,
            "n_events",
            "sum_value",
        )
    )
