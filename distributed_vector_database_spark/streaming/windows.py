"""Event-time window aggregates over the `events` stream — the
Structured-Streaming analog of the reference's WAL (SURVEY §2.2
Streaming; the WAL is the reference's only streaming-shaped seam,
src/utils/wal_manager.py:80-113).

Each window spec is ONE function used two ways: applied to a batch
DataFrame it is the oracle; applied to a readStream DataFrame (with
`streaming=True` adding the watermark) it is the live pipeline. That
makes streaming correctness checkable (SURVEY §5.5) — run the batch
form for the hash-matched oracle, run the stream form in tests through
foreachBatch and compare.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_counts(
    events: DataFrame,
    window_len: str = "1 hour",
    watermark: str = "2 hours",
    streaming: bool = False,
) -> DataFrame:
    """Tumbling-window per-event-type aggregates: count + value sum."""
    src = events.withWatermark("ts", watermark) if streaming else events
    return (
        src.groupBy(F.window("ts", window_len).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sliding_user_activity(
    events: DataFrame,
    window_len: str = "2 hours",
    slide: str = "1 hour",
    watermark: str = "3 hours",
    streaming: bool = False,
) -> DataFrame:
    """Sliding-window per-user activity (each event lands in
    window_len/slide windows)."""
    src = events.withWatermark("ts", watermark) if streaming else events
    return (
        src.groupBy(F.window("ts", window_len, slide).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "user_id", "n_events")
    )


def session_windows(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
    streaming: bool = False,
) -> DataFrame:
    """Session windows per user with a fixed inactivity gap."""
    src = events.withWatermark("ts", watermark) if streaming else events
    return (
        src.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("session_start"),
            "user_id",
            "n_events",
            "sum_value",
        )
    )
