"""Streaming sessionization and windowed aggregation.

The batch forms live in the registry (``events_sessionize``,
``events_tumbling_window``); these are their Structured Streaming
twins: ``session_window`` / ``window`` aggregations with watermarks for
late data. State is bounded by the watermark — at production rates the
state store holds only sessions still inside the lateness horizon.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sessionize_stream(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Per-user sessions with a dynamic inactivity gap.

    ``session_window(ts, gap)`` merges events whose timestamps are
    within ``gap`` of the session's current span — the streaming
    equivalent of the batch lag-gap + running-sum trick
    (registry ``events_sessionize``). The watermark closes sessions
    once event time passes (session end + watermark), emitting one
    final row per session (append mode).
    """
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(
            F.session_window(F.col(ts_col), gap).alias("session"),
            F.col(user_col),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(value_col), 2).alias("session_value"),
        )
        .select(
            user_col,
            F.col("session.start").alias("session_start"),
            F.col("session.end").alias("session_end"),
            "n_events",
            "session_value",
        )
    )


def tumbling_counts_stream(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "1 hour",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Watermarked tumbling-window counts (streaming twin of
    ``events_tumbling_window``)."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("w"), F.col(type_col))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("w.start").alias("window_start"),
            type_col,
            "n",
        )
    )
