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

from pyspark_scd_spark.functions.time import as_event_time


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
    events = events.withColumn(ts_col, as_event_time(ts_col))
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
    slide: str | None = None,
) -> DataFrame:
    """Watermarked tumbling-window counts (streaming twin of
    ``events_tumbling_window``); with ``slide`` the windows hop —
    see ``sliding_counts_stream``."""
    events = events.withColumn(ts_col, as_event_time(ts_col))
    win = (
        F.window(F.col(ts_col), window, slide)
        if slide is not None
        else F.window(F.col(ts_col), window)
    )
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(win.alias("w"), F.col(type_col))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("w.start").alias("window_start"),
            type_col,
            "n",
        )
    )


def sessionize_stateful(
    events,
    gap_seconds: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
):
    """Custom stateful sessionizer via ``applyInPandasWithState`` —
    the escape hatch when ``session_window`` can't express the
    semantics (e.g. dynamic per-user gaps, session caps, custom
    emission rules).

    State per user: (session_start_us, last_ts_us, n_events, value_sum).
    Each micro-batch folds its events into the state; sessions close
    when the inactivity gap passes (emitted rows) and the final open
    session is flushed on state timeout. State size is O(active users),
    bounded by the timeout — the knob that keeps 100 TB streams from
    accreting state forever.
    """
    import pandas as pd
    from pyspark.sql import types as T
    from pyspark.sql.streaming.state import (
        GroupState,
        GroupStateTimeout,
    )

    key_field = events.schema[user_col]
    out_schema = T.StructType(
        [
            T.StructField(user_col, key_field.dataType),
            T.StructField("session_start_us", T.LongType()),
            T.StructField("n_events", T.LongType()),
            T.StructField("value_sum", T.DoubleType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("start_us", T.LongType()),
            T.StructField("last_us", T.LongType()),
            T.StructField("n", T.LongType()),
            T.StructField("vsum", T.DoubleType()),
        ]
    )
    gap_us = gap_seconds * 1_000_000

    def _fold(key, pdfs, state: GroupState):
        (user,) = key
        closed = []
        if state.hasTimedOut:
            if state.exists:
                s, _, n, v = state.get
                closed.append((user, s, n, v))
                state.remove()
        else:
            rows = []
            for pdf in pdfs:
                ts_us = (
                    pd.to_datetime(pdf[ts_col]).astype("int64") // 1000
                )
                rows.extend(
                    zip(ts_us.tolist(), pdf[value_col].tolist())
                )
            rows.sort()
            if state.exists:
                s, last, n, v = state.get
            else:
                s = last = None
                n, v = 0, 0.0
            for t_us, val in rows:
                if last is not None and t_us - last > gap_us:
                    closed.append((user, s, n, v))
                    s, n, v = t_us, 0, 0.0
                if s is None:
                    s = t_us
                # late event (cross-batch out-of-order): fold it into
                # the current session without moving `last` backwards —
                # a regressed `last` would fake an inactivity gap and
                # split a live session
                s = min(s, t_us)
                last = t_us if last is None else max(last, t_us)
                n += 1
                v += float(val)
            state.update((s, last, n, v))
            state.setTimeoutDuration(gap_seconds * 1000)
        yield pd.DataFrame(
            closed,
            columns=[user_col, "session_start_us", "n_events", "value_sum"],
        )

    return (
        events.groupBy(user_col)
        .applyInPandasWithState(
            _fold,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )


def sliding_counts_stream(
    events: DataFrame,
    window: str = "1 hour",
    slide: str = "15 minutes",
    watermark: str = "1 second",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Watermarked HOPPING-window counts (streaming twin of
    ``events_sliding_window``): each event lands in window/slide
    overlapping windows; state per open window is expired by the
    watermark, so steady-state store size is (window/slide) ×
    |types| × horizon — bounded, unlike an unwatermarked sliding agg.
    """
    return tumbling_counts_stream(
        events,
        window=window,
        watermark=watermark,
        ts_col=ts_col,
        type_col=type_col,
        slide=slide,
    )
