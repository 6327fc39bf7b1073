"""Watermarked stream-stream interval join: attribution candidates.

Batch twin: registry ``events_attribution`` (last-click within 1 hour,
computed with one carry-forward window). The streaming form cannot use
an unbounded window — instead it joins the click stream to the
purchase stream on user + a time-range predicate. The watermarks plus
the range condition bound BOTH join state stores: a buffered click can
be dropped once the purchase-side watermark passes
``click.ts + horizon``, so state is O(events inside the horizon), not
O(stream). This is the canonical Structured Streaming interval-join
recipe (Spark docs "inner joins with optional watermarking").

Last-click *selection* (max click_ts per purchase) is a second
stateful stage; in production it runs in the ``foreachBatch`` sink or
as a downstream batch job over the candidates — chaining it inline
would stack stateful operators with mismatched output watermarks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyspark_scd_spark.functions.time import as_event_time


def attribution_candidates_stream(
    clicks: DataFrame,
    purchases: DataFrame,
    horizon: str = "1 hour",
    watermark: str = "30 minutes",
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    how: str = "inner",
) -> DataFrame:
    """All (purchase, click) pairs where the click precedes the
    purchase by at most ``horizon``, per user.

    Inner join: every emitted row is final as soon as both sides have
    arrived (append mode, no watermark-delayed null emission — the
    left-outer variant only emits unmatched purchases after the
    watermark passes, which an ``availableNow`` drain may never reach).
    """
    c = clicks.select(
        F.col(user_col).alias("c_user"),
        as_event_time(ts_col).alias("click_ts"),
        F.col(id_col).alias("click_id"),
    ).withWatermark("click_ts", watermark)
    p = purchases.select(
        F.col(user_col).alias("p_user"),
        as_event_time(ts_col).alias("purchase_ts"),
        F.col(id_col).alias("purchase_id"),
    ).withWatermark("purchase_ts", watermark)
    cond = (
        (F.col("c_user") == F.col("p_user"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (
            F.col("click_ts")
            >= F.col("purchase_ts") - F.expr(f"interval {horizon}")
        )
    )
    return p.join(c, cond, how).select(
        "purchase_id",
        F.col("p_user").alias("user_id"),
        "purchase_ts",
        "click_id",
        "click_ts",
    )


def attribution_outer_stream(
    clicks: DataFrame,
    purchases: DataFrame,
    horizon: str = "1 hour",
    watermark: str = "30 minutes",
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """LEFT OUTER variant: purchases with no click in the horizon
    emit null-padded — the "unattributed conversions" feed. Unlike
    the inner join, null rows are NOT final on arrival: a purchase
    emits its null form only once the GLOBAL watermark (min across
    both inputs, minus the delay) passes its timestamp, proving no
    matching click can still arrive. An ``availableNow`` drain runs a
    final no-data batch that advances the watermark to
    min(max_click_ts, max_purchase_ts) − delay and flushes state, so
    unmatched purchases above that line stay unemitted — the exact
    rule the oracle encodes (probed empirically, same protocol as the
    session/tumbling emission rules).
    """
    return attribution_candidates_stream(
        clicks,
        purchases,
        horizon=horizon,
        watermark=watermark,
        user_col=user_col,
        ts_col=ts_col,
        id_col=id_col,
        how="left_outer",
    )
