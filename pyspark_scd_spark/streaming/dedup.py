"""Streaming deduplication with bounded state.

The batch dedup tiers (operators/dedup.py) assume the corpus is at
rest; an ingest pipeline needs the same guarantee on a stream —
at-least-once sources (file drops, Kafka with producer retries)
deliver duplicates, and the reference's answer (re-running the batch
dedup over the whole accumulated history, reference
jobs/create_employee_all.py:74-81) is O(history) per micro-batch.

``dropDuplicatesWithinWatermark`` keeps one state entry per key and
EXPIRES it once the watermark passes, so state is bounded by
(key arrival rate x watermark horizon), not by stream lifetime —
plain ``dropDuplicates`` on a stream grows state forever and is a
guaranteed OOM at 100 TB/day. The cost: a duplicate arriving later
than the horizon is re-emitted; pick the horizon from the source's
actual redelivery window (file-drop retries: minutes; Kafka
transactional replays: the transaction timeout).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def dedup_stream(
    events: DataFrame,
    keys: Sequence[str],
    ts_col: str = "ts",
    horizon: str = "1 hour",
) -> DataFrame:
    """Drop per-key duplicates arriving within ``horizon`` of the
    first occurrence. ``events`` must be a streaming DataFrame; the
    watermark on ``ts_col`` both gates state expiry here and feeds
    any downstream windowed aggregation."""
    return events.withWatermark(ts_col, horizon).dropDuplicatesWithinWatermark(
        list(keys)
    )
