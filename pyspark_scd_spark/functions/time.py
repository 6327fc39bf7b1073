"""Timezone-independent time scalars.

The driver testdata's ``events.ts`` is parquet TIMESTAMP(isAdjustedToUTC
=false), which Spark ≥3.4 reads as TIMESTAMP_NTZ — and ``unix_micros``
accepts only TIMESTAMP (LTZ). ``epoch_us`` works on either type by
diffing against an NTZ epoch literal, so event-time arithmetic (session
gaps, attribution horizons) is identical under any driver session
timezone and matches DuckDB's ``epoch_us`` over the same naive values.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_EPOCH_NTZ = "TIMESTAMP_NTZ '1970-01-01 00:00:00'"


def epoch_us(c: Column | str) -> Column:
    """Microseconds since the epoch of a TIMESTAMP or TIMESTAMP_NTZ
    column.

    TIMESTAMP_NTZ inputs pass through untouched, so their differences
    are zone-independent. TIMESTAMP (LTZ) inputs are first rendered to
    NTZ **in the session zone** — this engine pins
    ``spark.sql.session.timeZone=UTC`` (session.py), under which the
    rendering is a fixed-offset bijection and differences are exact.
    Under a DST-observing session zone a difference spanning a
    transition would shift by the offset delta; callers outside the
    pinned-UTC sessions should ``unix_micros`` LTZ columns directly
    instead.
    """
    col = F.col(c) if isinstance(c, str) else c
    return F.timestamp_diff(
        "MICROSECOND", F.expr(_EPOCH_NTZ), col.cast("timestamp_ntz")
    )


def as_event_time(c: Column | str) -> Column:
    """Normalize a timestamp column for event-time streaming.

    Watermarks, ``session_window`` and stream-stream interval joins
    require TIMESTAMP; parquet TIMESTAMP(isAdjustedToUTC=false)
    arrives as TIMESTAMP_NTZ, which Spark rejects as an event-time
    column. The cast interprets the naive value in the session zone
    (UTC in this engine's sessions), preserving the instant.
    """
    col = F.col(c) if isinstance(c, str) else c
    return col.cast("timestamp")
