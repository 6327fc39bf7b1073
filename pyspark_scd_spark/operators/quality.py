"""Data-quality gates.

The reference runs three eager assertions before every write
(``test_DF``, reference jobs/create_employee_all.py:158-180): duplicate
keys, schema equality, non-empty. Each assertion there is a separate
Spark job re-executing the full unpersisted lineage — ~3× recompute per
output table (SURVEY.md §3). Here the row-level checks run in ONE pass
(a single aggregate job), and the empty-check uses ``isEmpty`` (scans at
most one partition) rather than a full ``count()``.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


class QualityError(Exception):
    """Raised when a gate fails (reference's ``CustomError``,
    jobs/create_employee_all.py:154-156)."""


def duplicate_keys(df: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Key groups with more than one row (reference
    jobs/create_employee_all.py:165-169), as a DataFrame so it can be
    inspected, not just counted."""
    return (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .filter(F.col("n_rows") > 1)
    )


def assert_schema(df: DataFrame, expected: T.StructType) -> None:
    """Strict StructType equality — names, order, types, nullability
    (reference jobs/create_employee_all.py:171-172). Metadata-only;
    triggers no job."""
    if df.schema != expected:
        raise QualityError(
            f"schema mismatch:\n  got      {df.schema.simpleString()}"
            f"\n  expected {expected.simpleString()}"
        )


def assert_not_empty(df: DataFrame) -> None:
    """Zero-row gate. ``isEmpty`` reads at most one partition; the
    reference's ``count()`` (jobs/create_employee_all.py:173) scans
    everything."""
    if df.isEmpty():
        raise QualityError("DataFrame has 0 records")


def observed_write_metrics(
    df: DataFrame, key_cols: Sequence[str] | None = None, name: str = "quality"
):
    """Attach zero-cost quality metrics to a DataFrame via
    ``observe()``: they are computed DURING whatever action consumes
    the df (typically the write), so validation adds no extra pass at
    all — the SURVEY.md §3 fix for the reference's 3-jobs-per-write
    pattern taken to its limit.

    Returns (df, observation); read ``observation.get`` AFTER the
    action. Example::

        df2, obs = observed_write_metrics(df, keys)
        df2.write.parquet(path)
        m = obs.get          # {'n_rows': ..., 'n_null_keys': ...}
    """
    import functools
    import operator

    from pyspark.sql import Observation

    keys = list(key_cols) if key_cols else df.columns[:1]
    null_key = functools.reduce(
        operator.or_, [F.col(c).isNull() for c in keys]
    )
    obs = Observation(name)
    out = df.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(null_key, 1).otherwise(0)).alias("n_null_keys"),
    )
    return out, obs


def validate(
    df: DataFrame,
    keys: Sequence[str],
    expected_schema: T.StructType | None = None,
) -> None:
    """All gates in one aggregation job.

    A single ``agg`` computes total rows and distinct key-groups
    together; dup keys exist iff the two differ. One shuffle, partial
    aggregation map-side — contrast the reference's three jobs.
    """
    if expected_schema is not None:
        assert_schema(df, expected_schema)
    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.count_distinct(*[F.col(k) for k in keys]).alias("n_keys"),
    ).first()
    if row["n"] == 0:
        raise QualityError("DataFrame has 0 records")
    if row["n"] != row["n_keys"]:
        raise QualityError(
            f"duplicate keys: {row['n']} rows over {row['n_keys']} "
            f"distinct key groups {tuple(keys)}"
        )
