"""Physical-plan inspection helpers.

The 100 TB design reviews in SURVEY.md §4/§7 become *testable* here:
count exchanges, assert a join broadcast, assert filters reached the
parquet scan. Used by tests/test_plans.py so plan regressions (an
accidental extra shuffle, a lost pushdown) fail CI, not production.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def count_exchanges(df: DataFrame) -> int:
    """Shuffle exchanges in the physical plan (excluding broadcast
    exchanges and reused ones — those move no partitioned data)."""
    plan = physical_plan(df)
    return len(
        [
            m
            for m in re.finditer(r"Exchange (\w+)", plan)
            if "SinglePartition" in m.group(0)
            or m.group(1) in ("hashpartitioning", "rangepartitioning")
        ]
    )


def count_pattern(df: DataFrame, pattern: str) -> int:
    return len(re.findall(pattern, physical_plan(df)))


def has_broadcast_join(df: DataFrame) -> bool:
    plan = physical_plan(df)
    return "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters lists from every parquet scan node. The plan's
    toString truncates long metadata with '...', so match to
    end-of-bracket OR truncation marker."""
    plan = physical_plan(df)
    return re.findall(r"PushedFilters: \[(.*?)(?:\]|\.\.\.)", plan)


def scan_read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema of every scan — column pruning check (truncation-
    tolerant, see pushed_filters)."""
    plan = physical_plan(df)
    return re.findall(r"ReadSchema: struct<(.*?)(?:>|\.\.\.)", plan)
