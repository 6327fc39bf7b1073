"""Relational operator breadth: joins, aggregations, set ops, sorts.

The reference deliberately has zero joins (reference README.md:99,102)
and only trivial aggregation (the dup-check ``groupBy().count()``,
reference jobs/create_employee_all.py:165-169). These operators supply
the relational surface any real pipeline needs, expressed declaratively
so Catalyst owns the physical strategy; the docstrings note the plan
shape we expect and why it scales.

Queries over the driver testdata (TPC-H-ish) live in
``__spark_entry__.py``; this module holds the reusable transforms.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def join_dim(
    fact: DataFrame,
    dim: DataFrame,
    on: Sequence[str] | Column,
    how: str = "inner",
    broadcast_dim: bool = True,
) -> DataFrame:
    """Fact-to-dimension join.

    ``broadcast_dim=True`` hints the dimension side for a broadcast-hash
    join: no shuffle of the fact table at all — the 100 TB fact streams
    through map tasks against an in-memory copy of the dim. Catalyst
    auto-broadcasts under ``spark.sql.autoBroadcastJoinThreshold``
    anyway; the hint makes intent explicit for dims we KNOW are small
    (region/nation/supplier-class tables).
    """
    d = F.broadcast(dim) if broadcast_dim else dim
    return fact.join(d, on=on, how=how)


def semi_join(df: DataFrame, other: DataFrame, on) -> DataFrame:
    """EXISTS: rows of ``df`` with a match in ``other``. Spark's
    left-semi hash join keeps only the key set of the build side —
    far cheaper than inner-join + distinct."""
    return df.join(other, on=on, how="left_semi")


def anti_join(df: DataFrame, other: DataFrame, on) -> DataFrame:
    """NOT EXISTS: rows of ``df`` with no match in ``other``."""
    return df.join(other, on=on, how="left_anti")


def aggregate(
    df: DataFrame,
    group_cols: Sequence[str],
    aggs: Sequence[Column],
    kind: str = "groupby",
) -> DataFrame:
    """groupBy / rollup / cube with the same call shape.

    All three compile to partial (map-side) + final aggregation around
    one hash exchange on the grouping keys; rollup/cube expand the
    grouping sets before the partial agg, so they cost ~#sets× the
    map-side work but still a single shuffle.
    """
    if kind == "rollup":
        grouped = df.rollup(*group_cols)
    elif kind == "cube":
        grouped = df.cube(*group_cols)
    else:
        grouped = df.groupBy(*group_cols)
    return grouped.agg(*aggs)
