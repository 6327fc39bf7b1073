"""Top-k / latest-per-group operators.

Generalizes the reference's ``get_latest_snapshot`` — row_number over a
per-key descending window, keep rank 1 (reference
jobs/create_employee_all.py:51-66) — to arbitrary k and arbitrary
ordering, plus a ``max_by``-struct variant that replaces the full sort
window with a single aggregation (one shuffle, map-side partial agg,
no per-partition sort) for the k=1 case.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def topk_per_group(
    df: DataFrame,
    key_cols: Sequence[str],
    order_by: Sequence[Column],
    k: int = 1,
    rank_col: str | None = None,
) -> DataFrame:
    """Keep the top-k rows per key group under ``order_by``.

    ``row_number`` (not ``rank``) — exactly k survivors per group, ties
    broken by window order, so callers wanting determinism must make
    ``order_by`` a total order (reference's dedup lacked this;
    SURVEY.md §2 #4).

    Scale: one hash-exchange on ``key_cols`` + per-partition sort.
    Catalyst inserts a rank-limit pushdown (WindowGroupLimit, Spark
    3.5+) so each map task keeps only k rows per key before the shuffle.
    """
    w = Window.partitionBy(*key_cols).orderBy(*order_by)
    out = df.withColumn("__rn", F.row_number().over(w)).filter(
        F.col("__rn") <= k
    )
    if rank_col:
        return out.withColumnRenamed("__rn", rank_col)
    return out.drop("__rn")


def latest_per_group(
    df: DataFrame,
    key_cols: Sequence[str],
    time_col: str,
    tiebreak_cols: Sequence[str] = (),
) -> DataFrame:
    """Latest row per key — the k=1 special case via ``max_by`` structs.

    ``groupBy(key).agg(max(struct(t, tiebreaks, *cols)))`` needs no sort
    window: partial aggregation keeps one candidate struct per key per
    map task, so the shuffle moves |keys| rows instead of |rows| — at
    100 TB with bounded key cardinality this is the difference between
    a full-data shuffle and a near-free one.
    """
    other = [c for c in df.columns if c not in (*key_cols, time_col, *tiebreak_cols)]
    packed = F.max(
        F.struct(
            F.col(time_col),
            *[F.col(c) for c in tiebreak_cols],
            *[F.col(c) for c in other],
        )
    ).alias("__top")
    out = df.groupBy(*key_cols).agg(packed)
    return out.select(
        *key_cols,
        F.col(f"__top.{time_col}").alias(time_col),
        *[F.col(f"__top.{c}").alias(c) for c in tiebreak_cols],
        *[F.col(f"__top.{c}").alias(c) for c in other],
    )


def global_topk(
    df: DataFrame, order_by: Sequence[Column], k: int
) -> DataFrame:
    """Global top-k: ``orderBy(...).limit(k)``.

    Spark plans this as TakeOrderedAndProject — each task keeps its
    local top-k and only k rows per task reach the driver-side merge;
    no global sort materializes. Safe at any scale for small k.
    """
    return df.orderBy(*order_by).limit(k)
