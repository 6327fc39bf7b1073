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

from pyspark.sql import Column, DataFrame, Window
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


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_time: str,
    right_time: str,
    right_value_cols: Sequence[str],
    tiebreak_cols: Sequence[str] = (),
) -> DataFrame:
    """As-of (last-observation-carried-forward) join: for every left
    row, the most recent right row with ``right_time <= left_time`` on
    the same key. Spark has no native ASOF JOIN; the naive form is a
    non-equi join + top-1 filter whose intermediate blows up with
    match density.

    This is the union-merge form: tag both sides, union, then
    ``last_value(ignorenulls)`` over (key, time)-sorted rows — right
    rows carry values, left rows carry nulls, so each left row reads
    the latest right value at its position. Cost: ONE hash exchange on
    the key + one sort — identical plan shape to the SCD windows,
    O(|L|+|R|) regardless of match density. Right rows sort before
    left rows at equal timestamps (asof "<=").
    """
    keys = list(on)
    lcols = [c for c in left.columns if c not in keys]
    l_tagged = left.select(
        *keys,
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__is_left"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__rv_{c}")
          for c in right_value_cols],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__tb_{c}")
          for c in tiebreak_cols],
        *lcols,
    )
    r_tagged = right.select(
        *keys,
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__is_left"),
        *[F.col(c).alias(f"__rv_{c}") for c in right_value_cols],
        *[F.col(c).alias(f"__tb_{c}") for c in tiebreak_cols],
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
    )
    u = l_tagged.unionByName(r_tagged)
    w = Window.partitionBy(*keys).orderBy(
        F.col("__t").asc(),
        F.col("__is_left").asc(),
        *[F.col(f"__tb_{c}").asc_nulls_first() for c in tiebreak_cols],
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    picked = [
        F.last(f"__rv_{c}", ignorenulls=True).over(w).alias(c)
        for c in right_value_cols
    ]
    return (
        u.select(*keys, "__t", "__is_left", *lcols, *picked)
        .filter(F.col("__is_left") == 1)
        .withColumnRenamed("__t", left_time)
        .drop("__is_left")
    )


def range_join(
    fact: DataFrame,
    bands: DataFrame,
    value_col: str,
    lo_col: str,
    hi_col: str,
    broadcast_bands: bool = True,
) -> DataFrame:
    """Band/interval join: fact rows matched to ranges
    ``lo <= value < hi``. With a broadcast band table Catalyst plans a
    BroadcastNestedLoopJoin — each fact partition scans the (tiny)
    band list in memory, no shuffle of the fact side. For non-broadcast
    interval joins, pre-bucketing both sides on a coarse grid turns it
    into an equi-join; that variant is a composition of this + a
    bucket column."""
    b = F.broadcast(bands) if broadcast_bands else bands
    cond = (F.col(value_col) >= F.col(lo_col)) & (
        F.col(value_col) < F.col(hi_col)
    )
    return fact.join(b, cond, "left")


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


def fuzzy_match_blocked(
    df: DataFrame,
    block_cols: list[str],
    text_col: str,
    id_col: str,
    max_distance: int = 5,
) -> DataFrame:
    """Entity-resolution candidate pairs: Levenshtein distance ≤
    ``max_distance`` between rows sharing a blocking key.

    The blocking join is the whole design: edit distance is O(len²)
    per pair and cannot be indexed, so the only scalable form is an
    equi-join on cheap block keys (brand+size here; phonetic codes or
    sorted-neighborhood keys in general) that bounds each block to a
    handful of rows, THEN the quadratic-per-pair distance inside the
    block. An unblocked fuzzy join is n² edit distances — a
    non-starter at any scale; block-key skew is the thing to monitor
    (a hot block re-introduces the n² locally).

    Emits (id_a, id_b, name_a, name_b, distance), id_a < id_b.
    """
    a = df.select(
        *[F.col(c) for c in block_cols],
        F.col(id_col).alias("id_a"),
        F.col(text_col).alias("name_a"),
    )
    b = df.select(
        *[F.col(c) for c in block_cols],
        F.col(id_col).alias("id_b"),
        F.col(text_col).alias("name_b"),
    )
    return (
        a.join(b, block_cols)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn(
            "distance", F.levenshtein(F.col("name_a"), F.col("name_b"))
        )
        .filter(F.col("distance") <= max_distance)
        .select("id_a", "id_b", "name_a", "name_b", "distance")
    )


def basket_lift_pairs(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_pair_count: int = 2,
) -> DataFrame:
    """Market-basket co-occurrence mining: for every item pair
    appearing together in at least ``min_pair_count`` baskets, the
    association metrics support, confidence (a→b) and lift.

    Shape: distinct (basket, item) → within-basket self-join keyed on
    the basket (candidate pairs exist only inside a basket — never a
    global item×item cross join) → pair counts, with per-item basket
    counts and the basket total broadcast back onto the (much
    smaller) pair table. Baskets are small and bounded, so the
    within-basket join is ~|baskets|·k² with k = items/basket; a hot
    basket (one order with thousands of items) is the thing to guard
    against upstream, not a hot item.

    Lift is computed from exact integer counts, so both engines
    derive the identical double.
    """
    # checkpointed: consumed four times (basket total, item margins,
    # both sides of the within-basket join) — each branch would
    # otherwise re-run the scan + distinct
    b = (
        df.select(
            F.col(basket_col).alias("__b"), F.col(item_col).alias("__i")
        )
        .distinct()
        .localCheckpoint()
    )
    n_baskets = b.select(F.countDistinct("__b").alias("__n"))
    item_n = b.groupBy("__i").agg(F.count(F.lit(1)).alias("__ni"))
    rhs = b.select(F.col("__b"), F.col("__i").alias("__j"))
    pairs = (
        b.join(rhs, "__b")
        .filter(F.col("__i") < F.col("__j"))
        .groupBy("__i", "__j")
        .agg(F.count(F.lit(1)).alias("pair_count"))
        .filter(F.col("pair_count") >= min_pair_count)
    )
    ni = item_n.select(F.col("__i"), F.col("__ni").alias("__na"))
    nj = item_n.select(
        F.col("__i").alias("__j"), F.col("__ni").alias("__nb")
    )
    # No broadcast hint on the per-item margin table: it is
    # O(|distinct items|) and unbounded (web-scale catalogs run to
    # many millions of items), so a forced broadcast risks OOM and
    # overrides AQE's size-based choice — AQE broadcasts it when it
    # actually fits. n_baskets is a literal single row; that hint
    # stays.
    out = (
        pairs.join(ni, "__i")
        .join(nj, "__j")
        .crossJoin(F.broadcast(n_baskets))
    )
    return out.select(
        F.col("__i").alias("item_a"),
        F.col("__j").alias("item_b"),
        "pair_count",
        F.round(F.col("pair_count") / F.col("__n"), 6).alias("support"),
        F.round(F.col("pair_count") / F.col("__na"), 6).alias(
            "confidence_a_to_b"
        ),
        # divide before the cross-count multiply: long*long products
        # (pair_count*n, na*nb) overflow 2^63 at web-scale basket
        # counts, an ANSI-mode hard error
        F.round(
            (F.col("pair_count") / F.col("__na"))
            * (F.col("__n") / F.col("__nb")),
            6,
        ).alias("lift"),
    )
