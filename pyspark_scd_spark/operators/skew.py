"""Skew mitigation operators.

At 100 TB a handful of hot keys (one mega-customer, one empty-string
token) can pin a whole stage on one task. Two standard remedies, both
plain DataFrame ops:

- **Salted two-phase aggregation**: partial-aggregate on
  (key, salt) — the hot key's rows spread across ``n_salts``
  partitions — then final-aggregate on the key. Works for any
  algebraic aggregate (sum/count/min/max and anything expressible as
  partial+merge).
- **Salted broadcast of the skewed side of a join** is not needed as a
  custom operator: AQE's skew-join handling
  (``spark.sql.adaptive.skewJoin.enabled``, on in session.py) splits
  oversized partitions at runtime; `relational.join_dim` broadcasts
  small dims outright.

The salt is ``pmod(xxhash64(all columns), n)`` — deterministic (no
``rand()``), so plans are reproducible and retries of a failed task
re-produce identical partitions (rand() salting breaks exactly-once
retry semantics under speculative execution).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_sum_count(
    df: DataFrame,
    key_cols: Sequence[str],
    sum_cols: Sequence[str],
    n_salts: int = 16,
) -> DataFrame:
    """Skew-tolerant groupBy: sums and a row count per key via
    (key, salt) partial aggregation + key-level merge.

    Equivalent to ``df.groupBy(keys).agg(sum(...), count(*))`` — the
    registry query checks that equivalence against the oracle — but
    the first shuffle's key space is |keys|·n_salts, so a key holding
    half the table occupies n_salts tasks instead of one. Spark's own
    map-side partial aggregation gives similar protection when the
    agg state is small; the explicit salt matters once per-key state
    or key cardinality defeats the hash-map (distinct-heavy aggs,
    collect_list, huge groups).
    """
    salt = F.pmod(
        F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salts)
    ).alias("__salt")
    partial = (
        df.withColumn("__salt", salt)
        .groupBy(*key_cols, "__salt")
        .agg(
            *[F.sum(c).alias(f"__ps_{c}") for c in sum_cols],
            F.count(F.lit(1)).alias("__pc"),
        )
    )
    return partial.groupBy(*key_cols).agg(
        *[F.sum(f"__ps_{c}").alias(f"sum_{c}") for c in sum_cols],
        F.sum("__pc").alias("n_rows"),
    )


def two_phase_distinct_agg(
    df: DataFrame,
    key_cols: Sequence[str],
    member_col: str,
    sample_k: int | None = None,
) -> DataFrame:
    """Distinct-member aggregation with BOUNDED per-task state: the
    state-heavy form the round-10 hot-key study proved out
    (SCALING.md: a naive ``collect_set`` held a 5.1M-member set in
    ONE task's aggregation buffer; the two-phase form won ~30% and —
    the point at 100 TB — bounded every task's state).

    Phase 1 deduplicates on (key, member): the shuffle key includes
    the member, so a hot key's rows spread across the full member
    diversity instead of collapsing onto one task, and map-side
    partial aggregation caps what any partition ships at its count
    of distinct pairs. Phase 2 groups the deduplicated pairs by key;
    its per-key state is TWO COUNTERS (distinct count via COUNT(*),
    row count via SUM of phase-1 duplicate counts), never a member
    set. Returns (``*key_cols``, ``n_distinct``, ``n_rows``).

    ``sample_k`` optionally adds ``member_sample`` — the k smallest
    distinct members per key as a sorted array. The sample comes from
    a rank-filtered window over the phase-1 pairs (Spark's group-limit
    pushdown keeps per-partition state at k rows per key), so even the
    "show me some members" use case never materializes an unbounded
    set in one task.
    """
    pairs = df.groupBy(*key_cols, member_col).agg(
        F.count(F.lit(1)).alias("__dup")
    )
    out = pairs.groupBy(*key_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n_distinct"),
        F.sum("__dup").cast("long").alias("n_rows"),
    )
    if sample_k is not None:
        from pyspark.sql import Window

        w = Window.partitionBy(*[F.col(c) for c in key_cols]).orderBy(
            member_col
        )
        samp = (
            pairs.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= sample_k)
            .groupBy(*key_cols)
            .agg(
                F.sort_array(F.collect_list(member_col)).alias(
                    "member_sample"
                )
            )
        )
        out = out.join(samp, list(key_cols))
    return out


def top_frequent_keys(
    df: DataFrame, key_cols: Sequence[str], k: int = 20
) -> DataFrame:
    """Hot-key detector: the k most frequent key groups with counts —
    run this on a sample to decide whether salting / AQE skew hints
    are warranted before launching the big job."""
    return (
        df.groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .orderBy(F.col("n_rows").desc(), *[F.col(c) for c in key_cols])
        .limit(k)
    )
