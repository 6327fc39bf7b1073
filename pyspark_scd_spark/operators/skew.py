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
