"""Mergeable cardinality sketches: deterministic HyperLogLog.

At 100 TB, COUNT(DISTINCT key) is one of the most expensive questions
a pipeline asks — the exact form shuffles every distinct key once.
HyperLogLog (Flajolet et al. 2007) answers it with m = 2^p registers
per (group of) partitions: hash each value, route it to register
h mod m, and keep the maximum "rank" (position of the first set bit
of the remaining hash bits). Registers MERGE by elementwise max, so
the Spark plan is two map-side-combinable aggregations — the same
shape as any algebraic agg — and the shuffle carries at most m rows
per partition regardless of input size. Spark's own
``approx_count_distinct`` is HLL++ with an opaque, version-dependent
hash; this operator exists for the engine's cross-engine exactness
discipline: the hash is a 60-bit md5 prefix and the rank uses the
bit-smear trick (w |= w>>1 … w>>32; rank = 50 − bit_count(w) + 1),
both of which DuckDB evaluates IDENTICALLY — so the whole register
table, not just the estimate, is hash-checkable.

Estimator: the raw HLL formula E = alpha_m · m² / Σ 2^(−reg) with
empty registers contributing 2^0 each. The linear-counting
small-range branch (E ≤ 2.5m) is deliberately NOT implemented — it
needs ln(), whose last-ulp behavior is libm-specific and would break
bit-parity; callers counting < 2.5·2^p distincts should lower p or
count exactly. The registry entry runs in the raw regime and the
oracle recomputes registers AND estimate from scratch.

Reference scope: the reference engine has no sketches (SURVEY.md §2);
this extends the same family as cms_vocab_topk (corpus.py), which
vendors count-min for the identical reason.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _rank_expr(w: Column, width: int) -> Column:
    """Position of the highest set bit, as rank = width − bit_length(w)
    + 1 (w == 0 → width + 1): smear the MSB downward with 6 or-shift
    steps, then bit_length = bit_count(smeared). Exact int64 ops that
    evaluate identically in Spark and DuckDB — no log2, no UDF."""
    s = w
    for k in (1, 2, 4, 8, 16, 32):
        s = s.bitwiseOR(F.shiftright(s, k))
    return F.lit(width + 1) - F.bit_count(s)


def hll_registers(
    df: DataFrame, value: Column, p: int = 10
) -> DataFrame:
    """(bucket, register) for the non-empty HLL buckets of ``value``.

    hash = 60-bit md5 prefix; bucket = hash % 2^p; rank over the
    remaining (60 − p) bits. One groupBy — map-side combined, shuffle
    bounded by m = 2^p rows per partition."""
    m = 1 << p
    width = 60 - p
    h = F.conv(
        F.substring(F.md5(value.cast("string")), 1, 15), 16, 10
    ).cast("long")
    return (
        df.select(
            (h % m).alias("bucket"),
            F.shiftright(h, p).alias("__w"),
        )
        .groupBy("bucket")
        .agg(
            F.max(_rank_expr(F.col("__w"), width))
            .cast("int")
            .alias("register")
        )
    )


def hll_distinct(
    df: DataFrame, value: Column, p: int = 10
) -> DataFrame:
    """One-row HLL cardinality report: (m, observed_buckets,
    zero_buckets, harmonic_sum, hll_estimate, exact_distinct,
    rel_error). Keeps the exact COUNT(DISTINCT) beside the sketch so
    the entry is its own accuracy audit; production callers at 100 TB
    drop the exact branch and keep the two-exchange sketch."""
    m = 1 << p
    alpha = 0.7213 / (1.0 + 1.079 / m)
    regs = hll_registers(df, value, p)
    sketch = regs.agg(
        F.count(F.lit(1)).cast("long").alias("observed_buckets"),
        F.sum(F.pow(F.lit(2.0), -F.col("register"))).alias("__hs_obs"),
    ).select(
        F.lit(m).cast("long").alias("m"),
        "observed_buckets",
        (F.lit(m) - F.col("observed_buckets"))
        .cast("long")
        .alias("zero_buckets"),
        F.round(
            F.col("__hs_obs") + (F.lit(m) - F.col("observed_buckets")),
            6,
        ).alias("harmonic_sum"),
        F.round(
            F.lit(alpha * m * m)
            / (
                F.col("__hs_obs")
                + (F.lit(m) - F.col("observed_buckets"))
            ),
            2,
        ).alias("hll_estimate"),
    )
    exact = df.agg(
        F.countDistinct(value).cast("long").alias("exact_distinct")
    )
    return sketch.crossJoin(F.broadcast(exact)).withColumn(
        "rel_error",
        F.round(
            F.abs(F.col("hll_estimate") - F.col("exact_distinct"))
            / F.col("exact_distinct"),
            4,
        ),
    )


def hll_estimate_from_registers(
    regs: DataFrame, p: int = 10, out_col: str = "estimate"
) -> DataFrame:
    """1-row raw-regime estimate from a (bucket, register) table —
    the consumer of MERGED registers (elementwise max of any number
    of per-source sketches), which is what makes HLL useful for join
    planning: |A ∩ B| ≈ E(A) + E(B) − E(A ∪ B) with the union sketch
    costing one groupBy-max over already-tiny register tables."""
    m = 1 << p
    alpha = 0.7213 / (1.0 + 1.079 / m)
    return regs.agg(
        F.count(F.lit(1)).alias("__obs"),
        F.sum(F.pow(F.lit(2.0), -F.col("register"))).alias("__hs"),
    ).select(
        (
            F.lit(alpha * m * m)
            / (F.col("__hs") + (F.lit(m) - F.col("__obs")))
        ).alias(out_col)
    )
