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
count exactly. That contract is ENFORCED, not just documented: every
estimate row carries a ``small_range_unreliable`` flag (raw estimate
≤ 2.5·m — the regime where standard HLL would switch to linear
counting and the raw formula is biased high), so a production caller
who lands in the unimplemented regime gets a machine-checkable
signal instead of a silently biased number. The registry entry runs
in the raw regime (flag asserted false at all three SFs in
tests/test_sketches.py) and the oracle recomputes registers AND
estimate from scratch.

Reference scope: the reference engine has no sketches (SURVEY.md §2);
this extends the same family as cms_vocab_topk (corpus.py), which
vendors count-min for the identical reason.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _smear(w: Column) -> Column:
    """Propagate the highest set bit downward (6 or-shift steps) —
    the exact-int64 building block for bit_length without log2."""
    s = w
    for k in (1, 2, 4, 8, 16, 32):
        s = s.bitwiseOR(F.shiftright(s, k))
    return s


def _rank_expr(w: Column, width: int) -> Column:
    """Position of the highest set bit, as rank = width − bit_length(w)
    + 1 (w == 0 → width + 1): smear the MSB downward with 6 or-shift
    steps, then bit_length = bit_count(smeared). Exact int64 ops that
    evaluate identically in Spark and DuckDB — no log2, no UDF."""
    return F.lit(width + 1) - F.bit_count(_smear(w))


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
    rel_error, small_range_unreliable). Keeps the exact
    COUNT(DISTINCT) beside the sketch so the entry is its own
    accuracy audit; production callers at 100 TB drop the exact
    branch and keep the two-exchange sketch, and gate on the
    ``small_range_unreliable`` flag (module docstring: the raw
    formula is biased in the E ≤ 2.5·m regime where linear counting
    is deliberately unimplemented).

    Empty-input contract: an empty ``df`` yields one well-defined
    row — zero observed buckets, harmonic_sum = m, the raw-formula
    floor estimate (≈ 0.72·m, flagged unreliable), exact_distinct =
    0, and rel_error NULL (the exact-vs-estimate ratio is undefined
    at zero), instead of a division-by-zero null cascade."""
    m = 1 << p
    alpha = 0.7213 / (1.0 + 1.079 / m)
    regs = hll_registers(df, value, p)
    sketch = regs.agg(
        F.count(F.lit(1)).cast("long").alias("observed_buckets"),
        # coalesce: SUM over zero rows (empty input) is NULL; the
        # empty sketch's harmonic sum over observed buckets is 0.
        F.coalesce(
            F.sum(F.pow(F.lit(2.0), -F.col("register"))), F.lit(0.0)
        ).alias("__hs_obs"),
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
    return (
        sketch.crossJoin(F.broadcast(exact))
        .withColumn(
            "rel_error",
            F.when(
                F.col("exact_distinct") > 0,
                F.round(
                    F.abs(
                        F.col("hll_estimate") - F.col("exact_distinct")
                    )
                    / F.col("exact_distinct"),
                    4,
                ),
            ),
        )
        .withColumn(
            "small_range_unreliable",
            F.col("hll_estimate") <= F.lit(2.5 * m),
        )
    )


def hll_estimate_from_registers(
    regs: DataFrame,
    p: int = 10,
    out_col: str = "estimate",
    with_flag: bool = False,
) -> DataFrame:
    """1-row raw-regime estimate from a (bucket, register) table —
    the consumer of MERGED registers (elementwise max of any number
    of per-source sketches), which is what makes HLL useful for join
    planning: |A ∩ B| ≈ E(A) + E(B) − E(A ∪ B) with the union sketch
    costing one groupBy-max over already-tiny register tables.

    ``with_flag=True`` appends ``{out_col}_small_range`` (estimate ≤
    2.5·m), the same unimplemented-linear-counting-regime guard as
    ``hll_distinct`` — pass it whenever the merged cardinality could
    be small relative to 2^p."""
    m = 1 << p
    alpha = 0.7213 / (1.0 + 1.079 / m)
    est = regs.agg(
        F.count(F.lit(1)).alias("__obs"),
        F.coalesce(
            F.sum(F.pow(F.lit(2.0), -F.col("register"))), F.lit(0.0)
        ).alias("__hs"),
    ).select(
        (
            F.lit(alpha * m * m)
            / (F.col("__hs") + (F.lit(m) - F.col("__obs")))
        ).alias(out_col)
    )
    if with_flag:
        est = est.withColumn(
            f"{out_col}_small_range", F.col(out_col) <= F.lit(2.5 * m)
        )
    return est


def hll_registers_grouped(
    df: DataFrame, key_cols: list[str], value: Column, p: int = 10
) -> DataFrame:
    """(``*key_cols``, bucket, register) — per-key HLL registers.
    Same hash/rank derivation as ``hll_registers`` with the group key
    joined into the aggregation key: still ONE map-side-combined
    exchange, shuffle bounded by |keys|·2^p rows per partition."""
    m = 1 << p
    width = 60 - p
    h = F.conv(
        F.substring(F.md5(value.cast("string")), 1, 15), 16, 10
    ).cast("long")
    return (
        df.select(
            *[F.col(k) for k in key_cols],
            (h % m).alias("bucket"),
            F.shiftright(h, p).alias("__w"),
        )
        .groupBy(*key_cols, "bucket")
        .agg(
            F.max(_rank_expr(F.col("__w"), width))
            .cast("int")
            .alias("register")
        )
    )


def hll_distinct_grouped(
    df: DataFrame, key_cols: list[str], value: Column, p: int = 10
) -> DataFrame:
    """Per-key HLL cardinality report — ``hll_distinct`` grouped: one
    row per key with (m, observed_buckets, zero_buckets,
    harmonic_sum, hll_estimate, exact_distinct, rel_error,
    small_range_unreliable). The per-key exact COUNT(DISTINCT) audit
    column is the documented expensive baseline (its shuffle carries
    every distinct (key, value) pair — the agg_hotkey_distinct
    two-phase shape); 100 TB callers drop it and keep the
    register-table pipeline, whose per-key state is 2^p bytes-ish
    regardless of group size. The small-range guard applies PER KEY —
    a skewed mix of big and tiny groups flags exactly the tiny ones."""
    m = 1 << p
    alpha = 0.7213 / (1.0 + 1.079 / m)
    regs = hll_registers_grouped(df, key_cols, value, p)
    sketch = regs.groupBy(*key_cols).agg(
        F.count(F.lit(1)).cast("long").alias("observed_buckets"),
        F.coalesce(
            F.sum(F.pow(F.lit(2.0), -F.col("register"))), F.lit(0.0)
        ).alias("__hs_obs"),
    )
    sketch = sketch.select(
        *key_cols,
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
    exact = df.groupBy(*key_cols).agg(
        F.countDistinct(value).cast("long").alias("exact_distinct")
    )
    return (
        sketch.join(exact, list(key_cols))
        .withColumn(
            "rel_error",
            F.when(
                F.col("exact_distinct") > 0,
                F.round(
                    F.abs(
                        F.col("hll_estimate") - F.col("exact_distinct")
                    )
                    / F.col("exact_distinct"),
                    4,
                ),
            ),
        )
        .withColumn(
            "small_range_unreliable",
            F.col("hll_estimate") <= F.lit(2.5 * m),
        )
    )


# ----------------------------------------------------------------------
# Mergeable quantiles: deterministic log-bucket histogram
# (VERDICT r10 item 2 — replaces the exact percentile() memory wall:
# Spark's exact percentile buffers EVERY value into one aggregation
# state, a multi-TB single-buffer at 100 TB; this sketch's state is a
# bounded histogram that merges by bucket-count addition, so the plan
# is one map-side-combinable exchange carrying at most a few thousand
# rows per partition regardless of input size.)
# ----------------------------------------------------------------------


def _bit_length(x: Column) -> Column:
    """bit_length of a non-negative int64 via smear + bit_count —
    exact integer ops both engines evaluate identically (0 → 0)."""
    return F.bit_count(_smear(x))


def quantile_histogram(
    df: DataFrame, value: Column, sub_bits: int = 7
) -> DataFrame:
    """(bucket_lo, bucket_hi, cnt) log-bucket histogram over a
    NON-NEGATIVE INTEGER column (fixed-point: callers scale floats to
    integer cents/micros first — exact bucketing needs exact values).

    HDR-histogram bucketing, integer-exact in both engines: values
    below 2^sub_bits get exact unit buckets [v, v+1); larger values
    keep their top (sub_bits+1) bits — bucket width 2^(e−sub_bits)
    for e = floor(log2 v) — so RELATIVE bucket width, hence the
    quantile estimate's relative error, is bounded by 2^−sub_bits
    (0.78% at the default 7). floor(log2) is the bit-smear
    (no libm log2, whose last-ulp behavior would flip bucket
    boundaries between engines), and 2^k goes through POWER(2.0, k)
    — exact in ieee754 doubles for k ≤ 52.

    Bucket count is bounded by 2^sub_bits · (64 − sub_bits) ≈ 7.3k
    at sub_bits=7 INDEPENDENT OF INPUT SIZE, and the groupBy is
    map-side combinable — the whole point: histograms from any
    number of partitions/days/sources MERGE by adding counts, unlike
    an exact percentile's value buffer."""
    c = value.cast("long")
    e = _bit_length(c) - F.lit(1)  # floor(log2 c); -1 for c == 0
    ws = F.greatest(e - F.lit(sub_bits), F.lit(0))
    width = F.pow(F.lit(2.0), ws).cast("long")
    lo = c - F.pmod(c, width)
    return (
        df.select(
            lo.alias("bucket_lo"), (lo + width).alias("bucket_hi")
        )
        .groupBy("bucket_lo", "bucket_hi")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def quantile_sketch(
    df: DataFrame,
    value: Column,
    quantiles: dict[str, float],
    sub_bits: int = 7,
    scale: float = 1.0,
) -> DataFrame:
    """One-row quantile report (n_total, n_buckets, <name> per
    requested quantile) from the mergeable log-bucket histogram.

    Estimator (percentile_cont's fractional-rank convention): target
    rank t = 1 + p·(n−1); the answer bucket is the first with
    cumulative count ≥ t; within it, linear interpolation
    est = lo + (hi − lo) · (t − cum_before) / cnt. Every input to
    that expression is an exact integer, so the float arithmetic is
    the same IEEE evaluation in Spark and DuckDB — the estimate
    hash-checks cross-engine, unlike approx_percentile's opaque
    digest. ``scale`` divides the estimate back into original units
    (cents → currency).

    Plan shape: ONE full-data exchange (the map-side-combined
    histogram groupBy, ≤ ~7.3k distinct keys); everything after —
    the cumulative/total windows, the final pick-and-interpolate
    aggregate — runs on the bounded histogram, so the
    single-partition window is over sketch rows, never data rows.
    The totals come from a whole-frame window over the SAME sort as
    the cumulative sum (one window exec), not a separate aggregate
    branch: a crossJoined 1-row total would duplicate the histogram
    subtree and scan the data twice (pinned in
    tests/test_plans.py)."""
    from pyspark.sql import Window

    hist = quantile_histogram(df, value, sub_bits)
    w = Window.orderBy("bucket_lo").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wt = Window.orderBy("bucket_lo").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    h = (
        hist.withColumn("cum", F.sum("cnt").over(w))
        .withColumn("n_total", F.sum("cnt").over(wt))
        .withColumn(
            "n_buckets", F.count(F.lit(1)).over(wt).cast("long")
        )
    )
    return h.agg(*_quantile_pick_aggs(quantiles, scale))


def _quantile_pick_aggs(
    quantiles: dict[str, float], scale: float
) -> list[Column]:
    """The pick-and-interpolate aggregate expressions shared by the
    global and grouped sketch forms (module docstring for the exact
    IEEE-parity reasoning).

    Empty-input contract (global form): the final agg over an empty
    histogram still emits ONE row — n_total=0, n_buckets=0, every
    quantile NULL (there is no value to estimate) — mirroring
    hll_distinct's explicit empty contract rather than a row of
    NULLs that reads like a failed aggregate. The grouped form
    naturally emits zero rows for an empty input (no keys, no
    groups)."""
    aggs = [
        F.coalesce(F.first("n_total"), F.lit(0).cast("long")).alias(
            "n_total"
        ),
        F.coalesce(F.first("n_buckets"), F.lit(0).cast("long")).alias(
            "n_buckets"
        ),
    ]
    for name, p in quantiles.items():
        t = F.lit(1.0) + F.lit(p) * (F.col("n_total") - F.lit(1))
        est = F.col("bucket_lo") + (
            F.col("bucket_hi") - F.col("bucket_lo")
        ) * ((t - (F.col("cum") - F.col("cnt"))) / F.col("cnt"))
        aggs.append(
            F.round(
                F.max(
                    F.when(
                        ((F.col("cum") - F.col("cnt")) < t)
                        & (t <= F.col("cum")),
                        est / F.lit(scale),
                    )
                ),
                4,
            ).alias(name)
        )
    return aggs


def quantile_sketch_grouped(
    df: DataFrame,
    key_cols: list[str],
    value: Column,
    quantiles: dict[str, float],
    sub_bits: int = 7,
    scale: float = 1.0,
) -> DataFrame:
    """Per-key quantile report — ``quantile_sketch`` with the
    histogram keyed on (``key_cols``, bucket): the form a pipeline
    actually calls at 100 TB (per-source length percentiles, per-day
    latency bands). Plan is STRICTLY better than the global sketch:
    the one data exchange is the map-side-combined (keys, bucket)
    groupBy, and the cumulative/total windows PARTITION BY the keys —
    no SinglePartition stage anywhere (pinned in tests/test_plans.py).
    Per-key state everywhere is bounded by the ~7.3k-bucket histogram,
    never by the group's row count — the same guarantee
    two_phase_distinct_agg gives COUNT(DISTINCT) (skew.py)."""
    from pyspark.sql import Window

    c = value.cast("long")
    e = _bit_length(c) - F.lit(1)
    ws = F.greatest(e - F.lit(sub_bits), F.lit(0))
    width = F.pow(F.lit(2.0), ws).cast("long")
    lo = c - F.pmod(c, width)
    hist = (
        df.select(
            *[F.col(k) for k in key_cols],
            lo.alias("bucket_lo"),
            (lo + width).alias("bucket_hi"),
        )
        .groupBy(*key_cols, "bucket_lo", "bucket_hi")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    keys = [F.col(k) for k in key_cols]
    w = (
        Window.partitionBy(*keys)
        .orderBy("bucket_lo")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wt = (
        Window.partitionBy(*keys)
        .orderBy("bucket_lo")
        .rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )
    )
    h = (
        hist.withColumn("cum", F.sum("cnt").over(w))
        .withColumn("n_total", F.sum("cnt").over(wt))
        .withColumn(
            "n_buckets", F.count(F.lit(1)).over(wt).cast("long")
        )
    )
    return h.groupBy(*key_cols).agg(
        *_quantile_pick_aggs(quantiles, scale)
    )
