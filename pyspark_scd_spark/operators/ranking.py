"""Scale-safe GLOBAL ranking: dense_rank / row_number over a total
key order without a single-partition window.

The naive form — ``ROW_NUMBER() OVER (ORDER BY …)`` with no
PARTITION BY — funnels the entire dataset through ONE task (Spark
even logs the WindowExec warning), which is the canonical
billion-row cliff. The classic distributed construction here:

1. ``repartitionByRange`` on the sort keys (one exchange; the range
   partitioner maps EQUAL keys to the SAME partition, so partition
   boundaries never split a tie group) + ``sortWithinPartitions``;
2. ``localCheckpoint`` the ranged result ONCE — the stats pass and
   the ranking pass are separate jobs, and without pinning the
   partitions the second job RE-EXECUTES the range exchange with
   freshly sampled boundaries and its own AQE coalescing, so pass-1
   offsets describe partitions that no longer exist (caught by the
   sf0.1 gate: single-partition small inputs masked it; at 600k
   rows ranks came out wrong by half the corpus). At cluster scale
   substitute ``persist(DISK_ONLY)`` — the point is identical
   physical partitions for both passes, not the storage tier;
3. one bounded aggregate of per-partition counts (rows and distinct
   key tuples) — #partitions rows to the driver, the
   kmeans-centroid bounded-driver-state contract;
4. a second pass over the pinned partitions assigning local ranks
   in an Arrow ``mapInPandas`` stream plus the broadcast
   per-partition offset.

Because partition i holds strictly smaller keys than partition i+1
and ties never straddle partitions, ``local rank + offset`` IS the
global rank — no merge pass, no boundary reconciliation.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_PID = "__rank_pid"

# Sentinel standing in for SQL NULL in the Arrow rank pass. Arrow
# hands a nullable long column to pandas as float64 with NaN holes,
# and NaN != NaN would give every null row its own dense rank; all
# null keys normalize to this one identity-equal object instead.
_NULL = object()
# Sentinel for a REAL float NaN (distinct from SQL NULL): Spark's
# grouping normalization treats all NaNs as ONE key but a separate
# key from NULL, so the Arrow pass must keep them apart too — pass
# 1's count_distinct counts two keys, and merging them here would
# shift every later partition's rank offset (ADVICE r8).
_NAN = object()


def _norm_key_part(v):
    try:
        if pd.isna(v):
            return _NULL
    except (TypeError, ValueError):
        # non-scalar (array/struct) order values: pass through
        pass
    return v


def checkpoint_rdd_handle(df: DataFrame):
    """JVM RDD pinned by a ``localCheckpoint``-ed DataFrame (its
    analyzed plan is a LogicalRDD), or None when the plan isn't one.
    Callers that checkpoint per iteration (prefix doubling, pagerank)
    use this to ``unpersist(False)`` round N−1's blocks once round
    N has materialized — otherwise peak pinned storage is the whole
    iteration history, not one round."""
    try:
        return df._jdf.queryExecution().analyzed().rdd()
    except Exception:
        return None


def global_dense_rank(
    df: DataFrame,
    order_cols: Sequence[str],
    rank_col: str = "rank",
    dense: bool = True,
    num_partitions: int | None = None,
    _cleanup: list | None = None,
) -> DataFrame:
    """Attach a global ``dense_rank`` (or ``row_number`` with
    ``dense=False``) over ``ORDER BY order_cols ASC NULLS FIRST`` —
    Spark's ``asc`` null order; mirror with NULLS FIRST in oracle
    SQL. With ``dense=False`` ties are broken by the engine's
    physical order WITHIN the tie group, so use it only when
    ``order_cols`` is a total key (unique) — dense ranks are
    deterministic under ties, row numbers are not.

    NULL order keys are supported: distinct counts use a struct (a
    struct with null fields is non-null, so null-bearing tuples
    count) and the Arrow pass normalizes NaN-encoded nulls to one
    shared sentinel. FLOAT/DOUBLE order columns carry an explicit
    is-null companion column through the Arrow pass so a real NaN
    and a SQL NULL stay DISTINCT keys (matching Spark's grouping
    normalization: all NaNs one key, NULL another) — conflating
    them would disagree with pass 1's distinct count and shift
    every later partition's offset. All key types are exact.
    """
    cols = list(order_cols)
    ranged = (
        df.repartitionByRange(num_partitions, *cols)
        if num_partitions
        else df.repartitionByRange(*cols)
    ).sortWithinPartitions(*cols)
    # Pin the physical partitions (docstring step 2): both passes
    # below MUST see identical partition ids and contents.
    pinned = ranged.localCheckpoint(eager=True)
    if _cleanup is not None:
        # hand the pinned blocks' JVM RDD to an iterative caller so
        # it can unpersist them once its own downstream checkpoint
        # has materialized (the returned DataFrame reads `pinned`
        # lazily — only eager consumers may free it)
        h = checkpoint_rdd_handle(pinned)
        if h is not None:
            _cleanup.append(h)
    staged = pinned.withColumn(_PID, F.spark_partition_id())
    # Float/double keys: Arrow materializes SQL NULL and real NaN
    # both as pandas NaN, so carry an explicit is-null flag per such
    # column (projection only — partitioning untouched). The Arrow
    # pass maps flag→_NULL, NaN-with-flag-false→_NAN, keeping the
    # two groups distinct exactly as pass 1's count_distinct does.
    null_flags = {
        c: f"__rank_isnull_{i}"
        for i, c in enumerate(cols)
        if isinstance(
            df.schema[c].dataType, (T.FloatType, T.DoubleType)
        )
    }
    for c, flag in null_flags.items():
        staged = staged.withColumn(flag, F.isnull(F.col(c)))

    # Pass 1: bounded per-partition stats. The distinct-tuple count
    # rides the same grouped aggregate; re-running this lineage in
    # pass 2 reuses the range exchange's shuffle files (skipped map
    # stages), so the corpus is exchanged exactly once.
    stats = (
        staged.groupBy(_PID)
        .agg(
            F.count(F.lit(1)).alias("__n"),
            # struct() so tuples CONTAINING nulls still count: bare
            # count_distinct(a, b) skips any row where a or b is
            # NULL, undercounting the partition and shifting every
            # later partition's offset. A struct with null fields is
            # itself non-null, so every distinct key tuple counts.
            F.count_distinct(F.struct(*[F.col(c) for c in cols])).alias(
                "__d"
            ),
        )
        .collect()
    )
    sizes = {int(r[_PID]): (int(r["__n"]), int(r["__d"])) for r in stats}
    offsets: dict[int, int] = {}
    acc = 0
    for pid in sorted(sizes):
        offsets[pid] = acc
        acc += sizes[pid][1] if dense else sizes[pid][0]

    out_schema = T.StructType(
        list(df.schema.fields)
        + [T.StructField(rank_col, T.LongType())]
    )

    def _norm_col(pdf: pd.DataFrame, c: str) -> list:
        if c in null_flags:
            flags = pdf[null_flags[c]]
            out = []
            for v, is_null in zip(pdf[c], flags):
                if is_null:
                    out.append(_NULL)
                elif pd.isna(v):
                    out.append(_NAN)
                else:
                    out.append(v)
            return out
        return [_norm_key_part(v) for v in pdf[c]]

    helper_cols = [_PID, *null_flags.values()]

    def _rank(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        seen = 0
        prev_key = None
        local = 0
        for pdf in batches:
            if len(pdf) == 0:
                continue
            pid = int(pdf[_PID].iloc[0])
            base = offsets.get(pid, 0)
            ranks = []
            if dense:
                for key in zip(*[_norm_col(pdf, c) for c in cols]):
                    if key != prev_key:
                        local += 1
                        prev_key = key
                    ranks.append(base + local)
            else:
                ranks = list(
                    range(base + seen + 1, base + seen + len(pdf) + 1)
                )
                seen += len(pdf)
            out = pdf.drop(columns=helper_cols)
            # Output fidelity: plain float64 columns hand NaN to
            # Arrow as NULL (pandas' NaN-is-missing convention), so
            # a real-NaN key would come back as SQL NULL. Rebuild
            # the float key columns as MASKED arrays — the mask is
            # the true is-null flag, NaN stays a value.
            for c, flag in null_flags.items():
                import numpy as np

                vals = out[c].to_numpy(dtype="float64", na_value=np.nan)
                mask = pdf[flag].to_numpy(dtype=bool)
                out[c] = pd.arrays.FloatingArray(vals, mask)
            out[rank_col] = pd.Series(ranks, index=pdf.index, dtype="int64")
            yield out

    return staged.mapInPandas(_rank, schema=out_schema)
