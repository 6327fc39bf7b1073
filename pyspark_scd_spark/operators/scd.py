"""Slowly-changing-dimension operators, generalized and scale-hardened.

The reference computes an SCD history (``employee_all``) and a current
view (``employee_current``) from daily full snapshots using only window
functions (reference jobs/create_employee_all.py:51-150, README.md:99).
This module re-implements that semantic surface as pure, parameterized
DataFrame transforms — ``key_cols`` / ``time_col`` / ``hash_cols`` are
arguments, not hardcoded employee columns — with the reference's known
scale hazards engineered out:

- global max computed via ``agg(max)`` + broadcast cross-join instead of
  a ``partitionBy(lit(1))`` window that funnels every row through one
  task (reference jobs/create_employee_all.py:58,63,118,127);
- gaps-and-islands partitioned by ``(key, hash, gap_grp)`` — the
  reference partitions by ``gap_grp`` alone, which collapses islands of
  different entities into one group and is empirically wrong on its own
  committed output (SURVEY.md §2 #11; reference
  jobs/create_employee_all.py:138);
- deterministic dedup tie-break (the reference's survivor among true
  duplicates is arbitrary, reference jobs/create_employee_all.py:74);
- ``unionByName`` instead of positional ``unionAll`` (reference
  jobs/create_employee_all.py:77-78).

Every window here partitions by the entity key, so the work distributes
across executors by key hash — the plan shape survives a 100 TB input
as long as no single entity's history is pathological.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# Status vocabulary, verbatim from the reference (README.md:34-41,
# jobs/create_employee_all.py:128-134).
STATUS_NEW = "New"
STATUS_NO_CHANGE = "No Change"
STATUS_CHANGED = "Changed"
STATUS_DELETED = "Deleted"


def with_row_hash(
    df: DataFrame,
    hash_cols: Sequence[str],
    out_col: str = "row_hash",
    hardened: bool = False,
) -> DataFrame:
    """Per-row change-detection fingerprint.

    Faithful form: ``sha2(concat_ws("||", cols), 256)`` as in reference
    jobs/create_employee_all.py:99-109, including its two documented
    hazards (``concat_ws`` skips NULLs → NULL-shift collisions; a value
    containing the delimiter can collide across a column boundary).

    ``hardened=True`` switches to ``sha2(to_json(struct(cols)), 256)``:
    NULLs and delimiters are unambiguous because each value is a quoted,
    keyed JSON field. Use this form for new pipelines; the faithful form
    exists for parity with the reference and for the DuckDB oracle
    (``sha256(concat_ws(...))`` matches bit-for-bit on string/int input).
    """
    cols = [F.col(c) for c in hash_cols]
    if hardened:
        fingerprint = F.sha2(F.to_json(F.struct(*cols)), 256)
    else:
        fingerprint = F.sha2(F.concat_ws("||", *cols), 256)
    return df.withColumn(out_col, fingerprint)


def snapshot_dedup(
    df: DataFrame,
    key_cols: Sequence[str],
    tiebreak_cols: Sequence[str] = (),
) -> DataFrame:
    """Keep exactly one row per key group.

    The reference's dedup (reference jobs/create_employee_all.py:74-81)
    orders by a column that is constant within the partition, so the
    survivor among non-identical duplicates is nondeterministic. Here
    ``tiebreak_cols`` (descending) pins the survivor; with no tiebreak
    given this degenerates to ``dropDuplicates`` semantics, which is
    fine only when duplicates are exact re-drops (reference README.md:87).
    """
    if not tiebreak_cols:
        return df.dropDuplicates(list(key_cols))
    w = Window.partitionBy(*key_cols).orderBy(
        *[F.col(c).desc() for c in tiebreak_cols]
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def snapshot_dedup_aligned(
    df: DataFrame,
    key_cols: Sequence[str],
    time_col: str,
    tiebreak_cols: Sequence[str],
) -> DataFrame:
    """Dedup to one row per (key, time) WITHOUT leaving the per-key
    partitioning.

    ``snapshot_dedup`` partitions by (key, time) — an exchange the
    downstream SCD windows (partitioned by key alone) cannot reuse, so
    the pipeline pays two shuffles. Here rows are sorted (time ASC,
    tiebreaks DESC) inside the per-KEY window and a row survives iff it
    is the first of its time-run (``lag(time) != time``) — same
    survivor as row_number()=1 per (key, time) ordered by tiebreaks
    DESC, but the single hash(key) exchange now serves every later
    window (Spark satisfies a required (key) clustering and
    (key, time) sort prefix from it). One shuffle for the whole SCD
    pipeline instead of two.
    """
    w = Window.partitionBy(*key_cols).orderBy(
        F.col(time_col).asc(),
        *[F.col(c).desc() for c in tiebreak_cols],
    )
    prev_t = F.lag(time_col).over(w)
    return (
        df.withColumn("__prev_t", prev_t)
        .filter(
            F.col("__prev_t").isNull() | (F.col("__prev_t") != F.col(time_col))
        )
        .drop("__prev_t")
    )


def union_snapshots(history: DataFrame, new_rows: DataFrame) -> DataFrame:
    """Append new snapshot rows to accumulated history, by column NAME.

    The reference aligns column order by projection then uses positional
    ``unionAll`` (reference jobs/create_employee_all.py:77-78) — silent
    corruption if the order ever drifts. ``unionByName`` makes the match
    explicit and fails fast on a missing column.
    """
    return history.unionByName(new_rows, allowMissingColumns=False)


def union_snapshots_evolving(
    history: DataFrame, new_rows: DataFrame
) -> DataFrame:
    """Schema-drift-tolerant append: a column newly appearing in (or
    dropped from) a snapshot feed unions by NAME with NULL backfill on
    the side that lacks it — the most common real-world SCD event the
    reference silently corrupts (positional unionAll, reference
    jobs/create_employee_all.py:77-78: a new column would shift every
    later column one slot).

    Hash-columns policy: after an evolving union, compute the row
    fingerprint over the EVOLVED column set with
    ``with_row_hash(hardened=True)``. The hardened form
    (sha2(to_json(struct))) omits null fields from the JSON, so a
    pre-drift row (new column backfilled NULL) hashes identically to
    a post-drift row whose new column is also NULL — no spurious
    'Changed' wall at the drift boundary — while any real value in
    the new column changes the fingerprint exactly like a tracked-
    attribute edit. The faithful concat_ws hash must NOT be used
    across a drift boundary: concat_ws skips NULLs, so it cannot
    distinguish (NULL, 'x') from ('x', NULL) shifts.
    """
    return history.unionByName(new_rows, allowMissingColumns=True)


def _with_global_max(
    df: DataFrame,
    time_col: str,
    out_col: str,
    scalar_source: DataFrame | None = None,
) -> DataFrame:
    """Stamp the dataset-global max of ``time_col`` onto every row.

    Replaces the reference's ``max(t) over (partition by lit(1))``
    (reference jobs/create_employee_all.py:118,127 and :58,63), which
    shuffles the entire dataset into a single task. ``agg(max)``
    aggregates map-side down to one row per partition, and the broadcast
    cross-join adds the scalar to every row with no shuffle at all —
    Catalyst plans a BroadcastNestedLoopJoin over a 1-row table.

    ``scalar_source``: optional cheaper lineage with the same max (e.g.
    the raw pre-dedup scan) — the scalar branch is a separate plan
    subtree, so pointing it at the raw scan avoids re-running the
    dedup/hash stages just to take a max.
    """
    src = scalar_source if scalar_source is not None else df
    scalar = src.agg(F.max(time_col).alias(out_col))
    return df.crossJoin(F.broadcast(scalar))


def with_change_status(
    df: DataFrame,
    key_cols: Sequence[str],
    time_col: str,
    hash_col: str = "row_hash",
    status_col: str = "change_status",
    treat_gap_as_delete: bool = False,
    global_max_source: DataFrame | None = None,
) -> DataFrame:
    """Classify every snapshot row as New / Changed / No Change / Deleted.

    Semantics per reference jobs/create_employee_all.py:111-134:
    - ``New``      : the entity's earliest snapshot row (wins over all);
    - ``Deleted``  : the entity's latest row, when that row predates the
                     dataset-global latest snapshot (entity dropped out);
    - ``Changed``  : fingerprint differs from the previous snapshot row;
    - ``No Change``: fingerprint equals the previous row's.

    A gap followed by reappearance compares against the pre-gap
    fingerprint — the gap itself is invisible (reference behavior,
    SURVEY.md §2 #10). ``treat_gap_as_delete=True`` additionally marks
    the row *before* a gap as ``Deleted`` and the reappearance row as
    ``New`` (an extension; off by default for parity).

    Unlike the reference, the min/max windows use explicit unbounded
    frames — the reference relied on a running max over an ascending
    order being "accidentally correct" at the one row where it is read
    (SURVEY.md §2 #7).
    """
    w_key = Window.partitionBy(*key_cols)
    w_full = w_key.orderBy(time_col).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    w_ord = w_key.orderBy(time_col)

    if treat_gap_as_delete:
        # Rank the distinct snapshot dates (a tiny, bounded set — one row
        # per snapshot, not per data row) and broadcast the rank back so
        # a jump of >1 rank between consecutive observations of an entity
        # marks a gap. The rank window is global but runs over #snapshots
        # rows only, so it is not a scale hazard.
        date_rank = (
            df.select(time_col)
            .distinct()
            .withColumn("__t_rank", F.row_number().over(Window.orderBy(time_col)))
        )
        df = df.join(F.broadcast(date_rank), on=time_col, how="left")

    df = (
        df.withColumn("__min_t", F.min(time_col).over(w_full))
        .withColumn("__max_t", F.max(time_col).over(w_full))
        .withColumn("__prev_hash", F.lag(hash_col).over(w_ord))
        .withColumn("__next_hash", F.lead(hash_col).over(w_ord))
    )
    df = _with_global_max(
        df, time_col, "__global_max_t", scalar_source=global_max_source
    )

    t = F.col(time_col)
    ended_early = F.col("__next_hash").isNull() & (
        F.col("__max_t") != F.col("__global_max_t")
    )
    is_first = t == F.col("__min_t")
    changed = F.col("__prev_hash") != F.col(hash_col)

    if treat_gap_as_delete:
        gap_before = (F.col("__t_rank") - F.lag("__t_rank").over(w_ord)) > 1
        gap_after = (F.lead("__t_rank").over(w_ord) - F.col("__t_rank")) > 1
        status = (
            F.when(is_first, F.lit(STATUS_NEW))
            .when(gap_before, F.lit(STATUS_NEW))
            .when(gap_after | ended_early, F.lit(STATUS_DELETED))
            .when(changed, F.lit(STATUS_CHANGED))
            .otherwise(F.lit(STATUS_NO_CHANGE))
        )
        return df.withColumn(status_col, status).drop("__t_rank")

    status = (
        F.when(is_first, F.lit(STATUS_NEW))
        .when(ended_early, F.lit(STATUS_DELETED))
        .when(changed, F.lit(STATUS_CHANGED))
        .otherwise(F.lit(STATUS_NO_CHANGE))
    )
    return df.withColumn(status_col, status)


def with_change_date(
    df: DataFrame,
    key_cols: Sequence[str],
    time_col: str,
    hash_col: str = "row_hash",
    status_col: str = "change_status",
    out_col: str = "changed_status_date",
) -> DataFrame:
    """Gaps-and-islands: date each row's status took effect.

    ``gap_grp = row_number() over (key ↓t) − row_number() over
    (key, hash ↓t)`` identifies contiguous runs of the same fingerprint;
    ``out_col`` = the run's first snapshot date, except ``Deleted`` rows
    which carry their own date (reference
    jobs/create_employee_all.py:136-150).

    The island-min window partitions by ``(key, hash, gap_grp)`` — the
    *corrected* form. The reference partitions by ``gap_grp`` alone
    (reference jobs/create_employee_all.py:138), merging islands across
    entities; its own committed output shows the wrong dates (e.g. emp
    13's 2020-01-02 salary change dated 2020-01-01 — SURVEY.md §2 #11).
    """
    w1 = Window.partitionBy(*key_cols).orderBy(F.col(time_col).desc())
    w2 = Window.partitionBy(*key_cols, hash_col).orderBy(
        F.col(time_col).desc()
    )
    df = df.withColumn(
        "__gap_grp", F.row_number().over(w1) - F.row_number().over(w2)
    )
    w_island = Window.partitionBy(*key_cols, hash_col, "__gap_grp")
    island_min = F.min(time_col).over(w_island)
    return df.withColumn(
        out_col,
        F.when(F.col(status_col) == STATUS_DELETED, F.col(time_col)).otherwise(
            island_min
        ),
    )


_HELPER_COLS = (
    "__min_t",
    "__max_t",
    "__prev_hash",
    "__next_hash",
    "__global_max_t",
    "__gap_grp",
    "__n_dates_lt",
    "row_hash",
)


def drop_helpers(df: DataFrame, extra: Sequence[str] = ()) -> DataFrame:
    """Drop internal helper columns (reference
    jobs/create_employee_all.py:120,140,150). Catalyst column-pruning
    means they were never materialized downstream anyway."""
    present = [c for c in (*_HELPER_COLS, *extra) if c in df.columns]
    return df.drop(*present)


def current_view(
    df: DataFrame,
    key_cols: Sequence[str],
    time_col: str,
    stamp_global_max: bool = True,
    global_max_source: DataFrame | None = None,
) -> DataFrame:
    """Latest row per entity (the SCD Type-1 "current" table).

    Keeps entities whose latest status is ``Deleted`` — their last-seen
    row survives, matching the reference's committed current view
    (reference jobs/create_employee_all.py:51-66; SURVEY.md §2 #13).

    ``stamp_global_max=True`` overwrites ``time_col`` with the global
    max snapshot date on every row (reference behavior, :58,63) via the
    broadcast-scalar pattern, not a single-partition window.

    ``global_max_source``: cheaper lineage with the same max — without
    it the scalar branch re-executes ``df``'s whole upstream pipeline
    just to take one max (observed: the SCD window chain ran twice).
    """
    w = Window.partitionBy(*key_cols).orderBy(F.col(time_col).desc())
    latest = (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    if stamp_global_max:
        latest = _with_global_max(
            latest, time_col, "__stamp", scalar_source=global_max_source
        )
        latest = latest.withColumn(time_col, F.col("__stamp")).drop("__stamp")
    return latest


def scd_apply(
    snapshots: DataFrame,
    key_cols: Sequence[str],
    time_col: str,
    hash_cols: Sequence[str],
    tiebreak_cols: Sequence[str] = (),
    hardened_hash: bool = False,
    treat_gap_as_delete: bool = False,
) -> DataFrame:
    """The full ``employee_all`` pipeline as one transform chain
    (reference jobs/create_employee_all.py:236-240): dedup → hash →
    status → change date → drop helpers.

    Plan shape: ONE hash exchange on ``key_cols`` feeds the dedup, the
    status windows, and the islands windows (partition-aligned dedup +
    prefix-compatible sorts); the global-max scalar comes from the raw
    pre-dedup scan so its branch is scan+agg only.
    """
    if tiebreak_cols:
        df = snapshot_dedup_aligned(
            snapshots, key_cols, time_col, tiebreak_cols
        )
    else:
        df = snapshot_dedup(snapshots, [*key_cols, time_col], ())
    df = with_row_hash(df, hash_cols, hardened=hardened_hash)
    df = with_change_status(
        df,
        key_cols,
        time_col,
        treat_gap_as_delete=treat_gap_as_delete,
        global_max_source=snapshots.select(time_col),
    )
    df = with_change_date(df, key_cols, time_col)
    return drop_helpers(df)


def scd_bootstrap(
    first_snapshot: DataFrame,
    key_cols: Sequence[str],
    time_col: str,
    status_col: str = "change_status",
    date_col: str = "changed_status_date",
) -> DataFrame:
    """Initial current view from the first snapshot: everything is New."""
    return first_snapshot.withColumn(
        status_col, F.lit(STATUS_NEW)
    ).withColumn(date_col, F.col(time_col))


def scd_merge(
    current: DataFrame,
    new_snapshot: DataFrame,
    key_cols: Sequence[str],
    time_col: str,
    hash_cols: Sequence[str],
    status_col: str = "change_status",
    date_col: str = "changed_status_date",
) -> DataFrame:
    """Incremental MERGE-style upsert: one new snapshot against the
    current view only — the 100 TB path.

    The reference recomputes every status over the full accumulated
    history on every run (reference jobs/create_employee_all.py:76-81,
    README's read-own-output loop) — O(history) per day. This joins the
    day's snapshot (N_day rows) against the current view (N_entities
    rows) with a full-outer join on the key: O(N_entities) per day,
    independent of history depth, and co-partitionable (bucket both
    sides by key → zero-shuffle join). BASELINE.json names this
    ("DataFrame upsert/merge operations") as the target approach.

    Returns the NEW current view with ``status_col``/``date_col``
    updated; append it to the history table to extend ``employee_all``.
    Known divergence vs the full windowed recompute: an entity that
    disappears and later reappears with its pre-gap fingerprint gets
    its change date from the merge state, not from the pre-gap island
    (the window form treats the gap as invisible — SURVEY.md §2 #10).
    """
    keys = list(key_cols)
    attr_cols = [c for c in new_snapshot.columns if c not in (*keys, time_col)]

    new = with_row_hash(new_snapshot, hash_cols, out_col="__new_hash")
    cur = with_row_hash(current, hash_cols, out_col="__cur_hash")

    # Alias scheme: user attribute columns get a "__an_" / "__ac_" prefix
    # (new/current side); bookkeeping columns use bare "__*" names with
    # no user-column suffix, so no user column name can collide.
    n = new.select(
        *keys,
        F.col(time_col).alias("__t_n"),
        *[F.col(a).alias(f"__an_{a}") for a in attr_cols],
        "__new_hash",
    )
    c = cur.select(
        *keys,
        F.col(time_col).alias("__t_c"),
        *[F.col(a).alias(f"__ac_{a}") for a in attr_cols],
        F.col(status_col).alias("__st_c"),
        F.col(date_col).alias("__dt_c"),
        "__cur_hash",
    )
    j = n.join(c, on=keys, how="full_outer")

    # concat_ws never yields NULL, so a NULL hash ⇔ that side's row is
    # absent from the join — no separate presence flags needed.
    is_new = F.col("__cur_hash").isNull()
    is_gone = F.col("__new_hash").isNull()
    changed = F.col("__new_hash") != F.col("__cur_hash")

    status = (
        F.when(is_new, F.lit(STATUS_NEW))
        .when(is_gone, F.lit(STATUS_DELETED))
        .when(changed, F.lit(STATUS_CHANGED))
        .otherwise(F.lit(STATUS_NO_CHANGE))
    )
    change_date = (
        F.when(is_new, F.col("__t_n"))
        .when(is_gone, F.col("__t_c"))
        .when(changed, F.col("__t_n"))
        .otherwise(F.col("__dt_c"))
    )
    picked_attrs = [
        F.when(is_gone, F.col(f"__ac_{a}")).otherwise(F.col(f"__an_{a}")).alias(a)
        for a in attr_cols
    ]
    return j.select(
        *keys,
        F.coalesce(F.col("__t_n"), F.col("__t_c")).alias(time_col),
        *picked_attrs,
        status.alias(status_col),
        change_date.alias(date_col),
    )


def scd_merge_tree(
    snapshots: DataFrame,
    key_cols: Sequence[str],
    time_col: str,
    hash_cols: Sequence[str],
    status_col: str = "change_status",
    date_col: str = "changed_status_date",
) -> DataFrame:
    """Tree-fold (parallel-prefix) form of the incremental MERGE fold:
    the same end state as folding ``scd_merge`` day-by-day, in
    ``ceil(log2 days)`` passes instead of ``days`` sequential joins.

    Input: ONE table with one row per (key, snapshot time) — i.e. the
    deduped union of all snapshots — where the distinct snapshot
    times form the global snapshot sequence (gaps in a KEY's
    appearances are meaningful; gaps in the global sequence are not
    allowed, same contract as the closed-form oracle).

    Why it composes: the per-key fold state is summarizable per
    contiguous block of snapshots as (first appearance year+hash,
    previous/last appearance year+hash, last RESET strictly after
    the block's first appearance, last attrs). Two adjacent blocks
    combine with pure expressions — the boundary reset is the later
    block's first year on a fingerprint change, the earlier block's
    last year on an appearance gap (block-index arithmetic, so any
    orderable time type works), else nothing; the combined last
    reset is ``coalesce(later.internal, boundary, earlier.internal)``.
    Status and change date fall out of the root block exactly as the
    sequential fold computes them (deleted keys keep their last
    appearance's attrs/date; gap + same fingerprint = No Change with
    the pre-gap date; gap + new fingerprint = Changed at reappearance).

    Scale: each pass is ONE hash exchange on (key, pair) over one
    summary row per live (key, block) — the day-by-day fold is a
    serial chain of full-outer joins whose length is the snapshot
    count, which is exactly what dominates its wall clock at x10
    (NOTES round-7 flag). Driver state: the sorted distinct snapshot
    times (bounded — days, not rows).
    """
    keys = list(key_cols)
    attr_cols = [
        c for c in snapshots.columns if c not in (*keys, time_col)
    ]
    hashed = with_row_hash(snapshots, hash_cols, out_col="__h")
    times = sorted(
        r[0] for r in snapshots.select(time_col).distinct().collect()
    )
    if not times:
        return snapshots.select(
            *keys,
            time_col,
            *attr_cols,
            F.lit(STATUS_NEW).alias(status_col),
            F.col(time_col).alias(date_col),
        ).limit(0)
    t_type = snapshots.schema[time_col].dataType
    tmax = times[-1]
    blk_map = F.create_map(
        *[
            x
            for t, i in ((t, i) for i, t in enumerate(times))
            for x in (F.lit(t), F.lit(i))
        ]
    )
    state = hashed.select(
        *keys,
        blk_map[F.col(time_col)].cast("long").alias("__blk"),
        F.struct(
            F.lit(1).cast("long").alias("n"),
            F.col(time_col).alias("fy"),
            F.col("__h").alias("fh"),
            blk_map[F.col(time_col)].cast("long").alias("fb"),
            F.lit(None).cast(t_type).alias("py"),
            F.lit(None).cast("string").alias("ph"),
            F.col(time_col).alias("ly"),
            F.col("__h").alias("lh"),
            blk_map[F.col(time_col)].cast("long").alias("lb"),
            F.lit(None).cast(t_type).alias("dtx"),
            F.struct(*attr_cols).alias("attrs"),
        ).alias("__s"),
    )
    n_blocks = len(times)
    while n_blocks > 1:
        paired = state.select(
            *keys,
            F.floor(F.col("__blk") / 2).alias("__pair"),
            F.when(F.col("__blk") % 2 == 0, F.col("__s")).alias("__s0"),
            F.when(F.col("__blk") % 2 == 1, F.col("__s")).alias("__s1"),
        ).withColumnRenamed("__pair", "__blk")
        g = paired.groupBy(*keys, "__blk").agg(
            F.first("__s0", ignorenulls=True).alias("__s0"),
            F.first("__s1", ignorenulls=True).alias("__s1"),
        )
        s0, s1 = F.col("__s0"), F.col("__s1")
        boundary_reset = F.when(
            s1["fh"] != s0["lh"], s1["fy"]
        ).when(s1["fb"] > s0["lb"] + 1, s0["ly"])
        combined = F.struct(
            (s0["n"] + s1["n"]).alias("n"),
            s0["fy"].alias("fy"),
            s0["fh"].alias("fh"),
            s0["fb"].alias("fb"),
            F.when(s1["n"] >= 2, s1["py"])
            .otherwise(s0["ly"])
            .alias("py"),
            F.when(s1["n"] >= 2, s1["ph"])
            .otherwise(s0["lh"])
            .alias("ph"),
            s1["ly"].alias("ly"),
            s1["lh"].alias("lh"),
            s1["lb"].alias("lb"),
            F.coalesce(s1["dtx"], boundary_reset, s0["dtx"]).alias(
                "dtx"
            ),
            s1["attrs"].alias("attrs"),
        )
        state = g.select(
            *keys,
            "__blk",
            F.when(s0.isNull(), s1)
            .when(s1.isNull(), s0)
            .otherwise(combined)
            .alias("__s"),
        )
        n_blocks = -(-n_blocks // 2)
    s = F.col("__s")
    at_max = s["ly"] == F.lit(tmax)
    status = (
        F.when(at_max & s["py"].isNull(), F.lit(STATUS_NEW))
        .when(at_max & (s["ph"] != s["lh"]), F.lit(STATUS_CHANGED))
        .when(at_max, F.lit(STATUS_NO_CHANGE))
        .otherwise(F.lit(STATUS_DELETED))
    )
    change_date = F.when(
        at_max, F.coalesce(s["dtx"], s["fy"])
    ).otherwise(s["ly"])
    return state.select(
        *keys,
        s["ly"].alias(time_col),
        *[s["attrs"][a].alias(a) for a in attr_cols],
        status.alias(status_col),
        change_date.alias(date_col),
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: Sequence[str],
    compare_cols: Sequence[str],
    status_col: str = "diff_status",
) -> DataFrame:
    """CDC-style diff of two table versions keyed on ``key_cols``:
    every key classified added / removed / changed / unchanged.

    The SCD pipeline answers "how did each entity evolve over all
    history"; this answers the cheaper operational question "what
    moved between these two versions" with ONE full-outer join on the
    key — no windows, no history scan. Comparisons are null-safe
    (``<=>``): a column going NULL->value or value->NULL is 'changed',
    never silently 'unchanged'.

    Output: key_cols, ``status_col``, and old_/new_ copies of every
    compare column.
    """
    keys = list(key_cols)
    cmp_cols = list(compare_cols)
    o = old.select(
        *keys, *[F.col(c).alias(f"old_{c}") for c in cmp_cols]
    ).withColumn("__in_old", F.lit(1))
    n = new.select(
        *keys, *[F.col(c).alias(f"new_{c}") for c in cmp_cols]
    ).withColumn("__in_new", F.lit(1))
    j = o.join(n, keys, "full_outer")
    changed = F.lit(False)
    for c in cmp_cols:
        changed = changed | ~F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}"))
    status = (
        F.when(F.col("__in_old").isNull(), "added")
        .when(F.col("__in_new").isNull(), "removed")
        .when(changed, "changed")
        .otherwise("unchanged")
    )
    return j.withColumn(status_col, status).drop("__in_old", "__in_new")


def type2_intervals(
    df: DataFrame,
    key_cols: Sequence[str],
    time_col: str,
    state_cols: Sequence[str],
    hash_col: str = "row_hash",
) -> DataFrame:
    """Collapse a snapshot history into SCD Type-2 effective-dated rows.

    The reference's ``employee_all`` keeps one row per (snapshot, key)
    with a change_status; a Type-2 dimension keeps one row per
    *contiguous run* of identical state: ``valid_from`` (first snapshot
    of the run), ``valid_to`` (next run's valid_from, exclusive; NULL on
    the open run), ``last_seen``, ``n_snaps``, ``is_current``.

    Islands are found with the single-window form: change flag =
    "fingerprint differs from the previous row" (null-safe), island id
    = running sum of the flag. Every window here partitions by the
    entity key only, so the whole pass costs ONE exchange on the key
    (the two-row_number gap-group trick needs a second (key, hash)
    exchange); the groupBy that follows re-uses tiny per-island rows.
    Reference semantics source: jobs/create_employee_all.py:136-150.
    """
    keys = list(key_cols)
    w = Window.partitionBy(*keys).orderBy(time_col)
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    changed = (
        ~F.lag(hash_col).over(w).eqNullSafe(F.col(hash_col))
    ).cast("int")
    runs = df.withColumn("__chg", changed).withColumn(
        "__island", F.sum("__chg").over(wrun)
    )
    g = runs.groupBy(*keys, "__island", *state_cols).agg(
        F.min(time_col).alias("valid_from"),
        F.max(time_col).alias("last_seen"),
        F.count(F.lit(1)).cast("long").alias("n_snaps"),
    )
    w2 = Window.partitionBy(*keys).orderBy("valid_from")
    valid_to = F.lead("valid_from").over(w2)
    return g.select(
        *keys,
        *state_cols,
        "valid_from",
        "last_seen",
        "n_snaps",
        valid_to.alias("valid_to"),
        valid_to.isNull().alias("is_current"),
    )
