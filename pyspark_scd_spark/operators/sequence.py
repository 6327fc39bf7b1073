"""Event-sequence mining: Markov transition matrices and session paths.

Product-analytics staples the reference cannot express (it has no
joins, no multi-row sequence logic beyond lag/lead on a single hash —
reference jobs/create_employee_all.py:125-126); both build on the same
per-user time-ordered window the SCD core uses, so they inherit its
scale shape: ONE hash exchange on user_id, then everything — ordering,
adjacency, sessionization — happens inside the partition.

Scale notes:
- Ordering ties on ts are broken by event_id so results are
  deterministic under any partitioning.
- The transition/path aggregations run on the tiny derived pair/path
  space (|event_types|^2 rows, |paths| <= distinct trigrams), with
  map-side combine before their exchange.
- Sessionization is the lag-gap + running-sum form (two window passes
  over the SAME user partitioning = one exchange total); the
  streaming twin is streaming/sessions.py's session_window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark_scd_spark.functions.time import epoch_us


def markov_transitions(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """First-order Markov transition matrix over per-user event streams.

    Output: (src, dst, transitions, prob) — prob row-normalized over
    src, rounded 6dp. Terminal events (no successor) are dropped.
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, "event_id")
    pairs = (
        events.withColumn("dst", F.lead(type_col).over(w))
        .filter(F.col("dst").isNotNull())
        .select(F.col(type_col).alias("src"), "dst")
    )
    counts = pairs.groupBy("src", "dst").agg(
        F.count(F.lit(1)).alias("transitions")
    )
    total = Window.partitionBy("src")
    return counts.select(
        "src",
        "dst",
        "transitions",
        F.round(
            F.col("transitions") / F.sum("transitions").over(total), 6
        ).alias("prob"),
    )


def sessionize(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
) -> DataFrame:
    """Gap-based session ids: a new session starts when the user's
    inter-event gap exceeds ``gap_minutes``. Adds ``session_id``
    (user-scoped 1-based dense counter). One exchange on user_id."""
    w = Window.partitionBy(user_col).orderBy(ts_col, "event_id")
    gap = epoch_us(F.col(ts_col)) - F.lag(
        epoch_us(F.col(ts_col))
    ).over(w)
    is_new = F.when(
        gap.isNull() | (gap > gap_minutes * 60 * 1_000_000), 1
    ).otherwise(0)
    return events.withColumn(
        "session_id",
        F.sum(is_new).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )


def session_paths(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    gap_minutes: int = 30,
    path_len: int = 3,
    k: int = 50,
) -> DataFrame:
    """Top-``k`` most frequent length-``path_len`` event-type paths
    within sessions ("users who did X then Y then Z").

    Output: (path, occurrences, path_rank) with path like
    'view>click>purchase'; ties broken by path ASC.
    """
    sess = sessionize(events, user_col, ts_col, gap_minutes)
    w = Window.partitionBy(user_col, "session_id").orderBy(
        ts_col, "event_id"
    )
    stepped = sess.withColumns(
        {
            f"__s{i}": F.lead(type_col, i).over(w)
            for i in range(1, path_len)
        }
    )
    paths = stepped.filter(
        F.col(f"__s{path_len - 1}").isNotNull()
    ).withColumn(
        "path",
        F.concat_ws(
            ">",
            F.col(type_col),
            *[F.col(f"__s{i}") for i in range(1, path_len)],
        ),
    )
    counts = paths.groupBy("path").agg(
        F.count(F.lit(1)).alias("occurrences")
    )
    # Top-k FIRST via orderBy+limit (TakeOrderedAndProject: per-task
    # local top-k, no global sort), so the unavoidable single-partition
    # rank window only ever sees k rows.
    order = [F.col("occurrences").desc(), F.col("path").asc()]
    wr = Window.orderBy(*order)
    return counts.orderBy(*order).limit(k).withColumn(
        "path_rank", F.row_number().over(wr)
    )


def ab_test_conversion(
    events: DataFrame,
    user_col: str = "user_id",
    convert_type: str = "purchase",
    type_col: str = "event_type",
    min_events: int = 1,
) -> DataFrame:
    """Deterministic A/B experiment readout: every user is assigned a
    variant by md5-prefix parity (reproducible across runs, engines,
    and cluster sizes — rand() splits are none of those), conversion
    is "user emitted at least ``min_events`` ``convert_type``
    events", and the result is one row per variant plus the pooled
    two-proportion z-score on the 'A' row (NULL when the pooled rate
    is degenerate — 0 or 1 — where the statistic is undefined).

    Shape: the event scan collapses to one row per user (max-flag
    aggregate with map-side combine — the only real shuffle), then a
    2-row variant aggregate and a broadcast self-join to attach the
    pooled statistic. Integer counts all the way; the z-score is
    computed from exact counts so both engines derive the identical
    double.
    """
    per_user = (
        events.select(
            F.col(user_col).alias("uid"),
            F.when(F.col(type_col) == convert_type, 1)
            .otherwise(0)
            .alias("conv"),
        )
        .groupBy("uid")
        .agg(
            F.when(F.sum("conv") >= min_events, 1)
            .otherwise(0)
            .alias("converted")
        )
        .withColumn(
            "variant",
            F.when(
                F.conv(
                    F.substring(F.md5(F.col("uid").cast("string")), 1, 8),
                    16,
                    10,
                ).cast("long")
                % 2
                == 0,
                "A",
            ).otherwise("B"),
        )
    )
    # The 2-row variant table feeds both the totals aggregate and the
    # final select; checkpointing it runs the event scan + per-user
    # collapse once instead of once per branch.
    variants = per_user.groupBy("variant").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("converted").alias("n_converted"),
    ).localCheckpoint()
    totals = variants.agg(
        F.sum("n_users").alias("__n"), F.sum("n_converted").alias("__c")
    )
    both = variants.crossJoin(F.broadcast(totals))
    pooled = F.col("__c") / F.col("__n")
    rate = F.col("n_converted") / F.col("n_users")
    other_n = F.col("__n") - F.col("n_users")
    # try_divide on every other_n division: if all users hash to one
    # variant (plausible in small cohorts), other_n is 0 and a plain
    # division is a DIVIDE_BY_ZERO hard error under ANSI mode — the
    # degenerate case must instead surface as the NULL z-score the
    # docstring promises.
    other_rate = F.try_divide(F.col("__c") - F.col("n_converted"), other_n)
    z = F.try_divide(
        rate - other_rate,
        F.sqrt(
            pooled
            * (1 - pooled)
            * (1 / F.col("n_users") + F.try_divide(F.lit(1), other_n))
        ),
    )
    return both.select(
        "variant",
        "n_users",
        "n_converted",
        F.round(rate, 6).alias("conversion_rate"),
        F.round(F.when(F.col("variant") == "A", z), 4).alias("z_score"),
    )


def debounce_events(
    events: DataFrame,
    gap: str = "5 seconds",
    user_col: str = "user_id",
    type_col: str = "event_type",
    time_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Telemetry debounce: within each (user, event_type), collapse
    bursts of repeated events into their FIRST event — an event is
    suppressed while it falls within ``gap`` of the previous event of
    the burst (chained: a burst extends as long as consecutive gaps
    stay ≤ gap, exactly a micro-sessionization). The kept row carries
    ``n_suppressed``, the number of events it swallowed — so the
    output is lossless for counting.

    Same scale shape as sessionize: one exchange on (user, type),
    then lag-gap mark + running-sum group ids + one aggregate inside
    the partition.
    """
    import re

    m = re.fullmatch(r"(\d+)\s*seconds?", gap)
    if not m:
        raise ValueError(f"gap must be '<n> seconds', got {gap!r}")
    gap_us = int(m.group(1)) * 1_000_000
    wo = Window.partitionBy(user_col, type_col).orderBy(time_col, id_col)
    wrun = wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    delta = epoch_us(F.col(time_col)) - F.lag(
        epoch_us(F.col(time_col))
    ).over(wo)
    marked = events.withColumn(
        "__is_start",
        F.when(delta.isNull() | (delta > gap_us), F.lit(1)).otherwise(
            F.lit(0)
        ),
    ).withColumn("__grp", F.sum("__is_start").over(wrun))
    return (
        marked.groupBy(user_col, type_col, "__grp")
        .agg(
            F.min(
                F.struct(time_col, id_col)
            ).alias("__first"),
            (F.count(F.lit(1)) - 1).cast("long").alias("n_suppressed"),
        )
        .select(
            F.col(f"__first.{id_col}").alias(id_col),
            user_col,
            type_col,
            epoch_us(F.col(f"__first.{time_col}")).alias("ts_us"),
            "n_suppressed",
        )
    )
