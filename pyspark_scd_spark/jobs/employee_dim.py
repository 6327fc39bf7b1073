"""The reference's end-to-end job, re-architected.

Reference flow (jobs/create_employee_all.py:226-251, README.md:43-79):
read prior employee_all output + new CSV drops → union+dedup → window
pipeline → validate → coalesce(1) CSV overwrite of the directory being
read → move inputs to processed/. Known failure: overwriting the input
of a lazy plan (README.md:109-112).

This version:
- ``spark`` is a parameter (reference wish-list, README.md:121-122);
- history is partitioned parquet, written via two-phase staged swap —
  the self-read-overwrite race cannot happen;
- validation is ONE aggregation pass, not three jobs;
- statuses recomputed with the corrected islands partitioning;
- an incremental variant applies the day's snapshot against the
  current view only (scd_merge) — O(day) not O(history).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from pyspark_scd_spark.operators import scd
from pyspark_scd_spark.operators.quality import validate
from pyspark_scd_spark.profiles import employee_profiles
from pyspark_scd_spark.sources.readers import read_csv_snapshots
from pyspark_scd_spark.sources.writers import archive_files, write_staged

KEY_COLS = ["employee_number"]
TIME_COL = "snapshot_date"
HASH_COLS = [
    "employee_number",
    "status",
    "first_name",
    "last_name",
    "gender",
    "email",
    "phone_number",
    "salary",
    "termination_date",
]


def run(
    spark: SparkSession,
    base_dir: str,
    archive: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """One pipeline run: ingest pending CSV drops, rebuild
    employee_all + employee_current, staged-write both, archive inputs.

    Returns (employee_all, employee_current) DataFrames re-read from
    the committed outputs (so callers observe exactly what was
    persisted).
    """
    profiles = employee_profiles(base_dir)
    snap_profile = profiles["emp_snapshots"]
    all_profile = profiles["employee_all"]
    cur_profile = profiles["employee_current"]

    new_df, files = read_csv_snapshots(
        spark, snap_profile.input_path, snap_profile.schema
    )

    hist_path = all_profile.output_path
    if os.path.isdir(hist_path):
        history = spark.read.parquet(hist_path).select(*snap_profile.schema.names)
        snapshots = scd.union_snapshots(history, new_df)
    else:
        snapshots = new_df

    employee_all = scd.scd_apply(
        snapshots,
        key_cols=KEY_COLS,
        time_col=TIME_COL,
        hash_cols=HASH_COLS,
    )
    # Cache across validate+write: the reference ran its three gates
    # and the save as four separate jobs, re-executing the whole
    # window lineage each time (SURVEY.md §3). One persist = one
    # lineage execution total.
    employee_all.persist()
    try:
        validate(employee_all, [TIME_COL, *KEY_COLS], all_profile.schema)
        write_staged(
            employee_all,
            hist_path,
            partition_by=all_profile.partition_by,
        )
    finally:
        employee_all.unpersist()

    committed_all = spark.read.parquet(hist_path)
    employee_current = scd.current_view(committed_all, KEY_COLS, TIME_COL)
    validate(employee_current, KEY_COLS)
    write_staged(employee_current, cur_profile.output_path)

    if archive and files:
        archive_files(files, snap_profile.output_path)

    return (
        spark.read.parquet(hist_path),
        spark.read.parquet(cur_profile.output_path),
    )


def run_incremental(
    spark: SparkSession,
    day_snapshot: DataFrame,
    current_path: str,
) -> DataFrame:
    """Incremental daily apply: merge one day against the current view
    (the 100 TB path — history is append-only elsewhere)."""
    if os.path.isdir(current_path):
        current = spark.read.parquet(current_path)
        new_current = scd.scd_merge(
            current, day_snapshot, KEY_COLS, TIME_COL, HASH_COLS
        )
    else:
        new_current = scd.scd_bootstrap(day_snapshot, KEY_COLS, TIME_COL)
    write_staged(new_current, current_path)
    return spark.read.parquet(current_path)
