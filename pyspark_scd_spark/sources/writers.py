"""Staged two-phase writer.

The reference reads its own previous output and overwrites the same
directory in place — its documented crash mode
(``java.io.FileNotFoundException``, reference README.md:109-112,
configs/config.py:23 + jobs/create_employee_all.py:190-196) — and
forces a single-task write via ``coalesce(1)`` (:191).

Here: write to a staging directory, validate, then atomically swap.
Partitioned parquet by default; no ``coalesce(1)`` anywhere.
"""

from __future__ import annotations

import os
import shutil
from collections.abc import Sequence

from pyspark.sql import DataFrame


def write_staged(
    df: DataFrame,
    path: str,
    partition_by: Sequence[str] = (),
    fmt: str = "parquet",
    options: dict | None = None,
) -> str:
    """Two-phase commit: stage → swap.

    1. Write the full output to ``<path>.__staging__``. Because the
       source lineage may read ``path`` itself (self-referential
       accumulate, reference configs/config.py:23), the write happens
       BEFORE anything under ``path`` is touched — no lazy file refs
       can dangle.
    2. Move the old output aside, promote staging, delete the old copy.

    On a real deployment this maps to a table-format commit (Iceberg /
    Delta snapshot swap); plain directories get the rename dance, which
    is atomic enough on a local/posix filesystem.
    """
    staging = f"{path}.__staging__"
    backup = f"{path}.__old__"
    writer = df.write.mode("overwrite").format(fmt)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if options:
        writer = writer.options(**options)
    writer.save(staging)

    if os.path.exists(backup):
        shutil.rmtree(backup)
    if os.path.exists(path):
        os.replace(path, backup)
    os.replace(staging, path)
    if os.path.exists(backup):
        shutil.rmtree(backup)
    # Spark keeps a session-level FileStatusCache of directory listings;
    # after the swap it still points at the replaced part files — the
    # reference's FileNotFoundException (README.md:109-112) by another
    # route. Invalidate the path so the next read lists fresh.
    df.sparkSession.catalog.refreshByPath(path)
    return path


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    n_buckets: int,
    sort_cols: Sequence[str] = (),
    fmt: str = "parquet",
) -> None:
    """Persist as a bucketed (and optionally sorted) managed table.

    Two tables bucketed on the same keys with the same bucket count
    join with ZERO shuffle — each task reads bucket i of both sides —
    and sorted buckets skip the sort-merge sort too. This is the
    at-rest layout for the incremental SCD current-view table: daily
    ``scd_merge`` joins then move no data at all. (Plain
    ``DataFrameWriter.save`` paths cannot carry bucket metadata;
    bucketing requires the catalog, hence ``saveAsTable``.)
    """
    writer = df.write.format(fmt).mode("overwrite").bucketBy(
        n_buckets, *bucket_cols
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def archive_files(files: Sequence[str], dest_dir: str) -> list[str]:
    """Move ingested input files to an archive directory (reference
    ``move_files``, jobs/create_employee_all.py:198-214). Driver-side
    housekeeping; the Structured Streaming file source's
    ``cleanSource=archive`` is the streaming-native equivalent
    (see streaming/ingest.py)."""
    os.makedirs(dest_dir, exist_ok=True)
    moved = []
    for f in files:
        target = os.path.join(dest_dir, os.path.basename(f))
        shutil.move(f, target)
        moved.append(target)
    return moved
