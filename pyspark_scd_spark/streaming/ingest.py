"""Structured Streaming file ingest — the Spark-native form of the
reference's manually-cranked micro-batch loop.

The reference polls a directory, globs CSVs, processes them, then
``shutil.move``s them to ``processed/`` (reference
jobs/create_employee_all.py:29-49,198-214; README.md:43-79). Structured
Streaming's file source does exactly this natively: new-file discovery,
exactly-once tracking via checkpoint, and ``cleanSource=archive`` for
the move-to-processed step — with restart recovery the reference lacks
(its crash mode, README.md:109-112, is unrecoverable mid-overwrite).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def stream_csv_snapshots(
    spark: SparkSession,
    input_dir: str,
    schema: T.StructType,
    archive_dir: str | None = None,
    max_files_per_trigger: int = 10,
) -> DataFrame:
    """Streaming snapshot reader with the reference's CSV conventions
    (header, NULL sentinel, yyyy-MM-dd dates — reference
    jobs/create_employee_all.py:40-47)."""
    reader = (
        spark.readStream.schema(schema)
        .option("header", "true")
        .option("nullValue", "NULL")
        .option("dateFormat", "yyyy-MM-dd")
        .option("maxFilesPerTrigger", max_files_per_trigger)
    )
    if archive_dir:
        reader = reader.option("cleanSource", "archive").option(
            "sourceArchiveDir", archive_dir
        )
    return reader.csv(input_dir)


def foreach_batch_scd(
    stream_df: DataFrame,
    checkpoint_dir: str,
    process_batch,
    trigger_available_now: bool = True,
):
    """Run a batch SCD merge per micro-batch via foreachBatch.

    ``process_batch(batch_df, batch_id)`` gets each file drop as a
    batch DataFrame — the idiomatic place to call
    ``operators.scd.scd_merge`` against the current-view table, giving
    an incremental, restartable pipeline where the reference re-read
    and overwrote its whole history every run.
    """
    writer = stream_df.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
