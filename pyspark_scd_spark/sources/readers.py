"""Schema-enforced readers.

Parquet-first (the testdata format and the only sane format at 100 TB);
CSV retained as the snapshot-ingest format with the reference's exact
conventions — explicit StructType, FAILFAST, header, ``NULL`` sentinel,
``yyyy-MM-dd`` dates (reference jobs/create_employee_all.py:40-47).
"""

from __future__ import annotations

import glob as _glob

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


# Process-level parquet SCHEMA memo (r13 optimization): a bare
# ``spark.read.parquet(path)`` infers the schema by reading footers —
# a driver-side job costing ~100-140 ms per call on this VM class —
# and the registry builders construct their DataFrames fresh on every
# invocation, so a bench pass re-inferred the same static schemas
# hundreds of times (~40 s of pure footer jobs per full bench run,
# measured). Production engines read table schemas from a catalog
# once, not from footers per query; this memo is that catalog. Keyed
# by the resolved path; caches METADATA only — every query still
# scans the parquet data itself on every run (the file index, scan,
# and all computation are rebuilt per DataFrame as before).
_SCHEMA_CACHE: dict[str, T.StructType] = {}


def read_parquet_cached_schema(spark: SparkSession, path: str) -> DataFrame:
    """``spark.read.parquet`` with the footer-inference job paid once
    per path per process (see ``_SCHEMA_CACHE``). Only for paths whose
    schema is stable for the process lifetime (the driver testdata
    tables, staged intermediates written once per process)."""
    schema = _SCHEMA_CACHE.get(path)
    if schema is None:
        df = spark.read.parquet(path)
        _SCHEMA_CACHE[path] = df.schema
        return df
    return spark.read.schema(schema).parquet(path)


def read_parquet_table(
    spark: SparkSession, sf_dir: str, name: str
) -> DataFrame:
    """One driver-testdata table. ``spark.read.parquet`` semantics with
    the schema-inference footer job memoized per path — filters and
    projections placed on the result push down to the scan
    (verify via ``.explain``: PushedFilters / ReadSchema).

    ``events.parquet`` carries TIMESTAMP(NANOS) which Spark rejects
    ([PARQUET_TYPE_ILLEGAL]); it is read with ``nanosAsLong`` and the
    ``ts`` column rebuilt as a microsecond timestamp — a projection on
    the scan output, so pushdown on the other columns is preserved.
    """
    path = f"{sf_dir}/{name}.parquet"
    if name == "events":
        from pyspark.sql import functions as F

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = read_parquet_cached_schema(spark, path)
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn(
                "ts",
                F.timestamp_micros(F.expr("ts div 1000")).cast(
                    "timestamp_ntz"
                ),
            )
        return df
    return read_parquet_cached_schema(spark, path)


def register_testdata_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view for spark.sql use."""
    for name in TESTDATA_TABLES:
        read_parquet_table(spark, sf_dir, name).createOrReplaceTempView(name)


def read_csv_snapshots(
    spark: SparkSession,
    pattern: str,
    schema: T.StructType,
    date_format: str = "yyyy-MM-dd",
    null_value: str = "NULL",
) -> tuple[DataFrame, list[str]]:
    """Schema-enforced multi-file CSV scan, FAILFAST.

    Returns (df, resolved_file_list) — the file list feeds the archive
    step, mirroring the reference's glob-then-read shape (reference
    jobs/create_employee_all.py:29-49). A malformed row aborts the job
    instead of silently nulling (FAILFAST).
    """
    files = sorted(_glob.glob(pattern))
    if not files:
        return spark.createDataFrame([], schema), []
    df = (
        spark.read.schema(schema)
        .options(
            header="true",
            mode="FAILFAST",
            nullValue=null_value,
            dateFormat=date_format,
        )
        .csv(files)
    )
    return df, files


def read_table(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: T.StructType | None = None,
    options: dict | None = None,
) -> DataFrame:
    """Format-generic table reader (parquet / orc / json / csv / avro
    where the runtime provides it).

    Self-describing formats (parquet, orc) carry their schema; text
    formats (json, csv) REQUIRE an explicit one — schema inference is
    a full extra pass over the data at 100 TB and silently widens
    types (an int column with one stray float becomes double
    corpus-wide). Passing ``schema`` also pins nullability for the
    strict write-gate (operators/quality.py assert_schema).
    """
    reader = spark.read.format(fmt)
    if schema is not None:
        reader = reader.schema(schema)
    elif fmt in ("json", "csv"):
        raise ValueError(
            f"{fmt} requires an explicit schema: inference is a full "
            "extra data pass and widens types silently"
        )
    if options:
        reader = reader.options(**options)
    return reader.load(path)
