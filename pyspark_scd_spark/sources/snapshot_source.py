"""Python Data Source (Spark 4 API): deterministic snapshot generator.

The reference's input is a directory of daily full-roster CSV drops
(reference data/input/2020-01-01.csv ... 2020-01-10.csv, ~50 rows each;
jobs/create_employee_all.py:29-49 reads them with an explicit schema).
This module packages that *shape* as a first-class Spark source —
``spark.read.format("emp_snapshots")`` — built on the Spark 4 Python
DataSource API, so SCD tests and demos can materialize any number of
snapshot days without fixture files.

Scale design:
- one ``InputPartition`` per snapshot day → each day generates on a
  different executor core; no driver-side loop, no collect.
- ``pushFilters`` handles snapshot_date =, <, <=, >, >= — pruned days
  are never generated at all (the custom-source analogue of partition
  pruning; the driver plans |matching days| tasks, not |all days|).
- the streaming variant emits one day per micro-batch from the same
  generator (offset = day index), partition-parallel via
  ``DataSourceStreamReader`` — state is two integers, and a crashed
  query resumes from the checkpointed offset.

Every row is a pure function of (day, employee): change/delete
patterns mirror the reference fixture (periodic salary changes, one
deleted employee, one gap-then-return) so SCD outputs are predictable.
"""

from __future__ import annotations

from datetime import date, timedelta
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
)
from pyspark.sql.types import (
    DateType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

SCHEMA = StructType(
    [
        StructField("snapshot_date", DateType(), False),
        StructField("employee_number", IntegerType(), False),
        StructField("first_name", StringType(), False),
        StructField("department", StringType(), False),
        StructField("salary", IntegerType(), False),
    ]
)

_DEPTS = ("eng", "sales", "ops", "finance")


def _rows_for_day(base: date, day_idx: int, n_employees: int):
    d = base + timedelta(days=day_idx)
    for emp in range(1, n_employees + 1):
        # emp == 3: deleted after day 2. emp == 5: absent on day 3 only
        # (the reference's gap-then-reappear pattern, SURVEY.md §2 #10).
        if emp == 3 and day_idx > 2:
            continue
        if emp == 5 and day_idx == 3:
            continue
        # periodic raise: each employee's salary steps once, on a day
        # determined by its number — deterministic Changed rows.
        raised = day_idx >= (emp % 7) + 1
        yield (
            d,
            emp,
            f"emp_{emp}",
            _DEPTS[emp % len(_DEPTS)],
            50_000 + emp * 10 + (1_000 if raised else 0),
        )


class _DayPartition(InputPartition):
    def __init__(self, day_idx: int):
        self.day_idx = day_idx


def _opts(options):
    base = date.fromisoformat(options.get("base_date", "2024-01-01"))
    n_days = int(options.get("n_days", 10))
    n_emp = int(options.get("n_employees", 50))
    return base, n_days, n_emp


class SnapshotBatchReader(DataSourceReader):
    def __init__(self, options):
        self.base, self.n_days, self.n_emp = _opts(options)
        self.min_day = 0
        self.max_day = self.n_days - 1

    def pushFilters(self, filters):
        for f in filters:
            cp = getattr(f, "attribute", None) or getattr(f, "columnPath", None)
            col = cp[0] if isinstance(cp, (tuple, list)) else cp
            if col != "snapshot_date" or not hasattr(f, "value"):
                yield f
                continue
            v = f.value
            if not isinstance(v, date):
                yield f
                continue
            idx = (v - self.base).days
            if isinstance(f, EqualTo):
                self.min_day = max(self.min_day, idx)
                self.max_day = min(self.max_day, idx)
            elif isinstance(f, GreaterThan):
                self.min_day = max(self.min_day, idx + 1)
            elif isinstance(f, GreaterThanOrEqual):
                self.min_day = max(self.min_day, idx)
            elif isinstance(f, LessThan):
                self.max_day = min(self.max_day, idx - 1)
            elif isinstance(f, LessThanOrEqual):
                self.max_day = min(self.max_day, idx)
            else:
                yield f

    def partitions(self):
        return [
            _DayPartition(i) for i in range(self.min_day, self.max_day + 1)
        ]

    def read(self, partition: _DayPartition) -> Iterator[tuple]:
        yield from _rows_for_day(self.base, partition.day_idx, self.n_emp)


class SnapshotStreamReader(DataSourceStreamReader):
    """One snapshot day per micro-batch; offset = next unread day."""

    def __init__(self, options):
        self.base, self.n_days, self.n_emp = _opts(options)

    def initialOffset(self):
        return {"day": 0}

    def latestOffset(self):
        return {"day": self.n_days}

    def partitions(self, start, end):
        return [_DayPartition(i) for i in range(start["day"], end["day"])]

    def read(self, partition: _DayPartition) -> Iterator[tuple]:
        yield from _rows_for_day(self.base, partition.day_idx, self.n_emp)

    def commit(self, end):
        pass

    def stop(self):
        pass


class SnapshotDataSource(DataSource):
    @classmethod
    def name(cls):
        return "emp_snapshots"

    def schema(self):
        return SCHEMA

    def reader(self, schema):
        return SnapshotBatchReader(self.options)

    def streamReader(self, schema):
        return SnapshotStreamReader(self.options)


def register(spark) -> None:
    # Python-source filter pushdown is off by default in Spark 4.1;
    # without it, a reader that implements pushFilters() is rejected
    # outright at planning time.
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(SnapshotDataSource)
