"""Synthetic employee-snapshot fixture (FIXTURES.md §A).

Reproduces every change pattern present in the reference's committed
data (verified by diffing reference data/input/2020-01-01.csv …
2020-01-10.csv): steady state, single persistent change, change-then-
revert (twice), delete, delete-then-reappear, duplicate file re-drop.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession

from pyspark_scd_spark.profiles import EMP_SNAPSHOT_SCHEMA

DATES = [dt.date(2020, 1, d) for d in range(1, 11)]


def _base_row(emp: int, date: dt.date) -> dict:
    return {
        "snapshot_date": date,
        "employee_number": emp,
        "status": "Active",
        "first_name": f"First{emp}",
        "last_name": f"Last{emp}",
        "gender": "F" if emp % 2 else "M",
        "email": f"emp{emp}@example.com",
        "phone_number": f"000-{emp:04d}",
        "salary": 50_000 + emp * 1_000,
        "termination_date": None,
    }


def build_rows() -> list[dict]:
    """10 snapshots × ~8 employees, exercising:

    - emp 1..4: steady state (New then No Change)
    - emp 13: salary change on 01-02, sticks      (persistent change)
    - emp 15: salary changes 01-02, reverts 01-03; last_name changes
      01-06, reverts 01-07                        (change-then-revert ×2)
    - emp 25: absent 01-04, present 01-05, absent 01-06 onward
                                                  (gap + final delete)
    - emp 30: present 01-01..01-03 only           (plain delete)
    """
    rows: list[dict] = []
    for date in DATES:
        day = date.day
        for emp in (1, 2, 3, 4):
            rows.append(_base_row(emp, date))

        r13 = _base_row(13, date)
        if day >= 2:
            r13["salary"] = 99_999
        rows.append(r13)

        r15 = _base_row(15, date)
        if day == 2:
            r15["salary"] = 139_999
        if day == 6:
            r15["last_name"] = "Nolan"
        rows.append(r15)

        if day != 4 and day <= 5:
            rows.append(_base_row(25, date))

        if day <= 3:
            rows.append(_base_row(30, date))
    return rows


def emp_snapshots(spark: SparkSession, duplicate_day: int | None = None) -> DataFrame:
    """The fixture as a DataFrame; ``duplicate_day`` re-drops that
    day's rows verbatim (duplicate-file ingest, reference README.md:87)."""
    rows = build_rows()
    if duplicate_day is not None:
        rows = rows + [
            r for r in rows if r["snapshot_date"].day == duplicate_day
        ]
    return spark.createDataFrame(rows, schema=EMP_SNAPSHOT_SCHEMA)


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
