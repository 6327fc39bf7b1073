"""CLI entry: ``python -m pyspark_scd_spark.jobs --base-dir DIR``.

Drop-in replacement for the reference's ``python3
create_employee_all.py`` (reference README.md:5): ingests pending CSV
snapshot drops from ``DIR/input/*.csv``, rebuilds ``employee_all`` +
``employee_current`` under ``DIR/output/``, archives processed inputs —
with the re-architected internals (partitioned parquet, staged writes,
single-pass validation; see jobs/employee_dim.py).
"""

from __future__ import annotations

import argparse


def main() -> None:
    parser = argparse.ArgumentParser(
        prog="pyspark_scd_spark.jobs",
        description="Run the employee SCD pipeline over a drop directory.",
    )
    parser.add_argument(
        "--base-dir",
        required=True,
        help="pipeline root: reads BASE/input/*.csv, writes BASE/output/",
    )
    parser.add_argument(
        "--no-archive",
        action="store_true",
        help="leave processed input files in place",
    )
    parser.add_argument("--master", default=None, help="Spark master URL")
    args = parser.parse_args()

    from pyspark_scd_spark.jobs import employee_dim
    from pyspark_scd_spark.session import get_spark

    spark = get_spark(app_name="employee_dim", master=args.master)
    employee_all, employee_current = employee_dim.run(
        spark, args.base_dir, archive=not args.no_archive
    )
    n_all = employee_all.count()
    n_cur = employee_current.count()
    print(f"employee_all: {n_all} rows; employee_current: {n_cur} rows")


if __name__ == "__main__":
    main()
