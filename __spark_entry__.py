"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query smoke check at sf0.001.
``queries()`` — every implemented operator from SURVEY.md §2 as
``(spark, sf_dir) -> DataFrame``.
``oracle_sql()`` — matching DuckDB ANSI SQL per query (omitted for
genuinely non-SQL-expressible ops → rows-only check).

All real logic lives in ``pyspark_scd_spark/``; this module is wiring.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO_DIR = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _REPO_DIR)
# Executor Python workers resolve imports from PYTHONPATH (they do not
# inherit driver-side sys.path mutations), so a harness launching from
# another cwd would break every mapInPandas closure that imports the
# package. Exporting here covers any SparkSession created after this
# import; harnesses launching from the repo root work regardless.
if _REPO_DIR not in os.environ.get("PYTHONPATH", "").split(os.pathsep):
    os.environ["PYTHONPATH"] = (
        _REPO_DIR + os.pathsep + os.environ["PYTHONPATH"]
        if os.environ.get("PYTHONPATH")
        else _REPO_DIR
    )

from pyspark_scd_spark.registry import REGISTRY  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the reference's headline output — the SCD current
    view (latest state per entity incl. Deleted survivors, stamped to
    the global max snapshot date; reference get_latest_snapshot,
    jobs/create_employee_all.py:51-66) — over the orders-as-snapshots
    mapping at sf0.001."""
    return REGISTRY["scd_employee_current"].builder(
        spark, "/root/testdata/sf0.001"
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: q.builder for name, q in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: q.oracle for name, q in REGISTRY.items() if q.oracle is not None
    }
