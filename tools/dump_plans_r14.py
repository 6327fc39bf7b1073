"""Dump per-query ``explain("formatted")`` snapshots for the r14
optimization round into ``plans/r14/<query>_<suffix>.txt``.

Usage: python tools/dump_plans_r14.py <suffix> [query ...]

With no query list, dumps every HEADLINE + X3_EXACT query. The
suffix is ``before`` (baseline, pre-optimization) or ``after``
(post-change); the judge checks plan-shape claims in
OPTIMIZATION_r14.md against these files.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE, X3_EXACT  # noqa: E402
from pyspark_scd_spark.plans import explain  # noqa: E402
from pyspark_scd_spark.registry import REGISTRY  # noqa: E402
from pyspark_scd_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"
OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "plans",
    "r14",
)


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or [
        n for n in HEADLINE + X3_EXACT if n in REGISTRY
    ]
    os.makedirs(OUT_DIR, exist_ok=True)
    spark = get_spark(app_name="dump_plans_r14")
    for name in names:
        df = REGISTRY[name].builder(spark, SF_DIR)
        plan = explain.formatted_plan(df)
        path = os.path.join(OUT_DIR, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path}", flush=True)
        spark.catalog.clearCache()
        try:
            jmap = spark.sparkContext._jsc.getPersistentRDDs()
            for rid in list(jmap.keySet().toArray()):
                jrdd = jmap.get(rid)
                if jrdd is not None:
                    jrdd.unpersist(False)
        except Exception:
            pass


if __name__ == "__main__":
    main()
