"""Key-shifted scale-up fixtures for the SCALING.md study.

Builds N× copies of sf0.1 tables with entity keys offset by 10M per
copy (entity counts and join fan-outs genuinely grow — no
dedup-collapse artifacts), written with an 8-file layout so read
parallelism is held constant. Usage:

    python tools/gen_scale.py [table ...]   # default: documents embeddings

Writes /tmp/scale_x{3,10,30}/<t>.parquet. Dimension tables
(supplier/part/nation/region) copy through UNSHIFTED — dims are held
constant, so per-dim-key fan-out grows with the tier (the hub-growth
caveat SCALING.md documents).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from pyspark_scd_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"
SHIFT = 10_000_000

KEY_COLS = {
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "orders": ["o_orderkey", "o_custkey"],
    "customer": ["c_custkey"],
    "lineitem": ["l_orderkey"],
    "events": ["event_id", "user_id"],
    # dimension tables: copied once, unshifted
    "supplier": [],
    "part": [],
    "nation": [],
    "region": [],
}


def build(spark, table: str, copies: int, out_dir: str) -> None:
    base = spark.read.parquet(f"{SF_DIR}/{table}.parquet")
    if not KEY_COLS[table]:  # dimension: pass through once
        base.repartition(8).write.mode("overwrite").parquet(
            f"{out_dir}/{table}.parquet"
        )
        return
    parts = []
    for i in range(copies):
        df = base
        for k in KEY_COLS[table]:
            df = df.withColumn(k, F.col(k) + F.lit(i * SHIFT))
        parts.append(df)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.repartition(8).write.mode("overwrite").parquet(
        f"{out_dir}/{table}.parquet"
    )


def main() -> None:
    args = sys.argv[1:]
    tiers = [int(a[1:]) for a in args if a.startswith("x")]
    tables = [a for a in args if not a.startswith("x")] or [
        "documents", "embeddings"
    ]
    tiers = tiers or [3, 10]
    spark = get_spark(app_name="gen_scale")
    for copies in tiers:
        out = f"/tmp/scale_x{copies}"
        for t in tables:
            build(spark, t, copies, out)
            print(f"wrote {out}/{t}.parquet ({copies}x)")


if __name__ == "__main__":
    main()
