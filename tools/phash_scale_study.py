"""x30/x100/x300 decade for the image-pHash dedup family
(SCALING.md round 10 — VERDICT r9 item 2: the only dedup family
without a decade study).

Workload: the EXACT registry builders (``image_phash``,
``image_phash_neardup``, ``image_phash_incremental``) from
``__spark_entry__.queries()``. Their only input column is
``documents.doc_id`` — the grayscale PNG payload is synthesized
deterministically from the id (perceptual.with_grayscale_payload), so
a scale tier is a documents.parquet of N contiguous ids and every id
yields a NOVEL image (no verbatim-duplicate-clique artifact, the same
reason the ANN study generated novel vectors instead of key-shifting).

Tiers vs sf0.1's 5k documents: 150k ("x30"), 500k ("x100"),
1.5M ("x300"). Timing protocol = ann_x100_study.py: noop consumer,
warm + 2 timed per (query, tier), steady state = the last.

Usage: python tools/phash_scale_study.py [out_json] [max_tier]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import __spark_entry__ as entrymod  # noqa: E402

from pyspark_scd_spark.session import get_spark  # noqa: E402

TIERS = [(150_000, "x30"), (500_000, "x100"), (1_500_000, "x300")]
QUERIES = [
    "image_phash",
    "image_phash_neardup",
    "image_phash_incremental",
]


def _consume(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _ensure_tier(spark, n: int, d: str) -> None:
    marker = os.path.join(d, "documents.parquet", "_SUCCESS")
    if os.path.exists(marker):
        return
    t0 = time.time()
    # 32 files so the Arrow synth+hash stage parallelizes across all
    # cores at every tier (the builders' mapInPandas rides the scan
    # partitioning).
    df = spark.range(0, n).withColumnRenamed("id", "doc_id")
    df.repartition(32).write.mode("overwrite").parquet(
        os.path.join(d, "documents.parquet")
    )
    print(f"built {d} ({n} ids) in {time.time() - t0:.1f}s", flush=True)


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/phash_decade.json"
    max_tier = sys.argv[2] if len(sys.argv) > 2 else "x300"
    tiers = TIERS[: [t for _, t in TIERS].index(max_tier) + 1]
    spark = get_spark(app_name="phash_scale_study")
    qs = entrymod.queries()

    for n, _tag in tiers:
        _ensure_tier(spark, n, f"/tmp/phashstudy_{n}")

    results: dict[str, dict[str, float]] = {}
    for name in QUERIES:
        q = qs[name]
        results[name] = {}
        for n, tag in tiers:
            d = f"/tmp/phashstudy_{n}"
            runs = []
            for _ in range(3):  # warm + 2 timed
                t0 = time.time()
                _consume(q(spark, d))
                runs.append(round(time.time() - t0, 2))
                spark.catalog.clearCache()
            results[name][tag] = runs[-1]
            print(
                json.dumps(
                    {"query": name, "tier": tag, "n": n, "runs": runs}
                ),
                flush=True,
            )

    summary = {}
    for name, r in results.items():
        x30, x100, x300 = r.get("x30"), r.get("x100"), r.get("x300")
        summary[name] = {
            "x30": x30,
            "x100": x100,
            "x300": x300,
            "x30_to_x100": round(x100 / x30, 2) if x30 and x100 else None,
            "x100_to_x300": round(x300 / x100, 2)
            if x100 and x300 else None,
        }
    with open(out_path, "w") as f:
        json.dump(summary, f, indent=1)
    print("SUMMARY " + json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
