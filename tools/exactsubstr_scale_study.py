"""x30/x100 decade for the ExactSubstr dedup family, with a
max_len-sensitivity axis (SCALING.md round 10 — VERDICT r9 item 4).

Workload: the EXACT registry builders ``suffix_array_ranks`` (full
prefix-doubling suffix index — rounds = ceil(log2 max_doc_len), the
scale knob under test) and ``dedup_exact_substrings`` (h=16 prefix
ranks — ceil(log2 16) = 4 rounds regardless of doc length, which the
axis should CONFIRM by showing flat sensitivity).

Corpus: novel synthetic text, NOT key-shifted sf0.1 copies — verbatim
copied text makes every 20-gram a duplicate, exploding the coverage
expansion into a pathological workload that measures nothing real.
Here each doc is ``words`` tokens 'w<k>', k = xxhash64(doc_id, i) mod
1000 — pure column expressions, no UDF — so natural cross-doc 4-word
gram collisions are ~zero and dup mass is CONTROLLED: every 50th doc
appends one fixed 25-word sentence (all planted docs land in the
builders' doc_id%10==0 shard), so dup positions grow linearly with
the tier.

Tiers (docs x words/doc; sf0.1 = 5k docs x ~60 words):
  x30   150k x 60   — decade leg 1
  x100  500k x 60   — decade leg 2
  x30L  37.5k x 240 — SAME total chars as x30, 4x doc length:
        +2 prefix-doubling rounds for the full build, 0 extra for
        the h=16 form. Isolates round count from corpus size.

Usage: python tools/exactsubstr_scale_study.py [out_json] [tiers...]
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
from pyspark.sql import functions as F  # noqa: E402

from pyspark_scd_spark.session import get_spark  # noqa: E402

PLANT = " ".join(f"p{i}" for i in range(25))

TIERS = {
    "x30": (150_000, 60),
    "x100": (500_000, 60),
    "x30L": (37_500, 240),
}
QUERIES = ["suffix_array_ranks", "dedup_exact_substrings"]


def _consume(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _ensure_tier(spark, tag: str, n_docs: int, words: int) -> str:
    d = f"/tmp/substrstudy_{tag}"
    marker = os.path.join(d, "documents.parquet", "_SUCCESS")
    if os.path.exists(marker):
        return d
    t0 = time.time()
    base = spark.range(0, n_docs).withColumnRenamed("id", "doc_id")
    txt = F.concat_ws(
        " ",
        F.transform(
            F.sequence(F.lit(1), F.lit(words)),
            lambda i: F.concat(
                F.lit("w"),
                F.pmod(F.xxhash64(F.col("doc_id"), i), F.lit(1000))
                .cast("string"),
            ),
        ),
    )
    df = base.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 50 == 0,
            F.concat(txt, F.lit(" " + PLANT)),
        )
        .otherwise(txt)
        .alias("text"),
    )
    df.repartition(32).write.mode("overwrite").parquet(
        os.path.join(d, "documents.parquet")
    )
    print(
        f"built {d} ({n_docs} docs x {words} words) in "
        f"{time.time() - t0:.1f}s",
        flush=True,
    )
    return d


def main() -> None:
    out_path = (
        sys.argv[1] if len(sys.argv) > 1 else "/tmp/substr_decade.json"
    )
    tags = sys.argv[2:] or list(TIERS)
    spark = get_spark(app_name="exactsubstr_scale_study")
    qs = entrymod.queries()

    dirs = {t: _ensure_tier(spark, t, *TIERS[t]) for t in tags}

    results: dict[str, dict[str, float]] = {q: {} for q in QUERIES}
    for name in QUERIES:
        q = qs[name]
        for tag in tags:
            runs = []
            for _ in range(3):  # warm + 2 timed
                t0 = time.time()
                _consume(q(spark, dirs[tag]))
                runs.append(round(time.time() - t0, 2))
                spark.catalog.clearCache()
            results[name][tag] = runs[-1]
            print(
                json.dumps({"query": name, "tier": tag, "runs": runs}),
                flush=True,
            )

    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
    print("SUMMARY " + json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
