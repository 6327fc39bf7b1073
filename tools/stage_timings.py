"""Marginal per-stage cost attribution for the corpus_release
composite (VERDICT r9 item 8).

The composite's manifest is one union of nine per-stage aggregates
over a lazily-checkpointed stage chain, so a single wall number hides
which stage buys what. Spark's ``observe()`` can attach row/metric
counts to the one job, but those are exactly the numbers the manifest
already returns — what it cannot give is per-stage TIME. This tool
gets time the honest way: it consumes the manifest truncated at stage
k (``corpus_release(..., upto=k)``) for k = 0..8, each in a FRESH
invocation (no shared checkpoint blocks), and differences consecutive
walls. The marginal delta at k is the cost of stage k's operator plus
its one bounded manifest aggregate.

Protocol matches SCALING.md: one untimed warm pass of the full
composite first, then one timed pass per prefix, noop-format consumer.

Usage:
    python tools/stage_timings.py [sf_dir]   # default /root/testdata/sf0.1
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from pyspark_scd_spark.operators import corpus  # noqa: E402
from pyspark_scd_spark.session import get_spark  # noqa: E402

STAGES = [
    "0_input",
    "1_eval_holdout",
    "2_exact_dedup",
    "3_near_dedup",
    "4_para_dedup",
    "5_decontaminate",
    "6_quality_gate",
    "7_temperature_mix",
    "8_pack",
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="stage_timings")
    docs_path = f"{sf_dir}/documents.parquet"

    def release(upto: int | None):
        d = spark.read.parquet(docs_path)
        return corpus.corpus_release(d, F.col("doc_id") % 10 == 0, upto=upto)

    def consume(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    # warm: full composite (JIT/codegen/footers), twice per the
    # SCALING.md convergence note for cogroup-heavy paths.
    for _ in range(2):
        consume(release(None))
        spark.catalog.clearCache()

    walls: list[float] = []
    for k in range(len(STAGES)):
        t0 = time.time()
        consume(release(k))
        walls.append(time.time() - t0)
        spark.catalog.clearCache()

    out = {}
    prev = 0.0
    for k, name in enumerate(STAGES):
        out[name] = {
            "cumulative_s": round(walls[k], 3),
            "marginal_s": round(walls[k] - prev, 3),
        }
        prev = walls[k]
    print(json.dumps({"sf_dir": sf_dir, "stages": out}, indent=1))


if __name__ == "__main__":
    main()
