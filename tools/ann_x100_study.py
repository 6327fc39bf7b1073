"""x100 decade for the ANN registry forms (SCALING.md round 8).

The corpus-prep family is x100-proven (round 7); this extends the
decade study to the index-shaped ANN forms the registry actually
serves — the EXACT builders from ``__spark_entry__.queries()``, not
study-local variants, so a regression here is a regression users of
the registry would hit:

- ``embedding_neardup_pairs_ivf_auto``  (auto_cells, O(n^1.5·d))
- ``knn_label_vote_ivf_auto``           (auto_cells, O(n^1.5·d))
- ``embedding_neardup_incremental_ivf`` (store+batch, O(batch)-probe)
- ``ivf_drift_retrain``                 (k=8 parity form, histogram+
                                         conditional re-assign: O(n))

Tiers are NOVEL vectors from gen_vectors.py (the key-shifted
gen_scale tiers duplicate vectors verbatim — wrong corpus for ANN:
exact-dup cliques, degenerate buckets): 60k ("x30" vs sf0.1's 2k),
200k ("x100"), 600k ("x300"). Timing protocol: noop-format consumer
(never count() — it prunes projections), one untimed warm run per
(query, tier), then two timed runs, steady state = the last.

Usage: python tools/ann_x100_study.py [out_json]
Writes one JSON line per (query, tier) and a final summary.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod  # noqa: E402
from gen_vectors import gen_vectors  # noqa: E402

from pyspark_scd_spark.session import get_spark  # noqa: E402

TIERS = [(60_000, "x30"), (200_000, "x100"), (600_000, "x300")]
QUERIES = [
    "ivf_drift_retrain",
    "embedding_neardup_incremental_ivf",
    "embedding_neardup_incremental_ivf_auto",
    "embedding_neardup_pairs_ivf_auto",
    "knn_label_vote_ivf_auto",
]

# the pinned-k=8 parity form is quadratic by construction (measured
# 3.8/31/322s across the decade); skip its x300 leg on re-runs —
# the wall is documented, re-measuring it costs ~17 min for nothing
SKIP = {("embedding_neardup_incremental_ivf", "x300")}


def _consume(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/ann_x100.json"
    spark = get_spark(app_name="ann_x100_study")
    qs = entrymod.queries()

    for n, _tag in TIERS:
        d = f"/tmp/vecstudy_{n}"
        marker = os.path.join(d, "embeddings.parquet", "_SUCCESS")
        if not os.path.exists(marker):
            t0 = time.time()
            gen_vectors(spark, n, d)
            print(
                f"built {d} in {time.time() - t0:.1f}s", flush=True
            )

    results: dict[str, dict[str, float]] = {}
    for name in QUERIES:
        q = qs[name]
        results[name] = {}
        for n, tag in TIERS:
            if (name, tag) in SKIP:
                continue
            d = f"/tmp/vecstudy_{n}"
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
            # linear growth would be 3.33 and 3.0 per step
            "x30_to_x100": round(x100 / x30, 2)
            if x30 and x100 else None,
            "x100_to_x300": round(x300 / x100, 2)
            if x100 and x300 else None,
        }
    with open(out_path, "w") as f:
        json.dump(summary, f, indent=1)
    print("SUMMARY " + json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
