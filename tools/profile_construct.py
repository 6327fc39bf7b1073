"""Per-entry driver-side construction vs execution profiling (r14).

For each named query: time the BUILDER call (pure driver work — py4j
round trips, F.expr parsing, DataFrame graph construction) separately
from the noop-sink EXECUTION (analysis + optimization + run), min over
N repeats of each. This separates "the plan is expensive to build"
(VERDICT r13 item 1: big-literal expression trees) from "the plan is
expensive to run" so the fix lands on the measured side.

Usage: python tools/profile_construct.py [entry ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from pyspark_scd_spark.session import get_spark  # noqa: E402

DEFAULT = [
    "embedding_neardup_pairs_ann",
    "knn_label_vote_ann",
    "embedding_neardup_pairs_ivf",
    "knn_label_vote_ivf",
    "embedding_neardup_pairs_ivf_auto",
    "knn_label_vote_ivf_auto",
    "embedding_neardup_pairs_ann_auto",
    "knn_label_vote_ann_auto",
    "hard_negative_mining_ivf_auto",
    "sim_search_ivf_pq",
    "ann_pair_recall_report",
    "ivf_drift_retrain",
    "dedup_semantic_clusters",
    "hybrid_search_rrf",
    "dedup_minhash_lsh",
    "corpus_release",
]


def main() -> None:
    names = sys.argv[1:] or DEFAULT
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="profile_construct")
    queries = entrymod.queries()

    # warm: JIT, parquet footers, python workers
    for name in names:
        df = queries[name](spark, "/root/testdata/sf0.001")
        df.write.format("noop").mode("overwrite").save()
    spark.catalog.clearCache()

    print(f"{'entry':40s} {'build_s':>8s} {'exec_s':>8s} {'total':>8s}")
    rows = []
    for name in names:
        builds, execs = [], []
        for _ in range(3):
            t0 = time.time()
            df = queries[name](spark, sf_dir)
            t1 = time.time()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.time()
            builds.append(t1 - t0)
            execs.append(t2 - t1)
            spark.catalog.clearCache()
            try:
                jmap = spark.sparkContext._jsc.getPersistentRDDs()
                for rid in list(jmap.keySet().toArray()):
                    j = jmap.get(rid)
                    if j is not None:
                        j.unpersist(False)
            except Exception:
                pass
        b, e = min(builds), min(execs)
        rows.append((name, b, e))
        print(f"{name:40s} {b:8.3f} {e:8.3f} {b + e:8.3f}")
    tb = sum(r[1] for r in rows)
    te = sum(r[2] for r in rows)
    print(f"{'TOTAL':40s} {tb:8.3f} {te:8.3f} {tb + te:8.3f}")


if __name__ == "__main__":
    main()
