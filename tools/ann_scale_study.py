"""ANN-vs-exact study at ≥100k vectors (SCALING.md, round 4).

Runs the dense near-dup tier against a gen_vectors.py corpus:

- exact blocked-BLAS grid (ground truth; O(n²) matmul)
- ANN tier under auto_planes (the registered 100 TB default shape)
- per-band recall of the ANN pair set vs the exact set
- candidate-volume and wall-clock, steady-state (second run)

Usage: python tools/ann_scale_study.py /tmp/vec10k /tmp/vec100k
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from pyspark_scd_spark.operators import similarity as S  # noqa: E402
from pyspark_scd_spark.session import get_spark  # noqa: E402

THRESHOLD = 0.55
BANDS = [0.55, 0.65, 0.75, 0.85, 0.95]


def band_col():
    c = F.col("cosine")
    expr = F.lit(BANDS[0])
    for b in BANDS[1:]:
        expr = F.when(c >= b, F.lit(b)).otherwise(expr)
    return expr


def run_tier(spark, d: str) -> None:
    e = spark.read.parquet(f"{d}/embeddings.parquet")
    n = e.count()
    planes = S.auto_planes(n)
    print(f"\n## tier {d}: n={n}, auto_planes={planes}")

    def timed(name, fn):
        t0 = time.time()
        out = fn()
        cnt = out.count()
        cold = time.time() - t0
        t0 = time.time()
        out = fn()
        cnt = out.count()
        steady = time.time() - t0
        print(f"{name}: rows={cnt} cold={cold:.1f}s steady={steady:.1f}s")
        return out

    cand = timed(
        "lsh_candidates(auto)",
        lambda: S.lsh_candidates(e, 64, None, 8, True),
    )
    ann = timed(
        "neardup_ann(auto)",
        lambda: S.embedding_neardup_pairs_ann(e, THRESHOLD, 64, None, 8),
    ).localCheckpoint()
    exact = timed(
        "neardup_grid_exact",
        lambda: S.embedding_neardup_pairs_grid(e, THRESHOLD),
    ).localCheckpoint()
    rec = (
        exact.join(
            ann.select("id_a", "id_b", F.lit(1).alias("__hit")),
            ["id_a", "id_b"],
            "left",
        )
        .select(
            band_col().alias("band"),
            F.coalesce("__hit", F.lit(0)).alias("h"),
        )
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_true"),
            F.sum("h").alias("n_hit"),
            F.round(F.sum("h") / F.count(F.lit(1)), 4).alias("recall"),
        )
        .orderBy("band")
    )
    for r in rec.collect():
        print(
            f"band>={r['band']}: true={r['n_true']} hit={r['n_hit']} "
            f"recall={r['recall']}"
        )
    spark.catalog.clearCache()


def main() -> None:
    spark = get_spark(app_name="ann_scale_study")
    for d in sys.argv[1:]:
        run_tier(spark, d)


if __name__ == "__main__":
    main()
