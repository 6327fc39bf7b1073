"""ANN-vs-exact study at ≥100k vectors (SCALING.md, round 4).

Runs the dense near-dup tiers against a gen_vectors.py corpus:

- exact blocked-BLAS grid (ground truth; O(n²) matmul)
- hyperplane-LSH ANN tier under auto_planes (round-3 default shape)
- IVF tier (auto_cells, BLAS fold) at a sweep of probe counts, plus
  an optional kmeans-trained-centroid config
- per-band recall of each approximate pair set vs the exact set
- candidate-volume and wall-clock, steady-state (second run)

Env knobs: ANN_STUDY_SKIP_LSH=1 (skip the LSH tier — it is
near-quadratic on clustered corpora and dominates wall at ≥100k),
ANN_STUDY_SKIP_EXACT=1 (skip ground truth + recall; wall/candidate
slope only — for tiers where O(n²) is genuinely infeasible),
ANN_STUDY_PROBES=2,4 (IVF probe sweep), ANN_STUDY_TRAINED=1
(add a kmeans-trained-centroid IVF config, 3 Lloyd iterations),
ANN_STUDY_SKIP_COUNTS=1 (skip the candidate-count jobs — they
MATERIALIZE the distinct pair set the cells-verify path never
builds: ~4B pairs ≈ 70 GB of raw shuffle at 1M vectors/probe=4),
ANN_STUDY_EXACT_ONLY=1 (run only the exact grid — for a clean
ground-truth wall in a fresh session; heavy approx jobs measurably
contaminate later timings via GC/page-cache pressure: the same
exact grid measured 48s after light jobs and 136s after a
712M-candidate count at 300k).

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


def ivf_candidate_count(e, centroids, n_probe: int) -> int:
    """Distinct same-cell candidate pairs for an IVF config — the
    volume the verify stage pays for."""
    cells = S._ivf_cell_rows(
        e, centroids, n_probe, "vec_id", "embedding", fold="blas"
    ).localCheckpoint()
    a = cells.select(F.col("vec_id").alias("id_a"), "cell")
    b = cells.select(F.col("vec_id").alias("id_b"), "cell")
    return (
        a.join(b, "cell")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
        .count()
    )


def run_tier(spark, d: str) -> None:
    e = spark.read.parquet(f"{d}/embeddings.parquet")
    n = e.count()
    planes = S.auto_planes(n)
    k = S.auto_cells(n)
    print(f"\n## tier {d}: n={n}, auto_planes={planes}, auto_cells={k}")

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

    approxes: list[tuple[str, object]] = []
    skip_counts = os.environ.get("ANN_STUDY_SKIP_COUNTS", "") != ""
    if os.environ.get("ANN_STUDY_EXACT_ONLY", "") != "":
        timed(
            "neardup_grid_exact",
            lambda: S.embedding_neardup_pairs_grid(e, THRESHOLD),
        )
        spark.catalog.clearCache()
        return

    if os.environ.get("ANN_STUDY_SKIP_LSH", "") == "":
        timed(
            "lsh_candidates(auto)",
            lambda: S.lsh_candidates(e, 64, None, 8, True),
        )
        ann = timed(
            "neardup_ann(auto)",
            lambda: S.embedding_neardup_pairs_ann(e, THRESHOLD, 64, None, 8),
        ).localCheckpoint()
        approxes.append(("lsh", ann))

    probes = [
        int(p)
        for p in os.environ.get("ANN_STUDY_PROBES", "2,4").split(",")
    ]
    # first-k centroids, shared across probe configs (the registry
    # default); collected once so timing isolates the probe knob
    first_k = [
        r["__v"]
        for r in e.orderBy("vec_id")
        .limit(k)
        .select(F.col("embedding").cast("array<double>").alias("__v"))
        .collect()
    ]
    for p in probes:
        if not skip_counts:
            nc = ivf_candidate_count(e, first_k, p)
            print(f"ivf probe={p}: candidates={nc}")
        ivf = timed(
            f"neardup_ivf(probe={p})",
            lambda p=p: S.embedding_neardup_pairs_ivf(
                e, THRESHOLD, centroids=first_k, n_probe=p, fold="blas"
            ),
        ).localCheckpoint()
        approxes.append((f"ivf_p{p}", ivf))

    if os.environ.get("ANN_STUDY_TRAINED", "") != "":
        t0 = time.time()
        cents, _ = S.kmeans_train(e, k=k, max_iter=3, tol=0.0)
        print(f"kmeans_train(k={k}, 3 iters): {time.time() - t0:.1f}s")
        if not skip_counts:
            nc = ivf_candidate_count(e, cents, 2)
            print(f"ivf trained probe=2: candidates={nc}")
        ivf_t = timed(
            "neardup_ivf(trained, probe=2)",
            lambda: S.embedding_neardup_pairs_ivf(
                e, THRESHOLD, centroids=cents, n_probe=2, fold="blas"
            ),
        ).localCheckpoint()
        approxes.append(("ivf_trained_p2", ivf_t))

    if os.environ.get("ANN_STUDY_SKIP_EXACT", "") != "":
        spark.catalog.clearCache()
        return
    if os.environ.get("ANN_STUDY_TRUTH_ONCE", "") != "":
        # ground truth for recall only — wall comes from a dedicated
        # ANN_STUDY_EXACT_ONLY run, so one untimed pass suffices
        t0 = time.time()
        exact = S.embedding_neardup_pairs_grid(
            e, THRESHOLD
        ).localCheckpoint()
        print(
            f"neardup_grid_exact(truth-once): rows={exact.count()} "
            f"wall={time.time() - t0:.1f}s"
        )
    else:
        exact = timed(
            "neardup_grid_exact",
            lambda: S.embedding_neardup_pairs_grid(e, THRESHOLD),
        ).localCheckpoint()

    def recall_of(approx, name):
        rec = (
            exact.join(
                approx.select("id_a", "id_b", F.lit(1).alias("__hit")),
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
                f"{name} band>={r['band']}: true={r['n_true']} "
                f"hit={r['n_hit']} recall={r['recall']}"
            )

    for name, approx in approxes:
        recall_of(approx, name)
    spark.catalog.clearCache()


def main() -> None:
    spark = get_spark(app_name="ann_scale_study")
    for d in sys.argv[1:]:
        run_tier(spark, d)


if __name__ == "__main__":
    main()
