"""Headline benchmark: runs the engine's flagship queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) and prints ONE JSON
line {"metric", "value", "unit", "queries", "sf"}.

Each query runs once warm-up-free but shares one SparkSession, so JVM
startup is excluded from per-query timings (timed per query; the
headline value is the sum of per-query wall times).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod
from pyspark_scd_spark.session import get_spark

# The headline set: one per operator family — SCD pipeline, windows,
# joins+agg, top-k, sessionization, dedup/text/similarity (as added).
HEADLINE = [
    "scd_employee_all",
    "scd_employee_current",
    "scd_composite_key",
    "top1_per_group",
    "latest_per_group_maxby",
    "q1_pricing_summary",
    "q3_top_unshipped",
    "q5_nation_revenue",
    "events_sessionize",
    "window_running_sum",
    "global_topk",
    "asof_join",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_cc_clusters",
    "sim_search_topk",
    "embedding_neardup_pairs",
    "text_stats",
    "multimodal_payload_meta",
    "q8_market_share",
    "profile_table",
    "corpus_vocab_topk",
    "doc_pack_bins",
    "decontaminate_ngram",
    "text_repetition_gopher",
    "corpus_temperature_sample",
    "knn_label_vote",
    "doc_chunk_windows",
    "q6_forecast_revenue",
    "q10_returned_items",
    "q21_last_shipper",
    "graph_pagerank_topk",
    "graph_triangle_count",
    "hard_negative_mining",
    "events_ab_test",
    "basket_lift_pairs",
    "source_drift_chisq",
    "scd_merge_incremental",
    "scd_type2_intervals",
    "doc_pack_materialize",
    "corpus_weighted_sample",
    # batched (token-disjoint top-m per corpus pass) is the headline
    # BPE form: bounded sequential jobs at real vocab sizes; the
    # one-pair-per-pass serial form stays registered as the
    # pedagogical twin (bpe_train_merges).
    "bpe_train_merges_batched",
    "sim_search_ivf_pq",
    "hybrid_search_rrf",
    "embedding_neardup_pairs_ann",
    "knn_label_vote_ann",
    "dedup_semantic_clusters",
    "ann_pair_recall_report",
    "embedding_neardup_pairs_ivf",
    "knn_label_vote_ivf",
    "embedding_neardup_pairs_ivf_auto",
    "knn_label_vote_ivf_auto",
    "embedding_neardup_pairs_ann_auto",
    "knn_label_vote_ann_auto",
    "hard_negative_mining_ivf_auto",
    "multimodal_audio_energy",
    "multimodal_video_frame_stats",
    "pii_scrub_redact",
    "lm_perplexity_score",
    "dedup_paragraph_exact",
    "bloom_decontaminate",
    "tokenizer_fertility",
    "train_holdout_split",
    "quality_classifier_scores",
]


# Standing 10x tier: a heavy subset re-run against key-shifted 10x
# fixtures (tools/gen_scale.py), so round-over-round deltas measure
# throughput instead of fixed cost — 44/48 headline queries finish
# under 3s at sf0.1, where job-scheduling noise is a large share of
# the signal. Fixtures are built once and cached in /tmp.
X10_DIR = "/tmp/scale_x10_bench"
X10_HEAVY = [
    "dedup_minhash_lsh",
    "dedup_cc_clusters",
    "knn_label_vote",
    "embedding_neardup_pairs",
    "hard_negative_mining",
    "q21_last_shipper",
    "graph_pagerank_topk",
    "basket_lift_pairs",
    "scd_merge_incremental",
    "bpe_train_merges_batched",
    "embedding_neardup_pairs_ann",
    "knn_label_vote_ann",
    "dedup_semantic_clusters",
    "embedding_neardup_pairs_ivf",
    # the IVF/LSH tier contrast on identical duplicate-heavy data:
    # the pinned-planes LSH kNN entry is the x10 tier's heaviest row
    # while the IVF twin handles the same fixture in seconds
    "knn_label_vote_ivf",
    # balanced auto_cells (k = probe*sqrt(n)) twins: the IVF tier's
    # SCALE form — the pinned-k=8 entries above stay as the parity
    # forms, quadratic within cells by construction; these measure
    # the O(n^1.5*d) path the round-4 study validated
    "embedding_neardup_pairs_ivf_auto",
    "knn_label_vote_ivf_auto",
    # the LSH scale twin: auto_planes keeps bucket population (and
    # per-row candidate work) constant as n grows — measured 1.9x at
    # x10 where the pinned-planes parity form is the tier's wall
    "embedding_neardup_pairs_ann_auto",
    # scale twins for the two heaviest x10 rows (the deliberate
    # exact-grid twins knn_label_vote / hard_negative_mining): the
    # directed audits under auto_planes / auto_cells
    "knn_label_vote_ann_auto",
    "hard_negative_mining_ivf_auto",
    # the round-6 corpus-prep family: all scan-shaped by design
    # (gram-keyed aggregates, scan-side Bloom probe, one window +
    # one aggregate, per-step 4-value aggregates) — benched at x10
    # to pin the ~linear growth the docstrings claim
    "lm_perplexity_score",
    "dedup_paragraph_exact",
    "bloom_decontaminate",
    "quality_classifier_scores",
]


def _ensure_x10(spark) -> bool:
    """Build (once) the 10x fixtures for every testdata table; reuse
    across rounds via a _DONE marker."""
    import traceback

    marker = os.path.join(X10_DIR, "_DONE")
    if os.path.exists(marker):
        return True
    try:
        sys.path.insert(0, os.path.join(os.path.dirname(
            os.path.abspath(__file__)), "tools"))
        from gen_scale import KEY_COLS, build  # noqa: PLC0415

        for t in KEY_COLS:
            build(spark, t, 10, X10_DIR)
        with open(marker, "w") as f:
            f.write("ok\n")
        return True
    except Exception:
        traceback.print_exc(file=sys.stderr)
        return False


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = -1.0

    spark = get_spark(app_name="bench")
    queries = entrymod.queries()

    # Untimed warm-up at the smallest SF: JIT/codegen/parquet-footer
    # costs land here, so the timed section measures throughput, not
    # JVM startup (first-query penalty measured at ~5s vs 1s steady).
    for name in HEADLINE:
        if name in queries:
            queries[name](spark, "/root/testdata/sf0.001").count()
    spark.catalog.clearCache()

    # Median of 3 runs per query: single-shot timings at sf0.1 carry
    # run-to-run environmental spread (page cache, GC, scheduler) on
    # the same order as real plan changes for the ~1s mid-pack, so
    # round-over-round deltas were weather. The x10 tier below stays
    # single-shot (its queries are seconds-long, spread is relatively
    # small, and 3x its wall would dominate the round budget).
    timings: dict[str, float] = {}
    for name in HEADLINE:
        if name not in queries:
            continue
        runs = []
        for _ in range(3):
            t0 = time.time()
            df = queries[name](spark, sf_dir)
            n = df.count()
            runs.append(time.time() - t0)
            assert n >= 0
            # Some operators cache intermediates (shingle sets, edge
            # sets) and cannot unpersist before their consumer
            # executes; drop those blocks here so a query's leftover
            # cache never distorts the next timing (measured: a leaked
            # 260k-row cache pushed an unrelated BLAS query from 0.8s
            # to 6s via GC).
            spark.catalog.clearCache()
        timings[name] = round(sorted(runs)[1], 3)

    total = round(sum(timings.values()), 3)

    # 10x tier (only when benching the standard sf0.1 dir — a custom
    # SPARK_GRAFT_SF_DIR means the caller wants that tier alone)
    x10: dict[str, float] = {}
    if sf == 0.1 and _ensure_x10(spark):
        for name in X10_HEAVY:
            if name not in queries:
                continue
            # SCALING.md's steady-state protocol: report the SECOND
            # run. Single-shot x10 readings carry the previous heavy
            # query's GC/memory-pressure wake (measured: 15.3s for a
            # query whose steady state is 4.5s, right after the two
            # exact-grid monsters) — the first run absorbs it.
            runs = []
            for _ in range(2):
                t0 = time.time()
                n = queries[name](spark, X10_DIR).count()
                runs.append(time.time() - t0)
                assert n >= 0
                spark.catalog.clearCache()
            x10[name] = round(runs[-1], 3)

    out = {
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }
    if x10:
        out["queries_x10"] = x10
        out["value_x10"] = round(sum(x10.values()), 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
