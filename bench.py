"""Headline benchmark: runs the engine's flagship queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) and prints ONE JSON
line {"metric", "value", "unit", "queries", "sf"} as the FINAL stdout
line, guaranteed under the driver's 2000-char tail window (r05/r06
landed "parsed": null because the line outgrew the window and its head
was truncated). The full-detail record (x10/x3 tiers, 3-dp timings)
goes to BENCH_FULL.json beside this file and to an earlier stdout line.

Timing consumer: a noop-format write, NOT df.count() — count() lets
the optimizer PRUNE aggregate expressions (NOTES trap: a groupBy's
md5/collect_list never ran under .count()), so r<=6 under-measured
queries whose final stage carries expensive projections. The noop sink
materializes every output column JVM-side with zero I/O.
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
    # round 7
    "global_dense_rank",
    "scd_schema_evolution",
    "ivf_drift_retrain",
    "multimodal_png_meta",
    "multimodal_gif_meta",
    # round 8
    "multimodal_jpeg_meta",
    "multimodal_flac_meta",
    "dedup_exact_substrings",
    "corpus_release",
    # round 10: the multimodal perceptual-dedup triple + the
    # deterministic sketches
    "image_phash_neardup",
    "video_phash_neardup",
    "audio_fingerprint_neardup",
    # round 11: the 124-bit MIH twin (31-bit bands; the scale form
    # for >10^6 distinct fingerprints, SCALING.md round 11)
    "audio_fingerprint_neardup_wide",
    # round 12: the same wide-MIH remedy applied to video — the r11
    # decade study measured the narrow family's band-candidate floor
    # (n²/2^16) at 72% of x300 wall; 31-bit bands move it to n²/2^31
    # — and to image (124-bit pHash from the 8x16 DCT block)
    "video_phash_neardup_wide",
    "image_phash_neardup_wide",
    "hll_cardinality_report",
    "hll_cardinality_by_group",
    # round 12 set change (r11 VERDICT item 4): quantile_sampled_report
    # — the exact-percentile AUDIT twin, 8.5s of r11's headline — moved
    # to the X3_EXACT audit tier; no 100 TB caller runs the
    # value-buffering form, so benching it in the headline inflates the
    # round-over-round number with a non-production query. The sketch
    # form below is the headline representative of the family (the
    # common-set subtotal handles the removal automatically: it
    # compares only queries present in BOTH rounds' records).
    # round 11: the mergeable-quantile replacement for the sampled
    # report's exact percentile(), and the state-heavy two-phase
    # distinct aggregation under the deliberate hot key
    "quantile_sketch_report",
    "quantile_sketch_by_group",
    "agg_hotkey_distinct",
]

# r14 (VERDICT r13 item 8): the three wide-incremental perceptual
# forms (inherited ba7aef8, oracle-green since r13) get a scale
# checkpoint at x10 so their store-growth behavior is tracked.
X10_INCREMENTAL_WIDE = [
    "image_phash_incremental_wide",
    "audio_fingerprint_incremental_wide",
    "video_phash_incremental_wide",
]


# Standing scale tiers re-run against key-shifted fixtures
# (tools/gen_scale.py), so round-over-round deltas measure throughput
# instead of fixed cost — most headline queries finish under 3s at
# sf0.1, where job-scheduling noise is a large share of the signal.
# Fixtures are built once and cached in /tmp.
X10_DIR = "/tmp/scale_x10_bench"
X3_DIR = "/tmp/scale_x3_bench"
X10_HEAVY = [
    "dedup_minhash_lsh",
    "dedup_cc_clusters",
    "embedding_neardup_pairs",
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
    # pinned-k_cells=8 parity form beside its balanced auto twin
    "knn_label_vote_ivf",
    # balanced auto_cells (k = probe*sqrt(n)) twins: the IVF tier's
    # SCALE form — the pinned-k=8 entries above stay as the parity
    # forms, quadratic within cells by construction; these measure
    # the O(n^1.5*d) path the round-4 study validated
    "embedding_neardup_pairs_ivf_auto",
    "knn_label_vote_ivf_auto",
    # the LSH scale twin: auto_planes keeps bucket population (and
    # per-row candidate work) constant as n grows
    "embedding_neardup_pairs_ann_auto",
    "knn_label_vote_ann_auto",
    "hard_negative_mining_ivf_auto",
    # daily-ingest near-dup, balanced-cells scale form (the pinned
    # k=8 parity sibling measured quadratic at the r8 x100 study)
    "embedding_neardup_incremental_ivf_auto",
    # the round-6 corpus-prep family: all scan-shaped by design
    # (gram-keyed aggregates, scan-side Bloom probe, one window +
    # one aggregate, per-step 4-value aggregates) — benched at x10
    # to pin the ~linear growth the docstrings claim
    "lm_perplexity_score",
    "dedup_paragraph_exact",
    "bloom_decontaminate",
    "quality_classifier_scores",
    # full-width global ranking: the no-single-partition shape must
    # hold its ~linear growth as rows x10
    "global_dense_rank",
    # round 10: dangling-mass PageRank (does the per-pass 1-row
    # dangling aggregate change the decade vs graph_pagerank_topk?)
    # and the deliberate-hot-key salted aggregation
    "graph_pagerank_dangling",
    "agg_salted_hotkey",
    # round 11: the state-heavy two-phase distinct twin and the
    # mergeable quantile sketch — both single-digit-bucket exchanges
    # whose decade should be scan-bound
    "agg_hotkey_distinct",
    "quantile_sketch_report",
]
# The two deliberate exact-quadratic ground-truth twins: their answers
# are pinned by parity tests and their x10 runs burned ~31s of the
# tier for no new information (O(n²) is O(n²)). They keep a scale
# checkpoint at x3 — still exact ground truth for recall audits —
# while their _ann/_ivf/auto twins carry the x10 scale story.
X3_EXACT = [
    "knn_label_vote",
    "hard_negative_mining",
    # exact-percentile audit twin of quantile_sketch_report (r12 move
    # out of the headline set — see the note in HEADLINE): still
    # benched every round as ground truth, at the audit tier where
    # the other deliberate exact-but-unscalable twins live.
    "quantile_sampled_report",
]

# Driver tail window: the final stdout line must fit inside it whole,
# or the driver records parsed:null (r05/r06 failure mode).
TAIL_BUDGET = 1900


def _ensure_scale(spark, copies: int, out_dir: str) -> tuple[bool, bool]:
    """Build (once) key-shifted fixtures for every testdata table;
    reuse across rounds via a _DONE marker. Returns (ok, fresh):
    ``fresh`` means the fixture was built THIS call — the caller must
    run one untimed full-tier pass before timing (the r7 driver rerun
    recorded knn_label_vote_ivf at 12.5s where steady state is ~4s:
    a rebuild leaves the process with fixture-write GC pressure and
    cold per-query code paths that the second-of-2 protocol alone
    does not absorb)."""
    import traceback

    marker = os.path.join(out_dir, "_DONE")
    if os.path.exists(marker):
        return True, False
    try:
        sys.path.insert(0, os.path.join(os.path.dirname(
            os.path.abspath(__file__)), "tools"))
        from gen_scale import KEY_COLS, build  # noqa: PLC0415

        for t in KEY_COLS:
            build(spark, t, copies, out_dir)
        with open(marker, "w") as f:
            f.write("ok\n")
        return True, True
    except Exception:
        traceback.print_exc(file=sys.stderr)
        return False, False


def _consume(df) -> None:
    """Materialize EVERY output column: noop-format write (JVM-side,
    zero I/O, nothing pruned). count() is not a valid consumer here —
    it prunes aggregate expressions (see module docstring)."""
    df.write.format("noop").mode("overwrite").save()


def _release(spark) -> None:
    """clearCache PLUS unpersist of leftover RDD blocks between timed
    runs. clearCache() only drops catalog/SQL-cached relations — NOT
    the RDD blocks pinned by operators' localCheckpoint calls (r13
    finding: at the x300 diverse tier, back-to-back runs of the wide
    video neardup grew 58 -> 74 -> 113s as each run's 4.5M-row
    checkpointed frames table stayed pinned; GC churn from the pile
    contaminated every later reading). Best-effort via the private
    _jsc map, same mechanism as graph.py's tracked checkpoints."""
    spark.catalog.clearCache()
    try:
        jmap = spark.sparkContext._jsc.getPersistentRDDs()
        for rid in list(jmap.keySet().toArray()):
            jrdd = jmap.get(rid)
            if jrdd is not None:
                jrdd.unpersist(False)
    except Exception:
        pass


def _cpu_calibration() -> float:
    """Fixed-work single-thread CPU benchmark (~1.2s on this VM class
    when healthy): sha256 over 64 KiB, 20k rounds. Emitted as
    cal_1t_sec so round-over-round wall-clock deltas can be divided
    by machine speed — round 11 measured UNTOUCHED queries 3-5x
    slower than round 10's committed run on a nominally idle VM
    (hypervisor contention), which is indistinguishable from a plan
    regression without an in-record calibration constant."""
    import hashlib

    t0 = time.time()
    b = b"x" * 65536
    for _ in range(20000):
        b = hashlib.sha256(b[:65536]).digest() * 2048
    return round(time.time() - t0, 3)


def _steal_ticks() -> int:
    """Cumulative hypervisor steal ticks (field 8 of /proc/stat cpu
    line); differences across the timed section expose noisy-
    neighbor windows that are invisible from load average."""
    try:
        with open("/proc/stat") as f:
            return int(f.readline().split()[8])
    except Exception:
        return -1


def _clk_tck() -> float:
    """Kernel ticks-per-second for /proc/stat fields (USER_HZ).
    sysconf'd instead of the hardcoded 100 the first cut used."""
    try:
        return float(os.sysconf("SC_CLK_TCK"))
    except Exception:
        return 100.0


def _cal_worker(_i: int) -> int:
    """1/8 of the _cpu_calibration work loop — module-level so the
    multiprocessing pool can pickle it."""
    import hashlib

    b = b"x" * 65536
    for _ in range(20000 // 8):
        b = hashlib.sha256(b[:65536]).digest() * 2048
    return 0


def _cpu_calibration_parallel(n_procs: int = 0) -> float:
    """The single-thread calibration run on EVERY core at once: wall
    seconds for n_procs concurrent PROCESSES each doing 1/8 of the 1t
    rounds. Round-11 adjudication gap this closes: cal_1t_sec read
    healthy (1.14s) in a record whose 32-wide query sections ran 22%
    slow — contention that only bites when all cores are busy is
    invisible to a single-thread probe. Processes, NOT threads: the
    loop's Python-side bytes ops hold the GIL between hash calls, so
    a thread pool measured GIL convoy (13.7s) instead of CPU
    availability. Healthy reading ≈ cal_1t/8 + fork overhead
    (~0.3-0.6s on an idle 32-vCPU box); readings at several× that
    mean the vCPUs are being time-sliced against a neighbor."""
    import multiprocessing as mp

    if n_procs <= 0:
        n_procs = os.cpu_count() or 1
    try:
        ctx = mp.get_context("fork")
    except ValueError:
        ctx = mp.get_context()
    t0 = time.time()
    with ctx.Pool(n_procs) as pool:
        pool.map(_cal_worker, range(n_procs))
    return round(time.time() - t0, 3)


def _prev_line_queries() -> set:
    """Query names in the PREVIOUS round's driver-facing line.

    The driver's round-over-round comparison flags a query present in
    last round's line but absent from this one as dropped_from_bench —
    in r13 five queries got FAST enough to fall below the slowest-first
    truncation cutoff and were falsely flagged dropped (VERDICT r13
    item 2a). Truncation now keeps last round's keys first, so the
    driver's comparable set never shrinks because a query improved.
    Reads the highest-numbered committed BENCH_r*.json record."""
    import glob
    import re

    best, names = -1, set()
    here = os.path.dirname(os.path.abspath(__file__))
    for p in glob.glob(os.path.join(here, "BENCH_r*.json")):
        m = re.match(r"BENCH_r(\d+)\.json$", os.path.basename(p))
        if not m or int(m.group(1)) <= best:
            continue
        try:
            with open(p) as f:
                q = (json.load(f).get("parsed") or {}).get("queries")
        except Exception:
            continue
        if q:
            best, names = int(m.group(1)), set(q)
    return names


def _final_line(out: dict) -> str:
    """The driver-facing JSON line, guaranteed <= TAIL_BUDGET chars:
    compact separators, then progressively coarser per-query decimals,
    then truncation of the queries dict — keeping (1) every query in
    the previous round's driver line (see _prev_line_queries), then
    (2) the slowest others, so a query never leaves the driver's
    comparable set by getting faster (full detail is always in
    BENCH_FULL.json / the earlier stdout line)."""
    for nd in (3, 2, 1):
        cand = dict(out)
        cand["queries"] = {
            k: round(v, nd) for k, v in out["queries"].items()
        }
        s = json.dumps(cand, separators=(",", ":"))
        if len(s) <= TAIL_BUDGET:
            return s
    # Truncate: previous-line keys are load-bearing (the driver
    # diffs them round-over-round), the rest slowest-first.
    must = _prev_line_queries() & set(out["queries"])
    base = sorted(
        ((k, out["queries"][k]) for k in must), key=lambda kv: -kv[1]
    )
    rest = sorted(
        (
            (k, v)
            for k, v in out["queries"].items()
            if k not in must
        ),
        key=lambda kv: -kv[1],
    )
    n_all = len(base) + len(rest)
    for keep in range(len(rest), -1, -1):
        cand = dict(out)
        cand["queries"] = {
            k: round(v, 1) for k, v in base + rest[:keep]
        }
        cand["queries_omitted"] = n_all - len(base) - keep
        s = json.dumps(cand, separators=(",", ":"))
        if len(s) <= TAIL_BUDGET:
            return s
    # Even the previous-line set alone does not fit (only possible if
    # the comparable set itself outgrows the window): drop its fastest
    # entries last, so the slow movers the driver watches survive.
    for keep in range(len(base), 0, -1):
        cand = dict(out)
        cand["queries"] = {k: round(v, 1) for k, v in base[:keep]}
        cand["queries_omitted"] = n_all - keep
        s = json.dumps(cand, separators=(",", ":"))
        if len(s) <= TAIL_BUDGET:
            return s
    return json.dumps(
        {k: v for k, v in out.items() if k != "queries"},
        separators=(",", ":"),
    )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = -1.0
    # The core count this bench runs at (the session builds
    # local[$SPARK_GRAFT_CPUS]); recorded in the output and used to
    # route non-default-core runs to a suffixed record file (r13: the
    # driver's 8-core scaling run clobbered the canonical 32-core
    # BENCH_FULL.json, so the next common-set comparison would have
    # silently baselined against 8-core numbers — VERDICT r13 item 2b,
    # the cpu-axis twin of the r12 sf-clobber).
    machine_cpus = os.cpu_count() or 1
    bench_cpus = int(
        os.environ.get("SPARK_GRAFT_CPUS") or machine_cpus
    )

    spark = get_spark(app_name="bench")
    queries = entrymod.queries()

    # Untimed warm-up at the smallest SF: JIT/codegen/parquet-footer
    # costs land here, so the timed section measures throughput, not
    # JVM startup (first-query penalty measured at ~5s vs 1s steady).
    for name in HEADLINE + X3_EXACT:
        if name in queries:
            _consume(queries[name](spark, "/root/testdata/sf0.001"))
    _release(spark)

    # Median of 3 runs per query: single-shot timings at sf0.1 carry
    # run-to-run environmental spread (page cache, GC, scheduler) on
    # the same order as real plan changes for the ~1s mid-pack, so
    # round-over-round deltas were weather. The scale tiers below stay
    # at second-of-2 (their queries are seconds-long, spread is
    # relatively small, and 3x their wall would dominate the budget).
    cal_1t = _cpu_calibration()
    cal_nt = _cpu_calibration_parallel()
    steal0 = _steal_ticks()
    wall0 = time.time()
    # r13 (VERDICT r12 item 2): per-query MIN of the 3 runs is the
    # COMMITTED metric — the r12 adjudication proved it reproducible
    # to 0.2% across identical-code rounds while each single run
    # inflates a different query subset (contamination is one-sided:
    # GC pauses and noisy neighbors only ever ADD time). The median
    # ships beside it as the secondary line; `queries`/`value` now
    # mean min-of-3.
    timings: dict[str, float] = {}
    timings_med: dict[str, float] = {}
    for name in HEADLINE:
        if name not in queries:
            continue
        runs = []
        for _ in range(3):
            t0 = time.time()
            _consume(queries[name](spark, sf_dir))
            runs.append(time.time() - t0)
            # Some operators cache intermediates (shingle sets, edge
            # sets) and cannot unpersist before their consumer
            # executes; drop those blocks here so a query's leftover
            # cache never distorts the next timing (measured: a leaked
            # 260k-row cache pushed an unrelated BLAS query from 0.8s
            # to 6s via GC).
            _release(spark)
        runs.sort()
        timings[name] = round(runs[0], 3)
        timings_med[name] = round(runs[1], 3)
    # steal window closed HERE so steal_pct covers exactly the
    # headline section (the first cut read /proc/stat after the
    # x10/x3 tiers, so the published number spanned the whole run
    # while its comment claimed the headline section).
    steal1 = _steal_ticks()
    headline_wall = time.time() - wall0
    # gauges re-read AFTER the headline section: weather moves
    # mid-run (r12 measured back-to-back identical-code runs 26%
    # apart with the PRE-run gauges healthy both times; the post-run
    # cal_nt had moved 40% — the pre/post pair brackets the section)
    cal_1t_post = _cpu_calibration()
    cal_nt_post = _cpu_calibration_parallel()

    total = round(sum(timings.values()), 3)

    # Round-over-round comparability (VERDICT r10 item 8): the
    # headline set gains/loses queries between rounds, so the raw
    # total conflates plan changes with set changes. Read the PRIOR
    # round's full record (committed BENCH_FULL.json, about to be
    # overwritten below) and publish the subtotal over the common
    # query set as a first-class metric — no more hand set
    # reconciliation to compare rounds.
    full_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_FULL.json"
    )
    common_fields: dict = {}
    try:
        with open(full_path) as f:
            prev = json.load(f)
        # Compare min against min when the prior record carries one
        # (r13+); a pre-r13 record's `queries` dict is per-query
        # MEDIANS — still comparable at a healthy window (median ≈
        # min there, r12 adjudication), but the record says which
        # metric the prev side is so the reader never guesses.
        if "queries_med" in prev:
            pq, prev_metric = prev.get("queries") or {}, "min"
        else:
            pq, prev_metric = prev.get("queries") or {}, "median"
        common = sorted(set(pq) & set(timings))
        # Only meaningful when this run uses the same core count as
        # the canonical record (the r13 c8 record published a
        # common-set delta that was really 8-vs-32 cores).
        if common and prev.get("sf") == sf and bench_cpus == machine_cpus:
            common_fields = {
                "common_n": len(common),
                "common_prev_metric": prev_metric,
                "common_prev_total": round(
                    sum(pq[k] for k in common), 3
                ),
                "common_now_total": round(
                    sum(timings[k] for k in common), 3
                ),
            }
    except Exception:
        pass

    # Scale tiers (only when benching the standard sf0.1 dir — a custom
    # SPARK_GRAFT_SF_DIR means the caller wants that tier alone).
    # Variance-bounded protocol (round 10): the x10 tier publishes the
    # MEDIAN of 3 timed runs plus the run spread (max-min) per query.
    # Two consecutive rounds of single-reading wobble in the pinned-k
    # IVF family (r7: 12.5s vs 3.6s committed; r9: 3.2s -> 10.4s with
    # zero code change) showed one steady-state reading per query is
    # too thin to distinguish plan regressions from GC/scheduler
    # weather on seconds-long queries.
    def _tier(
        names: list, fixture_dir: str, n_runs: int = 3
    ) -> tuple[dict, dict, dict]:
        # TWO untimed full-tier warm passes first. Round-10 probe of
        # the volatile family (6 back-to-back runs, idle machine):
        # embedding_neardup_pairs_ann 17.3/5.1/4.8/3.3/3.5/2.9s —
        # the cogroup+GEMM paths converge over ~4-5 executions, not
        # 2, so the old warm+second-of-2 protocol sampled the
        # convergence curve's knee and round-over-round deltas there
        # were protocol position, not plan changes (r9's
        # embedding_neardup_pairs_ivf "3.2->10.4 regression"
        # reproduced back to ~3.0s once warm). Two warm passes put
        # the 3 timed runs on the flat; the published min/spread
        # expose any reading that still is not.
        for name in names:
            if name in queries:
                for _ in range(2):
                    _consume(queries[name](spark, fixture_dir))
                    _release(spark)
        res: dict[str, float] = {}
        spread: dict[str, float] = {}
        lo: dict[str, float] = {}
        for name in names:
            if name not in queries:
                continue
            runs = []
            for _ in range(n_runs):
                t0 = time.time()
                _consume(queries[name](spark, fixture_dir))
                runs.append(time.time() - t0)
                _release(spark)
            runs.sort()
            # median for odd n; faster-of-2 for the x3 tier (its two
            # exact-quadratic queries are post-warm, so the lower
            # reading is the steady state, matching the old protocol).
            res[name] = round(runs[(len(runs) - 1) // 2], 3)
            spread[name] = round(runs[-1] - runs[0], 3)
            # the min is the cleanest steady-state estimator under
            # one-sided contamination (GC pauses and neighbors only
            # ever ADD time); published beside the median so a fat
            # median with a slim min reads as weather, not regression
            lo[name] = round(runs[0], 3)
        return res, spread, lo

    x10: dict[str, float] = {}
    x10_spread: dict[str, float] = {}
    x10_min: dict[str, float] = {}
    x3: dict[str, float] = {}
    if sf == 0.1:
        if _ensure_scale(spark, 10, X10_DIR)[0]:
            x10, x10_spread, x10_min = _tier(
                X10_HEAVY + X10_INCREMENTAL_WIDE, X10_DIR
            )
        if _ensure_scale(spark, 3, X3_DIR)[0]:
            x3, _, _ = _tier(X3_EXACT, X3_DIR, n_runs=2)

    out = {
        "metric": "headline_queries_total_wall_min3",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "cpus": bench_cpus,
        # secondary line: per-run medians and their sum — a fat
        # median over a slim min reads as weather, not regression
        "value_med": round(sum(timings_med.values()), 3),
    }
    out.update(common_fields)
    # Gauge-health verdict for the window (VERDICT r12 item 2): the
    # round-over-round comparison is only meaningful when BOTH
    # bracketing gauge readings sit inside the rolling healthy bands
    # measured across r10-r13 (cal_1t 0.89-1.21s healthy vs 1.34s in
    # the r12 slow window; cal_nt 0.2-0.5s healthy, several× that
    # when vCPUs are time-sliced against a neighbor). r14: the cal_nt
    # bound tightened 1.0 -> 0.6 (VERDICT r13 item 7 — the r13
    # baseline window passed the old gate at cal_nt_pre 0.991, a
    # contended reading that inflated the baseline and therefore the
    # round's improvement claim; 0.6 keeps the healthy band plus
    # fork-overhead slack while rejecting that window).
    out["gauge_healthy"] = bool(
        max(cal_1t, cal_1t_post) <= 1.30
        and max(cal_nt, cal_nt_post) <= 0.6
    )
    # Machine-health context for the record (see _cpu_calibration):
    # cal_1t_sec is the fixed-work constant; steal_pct is hypervisor
    # steal across the headline section as a share of total CPU.
    out["cal_1t_sec"] = cal_1t
    # parallel-calibration wall (all cores busy at once) — the probe
    # that can see contention a single thread cannot (r11 VERDICT
    # adjudication item); healthy ≈ 0.2-0.5s on this VM class.
    out["cal_nt_sec"] = cal_nt
    out["cal_1t_post_sec"] = cal_1t_post
    out["cal_nt_post_sec"] = cal_nt_post
    if steal0 >= 0 and steal1 >= steal0:
        cpus = os.cpu_count() or 1
        out["steal_pct"] = round(
            100.0 * (steal1 - steal0) / _clk_tck()
            / (headline_wall * cpus),
            2,
        )
    # full-record only (popped from the driver line): the per-query
    # medians that back value_med, and the r13 min-metric marker
    out["queries_med"] = timings_med
    if x10:
        out["queries_x10"] = x10
        out["value_x10"] = round(sum(x10.values()), 3)
        # per-query max-min across the 3 timed runs: a reading whose
        # spread rivals its median is weather, not a plan delta.
        out["spread_x10"] = x10_spread
        out["min_x10"] = x10_min
    if x3:
        out["queries_x3"] = x3
        out["value_x3"] = round(sum(x3.values()), 3)

    # Full-detail record: file + an early stdout line (human tail
    # inspection); neither needs to fit any window. BENCH_FULL.json
    # is the canonical sf0.1 full-core record that feeds next round's
    # common-set comparison — a bench run at any OTHER SF (e.g. a
    # verify pass at sf0.01) writes a suffixed file instead of
    # clobbering the baseline (r12: an sf0.01 run destroyed the r11
    # record and the comparison had to be restored from git), and so
    # does a run at any other CORE COUNT (r13: the driver's 8-core
    # scaling run overwrote the 32-core record — the same bug class
    # on the cpu axis, VERDICT r13 item 2b).
    if sf != 0.1:
        full_path = full_path.replace(
            "BENCH_FULL.json", f"BENCH_FULL_sf{sf}.json"
        )
    elif bench_cpus != machine_cpus:
        full_path = full_path.replace(
            "BENCH_FULL.json", f"BENCH_FULL_c{bench_cpus}.json"
        )
    with open(full_path, "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    print(json.dumps(out))

    # Driver-facing line LAST: compact, per-query dict included while
    # it fits, always whole inside the 2000-char tail window.
    final = dict(out)
    final.pop("queries_med", None)
    final.pop("queries_x10", None)
    final.pop("queries_x3", None)
    final.pop("spread_x10", None)
    final.pop("min_x10", None)
    # post-window gauges live in the full record; gauge_healthy (which
    # brackets pre+post) plus the pre gauges carry the driver line's
    # health evidence — the ~60 freed chars keep more queries in it.
    final.pop("cal_1t_post_sec", None)
    final.pop("cal_nt_post_sec", None)
    sys.stdout.flush()
    print(_final_line(final))


if __name__ == "__main__":
    main()
