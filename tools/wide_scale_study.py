"""Wide-MIH decade study (round 12): does the 124-bit / 31-bit-band
family actually DETACH from the narrow family's n²/2^16 band-candidate
floor, at the tier where that floor dominates?

VERDICT r11 items 2 & 5. The r11 study measured the narrow video pair
stage at 49s of 68s total at x300 and the audio family's floor fixed
by interleave but not moved; the wide forms (audio r11, video r12)
claim the floor moves to n²/2^31. This study measures that claim:

- Same diverse corpora as tools/av_scale_study.py (imported, not
  re-derived): ~unique frame hashes / fingerprints with planted
  partners at doc_id % 100 == 1, dup mass linear in n.
- HASH-ONLY twin timed beside each NEARDUP query, so the pair stage
  (neardup − hash) is measured per tier, per family — the quantity
  the floor argument is about.
- x1000 tier (5M docs — 15M frames / 5M clips) where the narrow
  floor's candidate volume is ~n²/2^16 ≈ 10⁸-10⁹ while the wide
  family's buckets (2^31 space) stay ~empty. Narrow VIDEO is skipped
  at x1000 (its x300 pair stage alone was 49s; the x1000 candidate
  volume extrapolates to ~6.8B rows — the point of the wide form is
  not to run that); narrow AUDIO runs at x1000 so the separation is
  measured head-to-head, not extrapolated.
- Planted-pair RECALL checked per tier for the wide forms (untimed):
  the (i-1, i) partners must all be found — banded recall is a
  pigeonhole theorem, so a miss is a bug, not noise.

Usage: python tools/wide_scale_study.py [out_json] [max_tier]
  max_tier in {x30, x100, x300, x1000}; default x1000.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import functions as F  # noqa: E402

from pyspark_scd_spark.operators import perceptual  # noqa: E402
from pyspark_scd_spark.session import get_spark  # noqa: E402
from tools.av_scale_study import (  # noqa: E402
    _consume,
    _ensure_tier,
    diverse_audio_payload,
    diverse_video_payload,
)

TIERS = [
    (150_000, "x30"),
    (500_000, "x100"),
    (1_500_000, "x300"),
    (5_000_000, "x1000"),
]

# narrow video's x1000 pair stage extrapolates to ~6.8B candidate
# rows (Σ C(n_b,2) over 2^16 buckets at 15M distinct hashes) — the
# cost the wide family exists to avoid; not worth a 32-core hour to
# confirm a floor already measured at x300.
SKIP = {("video_phash_neardup", "x1000")}


def _queries(spark, sf_dir: str):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    def q_video_hash_wide(_s, _d):
        return perceptual.video_frame_hash_wide(
            diverse_video_payload(docs)
        )

    def q_video_neardup_wide(_s, _d):
        return perceptual.video_neardup_pairs_wide(
            perceptual.video_frame_hash_wide(
                diverse_video_payload(docs)
            )
        )

    def q_video_hash(_s, _d):
        return perceptual.video_frame_hashes(diverse_video_payload(docs))

    def q_video_neardup(_s, _d):
        return perceptual.video_neardup_pairs(
            perceptual.video_frame_hashes(diverse_video_payload(docs))
        )

    def q_audio_hash_wide(_s, _d):
        return perceptual.audio_fingerprint_wide(
            diverse_audio_payload(docs)
        )

    def q_audio_neardup_wide(_s, _d):
        return perceptual.wide_hamming_neardup_pairs(
            perceptual.audio_fingerprint_wide(
                diverse_audio_payload(docs)
            )
        )

    def q_audio_hash(_s, _d):
        return perceptual.audio_fingerprint(diverse_audio_payload(docs))

    def q_audio_neardup(_s, _d):
        return perceptual.phash_neardup_pairs(
            perceptual.audio_fingerprint(diverse_audio_payload(docs)),
            hash_col="afp",
        )

    # (name, hash-only twin name) — the subtraction pairs
    return {
        "video_frame_hash_wide": q_video_hash_wide,
        "video_phash_neardup_wide": q_video_neardup_wide,
        "video_frame_hashes": q_video_hash,
        "video_phash_neardup": q_video_neardup,
        "audio_fingerprint_wide": q_audio_hash_wide,
        "audio_fingerprint_neardup_wide": q_audio_neardup_wide,
        "audio_fingerprint": q_audio_hash,
        "audio_fingerprint_neardup": q_audio_neardup,
    }


HASH_TWIN = {
    "video_phash_neardup_wide": "video_frame_hash_wide",
    "video_phash_neardup": "video_frame_hashes",
    "audio_fingerprint_neardup_wide": "audio_fingerprint_wide",
    "audio_fingerprint_neardup": "audio_fingerprint",
}


def _recall(spark, sf_dir: str) -> dict:
    """Planted-partner recall for the two wide forms + distinct-hash
    diversity — untimed, once per tier."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n = docs.count()
    expected = (
        docs.filter(
            (F.col("doc_id") % 100 == 1) & (F.col("doc_id") > 0)
        ).count()
    )
    vh = perceptual.video_frame_hash_wide(
        diverse_video_payload(docs)
    ).localCheckpoint(eager=False)
    vd = vh.agg(
        F.countDistinct("fhash_lo", "fhash_hi").alias("d"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    v_found = (
        perceptual.video_neardup_pairs_wide(vh)
        .filter(
            (F.col("video_b") == F.col("video_a") + 1)
            & (F.col("video_a") % 100 == 0)
        )
        .count()
    )
    ah = perceptual.audio_fingerprint_wide(
        diverse_audio_payload(docs)
    ).localCheckpoint(eager=False)
    ad = ah.agg(
        F.countDistinct("afp_lo", "afp_hi").alias("d"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    a_found = (
        perceptual.wide_hamming_neardup_pairs(ah)
        .filter(
            (F.col("doc_b") == F.col("doc_a") + 1)
            & (F.col("doc_a") % 100 == 0)
        )
        .count()
    )
    return {
        "n_docs": n,
        "planted": expected,
        "video_wide_found": v_found,
        "audio_wide_found": a_found,
        "video_frames": vd["n"],
        "video_distinct_wide_fhash": vd["d"],
        "audio_clips": ad["n"],
        "audio_distinct_wide_afp": ad["d"],
    }


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/wide_decade.json"
    max_tier = sys.argv[2] if len(sys.argv) > 2 else "x1000"
    tiers = TIERS[: [t for _, t in TIERS].index(max_tier) + 1]
    spark = get_spark(app_name="wide_scale_study")

    for n, _tag in tiers:
        _ensure_tier(spark, n, f"/tmp/avdiv_{n}")

    results: dict[str, dict[str, float]] = {}
    recalls: dict[str, dict] = {}
    for n, tag in tiers:
        d = f"/tmp/avdiv_{n}"
        rc = _recall(spark, d)
        recalls[tag] = rc
        print(f"RECALL {tag} " + json.dumps(rc), flush=True)
        spark.catalog.clearCache()
        for name, q in _queries(spark, d).items():
            if (name, tag) in SKIP:
                continue
            runs = []
            for _ in range(3):  # warm + 2 timed, steady = last
                t0 = time.time()
                _consume(q(spark, d))
                runs.append(round(time.time() - t0, 2))
                spark.catalog.clearCache()
            results.setdefault(name, {})[tag] = runs[-1]
            print(
                json.dumps(
                    {"query": name, "tier": tag, "n": n, "runs": runs}
                ),
                flush=True,
            )

    summary: dict = {"recalls": recalls, "timings": results}
    pair_stage: dict[str, dict[str, float]] = {}
    for name, twin in HASH_TWIN.items():
        pair_stage[name] = {}
        for _n, tag in tiers:
            t_all = results.get(name, {}).get(tag)
            t_hash = results.get(twin, {}).get(tag)
            if t_all is not None and t_hash is not None:
                pair_stage[name][tag] = round(t_all - t_hash, 2)
    summary["pair_stage"] = pair_stage
    with open(out_path, "w") as f:
        json.dump(summary, f, indent=1)
    print("SUMMARY " + json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
