"""Synthetic embedding tiers for the ≥100k-vector ANN scale study.

The key-shifted gen_scale.py tiers duplicate each sf0.1 VECTOR
verbatim (only ids shift), which is the wrong corpus for an ANN
study: identical vectors collapse into the same buckets and the
"near-dup" set degenerates into exact-duplicate cliques. This
generator produces NOVEL vectors with controlled structure instead:

- a 32-center Gaussian mixture at low signal (background same-cluster
  cosine ≈ 0.2, cross-cluster ≈ 0) so buckets are populated the way a
  real embedding corpus populates them;
- a planted near-duplicate tail (``dup_frac`` of rows are noised
  copies of earlier rows) whose noise scale cycles through 4 levels,
  landing planted-pair cosines across the ~0.6 / ~0.75 / ~0.85 / ~0.95
  bands — so ANN recall can be read per band against an exact twin.

Vectors are a pure function of (seed, vec_id) — counter-based PCG64
streams — so the corpus is partitioning-independent and reproducible.

Usage:
    python tools/gen_vectors.py 100000 /tmp/vec100k [dup_frac]

Writes <out>/embeddings.parquet with the testdata schema
(vec_id BIGINT, label INT, embedding ARRAY<FLOAT>).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark_scd_spark.session import get_spark  # noqa: E402

DIM = 64
N_CLUSTERS = 32
CENTER_SCALE = 0.5
DUP_NOISE = (0.35, 0.7, 1.0, 1.4)  # → planted cosines ≈ .95/.85/.74/.62
SEED = 7


def gen_vectors(spark, n: int, out_dir: str, dup_frac: float = 0.05):
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    n_base = int(n * (1.0 - dup_frac))
    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("label", T.IntegerType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
        ]
    )

    def _make(batches):
        centers = CENTER_SCALE * np.random.Generator(
            np.random.PCG64(SEED)
        ).normal(size=(N_CLUSTERS, DIM))

        def base_vec(i: int) -> np.ndarray:
            g = np.random.Generator(np.random.PCG64(SEED * 1_000_003 + i))
            return centers[i % N_CLUSTERS] + g.normal(size=DIM)

        for pdf in batches:
            ids = pdf["id"].to_numpy()
            out = np.empty((len(ids), DIM))
            for j, i in enumerate(ids):
                i = int(i)
                if i < n_base:
                    out[j] = base_vec(i)
                else:
                    k = (i - n_base) % n_base
                    g = np.random.Generator(
                        np.random.PCG64(SEED * 2_000_003 + i)
                    )
                    s = DUP_NOISE[(i - n_base) % len(DUP_NOISE)]
                    out[j] = base_vec(k) + s * g.normal(size=DIM)
            yield pd.DataFrame(
                {
                    "vec_id": ids,
                    "label": (ids % 16).astype(np.int32),
                    "embedding": [r.astype(np.float32) for r in out],
                }
            )

    df = spark.range(n).repartition(32).mapInPandas(_make, schema=schema)
    df.write.mode("overwrite").parquet(f"{out_dir}/embeddings.parquet")


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    out = sys.argv[2] if len(sys.argv) > 2 else f"/tmp/vec{n}"
    dup_frac = float(sys.argv[3]) if len(sys.argv) > 3 else 0.05
    spark = get_spark(app_name="gen_vectors")
    gen_vectors(spark, n, out, dup_frac)
    print(f"wrote {n} vectors (dup_frac={dup_frac}) to {out}")


if __name__ == "__main__":
    main()
