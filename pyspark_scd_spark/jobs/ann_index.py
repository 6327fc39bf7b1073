"""ANN index lifecycle job: build an at-rest IVF(+PQ) index, serve
probes off partition-pruned scans.

The similarity operators' scale story says "at rest, partition the
corpus by ivf_cell so a probe scans one partition" — this job IS that
story, end to end:

1. **train** — k-means centroids on the corpus (deterministic seeds,
   `kmeans_train`), or caller-supplied centroids;
2. **encode** — every vector gets its IVF cell (`ivf_assign`) and its
   PQ code array (`pq_codes`) — one pure-map pass;
3. **write** — two-phase staged write PARTITIONED BY ivf_cell: each
   cell is its own directory of parquet files;
4. **search** — a query probes its top-`n_probe` cells: the cell
   predicate prunes partitions at the SCAN (Spark lists only the
   probed directories — verified by `tests/test_ann_index.py`, which
   asserts the scan's partitionFilters and per-cell file pruning),
   then exact cosine re-ranks inside the probed cells.

At 100 TB the probe cost is |probed cells| / |cells| of the corpus in
listed bytes, not a full scan — the partition layout does the work,
no custom index structure needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark_scd_spark.operators import similarity
from pyspark_scd_spark.functions import vectors as V
from pyspark_scd_spark.sources.writers import write_staged


def build(
    spark: SparkSession,
    embeddings: DataFrame,
    out_path: str,
    k_cells: int = 8,
    train_iters: int = 3,
    pq_subspaces: int = 8,
    centroids: list[list[float]] | None = None,
) -> list[list[float]]:
    """Train (or accept) centroids, encode cells + PQ codes, write the
    index partitioned by cell. Returns the centroids (the 'index
    metadata' a caller persists beside the table)."""
    if centroids is None:
        centroids, _ = similarity.kmeans_train(
            embeddings,
            k=k_cells,
            max_iter=train_iters,
            tol=0.0,
            round_centroids=9,
        )
    dim = len(centroids[0])
    if dim % pq_subspaces:
        raise ValueError(
            f"dim {dim} not divisible by pq_subspaces {pq_subspaces}: "
            "trailing dimensions would be silently dropped from codes"
        )
    ds = dim // pq_subspaces
    codebooks = [
        [c[j * ds : (j + 1) * ds] for c in centroids]
        for j in range(pq_subspaces)
    ]
    # the raw vector rides through pq_codes as an extra column, so
    # the exact re-rank tier reads it from the SAME pruned partitions
    # and the whole encode stays ONE pure-map pass — no self-join
    assigned = similarity.ivf_assign(embeddings, centroids)
    out = similarity.pq_codes(
        assigned, codebooks, extra_cols=("ivf_cell", "embedding")
    )
    write_staged(out, out_path, partition_by=["ivf_cell"])
    return centroids


def search(
    spark: SparkSession,
    index_path: str,
    centroids: list[list[float]],
    queries: list[tuple[int, list[float]]],
    k: int = 5,
    n_probe: int = 2,
) -> DataFrame:
    """Probe the at-rest index: per query, scan ONLY its top-n_probe
    cell partitions, exact cosine re-rank inside. The cell filter is a
    partition predicate — Spark prunes the unprobed directories at
    file listing, which tests assert via the scan's partitionFilters.
    """
    from pyspark.sql import Window

    idx = spark.read.parquet(index_path)
    qdf = spark.createDataFrame(
        [(int(q), list(map(float, v))) for q, v in queries],
        schema="query_id bigint, qv array<double>",
    )
    # one collect serves both the partition-pruning IN-list and the
    # broadcast join side: re-executing the probe-cell expression job
    # twice would pay the n_queries x n_cells cosine codegen twice
    probe_rows = (
        similarity.ivf_probe_cells(
            qdf, centroids, n_probe=n_probe, vec_col="qv"
        )
        .select("query_id", "qv", F.col("probe_cell").alias("ivf_cell"))
        .collect()
    )
    probed = spark.createDataFrame(
        [(r["query_id"], r["qv"], r["ivf_cell"]) for r in probe_rows],
        schema="query_id bigint, qv array<double>, ivf_cell int",
    )
    cells = sorted({int(r["ivf_cell"]) for r in probe_rows})
    # the IN-list is a pure partition predicate over the probed cells
    pruned = idx.filter(F.col("ivf_cell").isin(cells))
    scored = pruned.join(F.broadcast(probed), "ivf_cell").select(
        "query_id",
        "vec_id",
        F.round(V.cosine(F.col("embedding"), F.col("qv")), 6).alias(
            "cosine"
        ),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine", "rank")
    )
