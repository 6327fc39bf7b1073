"""ANN index lifecycle: at-rest IVF layout, partition-pruned probes."""

from __future__ import annotations

from pyspark.sql import functions as F

from pyspark_scd_spark.jobs import ann_index
from pyspark_scd_spark.operators import similarity
from pyspark_scd_spark.plans import explain
from pyspark_scd_spark.sources.readers import read_parquet_table


def test_ann_index_build_and_pruned_search(spark, sf_dir, tmp_path):
    e = read_parquet_table(spark, sf_dir, "embeddings")
    cents = [
        list(r["embedding"])
        for r in e.filter(F.col("vec_id") < 8).orderBy("vec_id").collect()
    ]
    out = str(tmp_path / "ann_index")
    got_cents = ann_index.build(spark, e, out, centroids=cents)
    assert got_cents == cents

    # at-rest layout: one directory per cell
    import os

    cell_dirs = [
        d for d in os.listdir(out) if d.startswith("ivf_cell=")
    ]
    assert len(cell_dirs) >= 2

    queries = [
        (int(r["vec_id"]), list(r["embedding"]))
        for r in e.filter(
            (F.col("vec_id") >= 100) & (F.col("vec_id") < 105)
        ).orderBy("vec_id").collect()
    ]
    res = ann_index.search(spark, out, cents, queries, k=5, n_probe=2)
    plan = explain.physical_plan(res)
    # the cell predicate reaches the scan as a PARTITION filter (file
    # listing prunes unprobed cells) — not a post-scan data filter
    assert "PartitionFilters" in plan
    i = plan.index("PartitionFilters")
    assert "ivf_cell" in plan[i : i + 200], plan[i : i + 300]

    # results equal the in-memory probe twin
    rows = {
        (r["query_id"], r["rank"]): (r["vec_id"], r["cosine"])
        for r in res.collect()
    }
    corpus = similarity.ivf_assign(e, cents)
    probed = similarity.ivf_probe_cells(
        e.filter((F.col("vec_id") >= 100) & (F.col("vec_id") < 105)),
        cents,
        n_probe=2,
    ).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("__qv"),
        F.col("probe_cell").alias("ivf_cell"),
    )
    from pyspark.sql import Window

    scored = corpus.join(F.broadcast(probed), "ivf_cell").select(
        "query_id",
        "vec_id",
        F.round(
            __import__(
                "pyspark_scd_spark.functions.vectors", fromlist=["cosine"]
            ).cosine(F.col("embedding"), F.col("__qv")),
            6,
        ).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    want = {
        (r["query_id"], r["rank"]): (r["vec_id"], r["cosine"])
        for r in scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .collect()
    }
    assert rows == want


def test_ivf_drift_retrain_branches(spark, sf_dir):
    """Both sides of the drift trigger: an in-distribution batch keeps
    the serving centroids (retrained=False); a rectified-|x| batch
    (simulated encoder upgrade) concentrates into the positive orthant,
    trips the TV threshold, and re-seeds from store + batch."""
    from pyspark.sql import functions as F

    from pyspark_scd_spark.operators import similarity

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    store = e.filter(F.col("vec_id") % 10 != 7)
    same_dist = e.filter(F.col("vec_id") % 10 == 7)
    drifted = same_dist.select(
        "vec_id", F.transform("embedding", F.abs).alias("embedding")
    )

    calm = similarity.ivf_drift_retrain(
        store, same_dist, k_cells=8, n_probe=2, drift_threshold=0.25
    ).collect()
    assert all(not r["retrained"] for r in calm)
    assert len(calm) == 8
    # probe-row mass conserved: every vector lands in exactly n_probe cells
    assert sum(r["n_batch"] for r in calm) == same_dist.count() * 2

    hot = similarity.ivf_drift_retrain(
        store, drifted, k_cells=8, n_probe=2, drift_threshold=0.25
    ).collect()
    assert all(r["retrained"] for r in hot)
    assert len(hot) == 8
    assert hot[0]["tv_drift"] > calm[0]["tv_drift"]
    assert sum(r["n_store"] for r in hot) == store.count() * 2
