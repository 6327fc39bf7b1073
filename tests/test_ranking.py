"""Scale-safe global ranking: equivalence with the (single-partition)
window form, determinism, both rank modes, and the no-SinglePartition
plan pin."""

from __future__ import annotations

import re

from pyspark.sql import Window
from pyspark.sql import functions as F

from pyspark_scd_spark.operators import ranking
from pyspark_scd_spark.plans import explain
from pyspark_scd_spark.registry import REGISTRY


def test_dense_rank_matches_window_form(spark, sf_dir):
    li = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
        .limit(5000)
    )
    got = ranking.global_dense_rank(
        li, ["l_extendedprice"], rank_col="r"
    )
    want = li.withColumn(
        "r",
        F.dense_rank()
        .over(Window.orderBy("l_extendedprice"))
        .cast("long"),
    )
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_dense_rank_multi_column_and_ties(spark):
    rows = [(1, "a"), (1, "a"), (1, "b"), (2, "a"), (2, "a"), (0, "z")]
    df = spark.createDataFrame(rows, ["k", "s"])
    out = {
        (r["k"], r["s"], r["r"])
        for r in ranking.global_dense_rank(
            df, ["k", "s"], rank_col="r", num_partitions=3
        ).collect()
    }
    assert out == {
        (0, "z", 1),
        (1, "a", 2),
        (1, "b", 3),
        (2, "a", 4),
    }


def test_row_number_mode_total_key(spark):
    df = spark.createDataFrame(
        [(i,) for i in [7, 3, 9, 1, 5, 8, 2, 6, 4, 10]], ["v"]
    )
    got = sorted(
        (r["v"], r["n"])
        for r in ranking.global_dense_rank(
            df, ["v"], rank_col="n", dense=False, num_partitions=4
        ).collect()
    )
    assert got == [(v, v) for v in range(1, 11)]


def test_global_rank_plan_never_single_partitions(spark, sf_dir):
    df = REGISTRY["global_dense_rank"].builder(spark, sf_dir)
    plan = explain.physical_plan(df)
    assert "Exchange SinglePartition" not in plan, plan
    assert "rangepartitioning" in plan, plan
