"""Bucketed-table co-located joins: the zero-shuffle layout for the
incremental SCD merge (SURVEY.md §7 M4)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pyspark_scd_spark.plans import explain
from pyspark_scd_spark.sources.readers import read_parquet_table
from pyspark_scd_spark.sources.writers import write_bucketed_table


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    orders = read_parquet_table(spark, sf_dir, "orders")
    customers = read_parquet_table(spark, sf_dir, "customer")
    write_bucketed_table(
        orders, "b_orders", ["o_custkey"], 8, sort_cols=["o_custkey"]
    )
    write_bucketed_table(
        customers.withColumnRenamed("c_custkey", "o_custkey"),
        "b_customers",
        ["o_custkey"],
        8,
        sort_cols=["o_custkey"],
    )
    yield "b_orders", "b_customers"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customers")


def test_bucketed_join_no_shuffle(spark, bucketed_tables):
    t1, t2 = bucketed_tables
    # disable auto-broadcast so the join would OTHERWISE shuffle both
    # sides; with matching buckets it must shuffle neither
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        a = spark.table(t1)
        b = spark.table(t2)
        joined = a.join(b, "o_custkey")
        plan = explain.physical_plan(joined)
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, plan
        assert "Exchange hashpartitioning" not in plan, plan
        # and the result is right
        assert joined.count() == a.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")


def test_bucketed_merge_correctness(spark, bucketed_tables):
    t1, _ = bucketed_tables
    a = spark.table(t1)
    agg = a.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n"))
    # groupBy on the bucket key also avoids the exchange
    plan = explain.physical_plan(agg)
    assert "Exchange hashpartitioning" not in plan, plan


def test_partitioned_write_prunes(spark, tmp_path):
    """employee_all-style outputs partitioned by snapshot_date must
    prune to one partition when filtered on it (SURVEY.md §4:
    'partition pruning: the new engine's parquet layout partitioned by
    snapshot_date makes it real')."""
    from pyspark_scd_spark.sources.readers import read_parquet_table
    from pyspark_scd_spark.sources.writers import write_staged

    orders = read_parquet_table(spark, "/root/testdata/sf0.001", "orders")
    path = str(tmp_path / "orders_by_year")
    write_staged(
        orders.withColumn("order_year", F.year("o_orderdate")),
        path,
        partition_by=["order_year"],
    )
    back = spark.read.parquet(path).filter(F.col("order_year") == 1996)
    plan = explain.physical_plan(back)
    import re

    m = re.search(r"PartitionFilters: \[([^\]]*)", plan)
    assert m and "order_year" in m.group(1), plan
    # and the scan actually skips the other years' files
    assert back.count() > 0
