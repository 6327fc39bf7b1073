"""Deterministic HyperLogLog (operators/sketches.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from pyspark_scd_spark.operators import sketches


def test_hll_registers_merge_by_max(spark):
    """The sketch property that matters at 100 TB: registers built
    from two disjoint halves merge by elementwise max into exactly
    the registers of the union."""
    df = spark.range(0, 20000).withColumnRenamed("id", "v")
    full = {
        r["bucket"]: r["register"]
        for r in sketches.hll_registers(df, F.col("v"), p=8).collect()
    }
    lo = sketches.hll_registers(
        df.filter(F.col("v") < 10000), F.col("v"), p=8
    )
    hi = sketches.hll_registers(
        df.filter(F.col("v") >= 10000), F.col("v"), p=8
    )
    merged = {
        r["bucket"]: r["register"]
        for r in lo.unionByName(hi)
        .groupBy("bucket")
        .agg(F.max("register").alias("register"))
        .collect()
    }
    assert merged == full


def test_hll_estimate_accuracy_and_determinism(spark):
    """Raw-regime estimate lands within the ~3.25% theoretical rsd
    band (4 sigma for slack) and is bit-reproducible across runs."""
    df = spark.range(0, 50000).withColumnRenamed("id", "v")
    rows = [
        sketches.hll_distinct(df, F.col("v"), p=10).collect()[0]
        for _ in range(2)
    ]
    assert rows[0] == rows[1]
    r = rows[0]
    assert r["exact_distinct"] == 50000
    assert r["m"] == 1024 and r["observed_buckets"] <= 1024
    assert r["rel_error"] <= 0.13  # 4 * 1.04/sqrt(1024)
    assert round(abs(r["hll_estimate"] - 50000) / 50000, 4) == r["rel_error"]


def test_hll_rank_expr_known_values(spark):
    """rank = width - bit_length(w) + 1 pinned on known words."""
    df = spark.createDataFrame(
        [(0,), (1,), (2,), (3,), (1 << 49,), ((1 << 50) - 1,)], ["w"]
    )
    got = [
        r["rank"]
        for r in df.select(
            sketches._rank_expr(F.col("w"), 50).alias("rank")
        ).collect()
    ]
    assert got == [51, 50, 49, 49, 1, 1]


def test_hll_intersection_inclusion_exclusion(spark):
    """Sketch-estimated |A ∩ B| via inclusion-exclusion over merged
    registers tracks the true overlap within the p=8 error band."""
    a = spark.range(0, 30000).withColumnRenamed("id", "v")
    b = spark.range(20000, 50000).withColumnRenamed("id", "v")  # 10k overlap
    ra = sketches.hll_registers(a, F.col("v"), p=8)
    rb = sketches.hll_registers(b, F.col("v"), p=8)
    ru = (
        ra.unionByName(rb)
        .groupBy("bucket")
        .agg(F.max("register").alias("register"))
    )
    ea = sketches.hll_estimate_from_registers(ra, 8).collect()[0][0]
    eb = sketches.hll_estimate_from_registers(rb, 8).collect()[0][0]
    eu = sketches.hll_estimate_from_registers(ru, 8).collect()[0][0]
    inter = ea + eb - eu
    # rsd at m=256 is 6.5%; inclusion-exclusion compounds 3 estimates
    # over a 50k union vs a 10k intersection -> allow a wide but
    # still-meaningful band
    assert 10000 * 0.3 < inter < 10000 * 1.9
