"""The r14 single-parse expression forms in the MinHash path must be
bit-identical to the Column-operator reference forms they replaced
(_signatures_from_shingles / _band_signatures): the SQL int literal
seeds must type like F.lit(i) (IntegerType) or every xxhash64 — and
every signature, band bucket, and candidate pair — silently changes."""

from pyspark.sql import functions as F

from pyspark_scd_spark.operators.dedup import (
    _band_signatures,
    _signatures_from_shingles,
)


def _shingle_fixture(spark):
    return spark.range(0, 5000).select(
        (F.col("id") % 97).alias("__id"),
        F.xxhash64((F.col("id") * 7919).cast("string")).alias("shingle"),
    )


def _reference_signatures(sh, num_hashes, with_size):
    """The pre-r14 Column-operator form, kept as pinned semantics."""
    aggs = [
        F.min(F.xxhash64(F.col("shingle"), F.lit(i))).alias(f"mh_{i}")
        for i in range(num_hashes)
    ]
    if with_size:
        aggs.append(F.count(F.lit(1)).alias("__n"))
    return sh.groupBy("__id").agg(*aggs)


def _reference_bands(sig, id_col, num_hashes, bands):
    rows_per_band = num_hashes // bands
    band_cols = []
    for b in range(bands):
        cols = [
            F.col(f"mh_{i}")
            for i in range(b * rows_per_band, (b + 1) * rows_per_band)
        ]
        band_cols.append(
            F.struct(
                F.lit(b).alias("band"), F.xxhash64(*cols).alias("sig")
            )
        )
    return sig.select(
        F.col(id_col).alias("__id"),
        F.explode(F.array(*band_cols)).alias("bs"),
    ).select(
        "__id", F.col("bs.band").alias("band"), F.col("bs.sig").alias("sig")
    )


def test_signature_expr_form_matches_column_form(spark):
    sh = _shingle_fixture(spark)
    for num_hashes, with_size in ((32, False), (63, True)):
        new = _signatures_from_shingles(sh, num_hashes, with_size)
        ref = _reference_signatures(sh, num_hashes, with_size)
        assert new.schema == ref.schema
        assert (
            new.orderBy("__id").collect() == ref.orderBy("__id").collect()
        )


def test_band_expr_form_matches_column_form(spark):
    sh = _shingle_fixture(spark)
    for num_hashes, bands in ((32, 8), (63, 21)):
        sig = _signatures_from_shingles(sh, num_hashes).withColumnRenamed(
            "__id", "doc_id"
        )
        new = _band_signatures(sig, "doc_id", num_hashes, bands)
        ref = _reference_bands(sig, "doc_id", num_hashes, bands)
        assert new.schema == ref.schema
        assert (
            new.orderBy("__id", "band").collect()
            == ref.orderBy("__id", "band").collect()
        )
