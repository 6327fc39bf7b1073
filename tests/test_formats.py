"""Format round-trips through the staged writer: every supported
format preserves row content bit-for-bit when read back with the
written schema (text formats require the explicit schema; parquet/orc
are self-describing)."""

from __future__ import annotations

import pytest

from pyspark_scd_spark.sources.readers import read_parquet_table, read_table
from pyspark_scd_spark.sources.writers import write_staged


@pytest.fixture(scope="module")
def orders(spark, sf_dir):
    return read_parquet_table(spark, sf_dir, "orders")


def _canon(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize(
    "fmt,options",
    [
        ("parquet", None),
        ("orc", None),
        ("json", None),
        ("csv", {"header": "true", "timestampFormat": "yyyy-MM-dd HH:mm:ss"}),
    ],
)
def test_roundtrip(spark, orders, tmp_path_factory, fmt, options):
    path = str(tmp_path_factory.mktemp(f"rt_{fmt}") / "orders")
    write_staged(orders, path, fmt=fmt, options=options or {})
    back = read_table(spark, path, fmt=fmt, schema=orders.schema,
                      options=options or {})
    assert back.schema.fieldNames() == orders.schema.fieldNames()
    assert _canon(back) == _canon(orders)


def test_text_formats_require_schema(spark, tmp_path):
    with pytest.raises(ValueError, match="explicit schema"):
        read_table(spark, str(tmp_path), fmt="json")


def test_compact_files(spark, orders, tmp_path_factory):
    from pyspark_scd_spark.sources.writers import compact_files, write_staged

    path = str(tmp_path_factory.mktemp("compact") / "orders")
    write_staged(orders.repartition(32), path)
    import glob

    before = len(glob.glob(f"{path}/part-*"))
    assert before == 32
    n = compact_files(spark, path, target_bytes=1 << 30)  # force 1 file
    after = len(glob.glob(f"{path}/part-*"))
    assert n == 1 and after == 1
    assert spark.read.parquet(path).count() == orders.count()


def test_write_clustered_disjoint_ranges(spark, orders, tmp_path_factory):
    import pyarrow.parquet as pq
    import glob

    from pyspark_scd_spark.sources.writers import write_clustered

    path = str(tmp_path_factory.mktemp("clustered") / "orders")
    write_clustered(orders, path, ["o_orderdate"], n_files=4)
    spans = []
    for f in sorted(glob.glob(f"{path}/part-*")):
        md = pq.read_metadata(f)
        idx = md.schema.names.index("o_orderdate")
        lo = min(
            md.row_group(i).column(idx).statistics.min
            for i in range(md.num_row_groups)
        )
        hi = max(
            md.row_group(i).column(idx).statistics.max
            for i in range(md.num_row_groups)
        )
        spans.append((lo, hi))
    spans.sort()
    # range clustering -> file key ranges are pairwise disjoint, so a
    # date-filtered reader prunes whole files on footer min/max
    for (_, hi_prev), (lo_next, _) in zip(spans, spans[1:]):
        assert hi_prev <= lo_next
    assert spark.read.parquet(path).count() == orders.count()


def test_schema_evolution_merge(spark, tmp_path):
    # v1 writers emit 3 columns; a later deploy adds a 4th. Readers
    # with mergeSchema get the superset, v1 rows NULL-filled — the
    # additive-evolution contract a long-lived 100 TB table relies on.
    p = str(tmp_path / "evolving")
    spark.createDataFrame(
        [(1, "a", 10)], ["id", "name", "v"]
    ).write.parquet(p)
    spark.createDataFrame(
        [(2, "b", 20, "extra")], ["id", "name", "v", "tag"]
    ).write.mode("append").parquet(p)
    merged = spark.read.option("mergeSchema", "true").parquet(p)
    assert set(merged.columns) == {"id", "name", "v", "tag"}
    rows = {r["id"]: r["tag"] for r in merged.collect()}
    assert rows[1] is None and rows[2] == "extra"
