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
