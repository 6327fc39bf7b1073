"""Z-order layout: trailing-dimension file skipping actually improves.

Writes lineitem twice — range-clustered on l_orderkey only vs
z-ordered on (l_orderkey, l_partkey) — then reads each file's parquet
footer min/max for l_partkey and counts how many files a
partkey-band predicate would have to open. The z-ordered layout must
prune strictly better on the NON-leading dimension (the whole point
of the curve); both layouts prune the leading dimension fine.
"""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq

from pyspark_scd_spark.sources.readers import read_parquet_table
from pyspark_scd_spark.sources.writers import write_clustered, write_zordered

N_FILES = 16


def _file_ranges(path, col):
    out = []
    for f in glob.glob(os.path.join(path, "*.parquet")):
        md = pq.ParquetFile(f).metadata
        mn, mx = None, None
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                c = md.row_group(rg).column(ci)
                if c.path_in_schema == col and c.statistics is not None:
                    s = c.statistics
                    mn = s.min if mn is None else min(mn, s.min)
                    mx = s.max if mx is None else max(mx, s.max)
        out.append((mn, mx))
    return out


def _overlapping(ranges, lo, hi):
    return sum(1 for mn, mx in ranges if mn is not None and mn <= hi and mx >= lo)


def test_zorder_prunes_trailing_dim(spark, sf_dir, tmp_path):
    li = read_parquet_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity"
    )
    linear = str(tmp_path / "linear")
    zord = str(tmp_path / "zorder")
    write_clustered(li, linear, ["l_orderkey"], n_files=N_FILES)
    write_zordered(li, zord, ["l_orderkey", "l_partkey"], n_files=N_FILES)

    row = li.selectExpr(
        "min(l_partkey) as mn", "max(l_partkey) as mx"
    ).collect()[0]
    span = row["mx"] - row["mn"]
    # 1/16-wide band inside the curve's first partkey quadrant — a
    # band straddling a quadrant boundary legitimately touches two
    # rows of z-cells and halves the pruning win.
    lo = row["mn"] + span * 2 // 16
    hi = row["mn"] + span * 3 // 16

    lin_files = _overlapping(_file_ranges(linear, "l_partkey"), lo, hi)
    z_files = _overlapping(_file_ranges(zord, "l_partkey"), lo, hi)
    assert lin_files == N_FILES  # leading-col layout can't skip partkey
    assert z_files < lin_files / 2  # the curve localizes partkey too

    # correctness: both layouts hold exactly the same rows
    a = spark.read.parquet(linear).count()
    b = spark.read.parquet(zord).count()
    assert a == b == li.count()
