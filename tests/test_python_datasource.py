"""Spark-4 Python DataSource: batch read, day pruning, streaming SCD.

The source generates the reference's snapshot-drop shape on executors
(sources/snapshot_source.py); these tests pin (a) batch semantics and
row counts, (b) that a snapshot_date filter prunes generated *days*
via pushFilters (fewer input partitions, not post-hoc filtering),
(c) the streaming reader feeds the SCD pipeline one day per
micro-batch and lands the same current view as a batch run.
"""

from __future__ import annotations

from datetime import date

import pytest
from pyspark.sql import functions as F

from pyspark_scd_spark.sources import snapshot_source


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    snapshot_source.register(spark)


def _read(spark, **opts):
    r = spark.read.format("emp_snapshots")
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_batch_shape(spark):
    df = _read(spark, n_days=5, n_employees=10)
    # day 0..2: all 10; day 3: emp3 deleted, emp5 gapped -> 8;
    # day 4: emp3 still gone -> 9
    assert df.count() == 10 * 3 + 8 + 9
    assert df.schema == snapshot_source.SCHEMA
    per_day = {
        r["snapshot_date"].day: r["n"]
        for r in df.groupBy("snapshot_date")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert per_day == {1: 10, 2: 10, 3: 10, 4: 8, 5: 9}


def test_filter_prunes_generated_days(spark):
    df = _read(spark, n_days=30, n_employees=10).filter(
        F.col("snapshot_date") == date(2024, 1, 2)
    )
    assert df.count() == 10
    # pushFilters must shrink the scan to ONE input partition — the
    # RDD partition count is the number of generated days.
    assert df.rdd.getNumPartitions() == 1


def test_stream_scd_matches_batch(spark, tmp_path):
    from pyspark_scd_spark.operators import scd

    stream = (
        spark.readStream.format("emp_snapshots")
        .option("n_days", 6)
        .option("n_employees", 12)
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("snap_stream")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = spark.sql("select * from snap_stream")
    batch = _read(spark, n_days=6, n_employees=12)
    assert streamed.count() == batch.count()

    hist = scd.with_row_hash(
        streamed, ["first_name", "department", "salary"]
    )
    cur = scd.current_view(
        hist, ["employee_number"], "snapshot_date", stamp_global_max=False
    )
    # every employee surfaces exactly once; deleted emp 3's last row is
    # its last present day (day index 2 -> Jan 3)
    assert cur.count() == 12
    emp3 = cur.filter(F.col("employee_number") == 3).collect()[0]
    assert emp3["snapshot_date"] == date(2024, 1, 3)


def test_manifest_sink_commit_protocol(spark, tmp_path):
    """Writer half of the Python DataSource story: per-task JSONL
    files + driver-side manifest commit; readers trust the manifest,
    so orphan files from failed tasks are invisible."""
    import json
    import os

    from pyspark_scd_spark.sources import manifest_sink

    manifest_sink.register(spark)
    df = spark.range(0, 100, 1, 4).selectExpr(
        "id", "CAST(id % 7 AS STRING) AS tag"
    )
    out = str(tmp_path / "mtab")
    df.write.format("manifest_json").option("path", out).mode(
        "append"
    ).save()

    with open(os.path.join(out, "_MANIFEST.json")) as f:
        manifest = json.load(f)
    assert manifest["total_rows"] == 100
    assert 1 <= len(manifest["files"]) <= 4
    listed = {e["file"] for e in manifest["files"]}
    on_disk = {p for p in os.listdir(out) if p.startswith("part-")}
    assert listed == on_disk

    # an orphan file (zombie task) must be invisible to readers
    with open(os.path.join(out, "part-orphan.jsonl"), "w") as f:
        f.write('{"id": 999999, "tag": "zombie"}\n')
    back, m2 = manifest_sink.read_manifest_table(spark, out)
    assert back.count() == 100
    assert back.filter("id = 999999").count() == 0
    assert sorted(r["id"] for r in back.collect()) == list(range(100))


def test_manifest_sink_append_and_overwrite(spark, tmp_path):
    import json
    import os

    from pyspark_scd_spark.sources import manifest_sink

    manifest_sink.register(spark)
    out = str(tmp_path / "mtab2")
    spark.range(0, 10).write.format("manifest_json").option(
        "path", out
    ).mode("append").save()
    spark.range(10, 15).write.format("manifest_json").option(
        "path", out
    ).mode("append").save()
    back, m = manifest_sink.read_manifest_table(spark, out)
    # append carries forward the first commit's files
    assert m["total_rows"] == 15
    assert sorted(r["id"] for r in back.collect()) == list(range(15))

    spark.range(100, 103).write.format("manifest_json").option(
        "path", out
    ).mode("overwrite").save()
    back2, m2 = manifest_sink.read_manifest_table(spark, out)
    assert m2["total_rows"] == 3
    assert sorted(r["id"] for r in back2.collect()) == [100, 101, 102]
    # overwrite removed the superseded part files from disk
    on_disk = {p for p in os.listdir(out) if p.startswith("part-")}
    assert on_disk == {e["file"] for e in m2["files"]}


def test_manifest_compaction_read_equivalence(spark, tmp_path):
    """OPTIMIZE-style compaction: many small committed files merge
    into few, the manifest swaps atomically, and the table reads back
    IDENTICALLY (same multiset of rows) across the swap."""
    import json
    import os

    from pyspark_scd_spark.sources import manifest_sink

    manifest_sink.register(spark)
    out = str(tmp_path / "ctab")
    # 5 appends x 4 partitions -> up to 20 small files
    for lo in range(0, 100, 20):
        spark.range(lo, lo + 20, 1, 4).selectExpr(
            "id", "CAST(id % 7 AS STRING) AS tag"
        ).write.format("manifest_json").option("path", out).mode(
            "append"
        ).save()

    before_df, m_before = manifest_sink.read_manifest_table(spark, out)
    before_rows = sorted(r["id"] for r in before_df.collect())
    n_before = len(m_before["files"])
    assert n_before >= 5

    stats = manifest_sink.compact_manifest_table(
        spark, out, target_rows_per_file=1000
    )
    assert not stats["skipped"]
    assert stats["before_files"] == n_before
    assert stats["after_files"] < n_before

    after_df, m_after = manifest_sink.read_manifest_table(spark, out)
    assert m_after["total_rows"] == m_before["total_rows"] == 100
    assert sorted(r["id"] for r in after_df.collect()) == before_rows
    # the manifest names exactly the on-disk part files (superseded
    # small files are gone)
    listed = {e["file"] for e in m_after["files"]}
    on_disk = {p for p in os.listdir(out) if p.startswith("part-")}
    assert listed == on_disk
    assert len(listed) == stats["after_files"]

    # compaction is idempotent: a second pass with nothing small
    # enough to merge is a no-op
    stats2 = manifest_sink.compact_manifest_table(
        spark, out, target_rows_per_file=1000
    )
    assert stats2["skipped"] or stats2["after_files"] <= stats["after_files"]

    # a later append composes with the compacted manifest
    spark.range(100, 110, 1, 2).selectExpr(
        "id", "CAST(id % 7 AS STRING) AS tag"
    ).write.format("manifest_json").option("path", out).mode(
        "append"
    ).save()
    final_df, m_final = manifest_sink.read_manifest_table(spark, out)
    assert m_final["total_rows"] == 110
    assert sorted(r["id"] for r in final_df.collect()) == list(range(110))


def test_compaction_preserves_batch_id_provenance(spark, tmp_path):
    """Exactly-once survives OPTIMIZE: a micro-batch whose part files
    compaction merged must STAY in committed_batch_ids — otherwise a
    post-compaction replay of that batch re-appends its rows (the
    silent duplicate-data break compacted_batch_ids exists to stop).
    The provenance must also survive subsequent append commits, which
    rewrite the manifest."""
    from pyspark_scd_spark.sources import manifest_sink

    manifest_sink.register(spark)
    out = str(tmp_path / "btab")
    writer = manifest_sink.idempotent_batch_writer(out)
    for bid in range(3):
        writer(
            spark.range(bid * 10, bid * 10 + 10, 1, 2).selectExpr(
                "id", "CAST(id AS STRING) AS s"
            ),
            bid,
        )
    assert manifest_sink.committed_batch_ids(out) == {0, 1, 2}

    stats = manifest_sink.compact_manifest_table(
        spark, out, target_rows_per_file=1000
    )
    assert not stats["skipped"]
    assert manifest_sink.committed_batch_ids(out) == {0, 1, 2}

    # a replayed (already-committed) batch is skipped post-compaction
    writer(
        spark.range(0, 10, 1, 2).selectExpr(
            "id", "CAST(id AS STRING) AS s"
        ),
        1,
    )
    df, m = manifest_sink.read_manifest_table(spark, out)
    assert m["total_rows"] == 30  # no duplicate append
    # a NEW batch still lands, and the compacted provenance survives
    # the append's manifest rewrite
    writer(
        spark.range(30, 40, 1, 2).selectExpr(
            "id", "CAST(id AS STRING) AS s"
        ),
        3,
    )
    assert manifest_sink.committed_batch_ids(out) == {0, 1, 2, 3}
    df2, m2 = manifest_sink.read_manifest_table(spark, out)
    assert m2["total_rows"] == 40
