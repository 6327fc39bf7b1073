"""SCD Type-2 intervals + last-click attribution invariants.

Value-level correctness for both is covered by the DuckDB oracle
(tools/check_oracle.py); these tests pin the semantic invariants on
hand-built fixtures where the expected answer is obvious.
"""

from __future__ import annotations

from datetime import date, datetime

from pyspark.sql import functions as F

from pyspark_scd_spark.operators import scd


def _history(spark):
    # entity 1: A,A,B,B,A  -> three runs (A twice — a revert must open
    # a NEW interval, not merge with the first A run).
    # entity 2: single run, always current.
    rows = [
        (1, date(2024, 1, d), s)
        for d, s in [(1, "A"), (2, "A"), (3, "B"), (4, "B"), (5, "A")]
    ] + [(2, date(2024, 1, 1), "X"), (2, date(2024, 1, 2), "X")]
    return spark.createDataFrame(rows, ["key", "snap_date", "state"])


def test_type2_runs_and_revert(spark):
    df = scd.with_row_hash(_history(spark), ["state"])
    out = scd.type2_intervals(
        df, ["key"], "snap_date", ["state"]
    ).collect()
    one = sorted(
        [r for r in out if r["key"] == 1], key=lambda r: r["valid_from"]
    )
    assert [(r["state"], r["valid_from"].day, r["n_snaps"]) for r in one] == [
        ("A", 1, 2),
        ("B", 3, 2),
        ("A", 5, 1),
    ]
    # intervals tile: valid_to == next valid_from, open run at the end
    assert [r["valid_to"] and r["valid_to"].day for r in one] == [3, 5, None]
    assert [r["is_current"] for r in one] == [False, False, True]


def test_type2_exactly_one_current_per_key(spark):
    df = scd.with_row_hash(_history(spark), ["state"])
    out = scd.type2_intervals(df, ["key"], "snap_date", ["state"])
    per_key = (
        out.groupBy("key")
        .agg(F.sum(F.col("is_current").cast("int")).alias("n_cur"))
        .collect()
    )
    assert all(r["n_cur"] == 1 for r in per_key)


def test_attribution_window_semantics(spark):
    from pyspark_scd_spark.registry import REGISTRY

    ts = lambda m, s=0: datetime(2024, 1, 1, m // 60, m % 60, s)
    rows = [
        # user 1: click -> purchase 10 min later (attributed)
        (1, 1, ts(0), "click"),
        (2, 1, ts(10), "purchase"),
        # user 1: second purchase 70 min after the SAME click (stale)
        (3, 1, ts(70, 30), "purchase"),
        # user 2: purchase with no click at all
        (4, 2, ts(5), "purchase"),
        # user 3: two clicks — the LATER one must win
        (5, 3, ts(0), "click"),
        (6, 3, ts(20), "click"),
        (7, 3, ts(30), "purchase"),
    ]
    ev = spark.createDataFrame(
        rows, ["event_id", "user_id", "ts", "event_type"]
    ).withColumn("value", F.lit(0.0)).withColumn("props", F.lit("{}"))

    import pyspark_scd_spark.registry as reg

    orig = reg.read_parquet_table
    # reuse the registered builder against the in-memory fixture
    try:
        reg.__dict__["_fixture"] = ev

        def fake(spark_, sf_dir, name):
            assert name == "events"
            return ev

        reg.__dict__["read_parquet_table"] = fake
        # _t resolves read_parquet_table at call time via module global
        out = {
            r["purchase_id"]: r
            for r in REGISTRY["events_attribution"]
            .builder(spark, "unused")
            .collect()
        }
    finally:
        reg.__dict__["read_parquet_table"] = orig

    assert out[2]["click_event_id"] == 1 and out[2]["attributed"]
    assert out[2]["seconds_since_click"] == 600
    assert out[3]["click_event_id"] is None and not out[3]["attributed"]
    assert out[4]["click_event_id"] is None and not out[4]["attributed"]
    assert out[7]["click_event_id"] == 6 and out[7]["seconds_since_click"] == 600
