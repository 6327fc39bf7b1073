"""rollup_gapfill: bucket scaffolding and the three fill modes."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from pyspark_scd_spark.operators.timeseries import rollup_gapfill


def _rows(spark):
    # key 'a': observations at hours 0 and 3 (two-gap hole), so
    # interp must produce 20 and 30 at hours 1 and 2.
    return spark.createDataFrame(
        [
            ("a", datetime(2024, 1, 1, 0, 30), 10.0),
            ("a", datetime(2024, 1, 1, 3, 10), 40.0),
            ("b", datetime(2024, 1, 1, 1, 5), 7.0),
        ],
        ["k", "ts", "v"],
    )


def _run(spark, fill):
    out = rollup_gapfill(
        _rows(spark), ["k"], "ts", F.col("v"), bucket_width="hour",
        step="interval 1 hour", fill=fill,
    )
    return {
        (r["k"], r["bucket"].hour): (r["bucket_value"], r["is_gap"])
        for r in out.collect()
    }


def test_scaffold_materializes_gaps(spark):
    got = _run(spark, "zero")
    assert set(got) == {("a", 0), ("a", 1), ("a", 2), ("a", 3), ("b", 1)}
    assert got[("a", 1)] == (0.0, True)
    assert got[("a", 0)] == (10.0, False)


def test_locf(spark):
    got = _run(spark, "locf")
    assert got[("a", 1)][0] == 10.0 and got[("a", 2)][0] == 10.0
    assert got[("a", 3)][0] == 40.0


def test_interp(spark):
    got = _run(spark, "interp")
    assert got[("a", 1)][0] == 20.0
    assert got[("a", 2)][0] == 30.0
    assert got[("b", 1)][0] == 7.0  # single observation: no gaps


def test_epoch_us_ntz_and_ltz(spark):
    """epoch_us must agree across TIMESTAMP and TIMESTAMP_NTZ inputs
    (UTC session) — the NTZ form is what the driver testdata yields."""
    import datetime as dt

    from pyspark.sql import functions as F

    from pyspark_scd_spark.functions.time import as_event_time, epoch_us

    t = dt.datetime(2024, 1, 2, 3, 4, 5, 123456)
    df = spark.createDataFrame([(t,)], "ts timestamp")
    ntz = df.select(F.col("ts").cast("timestamp_ntz").alias("ts"))
    a = df.select(epoch_us("ts").alias("e")).first()["e"]
    b = ntz.select(epoch_us("ts").alias("e")).first()["e"]
    assert a == b == int(t.replace(tzinfo=dt.timezone.utc).timestamp() * 1e6)
    # as_event_time restores a watermark-legal TIMESTAMP from NTZ
    assert dict(ntz.select(as_event_time("ts").alias("ts")).dtypes)["ts"] == "timestamp"


def test_cusum_fires_after_planted_level_shift(spark):
    import datetime as dt

    from pyspark_scd_spark.operators import timeseries as TS

    base = dt.date(2024, 1, 1)
    # 30 flat days at 10, then a sustained shift to 14
    rows = [
        ("a", base + dt.timedelta(days=i), 10 if i < 30 else 14)
        for i in range(45)
    ]
    daily = spark.createDataFrame(rows, ["event_type", "day", "cnt"])
    got = TS.cusum_changepoints(
        daily, slack=0.5, threshold=3.0
    ).collect()
    days = sorted((r["day"] - base).days for r in got)
    # fires only AFTER the shift, within a few days of day 30, and
    # keeps firing while the shift persists
    assert days, "detector never fired"
    assert days[0] >= 30
    assert days[0] <= 36
    assert days[-1] == 44
