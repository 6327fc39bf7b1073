"""Time-series rollups — the "hypertable continuous aggregate" family.

A time-partitioned events table rolled up to fixed buckets has two
properties a plain groupBy misses: empty buckets must EXIST (a
monitoring consumer reading the rollup must distinguish "no events"
from "bucket not materialized"), and carried-forward values must be
computable without a self-join. Both are DataFrame-expressible:
``sequence()`` explodes the per-key time span into a scaffold, and
``last(ignorenulls=True)`` over an unbounded-preceding frame is LOCF.

Scale: the scaffold is |keys| x |buckets-in-span| rows — generated,
never shuffled (the explode happens after the per-key span agg, which
is the only exchange). The LOCF window re-uses the scaffold's
(key, bucket) partitioning, so gap-fill adds zero exchanges on top of
the rollup itself.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def rollup_gapfill(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    value: Column,
    bucket_width: str = "hour",
    step: str = "interval 1 hour",
    fill: str = "locf",
    quantize_interp: bool = False,
) -> DataFrame:
    """Bucketed rollup with materialized empty buckets.

    Returns (key_cols..., bucket, bucket_value, is_gap) where bucket
    covers every ``step`` between each key's first and last event.
    ``fill``: 'locf' carries the last seen value forward (0 before
    the first observation), 'zero' fills gaps with 0, 'interp'
    linearly interpolates between the neighboring observed buckets
    (falling back to the nearest observed value at the span edges).

    ``quantize_interp=True`` snaps interpolated values to integers
    via ``floor(x + 0.5)`` — for integer-unit metrics (cents, counts)
    this makes 'interp' reproducible across engines (exact .5
    midpoints are where decimal ROUND implementations disagree). It
    changes semantics for real-valued metrics (1.0→1.5 interpolates
    to 1.0, not 1.25), so it is opt-in; the oracle-paired registry
    queries set it because their metrics are integer cents.
    """
    keys = list(key_cols)
    agg = df.groupBy(
        *keys, F.date_trunc(bucket_width, F.col(ts_col)).alias("bucket")
    ).agg(F.sum(value).alias("__v"))
    span = agg.groupBy(*keys).agg(
        F.min("bucket").alias("__b0"), F.max("bucket").alias("__b1")
    )
    scaffold = span.select(
        *keys,
        F.explode(
            F.sequence(F.col("__b0"), F.col("__b1"), F.expr(step))
        ).alias("bucket"),
    )
    joined = scaffold.join(agg, [*keys, "bucket"], "left").withColumn(
        "is_gap", F.col("__v").isNull()
    )
    if fill == "locf":
        w = (
            Window.partitionBy(*keys)
            .orderBy("bucket")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        filled = F.coalesce(
            F.last("__v", ignorenulls=True).over(w), F.lit(0)
        )
    elif fill == "zero":
        filled = F.coalesce(F.col("__v"), F.lit(0))
    elif fill == "interp":
        # prev/next OBSERVED value and bucket; the interpolation
        # fraction is computed on epoch seconds so irregular bucket
        # spacing (DST, month buckets) still interpolates linearly in
        # physical time. Both windows reuse the (keys, bucket)
        # ordering — no extra exchange.
        wp = (
            Window.partitionBy(*keys)
            .orderBy("bucket")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        wn = (
            Window.partitionBy(*keys)
            .orderBy("bucket")
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        ep = F.unix_timestamp("bucket").cast("double")
        obs_ep = F.when(F.col("__v").isNotNull(), ep)
        pv = F.last("__v", ignorenulls=True).over(wp)
        pb = F.last(obs_ep, ignorenulls=True).over(wp)
        nv = F.first("__v", ignorenulls=True).over(wn)
        nb = F.first(obs_ep, ignorenulls=True).over(wn)
        raw = pv + (nv - pv) * (ep - pb) / (nb - pb)
        if quantize_interp:
            # The raw interpolation lands on exact .5 midpoints
            # whenever the gap length divides the value delta oddly,
            # and engines' decimal ROUND implementations disagree
            # exactly there (Spark rounds the BigDecimal of the
            # double, DuckDB rounds in double). floor(x+0.5) over
            # exact-integer inputs is deterministic across engines.
            interp = F.floor(raw + F.lit(0.5)).cast("double")
        else:
            interp = raw.cast("double")
        filled = F.coalesce(
            F.col("__v").cast("double"),
            interp,
            pv.cast("double"),
            nv.cast("double"),
        )
    else:
        raise ValueError(f"unknown fill: {fill!r}")
    return joined.withColumn("bucket_value", filled).drop("__v")


def grouped_linear_trend(
    df: DataFrame,
    key_col: str,
    x_col: str,
    y_col: str,
    round_to: int = 4,
) -> DataFrame:
    """Per-group OLS slope of y over x via grouped ``applyInPandas`` —
    the grouped-UDAF pattern: each key's rows arrive as one pandas
    frame over Arrow, the closed-form population slope
    cov_pop(x,y)/var_pop(x) is vectorized numpy, and groups with
    degenerate x (fewer than 2 points, or zero variance) emit nothing.

    The shuffle is the groupBy's hash exchange on the key — identical
    to any aggregate — and per-group state is one group's rows, so
    skew, not scale, is the limit (a hot key's rows must fit one
    task; salting or a two-stage moment aggregation is the fallback).
    Built-ins (covar_pop/var_pop) could express this exact statistic;
    the operator exists as the template for group-wise model fits that
    Catalyst genuinely cannot (regularized/robust fits, per-key
    seasonal decomposition).
    """
    import numpy as np
    import pandas as pd

    out_key = key_col

    def _fit(pdf: "pd.DataFrame") -> "pd.DataFrame":
        x = pdf[x_col].to_numpy(dtype=np.float64)
        y = pdf[y_col].to_numpy(dtype=np.float64)
        if len(x) < 2:
            return pd.DataFrame(
                {out_key: [], "n_points": [], "slope": []}
            )
        xm = x.mean()
        varx = ((x - xm) ** 2).sum()
        if varx == 0.0:
            return pd.DataFrame(
                {out_key: [], "n_points": [], "slope": []}
            )
        slope = ((x - xm) * (y - y.mean())).sum() / varx
        return pd.DataFrame(
            {
                out_key: [pdf[key_col].iloc[0]],
                "n_points": [len(x)],
                "slope": [round(float(slope), round_to)],
            }
        )

    schema = f"{out_key} long, n_points int, slope double"
    return (
        df.select(key_col, x_col, y_col)
        .groupBy(key_col)
        .applyInPandas(_fit, schema=schema)
    )


def robust_outliers_mad(
    df: DataFrame,
    key_col: str,
    value_col: str,
    k: float = 3.0,
    round_to: int = 4,
) -> DataFrame:
    """Per-key robust outlier report via median absolute deviation.

    A value is an outlier when |x - median| > k * 1.4826 * MAD (the
    1.4826 factor makes MAD a consistent sigma estimator under
    normality). Unlike the z-score form (events_anomaly_zscore), the
    median/MAD center is not dragged by the outliers themselves.

    Exact medians need two passes over the data (median, then median
    of deviations) — both are percentile aggregates that combine
    map-side; the per-key stats tables are |keys| rows and BROADCAST
    back onto the scan, so neither pass shuffles the fact table.
    Output: (key, n_events, median_value, mad, n_outliers).
    """
    med = df.groupBy(key_col).agg(
        F.percentile(value_col, F.lit(0.5)).alias("__med")
    )
    dev = df.join(F.broadcast(med), key_col).withColumn(
        "__absdev", F.abs(F.col(value_col) - F.col("__med"))
    )
    mad = dev.groupBy(key_col).agg(
        F.percentile("__absdev", F.lit(0.5)).alias("__mad")
    )
    flagged = dev.join(F.broadcast(mad), key_col)
    return flagged.groupBy(key_col).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.first("__med"), round_to).alias("median_value"),
        F.round(F.first("__mad"), round_to).alias("mad"),
        F.sum(
            F.when(
                F.col("__absdev") > k * 1.4826 * F.col("__mad"), 1
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_outliers"),
    )


def ewma_daily(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    alpha: float = 0.3,
    lookback: int = 28,
    round_to: int = 4,
) -> DataFrame:
    """Exponentially weighted moving average of daily event counts.

    ewma_t = sum_{j<lookback} (1-alpha)^j * cnt_{t-j} / sum weights,
    over the trailing ``lookback`` OBSERVED days per key (row frame,
    matching events_anomaly_zscore's convention). Computed without a
    self-join: collect_list over the window frame (bounded at
    ``lookback`` elements) then a codegen'd aggregate over the array
    indices — the daily rollup is the only exchange on the raw data.
    Output: (day, key, cnt, ewma).
    """
    decay = 1.0 - alpha
    daily = df.groupBy(
        F.to_date(ts_col).alias("day"), key_col
    ).agg(F.count(F.lit(1)).alias("cnt"))
    w = (
        Window.partitionBy(key_col)
        .orderBy("day")
        .rowsBetween(-(lookback - 1), Window.currentRow)
    )
    with_arr = daily.withColumn("__arr", F.collect_list("cnt").over(w))
    n = F.size("__arr")
    idx = F.sequence(F.lit(1), n)
    weight = lambda i: F.pow(F.lit(decay), (n - i).cast("double"))  # noqa: E731
    num = F.aggregate(
        idx,
        F.lit(0.0),
        lambda acc, i: acc + F.element_at("__arr", i) * weight(i),
    )
    den = F.aggregate(
        idx, F.lit(0.0), lambda acc, i: acc + weight(i)
    )
    return with_arr.select(
        "day",
        key_col,
        "cnt",
        F.round(num / den, round_to).alias("ewma"),
    )


def autocorrelation(
    daily: DataFrame,
    lag: int = 7,
    key_col: str = "event_type",
    time_col: str = "day",
    value_col: str = "cnt",
) -> DataFrame:
    """Per-key autocorrelation at a fixed lag over a (daily) rollup —
    the seasonality detector: corr(x_t, x_{t−lag}) near 1 means the
    series repeats with that period (lag=7 → weekly rhythm). Returns
    (key, lag, n_pairs, autocorr).

    The lag pairing joins the rollup to itself on CALENDAR day
    arithmetic (t−lag), not row offsets — a missing day (zero-event
    gap) shortens ``n_pairs`` instead of silently pairing values at
    the wrong calendar distance. The self-join and the correlation
    run over the tiny |days × keys| rollup, never raw events — same
    cost profile as the anomaly/EWMA rollup family.
    """
    prev = daily.select(
        F.col(key_col),
        F.date_add(F.col(time_col), int(lag)).alias(time_col),
        F.col(value_col).alias("__prev"),
    )
    paired = daily.join(prev, [key_col, time_col])
    return paired.groupBy(key_col).agg(
        F.lit(int(lag)).alias("lag"),
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.round(F.corr(value_col, "__prev"), 4).alias("autocorr"),
    )


def cusum_changepoints(
    daily: DataFrame,
    slack: float = 0.5,
    threshold: float = 5.0,
    key_col: str = "event_type",
    time_col: str = "day",
    value_col: str = "cnt",
) -> DataFrame:
    """One-sided CUSUM change-point detection on a per-key series —
    the classic drift detector: S_t = max(0, S_{t−1} + z_t − k)
    accumulates standardized excursions above the series mean and
    flags when it crosses ``threshold``; ``slack`` (k) absorbs noise
    so only sustained shifts alarm.

    The recursion has a closed form — S_t = R_t − min_{u≤t} R_u with
    R_t the running sum of (z − k) — so the whole detector is TWO
    cumulative windows over the rollup series, no iteration and no
    UDF; per-key mean/stddev come from a broadcast aggregate. Returns
    every flagged (key, day) with its cusum statistic.
    """
    from pyspark.sql import Window as W

    stats = daily.groupBy(key_col).agg(
        F.avg(value_col).alias("__mu"),
        F.stddev_pop(value_col).alias("__sd"),
    )
    z = (F.col(value_col) - F.col("__mu")) / F.col("__sd") - F.lit(
        float(slack)
    )
    w = (
        W.partitionBy(key_col)
        .orderBy(time_col)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    run = (
        daily.join(F.broadcast(stats), key_col)
        .filter(F.col("__sd") > 0)
        .withColumn("__r", F.sum(z).over(w))
        .withColumn("__rmin", F.min(F.least(F.col("__r"), F.lit(0.0))).over(w))
        .withColumn(
            "cusum", F.round(F.col("__r") - F.col("__rmin"), 4)
        )
    )
    return run.filter(F.col("cusum") >= threshold).select(
        key_col, time_col, value_col, "cusum"
    )
