"""Tests for robust statistics (MAD outliers, EWMA) and PageRank."""

from __future__ import annotations

import datetime as dt

import pytest

from pyspark_scd_spark.operators import graph, timeseries


def test_mad_flags_spike_median_unmoved(spark):
    # 9 values near 10 plus one spike; the median/MAD center must not
    # be dragged by the spike (that is the point vs z-scores).
    rows = [("a", float(v)) for v in [9, 9, 10, 10, 10, 10, 11, 11, 12]]
    rows.append(("a", 1000.0))
    df = spark.createDataFrame(rows, ["k", "value"])
    out = timeseries.robust_outliers_mad(df, "k", "value").collect()[0]
    assert out["median_value"] == 10.0
    assert out["mad"] == 1.0
    assert out["n_outliers"] == 1
    assert out["n_events"] == 10


def test_mad_zero_when_constant(spark):
    df = spark.createDataFrame(
        [("a", 5.0)] * 4, ["k", "value"]
    )
    out = timeseries.robust_outliers_mad(df, "k", "value").collect()[0]
    assert out["mad"] == 0.0 and out["n_outliers"] == 0


def test_ewma_weights_recent_days(spark):
    base = dt.datetime(2024, 1, 1, 12, 0)
    rows = []
    # day 1: 1 event, day 2: 1 event, day 3: 10 events
    for d, n in [(0, 1), (1, 1), (2, 10)]:
        for i in range(n):
            rows.append(("a", base + dt.timedelta(days=d, minutes=i)))
    df = spark.createDataFrame(rows, ["k", "ts"])
    out = {r["day"].day: r for r in timeseries.ewma_daily(df, "k", "ts").collect()}
    assert out[1]["ewma"] == 1.0
    # day3: (10*1 + 1*0.7 + 1*0.49) / (1 + 0.7 + 0.49)
    expected = (10 + 0.7 + 0.49) / (1 + 0.7 + 0.49)
    assert out[3]["ewma"] == pytest.approx(expected, abs=1e-4)
    # smoothed value sits between the min and max observed counts
    assert 1.0 < out[3]["ewma"] < 10.0


def test_pagerank_star_center_wins(spark):
    # undirected star: center <-> each of 4 leaves
    leaves = ["l1", "l2", "l3", "l4"]
    e = [("hub", l) for l in leaves] + [(l, "hub") for l in leaves]
    edges = spark.createDataFrame(e, ["src", "dst"])
    pr = {r["node"]: r["pr"] for r in graph.pagerank(edges, iters=5).collect()}
    assert max(pr, key=pr.get) == "hub"
    # symmetric leaves tie exactly
    assert len({round(pr[l], 10) for l in leaves}) == 1
    # rank mass is conserved (no dangling nodes in this graph)
    assert sum(pr.values()) == pytest.approx(1.0, abs=1e-6)


def test_pagerank_dangling_mass_conserved(spark):
    # a -> b with b dangling: the simplified form leaks b's share of
    # the mass every pass; the redistributed form conserves sum(pr)=1.
    edges = spark.createDataFrame([("a", "b")], ["src", "dst"])
    leaky = {
        r["node"]: r["pr"] for r in graph.pagerank(edges, iters=3).collect()
    }
    assert sum(leaky.values()) < 0.999  # documented leak
    fixed = {
        r["node"]: r["pr"]
        for r in graph.pagerank(
            edges, iters=3, redistribute_dangling=True
        ).collect()
    }
    assert sum(fixed.values()) == pytest.approx(1.0, abs=1e-9)
    # hand-computed first iteration on this 2-node graph:
    # pr(a) = 0.15/2 + 0.85*0.5/2            = 0.2875
    # pr(b) = 0.15/2 + 0.85*0.5 + 0.85*0.5/2 = 0.7125
    one = {
        r["node"]: r["pr"]
        for r in graph.pagerank(
            edges, iters=1, redistribute_dangling=True
        ).collect()
    }
    assert one["a"] == pytest.approx(0.2875, abs=1e-12)
    assert one["b"] == pytest.approx(0.7125, abs=1e-12)


def test_pagerank_dangling_noop_when_no_dangling_nodes(spark):
    # 3-cycle has no dangling nodes: both forms agree exactly.
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a")], ["src", "dst"]
    )
    plain = {
        r["node"]: r["pr"] for r in graph.pagerank(edges, iters=4).collect()
    }
    redis = {
        r["node"]: r["pr"]
        for r in graph.pagerank(
            edges, iters=4, redistribute_dangling=True
        ).collect()
    }
    for k in plain:
        assert redis[k] == pytest.approx(plain[k], abs=1e-12)


def test_pagerank_checkpoint_path(spark):
    # iters > checkpoint_every exercises the lineage-truncation branch
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a")], ["src", "dst"]
    )
    pr = {
        r["node"]: r["pr"]
        for r in graph.pagerank(edges, iters=6, checkpoint_every=2).collect()
    }
    # 3-cycle is symmetric: all equal, sum 1
    assert len({round(v, 10) for v in pr.values()}) == 1
    assert sum(pr.values()) == pytest.approx(1.0, abs=1e-6)


def test_triangle_count_known_graph(spark):
    from pyspark_scd_spark.operators.graph import triangle_count

    # K4 on {1,2,3,4} (4 triangles, every node in 3) plus a pendant
    # edge 4-5 (no triangle) and a duplicate/reversed edge to prove
    # canonicalization.
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5), (2, 1)],
        ["src", "dst"],
    )
    out = {r["node"]: r["triangles"] for r in triangle_count(edges).collect()}
    assert out == {1: 3, 2: 3, 3: 3, 4: 3}
