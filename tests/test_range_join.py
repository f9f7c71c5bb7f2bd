"""Range join via bin bucketing (operators/ranges.py): containment
semantics, multi-bin intervals, exactly-once pair production."""

from __future__ import annotations

import pytest

from victor_spark.operators.ranges import range_join_binned


def _join(spark, points, intervals, width=10.0):
    p = spark.createDataFrame(points, "pid long, t double")
    i = spark.createDataFrame(intervals, "iid long, s double, e double")
    out = range_join_binned(p, i, "t", "s", "e", width)
    return {(r["pid"], r["iid"]) for r in out.collect()}


def test_half_open_boundaries(spark):
    # start inclusive, end exclusive
    pairs = _join(
        spark,
        [(0, 10.0), (1, 19.999), (2, 20.0), (3, 9.999)],
        [(100, 10.0, 20.0)],
    )
    assert pairs == {(0, 100), (1, 100)}


def test_interval_spanning_many_bins(spark):
    # interval covers 5 bins at width 10; every point inside matches once
    pairs = _join(
        spark,
        [(i, float(i)) for i in range(0, 60, 7)],
        [(7, 5.0, 48.0)],
    )
    assert pairs == {(t, 7) for t in (7, 14, 21, 28, 35, 42)}


def test_overlapping_intervals_each_match(spark):
    pairs = _join(
        spark,
        [(0, 15.0)],
        [(1, 0.0, 30.0), (2, 10.0, 20.0), (3, 14.0, 16.0), (4, 16.0, 40.0)],
    )
    assert pairs == {(0, 1), (0, 2), (0, 3)}


def test_empty_and_inverted_intervals_match_nothing(spark):
    pairs = _join(
        spark,
        [(0, 5.0)],
        [(1, 5.0, 5.0), (2, 9.0, 3.0)],
    )
    assert pairs == set()


def test_exactly_once_no_dup_pairs(spark):
    # bin-edge point inside a 3-bin interval must appear exactly once
    p = spark.createDataFrame([(0, 20.0)], "pid long, t double")
    i = spark.createDataFrame([(9, 5.0, 35.0)], "iid long, s double, e double")
    rows = range_join_binned(p, i, "t", "s", "e", 10.0).collect()
    assert len(rows) == 1


def test_bad_bin_width_raises(spark):
    p = spark.createDataFrame([(0, 1.0)], "pid long, t double")
    with pytest.raises(ValueError):
        range_join_binned(p, p.selectExpr("pid iid", "t s", "t+1 e"), "t", "s", "e", 0)


def test_plan_has_no_nested_loop(spark):
    """The point of the rewrite: the physical plan must be an equi-join,
    not BroadcastNestedLoopJoin/CartesianProduct."""
    p = spark.range(100).selectExpr("id pid", "CAST(id AS DOUBLE) t")
    i = spark.range(10).selectExpr(
        "id iid", "CAST(id * 37 AS DOUBLE) s", "CAST(id * 37 + 12 AS DOUBLE) e"
    )
    plan = range_join_binned(p, i, "t", "s", "e", 12.0)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan
