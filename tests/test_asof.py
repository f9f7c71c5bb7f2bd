"""asof_join semantics (operators/asof.py): backward match, exact-ts
inclusive, null when no prior right row, latest-prior wins."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from victor_spark.operators.asof import asof_join


def _ts(s: int):
    return dt.datetime(2024, 1, 1, 0, 0, s)


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [(1, 1, _ts(5)), (2, 1, _ts(20)), (3, 2, _ts(10)), (4, 3, _ts(10))],
        "lid long, k long, ts timestamp",
    )
    right = spark.createDataFrame(
        # k=1: rows at 4 and 10 — lid=1 (ts=5) takes 4, lid=2 (ts=20) takes 10
        # k=2: row exactly at 10 — inclusive match
        # k=3: no rows — nulls
        [(100, 1, _ts(4)), (101, 1, _ts(10)), (200, 2, _ts(10))],
        "rid long, k long, ts timestamp",
    )
    got = {
        r["lid"]: (r["rid_r"], r["ts_r"])
        for r in asof_join(left, right, on=["k"], suffix="_r").collect()
    }
    assert got[1] == (100, _ts(4))
    assert got[2] == (101, _ts(10))  # latest prior, not first
    assert got[3] == (200, _ts(10))  # exact-ts inclusive
    assert got[4] == (None, None)  # no right rows for key


def test_asof_join_null_payload_atomicity(spark):
    """A NULL payload column in the matched right row must come through as
    NULL — not backfilled from an older right row (row atomicity; pandas
    merge_asof / DuckDB ASOF semantics)."""
    left = spark.createDataFrame([(1, 1, _ts(30))], "lid long, k long, ts timestamp")
    right = spark.createDataFrame(
        [(100, "old", 1, _ts(10)), (101, None, 1, _ts(20))],
        "rid long, label string, k long, ts timestamp",
    )
    [row] = asof_join(left, right, on=["k"], suffix="_r").collect()
    assert row["rid_r"] == 101
    assert row["label_r"] is None  # from row 101, NOT "old" from row 100


def test_asof_join_plan_single_shuffle(spark):
    left = spark.range(10).select(
        F.col("id").alias("lid"),
        (F.col("id") % 3).alias("k"),
        F.timestamp_seconds(F.col("id")).alias("ts"),
    )
    right = spark.range(5).select(
        F.col("id").alias("rid"),
        (F.col("id") % 3).alias("k"),
        F.timestamp_seconds(F.col("id")).alias("ts"),
    )
    plan = (
        asof_join(left, right, on=["k"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    # one exchange for the window partitioning; no nested-loop/cartesian
    assert plan.count("Exchange hashpartitioning") == 1
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan
