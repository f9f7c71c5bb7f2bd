"""Bucketed co-located joins: the physical claim (no Exchange on the
bucketed sides) and exact parity with the plain join."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from victor_spark.operators.bucketing import bucketed_join, write_bucketed


@pytest.fixture()
def bucketed_pair(spark, tmp_path):
    left = spark.range(2000).select(
        (F.col("id") % 500).alias("k"), (F.col("id") * 3).alias("a")
    )
    right = spark.range(1500).select(
        (F.col("id") % 500).alias("k"), (F.col("id") + 7).alias("b")
    )
    write_bucketed(left, "bkt_left", "k", 8, path=str(tmp_path / "l"))
    write_bucketed(right, "bkt_right", "k", 8, path=str(tmp_path / "r"))
    yield left, right
    spark.sql("DROP TABLE IF EXISTS bkt_left")
    spark.sql("DROP TABLE IF EXISTS bkt_right")


def test_bucketed_join_has_no_exchange(spark, bucketed_pair):
    """Both sides bucketed on (k, 8) -> the SortMergeJoin reads
    co-located buckets: NO Exchange anywhere in the plan. This is the
    write-once-join-forever contract a 100 TB fact table is bucketed
    for."""
    joined = bucketed_join(spark, "bkt_left", "bkt_right", "k")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan, plan


def test_plain_join_of_same_data_shuffles(spark, bucketed_pair):
    """Control: the identical join over non-bucketed frames exchanges
    both sides — the cost bucketing removes."""
    left, right = bucketed_pair
    plan = (
        left.hint("merge").join(right, "k")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" in plan


def test_bucketed_join_matches_plain_join(spark, bucketed_pair):
    left, right = bucketed_pair
    got = sorted(
        (r["k"], r["a"], r["b"])
        for r in bucketed_join(spark, "bkt_left", "bkt_right", "k").collect()
    )
    want = sorted(
        (r["k"], r["a"], r["b"]) for r in left.join(right, "k").collect()
    )
    assert got == want and len(got) > 0


def test_bucketed_aggregation_has_no_exchange(spark, bucketed_pair):
    """Bucketing serves groupBy on the bucket key too: partial + final
    aggregation collapse into the co-located read, no shuffle."""
    agg = spark.table("bkt_left").groupBy("k").agg(F.sum("a").alias("s"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
