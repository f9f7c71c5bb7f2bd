"""Salted skew join: result parity with a plain join + salt spread."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from victor_spark.operators.skew import salted_join


def _tables(spark):
    # pathological: 90% of the big side shares one key
    big = spark.range(10_000).select(
        F.when(F.col("id") % 10 != 0, F.lit(7)).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("payload"),
    )
    small = spark.createDataFrame(
        [(7, "hot"), (0, "cold0"), (20, "cold20"), (999999, "never")],
        "k long, label string",
    )
    return big, small


def test_salted_join_matches_plain_join(spark):
    big, small = _tables(spark)
    got = salted_join(big, small, "k", salt_factor=8).groupBy("k", "label").count()
    want = big.join(small, "k").groupBy("k", "label").count()
    assert sorted(got.collect()) == sorted(want.collect())


def test_salted_join_left_keeps_unmatched(spark):
    big, small = _tables(spark)
    got = salted_join(big, small, "k", salt_factor=4, how="left")
    assert got.count() == big.count()
    assert got.filter(F.col("label").isNull()).count() == big.join(
        small, "k", "left"
    ).filter(F.col("label").isNull()).count()


def test_hot_key_spreads_over_salts(spark):
    big, _ = _tables(spark)
    salted = big.withColumn(
        "_salt",
        F.pmod(F.xxhash64(F.col("k"), F.monotonically_increasing_id()), F.lit(8)),
    )
    n = salted.filter(F.col("k") == 7).select("_salt").distinct().count()
    assert n == 8  # the hot key actually uses every salt bucket


def test_rejects_right_outer(spark):
    big, small = _tables(spark)
    with pytest.raises(ValueError):
        salted_join(big, small, "k", how="right")


def test_salted_join_tolerates_map_columns(spark):
    from victor_spark.operators.skew import salted_join

    big = spark.createDataFrame(
        [(1, {"k": "v"}), (1, {"k2": "v2"}), (2, {})],
        "uid long, props map<string,string>",
    )
    small = spark.createDataFrame([(1, "a"), (2, "b")], "uid long, name string")
    got = salted_join(big, small, "uid", salt_factor=4).collect()
    assert sorted((r["uid"], r["name"]) for r in got) == [(1, "a"), (1, "a"), (2, "b")]
