"""Bloom-filtered join: result parity with the plain join, real pruning,
and the filter sitting on the map side of the exchange."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from victor_spark.operators.runtime_filter import bloom_filtered_join


@pytest.fixture(scope="module")
def fact_dim(spark):
    fact = spark.range(20_000).select(
        (F.col("id") % 5000).alias("key"), (F.col("id") * 7).alias("payload")
    )
    dim = spark.createDataFrame(
        [(k, f"d{k}") for k in range(0, 5000, 100)], "key long, attr string"
    )  # 50 of 5000 keys match
    return fact, dim


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_result_identical_to_plain_join(spark, fact_dim):
    fact, dim = fact_dim
    plain = fact.join(dim, "key")
    bloomed = bloom_filtered_join(fact, dim, "key")
    assert _rows(bloomed) == _rows(plain)


def test_semi_join_parity(spark, fact_dim):
    fact, dim = fact_dim
    plain = fact.join(dim, "key", "left_semi")
    bloomed = bloom_filtered_join(fact, dim, "key", how="semi")
    assert _rows(bloomed) == _rows(plain)


def test_prefilter_actually_prunes(spark, fact_dim):
    fact, dim = fact_dim
    from victor_spark.operators.sketches import bloom_build, bloom_might_contain

    bits = bloom_build(dim.select("key"), "key", m=1 << 20, salt="bj")
    kept = (
        fact.crossJoin(F.broadcast(bits))
        .filter(
            bloom_might_contain(F.col("words"), F.col("key"), m=1 << 20, salt="bj")
        )
        .count()
    )
    true_matches = fact.join(dim, "key", "left_semi").count()  # 200
    # the shuffle-side row count collapses from 20k to ~the match volume
    assert kept < 500
    assert kept >= true_matches  # never a false negative


def test_filter_is_before_the_join_exchange(spark, fact_dim):
    fact, dim = fact_dim
    df = bloom_filtered_join(fact, dim, "key")
    p = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    # the bloom probe is a Filter over the fact scan (below any exchange
    # for the equi-join), expressed via the broadcast words row
    assert "Filter" in p and "CartesianProduct" not in p


def test_outer_join_rejected(spark, fact_dim):
    fact, dim = fact_dim
    with pytest.raises(ValueError):
        bloom_filtered_join(fact, dim, "key", how="left")
