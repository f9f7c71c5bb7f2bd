"""Deterministic split/sample operators: stability, rates, strata."""

from __future__ import annotations

from pyspark.sql import functions as F

from victor_spark.operators.sampling import (
    hash_split,
    sample_bucket,
    stratified_hash_sample,
)


def _ids(spark, n=2000):
    return spark.range(n).withColumnRenamed("id", "doc_id")


def test_split_is_deterministic_and_total(spark):
    d = _ids(spark)
    a = {r["doc_id"]: r["split"] for r in hash_split(d, "doc_id").collect()}
    b = {r["doc_id"]: r["split"] for r in hash_split(d, "doc_id").collect()}
    assert a == b  # pure function of (salt, id)
    assert set(a.values()) == {"train", "val", "test"}
    assert len(a) == 2000  # every row assigned exactly once


def test_split_rates_near_weights(spark):
    counts = {
        r["split"]: r["n"]
        for r in hash_split(_ids(spark), "doc_id").groupBy("split").agg(F.count("*").alias("n")).collect()
    }
    assert abs(counts["train"] / 2000 - 0.8) < 0.05
    assert abs(counts["val"] / 2000 - 0.1) < 0.03
    assert abs(counts["test"] / 2000 - 0.1) < 0.03


def test_split_assignment_stable_under_corpus_growth(spark):
    # the property hash splits exist for: adding rows never reassigns
    # existing rows
    small = {r["doc_id"]: r["split"] for r in hash_split(_ids(spark, 500), "doc_id").collect()}
    big = {r["doc_id"]: r["split"] for r in hash_split(_ids(spark, 2000), "doc_id").collect()}
    assert all(big[k] == v for k, v in small.items())


def test_sample_rate_and_subset(spark):
    d = _ids(spark)
    s = stratified_hash_sample(d, "doc_id", rate=0.2)
    n = s.count()
    assert abs(n / 2000 - 0.2) < 0.04
    # sample of a sample at a higher rate is a superset relation on buckets
    s50 = stratified_hash_sample(d, "doc_id", rate=0.5)
    assert s.join(s50, "doc_id", "left_anti").count() == 0


def test_salts_are_independent(spark):
    d = _ids(spark, 1000)
    overlap = d.filter(
        (sample_bucket("doc_id", "a") < 200) & (sample_bucket("doc_id", "b") < 200)
    ).count()
    # independent 20% samples overlap on ~4%, not ~20%
    assert overlap < 100


def test_split_and_sample_guards(spark):
    """Review-caught trio: weights summing past 1 silently emptied later
    splits; a sub-granularity positive rate rounded to an always-empty
    sample; NULL ids concentrated deterministically in the LAST split
    (contaminating 'test'). All three are loud or safe now."""
    import pytest

    from victor_spark.operators.sampling import (
        hash_split,
        split_label,
        stratified_hash_sample,
    )

    df = spark.createDataFrame(
        [(str(i),) for i in range(2000)] + [(None,)], "id string"
    )
    with pytest.raises(ValueError, match="> 1"):
        hash_split(df, "id", weights={"train": 0.8, "val": 0.3, "test": 0.1})
    with pytest.raises(ValueError, match="non-empty"):
        split_label("id", weights={})
    with pytest.raises(ValueError, match="rate"):
        stratified_hash_sample(df, "id", 1.5)

    # sub-granularity positive rate keeps ONE bucket, not zero
    tiny = stratified_hash_sample(df, "id", 0.0005)
    assert 0 < tiny.count() < 50

    # NULL ids: NULL split (not silently 'test'), excluded from samples
    splits = hash_split(df, "id")
    null_split = splits.filter("id IS NULL").collect()
    assert len(null_split) == 1 and null_split[0]["split"] is None
    assert stratified_hash_sample(df, "id", 0.5).filter("id IS NULL").count() == 0

    # the committed default edges are unchanged (oracle contract):
    # 80/10/10 over 1000 buckets -> proportions hold on real ids
    from pyspark.sql import functions as F

    dist = {r["split"]: r["n"] for r in splits.filter("id IS NOT NULL")
            .groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert 0.75 < dist["train"] / 2000 < 0.85
    assert 0.07 < dist["val"] / 2000 < 0.13
    assert 0.07 < dist["test"] / 2000 < 0.13
