"""Learned quality classifier: pipeline shape + sane separation."""

from __future__ import annotations

from pyspark.sql import functions as F

from victor_spark.operators.quality_ml import score_quality, train_quality_classifier


def _corpus(spark):
    good = [(i, "the quick brown fox jumps over the lazy dog and runs far away " * 3)
            for i in range(20)]
    junk = [(100 + i, "zzzz " + "@@@@ ####" * 5) for i in range(20)]
    return spark.createDataFrame(good + junk, "doc_id long, text string")


def test_classifier_separates_obvious_classes(spark):
    from victor_spark.functions import text as T

    d = _corpus(spark)
    weak = (T.stopword_ratio("text") >= 0.05) & (T.punct_ratio("text") <= 0.2)
    model = train_quality_classifier(d, "text", weak, num_features=512, max_iter=5)
    out = score_quality(model, d, "text")
    rows = {r["doc_id"]: r["ml_quality"] for r in out.collect()}
    assert len(rows) == 40
    good_avg = sum(v for k, v in rows.items() if k < 100) / 20
    junk_avg = sum(v for k, v in rows.items() if k >= 100) / 20
    assert good_avg > 0.9 and junk_avg < 0.1
    # scoring keeps input columns and adds exactly the probability
    assert set(out.columns) == {"doc_id", "text", "ml_quality"}
