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


def test_feature_lr_train_export_and_frozen_scoring(spark):
    import math

    from victor_spark.functions import text as T
    from victor_spark.operators.quality_ml import (
        quality_feature_columns,
        score_linear,
        train_feature_lr,
    )

    d = _corpus(spark)
    weak = (T.stopword_ratio("text") >= 0.05) & (T.punct_ratio("text") <= 0.2)
    b, w = train_feature_lr(d, "text", weak, max_iter=25)
    assert len(w) == len(quality_feature_columns("text")) == 4
    assert all(math.isfinite(x) for x in [b, *w])  # L2 keeps weights bounded
    out = score_linear(d, "text", b, w)
    rows = {r["doc_id"]: r["ml_quality"] for r in out.collect()}
    good_avg = sum(v for k, v in rows.items() if k < 100) / 20
    junk_avg = sum(v for k, v in rows.items() if k >= 100) / 20
    assert good_avg > 0.8 and junk_avg < 0.2
    # frozen-weights serving: same literals -> bit-identical rescore
    again = {r["doc_id"]: r["ml_quality"]
             for r in score_linear(d, "text", b, w).collect()}
    assert rows == again


def test_score_linear_replays_in_python(spark):
    """The frozen scorer is a pure dot+sigmoid — verify against a direct
    Python computation of the same features on a known doc."""
    import math

    from victor_spark.operators.quality_ml import score_linear

    text = "the cat sat on the mat!"
    d = spark.createDataFrame([(1, text)], "doc_id long, text string")
    b, w = 0.5, [0.25, -0.1, 2.0, 1.5]
    got = score_linear(d, "text", b, w).first()["ml_quality"]
    toks = [t for t in text.split(" ") if t]
    f1 = math.log1p(len(toks))
    f2 = sum(len(t) for t in toks) / len(toks)
    f3 = sum(1 for c in text if not (c.isalnum() or c == " ")) / len(text)
    stop = {"the", "a", "an", "and", "or", "of", "to", "in", "is", "it"}
    f4 = sum(1 for t in toks if t.lower() in stop) / len(toks)
    z = b + w[0] * f1 + w[1] * f2 + w[2] * f3 + w[3] * f4
    assert abs(got - 1.0 / (1.0 + math.exp(-z))) < 1e-12


def test_scoring_guards(spark):
    """Review-caught pair: a coefficients/feature-count mismatch silently
    truncated via zip (plausible-looking partial dot products), and input
    columns colliding with the ML pipeline's internals crashed transform
    or silently dropped user data."""
    import pytest

    from victor_spark.operators.quality_ml import score_linear, score_quality

    docs = spark.createDataFrame([(1, "some text here")], "id long, text string")
    with pytest.raises(ValueError, match="coefficients"):
        score_linear(docs, "text", 0.0, [0.1, 0.2, 0.3])  # 3 != 4 features

    class FakeModel:
        def transform(self, df):  # never reached — the guard fires first
            raise AssertionError("guard should fire before transform")

    bad = docs.withColumn("features", docs.id)
    with pytest.raises(ValueError, match="collide"):
        score_quality(FakeModel(), bad, "text")
