"""Learned quality classifier — the ML leg of corpus curation.

Production pretraining pipelines (CCNet, LLaMA, RefinedWeb) pair the cheap
rule filters (text.py::quality_score, the Gopher signals) with a LEARNED
classifier (usually fastText) trained on weak labels: "looks like a good
page" vs "looks like junk". This module is that step on pyspark.ml —
RegexTokenizer → HashingTF (the hashing trick keeps the feature space
fixed-width with no vocabulary broadcast) → LogisticRegression — so the
whole train/score path is Spark-native and scales with the corpus: TF
hashing is map-side, and LR's L-BFGS iterations are treeAggregate passes
over the feature rows.

The weak-labeling seam is an argument (any boolean Column); the catalog
query feeds it the Gopher composite rule, which is exactly how a
bootstrap curation pass works before human labels exist. A fastText/BERT
scorer would replace the estimator behind the same train/score contract.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def train_quality_classifier(docs: DataFrame, text_col: str,
                             weak_label: Column, num_features: int = 4096,
                             max_iter: int = 10):
    """Fit the tokenize→hash→LR pipeline on weak labels; returns the
    fitted PipelineModel."""
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import HashingTF, RegexTokenizer

    train = docs.select(
        F.col(text_col).alias("_text"), weak_label.cast("double").alias("label")
    )
    pipe = Pipeline(stages=[
        RegexTokenizer(inputCol="_text", outputCol="_toks",
                       pattern=r"\s+", toLowercase=True),
        HashingTF(inputCol="_toks", outputCol="features",
                  numFeatures=num_features),
        LogisticRegression(maxIter=max_iter, regParam=0.01,
                           featuresCol="features", labelCol="label"),
    ])
    return pipe.fit(train)


def score_quality(model, docs: DataFrame, text_col: str,
                  out_col: str = "ml_quality") -> DataFrame:
    """Attach ``out_col`` = P(good) from the fitted model; keeps all input
    columns. Scoring is one map-side pass (no shuffle)."""
    from pyspark.ml.functions import vector_to_array

    scored = model.transform(docs.withColumn("_text", F.col(text_col)))
    return scored.withColumn(
        out_col, vector_to_array("probability").getItem(1)
    ).drop("_text", "_toks", "features", "rawPrediction", "probability", "prediction")
