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


def quality_feature_columns(text_col: str) -> list[Column]:
    """The interpretable feature vector for the linear scorer, in fixed
    order: [ln(1+n_tokens), avg_token_len, punct_ratio, stopword_ratio].

    Each is a pure codegen Column with an exact DuckDB twin (the same
    fragments the text_stats oracle uses), which is what makes a model
    over them oracle-replayable: score = sigmoid(b + w·f) is one SQL
    expression."""
    from victor_spark.functions import text as T

    return [
        F.log1p(T.token_count(text_col).cast("double")),
        T.avg_token_len(text_col),
        T.punct_ratio(text_col),
        T.stopword_ratio(text_col),
    ]


def train_feature_lr(docs: DataFrame, text_col: str, weak_label: Column,
                     max_iter: int = 50,
                     reg_param: float = 0.1) -> tuple[float, list[float]]:
    """Fit LogisticRegression over the interpretable features; returns
    (intercept, coefficients) for baking into score_linear as literals.

    This is the 'train once, export weights' leg: training is a bounded
    offline job (L-BFGS treeAggregate passes), the exported scalars ride
    along in code/config, and serving is pure map-side codegen — the shape
    every production quality-classifier deployment uses (train offline,
    score with frozen weights)."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.functions import array_to_vector

    feats = quality_feature_columns(text_col)
    train = docs.select(
        array_to_vector(F.array(*feats)).alias("features"),
        weak_label.cast("double").alias("label"),
    )
    # L2 regularization keeps the exported weights finite even when the
    # weak labels are (near-)separable in this feature space
    lr = LogisticRegression(maxIter=max_iter, regParam=reg_param,
                            standardization=True,
                            featuresCol="features", labelCol="label")
    m = lr.fit(train)
    return float(m.intercept), [float(c) for c in m.coefficients]


def score_linear(docs: DataFrame, text_col: str, intercept: float,
                 coefficients: list[float],
                 out_col: str = "ml_quality") -> DataFrame:
    """Attach ``out_col`` = sigmoid(intercept + coefficients · features).

    Frozen-weights serving: no model object, no UDF — the whole scorer is
    one whole-stage-codegen expression, so it runs at scan speed over a
    100 TB corpus and replays exactly in the DuckDB oracle."""
    feats = quality_feature_columns(text_col)
    if len(coefficients) != len(feats):
        # zip() would silently truncate — a weights/feature-version
        # mismatch (stale export, sliced list) must be loud, not a
        # plausible-looking partial dot product (review-caught)
        raise ValueError(
            f"expected {len(feats)} coefficients (one per quality "
            f"feature), got {len(coefficients)}"
        )
    z = F.lit(float(intercept))
    for w, f in zip(coefficients, feats):
        z = z + F.lit(float(w)) * f
    return docs.withColumn(out_col, F.lit(1.0) / (F.lit(1.0) + F.exp(-z)))


_PIPELINE_COLS = ("_text", "_toks", "features", "rawPrediction",
                  "probability", "prediction")


def score_quality(model, docs: DataFrame, text_col: str,
                  out_col: str = "ml_quality") -> DataFrame:
    """Attach ``out_col`` = P(good) from the fitted model; keeps all input
    columns. Scoring is one map-side pass (no shuffle).

    Input columns may not collide with the pipeline's internals
    (review-caught: a pre-existing 'features' column crashed transform
    with 'output column already exists', and a column literally named
    '_text' was silently overwritten then DROPPED — data loss)."""
    from pyspark.ml.functions import vector_to_array

    clash = [c for c in docs.columns if c in _PIPELINE_COLS]
    if clash:
        raise ValueError(
            f"input columns {clash} collide with the scoring pipeline's "
            f"internal columns {_PIPELINE_COLS}; rename them first"
        )
    scored = model.transform(docs.withColumn("_text", F.col(text_col)))
    return scored.withColumn(
        out_col, vector_to_array("probability").getItem(1)
    ).drop(*_PIPELINE_COLS)
