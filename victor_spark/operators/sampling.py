"""Deterministic sampling/splitting for training-data pipelines.

Both operators key on a salted 32-bit md5 of the row id, so:

- assignment is a pure function of (salt, id) — reproducible across runs,
  sessions, cluster sizes, and engines (the DuckDB oracle replays the same
  md5 arithmetic);
- no shuffle, no RNG state: the split/sample predicate evaluates map-side
  inside whole-stage codegen and pushes through scans like any other
  filter, so at 100 TB a 1% sample reads ~1% of row groups' worth of
  downstream work with zero coordination;
- adding a new split/rate never reassigns existing rows (the bucket of a
  row is fixed forever) — the property that makes hash splits the standard
  for train/val/test hygiene.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from victor_spark.functions import hashing as H

BUCKETS = 1000


def sample_bucket(id_col: str | Column, salt: str) -> Column:
    """Deterministic bucket in [0, BUCKETS) from a salted md5 of the id."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return H.md5_32(F.concat(F.lit(salt + ":"), c.cast("string"))) % BUCKETS


def split_label(id_col: str | Column, salt: str = "split",
                weights: dict[str, float] | None = None) -> Column:
    """Map each row to a named split by cumulative bucket thresholds.

    weights are fractions summing to ≤ 1 (remainder falls into the last
    split); default 80/10/10 train/val/test. Weights are VALIDATED
    (review-caught: a sum > 1 silently emptied later splits — the
    train/test-hygiene bug that surfaces only as a mysteriously empty
    split — and an explicitly-passed {} fell through to the default). A
    positive weight below the 1/BUCKETS granularity still gets one
    bucket. NULL ids get a NULL split (they used to concentrate
    deterministically in the LAST split — contaminating 'test')."""
    if weights is not None and not weights:
        raise ValueError("weights must be a non-empty mapping")
    weights = weights or {"train": 0.8, "val": 0.1, "test": 0.1}
    if any(w < 0 for w in weights.values()):
        raise ValueError(f"negative split weight in {weights}")
    if sum(weights.values()) > 1.0 + 1e-9:
        raise ValueError(
            f"split weights sum to {sum(weights.values())} > 1: a later "
            f"split would be silently empty"
        )
    bucket = sample_bucket(id_col, salt)
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    expr = F.when(c.isNull(), F.lit(None).cast("string"))
    acc = 0.0
    names = list(weights)
    for name in names[:-1]:
        acc += weights[name]
        # int(round(...)) is the committed bucket-edge rule (the oracle
        # SQL states these literals); a positive weight never rounds to
        # an empty range
        edge = int(round(acc * BUCKETS))
        if weights[name] > 0:
            edge = max(edge, int(round((acc - weights[name]) * BUCKETS)) + 1)
        expr = expr.when(bucket < edge, name)
    return expr.otherwise(names[-1]).alias("split")


def hash_split(df: DataFrame, id_col: str, salt: str = "split",
               weights: dict[str, float] | None = None) -> DataFrame:
    """Attach a deterministic `split` column (train/val/test by default)."""
    return df.withColumn("split", split_label(id_col, salt, weights))


def stratified_hash_sample(df: DataFrame, id_col: str, rate: float,
                           salt: str = "sample") -> DataFrame:
    """Keep a deterministic ~rate fraction of rows.

    'Stratified' falls out for free: because membership depends only on
    the row id, the realized rate concentrates around `rate` within every
    stratum (language, source, …) without per-stratum state — group the
    output by any column to audit. For exact per-stratum rates use
    per-stratum thresholds on :func:`sample_bucket` instead.

    A positive rate below the 1/BUCKETS granularity keeps one bucket
    (review-caught: round-half-to-even made rate=0.0005 an ALWAYS-EMPTY
    sample). NULL ids never pass the predicate — they carry no stable
    bucket (the same non-participation policy as split_label's NULL
    split).
    """
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    threshold = int(round(rate * BUCKETS))
    if rate > 0:
        threshold = max(threshold, 1)
    return df.filter(sample_bucket(id_col, salt) < threshold)
