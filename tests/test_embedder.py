"""Embed-and-insert path (reference S3/S4/Q1 — tests.rs:145-161 analog).

The hash embedder is deterministic token-overlap similarity, so the
reference's semantic test ('hawaiian pizza' → 'pineapple') becomes a
token-overlap test with the same shape: the query retrieves the document
sharing its tokens, not the unrelated one.
"""

from __future__ import annotations

import math

from victor_spark.functions.embedder import embed_query, _embed_one
from victor_spark.index import VectorIndex


def test_embedder_deterministic_and_normalized():
    a = _embed_one("spark is a distributed engine", 64)
    b = _embed_one("spark is a distributed engine", 64)
    assert a == b
    assert abs(math.sqrt(sum(x * x for x in a)) - 1.0) < 1e-6


def test_udf_matches_driver_side(spark):
    from pyspark.sql import functions as F
    from victor_spark.functions.embedder import embed

    df = spark.createDataFrame([("hello world",)], "t string")
    got = df.select(embed("t", 64).alias("e")).first()["e"]
    want = _embed_one("hello world", 64)
    assert all(abs(g - w) < 1e-6 for g, w in zip(got, want))


def test_add_and_text_search_end_to_end(spark, tmp_path):
    idx = VectorIndex(spark, str(tmp_path / "idx"))
    idx.add(
        ["pineapple pizza with ham and cheese", "rocks and stones and gravel"],
        tags=["food-or-not"],
    )
    hit = idx.search_text("hawaiian pizza with pineapple", k=1).first()
    assert "pineapple" in hit["content"]
