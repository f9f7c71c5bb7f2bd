"""Contamination operators: the two physical strategies must agree."""

from __future__ import annotations

from pyspark.sql import functions as F

from victor_spark.operators.contamination import ngram_overlap, ngram_overlap_small_bench


def test_overlap_strategies_agree(spark):
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox runs far away from here"),
            (3, "completely different words nothing shared at all here"),
        ],
        "id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps high")], "id long, text string"
    )
    big = {
        (r["id"], r["n_shingles"], r["n_shared"])
        for r in ngram_overlap(docs, bench, "id", "text").collect()
    }
    small = {
        (r["id"], r["n_shingles"], r["n_shared"])
        for r in ngram_overlap_small_bench(docs, bench, "id", "text").collect()
    }
    assert big == small
    assert {r[0] for r in big} == {1, 2}  # doc 3 shares nothing

    # doc 1 shares 'the quick brown'/'quick brown fox' (+ 'brown fox jumps')
    d1 = next(r for r in big if r[0] == 1)
    assert d1[2] >= 3


def test_overlap_empty_bench_yields_no_rows(spark):
    docs = spark.createDataFrame([(1, "a b c d e")], "id long, text string")
    bench = docs.filter(F.col("id") < 0)
    assert ngram_overlap_small_bench(docs, bench, "id", "text").count() == 0
    assert ngram_overlap(docs, bench, "id", "text").count() == 0
