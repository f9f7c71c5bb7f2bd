"""Benchmark-contamination detection: n-gram overlap against a held-out set.

A training corpus is 'contaminated' when documents share long n-grams with
an evaluation benchmark. The scalable shape is the same as MinHash dedup's
verify stage, minus the LSH (the benchmark side is small by construction):

  corpus → distinct shingle hashes per doc  (map-side, codegen)
  benchmark → distinct shingle-hash SET     (small: broadcast)
  explode corpus hashes ⨝ broadcast bench   (no corpus shuffle)
  groupBy doc → overlap count               (partial agg map-side)

At 100 TB the only shuffle is the final per-doc count aggregation, whose
input is already reduced to (doc, matching-hash) pairs — documents with no
benchmark overlap (the vast majority) contribute nothing after the join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from victor_spark.functions import hashing as H


def ngram_overlap(docs: DataFrame, bench: DataFrame, id_col: str,
                  content_col: str, shingle_n: int = 3,
                  unit: str = "word") -> DataFrame:
    """Per-document count of distinct shingle hashes shared with `bench`.

    Returns (id, n_shingles, n_shared) for documents sharing ≥ 1 shingle;
    join semantics are over 32-bit md5 shingle hashes on both sides, so
    the DuckDB oracle (list_intersect over the same hash lists) matches
    exactly.

    This is the large-benchmark path (explode + hash join): it never
    requires the benchmark hash set to fit in one array, at the cost of a
    distinct shuffle on the benchmark side and a count aggregation over
    the matching (doc, hash) pairs. For benchmarks of ordinary size
    (eval sets: thousands of docs, ≤ a few million shingles) prefer
    :func:`ngram_overlap_small_bench`, which does the whole comparison
    map-side.
    """
    h = H.shingle_hashes(content_col, shingle_n, unit)
    bench_hashes = (
        bench.select(F.explode(h).alias("bh")).distinct()
    )
    return (
        docs.select(
            F.col(id_col),
            F.size(h).alias("n_shingles"),
            F.explode(h).alias("ch"),
        )
        .join(F.broadcast(bench_hashes), F.col("ch") == F.col("bh"))
        .groupBy(id_col, "n_shingles")
        .agg(F.count("*").alias("n_shared"))
    )


def ngram_overlap_small_bench(docs: DataFrame, bench: DataFrame, id_col: str,
                              content_col: str, shingle_n: int = 3,
                              unit: str = "word") -> DataFrame:
    """Same result as :func:`ngram_overlap`, optimized for a small benchmark.

    The benchmark's distinct shingle hashes are collapsed into ONE array
    row (collect_set) and broadcast; each corpus row computes
    ``size(array_intersect(h, bench))`` map-side. No explode, no distinct
    shuffle, no count aggregation — the corpus pipeline is a single
    narrow projection, so the operator adds zero shuffles to whatever
    produced the corpus. Array size is the limit: ~10M 64-bit hashes ≈
    80 MB broadcast, beyond which use :func:`ngram_overlap`.
    """
    h = H.shingle_hashes(content_col, shingle_n, unit)
    bench_arr = bench.select(F.explode(h).alias("bh")).agg(
        F.collect_set("bh").alias("bl")
    )
    return (
        docs.select(F.col(id_col), F.size(h).alias("n_shingles"), h.alias("_h"))
        .crossJoin(F.broadcast(bench_arr))
        .withColumn("n_shared", F.size(F.array_intersect("_h", "bl")).cast("long"))
        .filter(F.col("n_shared") >= 1)
        .select(id_col, "n_shingles", "n_shared")
    )
