"""Deduplication operators for training-data curation.

Five dedup families, all shuffle-conscious:

- exact:     hash-groupBy on content — one shuffle on a 32-byte digest, the
             cheapest possible dedup at 100 TB (shuffle carries digests and
             ids, never the documents).
- minhash:   shingle → MinHash signature → LSH banding → band-bucket join →
             exact Jaccard verify. The join shuffles only (band_key, id,
             signature); candidate generation never compares all pairs.
- simhash:   32-bit SimHash fingerprint → block on fingerprint high bits →
             Hamming-distance verify within blocks.
- ngram:     exact n-gram Jaccard over candidate pairs (the verifier used
             by minhash, exposed standalone).
- embedding: cosine near-duplicate pairs over the embedding column, blocked
             by hyperplane-LSH buckets (see operators/ann.py).

Hashes come from functions/hashing.py and are reproducible in the DuckDB
oracle, so even the approximate operators are exactly verifiable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from victor_spark.functions import hashing as H
from victor_spark.functions.vector import cosine, to_double_array


def exact_duplicates(df: DataFrame, id_col: str, content_col: str) -> DataFrame:
    """Groups of byte-identical documents.

    Returns (content_hash, n_docs, min_id) for groups with n_docs > 1 —
    the keep-one-representative form. Map-side partial aggregation means
    the shuffle carries one row per distinct digest per partition.
    """
    return (
        df.select(F.sha2(F.col(content_col), 256).alias("content_hash"), F.col(id_col))
        .groupBy("content_hash")
        .agg(F.count("*").alias("n_docs"), F.min(id_col).alias("keep_id"))
        .filter(F.col("n_docs") > 1)
    )


def with_minhash(df: DataFrame, content_col: str, num_hashes: int = 16,
                 shingle_n: int = 3) -> DataFrame:
    """Attach `sig` (MinHash signature array<bigint>) to each row."""
    return df.withColumn(
        "sig", H.minhash_signature(H.shingle_hashes(content_col, shingle_n), num_hashes)
    )


def minhash_candidate_pairs(df: DataFrame, id_col: str, content_col: str,
                            num_hashes: int = 16, bands: int = 8,
                            shingle_n: int = 3) -> DataFrame:
    """LSH candidate pairs (id_a < id_b) sharing at least one band bucket.

    Plan shape: signature is computed map-side; explode(bands) multiplies
    rows by `bands` (cheap — rows are (key, id) pairs); the self-join
    shuffles on band_key only. At 100 TB the band_key distribution is the
    thing to watch — a degenerate corpus (one giant near-dup cluster) makes
    a hot key, which AQE skew-join splitting handles.
    """
    rows_per_band = num_hashes // bands
    sig = with_minhash(df, content_col, num_hashes, shingle_n).select(
        F.col(id_col).alias("doc"), "sig"
    )
    banded = sig.select(
        "doc", F.explode(H.band_keys("sig", bands, rows_per_band)).alias("band_key")
    )
    left = banded.alias("l")
    right = banded.alias("r")
    return (
        left.join(right, (F.col("l.band_key") == F.col("r.band_key"))
                  & (F.col("l.doc") < F.col("r.doc")))
        .select(F.col("l.doc").alias("id_a"), F.col("r.doc").alias("id_b"))
        .distinct()
    )


def ngram_jaccard(df_pairs: DataFrame, docs: DataFrame, id_col: str,
                  content_col: str, shingle_n: int = 3) -> DataFrame:
    """Exact character-n-gram Jaccard for each (id_a, id_b) pair.

    Joins the shingle sets in (both joins broadcast when docs is small;
    sort-merge on id otherwise) and computes |∩|/|∪| natively.
    """
    sh = docs.select(
        F.col(id_col).alias("_id"), H.char_shingles(content_col, shingle_n).alias("_sh")
    )
    return (
        df_pairs.join(sh.withColumnRenamed("_id", "id_a").withColumnRenamed("_sh", "sh_a"), "id_a")
        .join(sh.withColumnRenamed("_id", "id_b").withColumnRenamed("_sh", "sh_b"), "id_b")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
            / F.size(F.array_union("sh_a", "sh_b")),
        )
        .drop("sh_a", "sh_b")
    )


def minhash_near_duplicates(df: DataFrame, id_col: str, content_col: str,
                            threshold: float = 0.7, num_hashes: int = 16,
                            bands: int = 8, shingle_n: int = 3) -> DataFrame:
    """Full MinHash-LSH dedup: candidates by banding, verified by exact
    Jaccard ≥ threshold. Returns (id_a, id_b, jaccard)."""
    cands = minhash_candidate_pairs(df, id_col, content_col, num_hashes, bands, shingle_n)
    verified = ngram_jaccard(cands, df, id_col, content_col, shingle_n)
    return verified.filter(F.col("jaccard") >= threshold)


def simhash_fingerprints(df: DataFrame, id_col: str, content_col: str) -> DataFrame:
    """(id, simhash) — 32-bit SimHash over whitespace-token hashes."""
    from victor_spark.functions.text import tokens

    token_hashes = F.transform(tokens(content_col), lambda t: H._md5_32_expr(t))
    return df.select(
        F.col(id_col).alias("doc"), H.simhash32(token_hashes).alias("simhash")
    )


def simhash_near_duplicates(df: DataFrame, id_col: str, content_col: str,
                            max_hamming: int = 3, block_bits: int = 16) -> DataFrame:
    """SimHash pairs within Hamming ≤ max_hamming, blocked on the top
    `block_bits` bits of the fingerprint (standard multi-probe blocking:
    near-identical token bags almost surely agree on the high bits).
    Returns (id_a, id_b, hamming)."""
    fp = simhash_fingerprints(df, id_col, content_col).withColumn(
        "block", F.shiftright(F.col("simhash"), 32 - block_bits)
    )
    l, r = fp.alias("l"), fp.alias("r")
    return (
        l.join(r, (F.col("l.block") == F.col("r.block")) & (F.col("l.doc") < F.col("r.doc")))
        .select(
            F.col("l.doc").alias("id_a"),
            F.col("r.doc").alias("id_b"),
            H.hamming32(F.col("l.simhash"), F.col("r.simhash")).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
    )


def embedding_near_duplicates(df: DataFrame, id_col: str, vec_col: str,
                              threshold: float = 0.95, num_planes: int = 8) -> DataFrame:
    """Embedding-cosine near-dup pairs, LSH-bucketed.

    Blocks the O(n²) comparison by hyperplane bucket (vectors with cosine ≥
    0.95 are within ~18°, so they collide on all planes with high prob).
    Returns (id_a, id_b, cos_sim).
    """
    v = df.select(
        F.col(id_col).alias("doc"),
        to_double_array(vec_col).alias("vec"),
        H.hyperplane_bucket(to_double_array(vec_col), num_planes).alias("bucket"),
    )
    l, r = v.alias("l"), v.alias("r")
    return (
        l.join(r, (F.col("l.bucket") == F.col("r.bucket")) & (F.col("l.doc") < F.col("r.doc")))
        .select(
            F.col("l.doc").alias("id_a"),
            F.col("r.doc").alias("id_b"),
            cosine(F.col("l.vec"), F.col("r.vec")).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )
