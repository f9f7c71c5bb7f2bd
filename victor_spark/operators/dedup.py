"""Deduplication operators for training-data curation.

Six dedup families, all shuffle-conscious:

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
- semantic:  SemDeDup — nearest-centroid clustering, then cosine dedup
             within clusters only (per-cluster O(c²), never global).

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
    NULL-content rows are EXCLUDED (review-caught: sha2(NULL) is NULL and
    groupBy pools all NULLs, so 500 rows with MISSING text would read as
    one "byte-identical" group and a keep-one pipeline would drop 499
    rows that were never duplicates).
    """
    return (
        df.filter(F.col(content_col).isNotNull())
        .select(F.sha2(F.col(content_col), 256).alias("content_hash"), F.col(id_col))
        .groupBy("content_hash")
        .agg(F.count("*").alias("n_docs"), F.min(id_col).alias("keep_id"))
        .filter(F.col("n_docs") > 1)
    )


def with_minhash(df: DataFrame, content_col: str, num_hashes: int = 16,
                 shingle_n: int = 3, unit: str = "word") -> DataFrame:
    """Attach `sig` (MinHash signature array<bigint>) to each row."""
    return df.withColumn(
        "sig",
        H.minhash_signature(H.shingle_hashes(content_col, shingle_n, unit), num_hashes),
    )


# Live shingle-hash caches (bounded: each EVICTING build clears all
# previous; an operator may hold at most two — see incremental dedup's
# corpus+batch pair). Bounding this matters on a long-lived session —
# bench warmup + measured passes + repeated minhash queries would
# otherwise accumulate cached blocks in the JVM until full-GC stalls.
_SHINGLE_CACHE: list[DataFrame] = []


def release_shingle_caches() -> None:
    """Unpersist every live shingle-hash cache.

    Safe to call at any time: unpersisting only removes the recompute
    barrier, so a still-held pipeline built on an evicted cache recomputes
    instead of erroring.
    """
    while _SHINGLE_CACHE:
        _SHINGLE_CACHE.pop().unpersist()


def _hashed_shingles(df: DataFrame, id_col: str, content_col: str,
                     shingle_n: int, unit: str,
                     evict: bool = True) -> DataFrame:
    """(doc, h): distinct 32-bit shingle hashes per doc, CACHED.

    The cache is a deliberate recompute barrier: the MinHash pipeline reads
    this three times (both sides of the band self-join + the Jaccard
    verify), and without the barrier Catalyst's projection collapsing would
    re-run the md5 shingle hashing for each of the 16 signature components
    and each consumer. At cluster scale the same role is played by
    persisting to a staging table.

    Only the hash array is kept — shingling and hashing fuse into one
    codegen projection (emitting the shingle strings alongside measured
    ~4× slower), the cached rows are ints instead of long strings, and the
    downstream Jaccard verify is over hash sets on BOTH engines, so the
    comparison stays exact even under 32-bit collisions.
    """
    from victor_spark.sources.tables import fan_out

    grams = (H.char_shingles(content_col, shingle_n) if unit == "char"
             else H.word_shingles(content_col, shingle_n))
    # evict=False lets an operator cache TWO sides (incremental dedup's
    # corpus + batch) without the second build unpersisting the first —
    # both are released together by the next evicting build
    if evict:
        release_shingle_caches()
    out = fan_out(df).select(
        F.col(id_col).alias("doc"),
        F.array_distinct(F.transform(grams, H._md5_32_expr)).alias("h"),
    ).cache()
    _SHINGLE_CACHE.append(out)
    return out


def hashed_shingle_sets(df: DataFrame, id_col: str, content_col: str,
                        shingle_n: int = 3, unit: str = "word") -> DataFrame:
    """Public handle on the cached (doc, h) shingle-hash table, for
    composing several dedup operators over ONE hashing pass (pass it via
    their ``hashed=`` parameter — e.g. the recall audit feeds the same
    table to the ppjoin truth side and the banding candidate side)."""
    return _hashed_shingles(df, id_col, content_col, shingle_n, unit)


def minhash_candidate_pairs(df: DataFrame, id_col: str, content_col: str,
                            num_hashes: int = 16, bands: int = 8,
                            shingle_n: int = 3, unit: str = "word",
                            hashed: DataFrame | None = None) -> DataFrame:
    """LSH candidate pairs (id_a < id_b) sharing at least one band bucket.

    Plan shape: signature is computed map-side; explode(bands) multiplies
    rows by `bands` (cheap — rows are (key, id) pairs); the self-join
    shuffles on band_key only. At 100 TB the band_key distribution is the
    thing to watch — a degenerate corpus (one giant near-dup cluster) makes
    a hot key, which AQE skew-join splitting handles.

    ``hashed``: a precomputed ``hashed_shingle_sets`` table to reuse
    (skips this operator's own hashing pass AND its cache eviction).
    """
    if hashed is None:
        hashed = _hashed_shingles(df, id_col, content_col, shingle_n, unit)
    return _candidates_from_hashed(hashed, num_hashes, bands)


def _rows_per_band(num_hashes: int, bands: int) -> int:
    """Validated LSH banding geometry. bands > num_hashes would make
    every band key a constant (the 'candidate' join degenerates to a
    full O(n^2) cross product); a non-dividing bands would silently
    ignore the signature tail and deliver different recall than asked
    (review-caught)."""
    if bands < 1 or num_hashes % bands != 0:
        raise ValueError(
            f"bands must divide num_hashes: got num_hashes={num_hashes}, "
            f"bands={bands}"
        )
    return num_hashes // bands


def _candidates_from_hashed(hashed: DataFrame, num_hashes: int, bands: int) -> DataFrame:
    rows_per_band = _rows_per_band(num_hashes, bands)
    sig = hashed.select("doc", H.minhash_signature("h", num_hashes).alias("sig"))
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
                  content_col: str, shingle_n: int = 3, unit: str = "word") -> DataFrame:
    """Exact character-n-gram Jaccard for each (id_a, id_b) pair.

    Joins the shingle sets in (both joins broadcast when docs is small;
    sort-merge on id otherwise) and computes |∩|/|∪| natively.
    """
    grams = (H.char_shingles(content_col, shingle_n) if unit == "char"
             else H.word_shingles(content_col, shingle_n))
    sh = docs.select(F.col(id_col).alias("_id"), grams.alias("_sh"))
    return (
        df_pairs.join(sh.withColumnRenamed("_id", "id_a").withColumnRenamed("_sh", "sh_a"), "id_a")
        .join(sh.withColumnRenamed("_id", "id_b").withColumnRenamed("_sh", "sh_b"), "id_b")
        .withColumn("jaccard", H.jaccard("sh_a", "sh_b"))
        .drop("sh_a", "sh_b")
    )


def ngram_jaccard_join(df: DataFrame, id_col: str, content_col: str,
                       threshold: float = 0.5, shingle_n: int = 3,
                       unit: str = "word",
                       hashed: DataFrame | None = None) -> DataFrame:
    """Exact all-pairs similarity self-join: every (id_a < id_b) pair with
    shingle-hash Jaccard >= threshold, via prefix filtering (ppjoin).

    Losslessly prunes the O(n²) pair space: with each doc's distinct
    shingle hashes sorted ascending, two sets with Jaccard >= t MUST share
    an element within their first ``|s| - ceil(t·|s|) + 1`` hashes — so
    candidate generation is explode(prefix) + equi-join on the shared
    hash, and only candidates pay the exact |∩|/|∪| verify. At 100 TB
    this is the standard exact-similarity-join plan: the prefix explode is
    map-side, the candidate join shuffles on a single int key (AQE splits
    hot hashes), and the verify is O(candidates), not O(n²).

    ``hashed``: a precomputed ``hashed_shingle_sets`` table to reuse
    (skips this operator's own hashing pass AND its cache eviction).
    """
    if hashed is None:
        hashed = _hashed_shingles(df, id_col, content_col, shingle_n, unit)
    sh = hashed.select("doc", F.array_sort("h").alias("s"))
    plen = (F.size("s") - F.ceil(F.lit(float(threshold)) * F.size("s")) + 1).cast("int")
    pre = sh.select(
        "doc", F.size("s").alias("len"),
        F.explode(F.slice(F.col("s"), F.lit(1), plen)).alias("tok"),
    )
    # length filter (lossless): Jaccard >= t forces t·|a| <= |b| <= |a|/t,
    # so size-incompatible pairs are pruned inside the candidate join before
    # the distinct — the second classic ppjoin prune after the prefix filter
    t = float(threshold)
    cand = (
        pre.alias("a")
        .join(
            pre.alias("b"),
            (F.col("a.tok") == F.col("b.tok"))
            & (F.col("a.doc") < F.col("b.doc"))
            & (F.col("b.len") * t <= F.col("a.len"))
            & (F.col("a.len") * t <= F.col("b.len")),
        )
        .select(F.col("a.doc").alias("id_a"), F.col("b.doc").alias("id_b"))
        .distinct()
    )
    # The exact verify is CPU-bound (hash-set intersection per pair), and
    # AQE coalesces the small candidate shuffle to a handful of tasks sized
    # by BYTES — fan back out so the set work uses every core. Union size
    # comes free as |a|+|b|-|∩| (the hash arrays are distinct), halving the
    # per-pair set construction vs an explicit array_union.
    out = (
        cand.repartition(cand.sparkSession.sparkContext.defaultParallelism)
        .join(sh.select(F.col("doc").alias("id_a"), F.col("s").alias("sa")), "id_a")
        .join(sh.select(F.col("doc").alias("id_b"), F.col("s").alias("sb")), "id_b")
        .select("id_a", "id_b", H.jaccard("sa", "sb").alias("jaccard"))
    )
    return out.filter(F.col("jaccard") >= threshold)


def incremental_near_duplicates(corpus: DataFrame, batch: DataFrame,
                                id_col: str, content_col: str,
                                threshold: float = 0.7, num_hashes: int = 16,
                                bands: int = 8, shingle_n: int = 3,
                                unit: str = "word") -> DataFrame:
    """Which BATCH docs are near-duplicates of the existing CORPUS — the
    continuously-arriving-data shape of MinHash dedup. Returns
    (batch_id, corpus_id, jaccard >= threshold).

    Scale shape (the point of having this as its own operator): the batch
    is small relative to the corpus, so its banded signatures and the
    verified candidate set are BROADCAST — the corpus is scanned exactly
    once, map-side, with no corpus-sized shuffle anywhere. At 100 TB the
    corpus side's banded signature table would be a precomputed artifact
    maintained on ingest (the signature is a pure function of the text),
    turning daily-batch dedup into one broadcast-join scan of the band
    table; the dataflow below is identical with the scan swapped in.
    """
    rows_per_band = _rows_per_band(num_hashes, bands)

    def _bands(df: DataFrame, out_id: str, evict: bool) -> DataFrame:
        hashed = _hashed_shingles(df, id_col, content_col, shingle_n, unit,
                                  evict=evict)
        sig = hashed.select("doc", "h",
                            H.minhash_signature("h", num_hashes).alias("sig"))
        return sig.select(
            F.col("doc").alias(out_id), F.col("h").alias(f"_h_{out_id}"),
            F.explode(H.band_keys("sig", bands, rows_per_band)).alias("band_key"),
        )

    # corpus first (evicting any stale cache), batch second WITHOUT
    # evicting — otherwise the batch build would unpersist the corpus's
    # recompute barrier and the big side would re-hash shingles once per
    # signature component
    cb = _bands(corpus, "corpus_id", evict=True)
    bb = _bands(batch, "batch_id", evict=False)
    cands = (
        cb.join(F.broadcast(bb), "band_key")
        .select("batch_id", "corpus_id", "_h_batch_id", "_h_corpus_id")
        .distinct()
    )
    return (
        cands.select(
            "batch_id", "corpus_id",
            H.jaccard("_h_batch_id", "_h_corpus_id").alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def minhash_near_duplicates(df: DataFrame, id_col: str, content_col: str,
                            threshold: float = 0.7, num_hashes: int = 16,
                            bands: int = 8, shingle_n: int = 3,
                            unit: str = "word") -> DataFrame:
    """Full MinHash-LSH dedup: candidates by banding, verified by exact
    Jaccard ≥ threshold. Returns (id_a, id_b, jaccard).

    The shingle-hash table is computed once (cached) and shared by the
    candidate join and the verify joins; Jaccard is over the distinct
    hash sets (matching the oracle exactly)."""
    hashed = _hashed_shingles(df, id_col, content_col, shingle_n, unit)
    cands = _candidates_from_hashed(hashed, num_hashes, bands)
    sh = hashed.select("doc", "h")
    verified = (
        cands.join(sh.withColumnRenamed("doc", "id_a").withColumnRenamed("h", "sh_a"), "id_a")
        .join(sh.withColumnRenamed("doc", "id_b").withColumnRenamed("h", "sh_b"), "id_b")
        .withColumn("jaccard", H.jaccard("sh_a", "sh_b"))
        .drop("sh_a", "sh_b")
    )
    return verified.filter(F.col("jaccard") >= threshold)


def simhash_fingerprints(df: DataFrame, id_col: str, content_col: str) -> DataFrame:
    """(id, simhash) — 32-bit SimHash over whitespace-token hashes.

    Shape: explode token hashes → one groupBy with 32 conditional-sum bit
    counters → fold the majority bits. Each md5 token hash is computed
    exactly once (the naive per-bit ``filter(hashes, bit_set)`` form lets
    projection collapsing re-inline the whole hash transform into all 32
    bit expressions — measured ~6× slower). The aggregation is map-side
    partial (32 longs per doc cross the shuffle), so it scales to arbitrary
    corpus size.
    """
    from victor_spark.functions.text import tokens
    from victor_spark.sources.tables import fan_out

    exploded = fan_out(df).select(
        F.col(id_col).alias("doc"),
        F.explode_outer(tokens(content_col)).alias("tok"),
    ).select("doc", H._md5_32_expr(F.col("tok")).alias("h"))
    # the 32 bit-counter aggregates and the majority fold parse as SQL
    # strings (round-11: the builder forms cost ~5k py4j round trips per
    # build — guide §7.3; identical expressions, pinned by the operator's
    # oracle twin and tests/test_dedup.py)
    counts = exploded.groupBy("doc").agg(
        F.count("h").alias("n"),
        *[
            F.expr(f"count_if((`h` & {1 << i}) != 0)").alias(f"b{i}")
            for i in range(32)
        ],
    )
    sim = " + ".join(
        f"CASE WHEN `b{i}` * 2 > `n` THEN CAST({1 << i} AS BIGINT) "
        "ELSE CAST(0 AS BIGINT) END"
        for i in range(32)
    )
    return counts.select("doc", F.expr(sim).alias("simhash"))


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
    from victor_spark.sources.tables import fan_out

    # name the double array first so hyperplane_bucket takes its
    # one-parsed-SQL fast path (round-11: the builder form here cost
    # ~5.6k py4j round trips per build); same value, slot-read reference
    v = fan_out(df).select(
        F.col(id_col).alias("doc"),
        to_double_array(vec_col).alias("vec"),
    ).withColumn("bucket", H.hyperplane_bucket("vec", num_planes))
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


def semantic_dedup(df: DataFrame, id_col: str, vec_col: str,
                   centroids: DataFrame, threshold: float = 0.95) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): cluster-scoped
    semantic deduplication over an embedding column.

    Assign every vector to its nearest centroid (cosine, ties → lowest
    cell), then compare vectors ONLY within their cluster and mark a row a
    duplicate when some lower-id cluster member sits within ``threshold``
    cosine of it (lowest id wins, matching the other dedup families).

    ``centroids`` is a small (cell: long, cv: array) table — a k-means fit
    (operators/kmeans.py) or a deterministic sample — always broadcast.

    Scale shape (the paper's recipe): k is chosen so clusters are small
    (they use k=50 000 on LAION), making the within-cluster O(c²) compare
    the budgeted cost; the join is an equi-join on the cell key, so there
    is never a global all-pairs path, and assignment is a map-side fold
    over the literal centroid array (the model-sized centroid table is
    already collected for validation — zero exchanges, no k-fold row
    inflation).

    Returns (id, cell, max_lower_sim, keep): max_lower_sim is the highest
    cosine to any lower-id cluster member (-2.0 sentinel when the row is
    the lowest id in its cluster — below any real cosine), keep is 1 when
    the row survives dedup.

    Zero-norm rows have no direction, so cosine against them is undefined:
    they are routed to cell -1, always kept (keep=1, sentinel sim), and
    NEVER enter the pair compare — without the split their NaN dots would
    poison max()/max_by (Spark orders NaN above everything) and silently
    drop valid neighbors. Rows with NaN/Inf components take the SAME
    sentinel route (review-caught: a NaN embedding has NaN norm, not 0,
    so it slipped past the zero check and its NaN pair-dots marked every
    higher-id cluster neighbor as a duplicate). A zero-norm CENTROID or
    an EMPTY centroid table is a caller error and raises.

    Both sides are L2-normalized ONCE up front, so assignment and the
    within-cluster compare are plain dots — one fold per pair instead of
    dot + two norms (measured 3× on the pair stage).
    """
    import math

    from victor_spark.functions.vector import bind, dot, l2_normalize, norm
    from victor_spark.sources.tables import fan_out

    v_all = fan_out(df).select(
        F.col(id_col).alias("doc"), to_double_array(vec_col).alias("_vec")
    ).withColumn(
        "_zero",
        (norm("_vec") == 0.0) | F.isnan(norm("_vec"))
        | (norm("_vec") == float("inf")),
    )
    zero_rows = v_all.filter("_zero").select(
        "doc",
        F.lit(-1).cast("long").alias("cell"),
        F.lit(-2.0).alias("max_lower_sim"),
        F.lit(1).cast("int").alias("keep"),
    )
    v = v_all.filter(~F.col("_zero")).select(
        "doc", l2_normalize("_vec").alias("nv")
    )
    cdf = centroids.select(
        F.col("cell").cast("long").alias("cell"),
        to_double_array("cv").alias("_cv"),
    )
    # ONE bounded collect serves two jobs (centroids are a model-sized
    # table, like the PQ codebook, whose k·d floats the PQ operators
    # already bake into the plan as literals): it validates both
    # caller-error cases — zero-norm cells, and an EMPTY table, which
    # would otherwise silently drop every non-sentinel row from the
    # report — and it brings the vectors driver-side so cell assignment
    # runs MAP-SIDE as a per-row fold over the literal centroid array
    # (round-11 optimization). The old shape (broadcast crossJoin +
    # max_by groupBy) inflated the corpus k-fold through a shuffle
    # purely to pick each row's argmax — the fold computes the same k
    # dots per row with zero exchanges.
    #
    # The normalization below replays l2_normalize's exact arithmetic
    # (left-to-right double fold of x*x from 0.0, IEEE sqrt, then x/n
    # per element), so the literal values are bit-identical to what the
    # broadcast plan computed — assignment ties break identically.
    rows = cdf.collect()
    if not rows:
        raise ValueError("semantic_dedup: centroids table is empty")
    ncents = []
    for r in rows:
        cv = r["_cv"]
        acc = 0.0
        for x in cv:
            acc += x * x
        n = math.sqrt(acc)
        if n == 0.0:
            raise ValueError(
                f"semantic_dedup: centroid cell {r['cell']} has zero norm"
            )
        ncents.append((int(r["cell"]), [x / n for x in cv]))
    from victor_spark.functions.vector import lit_doubles

    cent_arr = F.array(
        *[
            F.struct(
                F.lit(cell).cast("long").alias("cell"),
                lit_doubles(ncv).alias("ncv"),
            )
            for cell, ncv in ncents
        ]
    )
    # fold semantics == max_by(cell, struct(cs, -cell)): strictly-higher
    # cosine wins; an exactly-equal cosine wins only with a lower cell
    # id. The init sentinel (-2.0) sits below any unit-vector cosine, so
    # the first centroid always replaces it — no NULL three-valued logic.
    init = F.struct(
        F.lit(-2.0).alias("cs"), F.lit(-(2 ** 62)).cast("long").alias("cell")
    )
    assigned = v.select(
        "doc",
        "nv",
        bind(
            F.col("nv"),
            lambda nv: F.aggregate(
                cent_arr,
                init,
                lambda acc, c: bind(
                    dot(nv, c["ncv"]),
                    lambda cs: F.when(
                        (cs > acc["cs"])
                        | ((cs == acc["cs"]) & (c["cell"] < acc["cell"])),
                        F.struct(cs.alias("cs"), c["cell"].alias("cell")),
                    ).otherwise(acc),
                ),
                lambda a: a["cell"],
            ),
        ).alias("cell"),
    )
    # assigned feeds THREE consumers (both sides of the within-cluster
    # pair join + the final report join); without a reuse barrier
    # Catalyst re-runs the scan -> normalize -> k-way centroid fold
    # subtree once per consumer (measured ~2x the query on the crossJoin
    # form). localCheckpoint truncates the lineage so the assignment
    # pass runs once; at cluster scale the same role is played by
    # persisting the assignment to a staging table (it is corpus-sized:
    # one (id, nv, cell) row per vector).
    assigned = assigned.localCheckpoint(eager=False)
    l, r = assigned.alias("l"), assigned.alias("r")
    sims = l.join(
        r, (F.col("l.cell") == F.col("r.cell")) & (F.col("l.doc") < F.col("r.doc"))
    ).select(
        F.col("r.doc").alias("doc"),
        dot(F.col("l.nv"), F.col("r.nv")).alias("_s"),
    )
    worst = sims.groupBy("doc").agg(F.max("_s").alias("_max_sim"))
    out = (
        assigned.join(worst, "doc", "left")
        .select(
            F.col("doc").alias(id_col),
            "cell",
            F.coalesce("_max_sim", F.lit(-2.0)).alias("max_lower_sim"),
            (F.coalesce("_max_sim", F.lit(-2.0)) < F.lit(threshold))
            .cast("int")
            .alias("keep"),
        )
    )
    return out.unionAll(
        zero_rows.select(
            F.col("doc").alias(id_col), "cell", "max_lower_sim", "keep"
        )
    )


def duplicate_clusters(pairs: DataFrame, id_a: str = "id_a", id_b: str = "id_b",
                       max_iterations: int = 15,
                       driver_edge_limit: int = 5_000_000) -> DataFrame:
    """Connected components over a near-dup pair graph → (doc, cluster),
    cluster = the smallest doc id in the component.

    Pair emitters (minhash/simhash/embedding dedup) return edges; keeping
    one representative per *transitive* duplicate group needs components,
    not pairs (A~B, B~C must collapse A,B,C together even when A~C was
    never emitted).

    Two physical strategies behind one semantics:

    - **small graph (≤ driver_edge_limit edges): driver union-find.** The
      near-dup edge list is orders of magnitude smaller than the corpus
      (it is the minhash/simhash OUTPUT), and 5M edges ≈ 80 MB on the
      driver — so the standard "local finish" from the connected-components
      literature applies: one collect, path-compressed union-find, one
      parallelize back. This replaces diameter-many shuffle rounds (each a
      join + aggregation + convergence check) with a single job, which is
      the difference between ~0.4 s and ~2.5 s even on a 1.4k-node graph.
    - **large graph: distributed min-label propagation** — every node
      starts labeled with itself; each round every node takes the min
      label over itself and its neighbors; stop when a round changes
      nothing. Rounds = graph diameter, which for near-dup clusters is
      tiny (duplicate groups are dense); the hard cap is a safety net, and
      the operator raises if it is hit rather than returning half-merged
      clusters. Each round is one shuffle join + one aggregation over the
      EDGE list (never the corpus), and ``localCheckpoint`` truncates the
      growing lineage so round N's plan doesn't replay rounds 1..N-1.
      (GraphX/GraphFrames run the same iteration.)

    The edge count that picks the strategy is a metadata-cheap action on
    the already-checkpointed edge list, so the big path pays one extra
    count over materialized blocks, not a recompute.
    """
    # Round-11 measurement note: a single limit(N+1).collect() probe
    # (replacing eager checkpoint + count + collect, "3 fewer jobs") was
    # tried and REVERTED. Wall-timing on the cluster-consuming queries
    # is noise-band either way on this host (they swing 2-3x run to
    # run), but the probe's CollectLimit executes the expensive
    # upstream minhash pipeline in serial partition ramp-up waves,
    # while the eager checkpoint materializes it in one fully-parallel
    # job and the count/collect that follow are metadata-cheap reads of
    # cached blocks — the parallel shape is the safer one at any scale.
    # Round-11 optimization: both directions of every pair come out of ONE
    # map-side explode — the old unionAll duplicated the (expensive) pair
    # pipeline subtree across two branches and then paid a distinct
    # exchange + aggregation to merge them. The distinct was semantically
    # dead weight: union-find is duplicate-edge-tolerant, and min-label
    # propagation takes min() over neighbors, so repeated edges change
    # nothing on either path (a duplicate-emitting caller only inflates
    # the strategy-probe count, which errs toward the distributed path —
    # the conservative direction).
    edges = (
        pairs.select(
            F.explode(
                F.array(
                    F.struct(F.col(id_a).alias("src"), F.col(id_b).alias("dst")),
                    F.struct(F.col(id_b).alias("src"), F.col(id_a).alias("dst")),
                )
            ).alias("_e")
        )
        .select("_e.src", "_e.dst")
        .localCheckpoint()
    )
    if edges.count() <= driver_edge_limit:
        return _clusters_union_find(edges)
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint()
    )
    for _ in range(max_iterations):
        nbr_min = (
            edges.join(labels, edges.dst == labels.node)
            .groupBy("src")
            .agg(F.min("label").alias("nbr_label"))
        )
        new_labels = (
            labels.join(nbr_min, labels.node == nbr_min.src, "left")
            .select(
                "node",
                F.least("label", F.coalesce("nbr_label", "label")).alias("label"),
                (F.col("label") != F.least("label", F.coalesce("nbr_label", "label"))).alias("changed"),
            )
        ).localCheckpoint()
        changed = new_labels.filter("changed").limit(1).count()
        labels = new_labels.drop("changed")
        if changed == 0:
            return labels.select(F.col("node").alias("doc"), F.col("label").alias("cluster"))
    raise RuntimeError(
        f"duplicate_clusters did not converge in {max_iterations} rounds "
        "(pathological graph diameter); raise max_iterations"
    )


def _clusters_union_find(edges: DataFrame) -> DataFrame:
    """Driver-side union-find over a (src, dst) edge DataFrame — one
    collect (not toLocalIterator: that launches a job PER PARTITION),
    then :func:`_clusters_union_find_rows` on the rows."""
    return _clusters_union_find_rows(
        edges.select("src", "dst").collect(),
        edges.sparkSession,
        edges.schema["src"].dataType,
    )


def _clusters_union_find_rows(rows, spark, id_type) -> DataFrame:
    """Driver-side path-compressed union-find over collected (src, dst)
    rows.

    Input edges are symmetric (both directions present), so the src column
    alone covers every node. Output matches the distributed propagation
    exactly: (doc, cluster) with cluster = min doc id of the component.
    """
    parent: dict = {}

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    for row in rows:
        a, b = row[0], row[1]
        if a not in parent:
            parent[a] = a
        if b not in parent:
            parent[b] = b
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[rb] = ra

    min_label: dict = {}
    roots = {node: find(node) for node in parent}
    for node, root in roots.items():
        cur = min_label.get(root)
        if cur is None or node < cur:
            min_label[root] = node
    from pyspark.sql.types import StructField, StructType

    schema = StructType(
        [StructField("doc", id_type, False), StructField("cluster", id_type, False)]
    )
    out = [(node, min_label[root]) for node, root in roots.items()]
    return spark.createDataFrame(out, schema)
