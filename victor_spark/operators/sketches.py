"""Mergeable sketches: HyperLogLog distinct counts, count-min frequencies,
Bloom-filter membership.

The 100 TB distinct-count path. ``count(DISTINCT x)`` shuffles every
distinct value to a single reducer per group; a HyperLogLog register
table is a FIXED 2^p-row summary whose per-bucket ``max(rho)`` combines
map-side (max is associative/commutative), so the full corpus reduces to
2^p rows regardless of input size, and register tables from disjoint
corpus slices merge by element-wise max — the sketch algebra that lets
daily partials roll up into a global estimate without re-reading data.

Flajolet et al., "HyperLogLog: the analysis of a near-optimal
cardinality estimation algorithm" (AofA 2007). Standard error is
1.04/sqrt(2^p) — p=10 (1024 registers, the default here) gives ~3.25%.

Determinism contract: the hash family is the repo's shared 32-bit md5
(functions/hashing.py::md5_32) — bucket = h(x) mod m from one hash, the
rank bits from an independently salted second hash (stochastic
averaging with split hashes, same estimator guarantees). Every quantity
downstream of the registers is reproducible cross-engine: the harmonic
sum folds 1024 terms of the form 2^-r with r <= 33, all dyadic
rationals whose exact sum needs < 53 mantissa bits — the double
accumulation is EXACT in any summation order, so Spark and a DuckDB
oracle replaying the same formula agree bit-for-bit before rounding.

Spark expression of rho (the 1-based position of the leftmost 1-bit in
the 32-bit hash): ``33 - length(bin(w))`` — ``bin`` renders without
leading zeros on both engines, so its length IS the bit length.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from victor_spark.functions.hashing import md5_32


def hll_prepare(df: DataFrame, col: str, p: int = 10, salt: str = "hll") -> DataFrame:
    """(bucket, rho) pairs for each value of ``col`` — the map-side leg.

    bucket = md5_32(x) mod 2^p; rho = rank of the leftmost 1-bit of the
    independently salted md5_32('{salt}:' || x), with the all-zero word
    assigned rank 33 (32 zero bits + 1).
    """
    m = 1 << p
    x = F.col(col).cast("string")
    w = md5_32(F.concat(F.lit(salt + ":"), x))
    rho = F.when(w == 0, F.lit(33)).otherwise(F.lit(33) - F.length(F.bin(w)))
    return df.select(
        (md5_32(x) % F.lit(m)).alias("bucket"),
        rho.cast("int").alias("rho"),
    )


def hll_registers(prepared: DataFrame, p: int = 10) -> DataFrame:
    """Dense 2^p-row register table (bucket, r): r = max(rho), 0 if empty.

    ``groupBy(bucket).max(rho)`` partial-aggregates map-side, so the
    shuffle moves at most 2^p rows per upstream partition no matter the
    corpus size; the left join against the bucket spine densifies empty
    registers to r=0 (they count as 2^0 in the harmonic sum and feed the
    linear-counting correction).
    """
    m = 1 << p
    spark = prepared.sparkSession
    spine = spark.range(m).select(F.col("id").alias("bucket"))
    regs = prepared.groupBy("bucket").agg(F.max("rho").alias("r"))
    return spine.join(regs, "bucket", "left").select(
        "bucket", F.coalesce("r", F.lit(0)).cast("int").alias("r")
    )


def hll_merge(*register_tables: DataFrame) -> DataFrame:
    """Merge register tables from disjoint (or overlapping) corpus slices.

    Element-wise max per bucket — the union sketch. This is the algebra
    a 100 TB rollup runs on: per-partition/per-day register tables are
    tiny parquet artifacts; the global estimate never re-reads data.
    """
    if not register_tables:
        raise ValueError("hll_merge needs at least one register table")
    u = register_tables[0]
    for t in register_tables[1:]:
        u = u.unionByName(t)
    return u.groupBy("bucket").agg(F.max("r").cast("int").alias("r"))


def _raw_estimate(m: int) -> Column:
    # alpha_m * m^2 / sum(2^-r) — stated with the same literal arithmetic
    # the oracle uses: two divisions, one add, left-associated products.
    alpha = F.lit(0.7213) / (F.lit(1.0) + F.lit(1.079) / F.lit(float(m)))
    return alpha * F.lit(float(m)) * F.lit(float(m)) / F.col("s")


def hll_estimate(registers: DataFrame, p: int = 10, correct: bool = True) -> DataFrame:
    """Single-row estimate from a register table.

    Columns: estimate (double), empty_registers (long). With
    ``correct=True`` the small-range linear-counting branch
    (E <= 2.5m and V > 0 → m·ln(m/V)) is applied — the full HLL
    estimator. The catalog's oracle-checked query uses ``correct=False``
    (raw branch only) because ln() is not guaranteed identically rounded
    across engines; on the corpora it audits the raw branch is the
    active one anyway (n >> 2.5m).
    """
    m = 1 << p
    agg = registers.agg(
        F.sum(F.pow(F.lit(2.0), -F.col("r").cast("double"))).alias("s"),
        F.count(F.when(F.col("r") == 0, True)).alias("v"),
    )
    raw = _raw_estimate(m)
    est = raw
    if correct:
        est = F.when(
            (F.col("v") > 0) & (raw <= F.lit(2.5 * m)),
            F.lit(float(m)) * F.log(F.lit(float(m)) / F.col("v").cast("double")),
        ).otherwise(raw)
    return agg.select(
        est.alias("estimate"), F.col("v").cast("long").alias("empty_registers")
    )


def approx_distinct(df: DataFrame, col: str, p: int = 10, salt: str = "hll") -> float:
    """Convenience one-shot: HLL estimate of count(DISTINCT col)."""
    regs = hll_registers(hll_prepare(df, col, p=p, salt=salt), p=p)
    return float(hll_estimate(regs, p=p).collect()[0]["estimate"])


# ---------------------------------------------------------------------------
# Count-min sketch (Cormode & Muthukrishnan 2005): fixed-size frequency
# summary. depth×width counter grid; est(x) = min over rows of the
# counter at hash_j(x) — never an underestimate, overestimate bounded by
# eps·N with prob 1-delta for width=e/eps, depth=ln(1/delta). Counters
# are sums → partial-aggregate map-side and merge across slices by
# element-wise +. All-integer arithmetic: the oracle replay is exact
# with no float caveats at all.
# ---------------------------------------------------------------------------


def cms_hash(col_or_expr: Column, j: int, width: int, salt: str = "cms") -> Column:
    """Row-j bucket for a value: md5_32('{salt}{j}:' || x) mod width."""
    return md5_32(F.concat(F.lit(f"{salt}{j}:"), col_or_expr)) % F.lit(width)


def cms_sketch(
    counts: DataFrame,
    key_col: str,
    count_col: str,
    depth: int = 4,
    width: int = 2048,
    salt: str = "cms",
) -> DataFrame:
    """Build the (j, bucket, s) counter table from a (key, count) table.

    Feeding pre-aggregated counts (one groupBy upstream) instead of raw
    occurrences is mathematically identical — addition is associative —
    and moves depth× less data. The sketch itself is depth·width rows
    total, regardless of corpus size; union + re-sum merges sketches
    from disjoint corpus slices.
    """
    k = F.col(key_col).cast("string")
    rows = counts.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"),
                        cms_hash(k, j, width, salt).alias("bucket"),
                        F.col(count_col).cast("long").alias("c"),
                    )
                    for j in range(depth)
                ]
            )
        ).alias("e")
    ).select("e.j", "e.bucket", "e.c")
    return rows.groupBy("j", "bucket").agg(F.sum("c").alias("s"))


def cms_lookup(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 2048,
    salt: str = "cms",
) -> DataFrame:
    """Point-estimate each key against the sketch: min over the depth rows.

    The key set is broadcast (queries are small); the join hits
    depth·|keys| of the sketch's depth·width rows.

    The sketch table is SPARSE (never-incremented (j, bucket) cells have
    no row), so a probed key whose hash lands on an untouched cell has a
    zero counter the inner join can't see. The estimate must be the min
    over ALL depth counters: a key matched by fewer than ``depth`` sketch
    rows estimates 0 — the exact CMS answer for a key with any empty
    counter. Keys absent from the corpus therefore return 0, never an
    inflated min over their non-empty rows only.
    """
    k = F.col(key_col).cast("string")
    # dedup first: the completeness test below counts matched rows per
    # key VALUE, so a duplicated input key would inflate _rows past depth
    # and falsely report 0
    keys = keys.select(key_col).distinct()
    probes = keys.select(
        F.col(key_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"),
                        cms_hash(k, j, width, salt).alias("bucket"),
                    )
                    for j in range(depth)
                ]
            )
        ).alias("e"),
    ).select(key_col, "e.j", "e.bucket")
    hits = (
        sketch.join(F.broadcast(probes), ["j", "bucket"])
        .groupBy(key_col)
        .agg(F.min("s").alias("_min_s"), F.count("*").alias("_rows"))
    )
    return (
        keys.join(hits, key_col, "left")
        .select(
            key_col,
            F.when(F.col("_rows") == depth, F.col("_min_s"))
            .otherwise(F.lit(0))
            .cast("long")
            .alias("cms_count"),
        )
    )


# ---------------------------------------------------------------------------
# Bloom filter (Bloom 1970): fixed-size set-membership summary — the
# third sketch beside HLL (distinct) and count-min (frequency). k salted
# md5 positions per value over an m-bit array stored as m/32 packed
# 32-bit words (in longs), so a probe is k O(1) word-index + bit-test
# expressions — no set lookup, no join. No false negatives ever; false
# positives at ~fill^k. Bit-or builds combine map-side and filters from
# disjoint slices merge by word-wise OR. All-integer → oracle-exact.
# ---------------------------------------------------------------------------

BLOOM_M = 16384  # bits
BLOOM_K = 4
_WORD_BITS = 32  # packed into longs; 32 keeps 1<<shift positive in BIGINT


def _bloom_pos(x: Column, j: int, m: int, salt: str) -> Column:
    return md5_32(F.concat(F.lit(f"{salt}{j}:"), x.cast("string"))) % F.lit(m)


# pyspark's shiftleft/shiftright take a PYTHON-int bit count, so a
# column-valued shift goes through this literal table instead (which
# also composes inside higher-order-function lambdas, where expr() is
# unavailable): bit b of word w == (w & _pow2()[b+1]) != 0. Lazy —
# building literal columns needs an active session, and this module
# must import without one (pytest collection, driver-side tools).
def _pow2() -> Column:
    # one parsed SQL expression instead of _WORD_BITS per-element F.lit
    # round trips (round-11, guide §7.3); identical long values
    return F.expr(
        "array("
        + ",".join(f"CAST({1 << i} AS BIGINT)" for i in range(_WORD_BITS))
        + ")"
    )


def bloom_build(
    df: DataFrame, col: str, k: int = BLOOM_K, m: int = BLOOM_M, salt: str = "bf"
) -> DataFrame:
    """Single-row DataFrame with the packed bit array: (words array<long>).

    One explode + one bit_or groupBy (bit_or is idempotent, so no
    distinct pass is needed) + a dense word spine; the filter is m/32
    longs regardless of input size.
    """
    n_words = m // _WORD_BITS
    pos = df.select(
        F.explode(
            F.array(*[_bloom_pos(F.col(col), j, m, salt) for j in range(k)])
        ).alias("pos")
    )
    words0 = pos.select(
        F.floor(F.col("pos") / _WORD_BITS).cast("long").alias("wi"),
        F.element_at(_pow2(), (F.col("pos") % _WORD_BITS).cast("int") + 1).alias("b"),
    ).groupBy("wi").agg(F.bit_or("b").alias("w"))
    spark = df.sparkSession
    spine = spark.range(n_words).select(F.col("id").alias("wi"))
    dense = spine.join(words0, "wi", "left").select(
        "wi", F.coalesce("w", F.lit(0)).alias("w")
    )
    return dense.agg(_pack_words())


def _pack_words():
    """The ONE (wi, w) -> sorted words-array packing expression, shared
    by bloom_build and bloom_merge so the build and merge word layouts
    cannot silently diverge."""
    return F.transform(
        F.array_sort(F.collect_list(F.struct("wi", "w"))), lambda s: s["w"]
    ).alias("words")


def bloom_might_contain(
    words: Column, x: Column, k: int = BLOOM_K, m: int = BLOOM_M, salt: str = "bf"
) -> Column:
    """Boolean probe against the packed word array: all k bits set.
    A NULL probe value returns False, not NULL: nulls are never inserted
    (bloom_build hashes non-null keys only), so "definitely not present"
    is the CORRECT answer — and the old NULL propagated through negated
    filters, silently dropping never-seen null rows as if seen
    (review-caught)."""
    checks = []
    for j in range(k):
        pos = _bloom_pos(x, j, m, salt)
        word = F.element_at(words, (F.floor(pos / _WORD_BITS) + 1).cast("int"))
        bit = F.element_at(_pow2(), (pos % _WORD_BITS).cast("int") + 1)
        checks.append(word.bitwiseAND(bit) != 0)
    out = checks[0]
    for c in checks[1:]:
        out = out & c
    return F.when(x.isNull(), F.lit(False)).otherwise(out)


# ---------------------------------------------------------------------------
# Fixed-bin histogram quantiles: the mergeable quantile summary
# completing the quartet (HLL distinct / count-min frequency / Bloom
# membership / histogram quantiles). A 2-pass computation: per-group
# min/max bounds, then per-(group, bin) counts — both partial-aggregate
# map-side, and histograms with shared bounds MERGE by summing bin
# counts, which is what t-digest/KLL buy you but deterministic and
# cross-engine replayable. Estimate error is bounded by the bin width
# (span/bins); events_quantiles pins the exact path, this is the
# documented 100 TB drop-in, now audited as a query.
# ---------------------------------------------------------------------------


def value_histogram(
    df: DataFrame, group_col: str, value_col: str, bins: int = 256
) -> DataFrame:
    """(group, bin, cnt, mn, mx, n): per-group fixed-width bin counts.

    Bin = floor((v - mn) * bins / (mx - mn)) clamped to bins-1 (the max
    value lands in the last bin); a constant group degenerates to bin 0.

    NULL and NaN values are EXCLUDED before binning (review-caught pair:
    F.count already excluded NULLs from n, but the bin path kept them as
    a null-bin row that the quantile walk's asc-nulls-first window
    counted FIRST — estimates drifted below the group minimum; and one
    NaN made mx=NaN, defeating the span==0 guard so EVERY value clamped
    into the last bin). The bounds aggregate is computed once and
    carried through the bin groupBy (F.first) instead of re-joined — the
    old second join re-derived the whole bounds subtree (the textrank
    loop-invariant lesson)."""
    clean = df.where(
        F.col(value_col).isNotNull()
        & ~F.isnan(F.col(value_col).cast("double"))
    )
    b = clean.groupBy(group_col).agg(
        F.min(value_col).alias("mn"),
        F.max(value_col).alias("mx"),
        F.count(value_col).alias("n"),
    )
    j = clean.join(F.broadcast(b), group_col)
    span = F.col("mx") - F.col("mn")
    bin_ = (
        F.when(span == 0, F.lit(0.0))
        .otherwise(
            F.least(
                F.floor(
                    (F.col(value_col) - F.col("mn")) * F.lit(float(bins)) / span
                ).cast("double"),
                F.lit(float(bins - 1)),
            )
        )
        .cast("long")
    )
    return (
        j.select(group_col, bin_.alias("bin"), "mn", "mx", "n")
        .groupBy(group_col, "bin")
        .agg(
            F.count("*").alias("cnt"),
            F.first("mn").alias("mn"),
            F.first("mx").alias("mx"),
            F.first("n").alias("n"),
        )
    )


def histogram_quantile(
    hist: DataFrame, group_col: str, q: float, bins: int = 256, out_col: str = "est"
) -> DataFrame:
    """Interpolated quantile estimate from a value_histogram table.

    Walks the cumulative counts to the first bin covering rank q·n and
    interpolates linearly inside it — stated with one fixed operation
    order so an oracle replays it bit-for-bit.
    """
    from pyspark.sql import Window

    w = (
        Window.partitionBy(group_col)
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    h = hist.withColumn("cum", F.sum("cnt").over(w))
    t = F.lit(q) * F.col("n")
    est = (
        F.col("mn")
        + (F.col("bin") + (t - (F.col("cum") - F.col("cnt"))) / F.col("cnt"))
        * (F.col("mx") - F.col("mn"))
        / F.lit(float(bins))
    )
    return (
        h.filter(F.col("cum") >= t)
        .groupBy(group_col)
        .agg(F.min_by(est, F.col("bin")).alias(out_col))
    )


def bloom_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Union filter of two builds (same k/m/salt): word-wise OR. Packs
    through the same _pack_words expression as bloom_build, so the two
    can never diverge on the word layout (review-caught duplication)."""
    return (
        a.unionByName(b)
        .select(F.posexplode("words").alias("wi", "w"))
        .groupBy("wi")
        .agg(F.bit_or("w").alias("w"))
        .agg(_pack_words())
    )
