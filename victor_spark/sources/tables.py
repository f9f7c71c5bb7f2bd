"""Parquet sources for the driver's testdata star schema.

At 100 TB these reads are plain columnar scans: Catalyst pushes filters and
prunes columns into the parquet reader (verify with ``.explain`` →
``PushedFilters`` / ``ReadSchema``), so the operators built on top never
read more bytes than their projection needs.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table as a DataFrame (lazy parquet scan).

    events.ts is stored as parquet TIMESTAMP(isAdjustedToUTC=false) — a
    *naive* wall-clock timestamp (DuckDB's plain TIMESTAMP). What Spark
    yields for that depends on the session it hands us (the correctness
    driver builds its own, with its own confs), so we canonicalize every
    arrival shape to TIMESTAMP_NTZ, the timezone-independent type that
    matches the storage semantics:

    - ``timestamp_ntz``: the default read (inferTimestampNTZ on) — as-is.
    - ``timestamp`` (LTZ, inference off): the naive value was taken as a
      UTC instant, so re-interpreting its epoch micros as NTZ restores the
      original wall clock without consulting the session timezone.
    - ``bigint`` (legacy nanosAsLong sessions reading NANOS files):
      truncate to micros, then micros→NTZ.

    If the files carry TIMESTAMP(NANOS) — which vanilla Spark REJECTS at
    schema-inference time (PARQUET_TYPE_ILLEGAL; this killed every events
    query of round 1 in the driver's own session) — the read is retried
    with ``spark.sql.legacy.parquet.nanosAsLong`` set, landing in the
    bigint branch above. The conf is runtime-settable, so this repairs
    sessions we didn't build.

    Downstream, every events query does its time arithmetic in NTZ (see
    ``epoch_us``), so results are identical in any session timezone.
    """
    if name not in TABLES:
        raise ValueError(f"unknown table {name!r}; expected one of {TABLES}")
    path = os.path.join(sf_dir, f"{name}.parquet")
    # Schema memo (round-11 optimization, guide §7.3 "planning time"):
    # schema inference reads parquet footers through a fresh JVM relation
    # on EVERY call (~90 ms measured), and the catalog builds each table
    # reference 1-4 times per query — pure serial driver latency inside
    # the timed region. The memo caches the INFERRED SCHEMA (never data,
    # never the DataFrame: each call still returns a fresh lazy scan with
    # its own file listing) per session object, keyed by (path, mtime) so
    # a regenerated testdata dir misses. Inference depends on session
    # confs (e.g. inferTimestampNTZ), so the cache lives ON the session
    # and dies with it. The NANOS fallback path below stays uncached.
    cache = getattr(spark, "_victor_schema_cache", None)
    if cache is None:
        cache = {}
        spark._victor_schema_cache = cache
    # Key by path -> (content mtime, schema): for a parquet DIRECTORY whose
    # part files are rewritten in place, the directory mtime alone can stay
    # unchanged, so fold in the direct children's mtimes (round-11 advice);
    # storing per-path also evicts stale entries instead of accumulating.
    mtime = _content_mtime_ns(path)
    hit = cache.get(path) if mtime is not None else None
    sch = hit[1] if hit is not None and hit[0] == mtime else None
    if sch is not None:
        df = spark.read.schema(sch).parquet(path)
        if name == "events":
            df = _canonical_events_ts(df, sch)
        return df
    try:
        df = spark.read.parquet(path)
        if mtime is not None:
            cache[path] = (mtime, df.schema)
    except Exception as exc:  # AnalysisException: footer read is eager
        if "PARQUET_TYPE_ILLEGAL" not in str(exc):
            raise
        # scope the legacy conf to this read: set, re-read, force analysis
        # (the physical scan reuses the analysis-time schema), then restore
        # the caller's previous value so unrelated NANOS parquet reads in
        # the same session keep their original interpretation.
        conf_key = "spark.sql.legacy.parquet.nanosAsLong"
        prev = spark.conf.get(conf_key, None)
        spark.conf.set(conf_key, "true")
        try:
            df = spark.read.parquet(path)
            df.schema  # force analysis while the conf is in effect
        finally:
            if prev is None:
                spark.conf.unset(conf_key)
            else:
                spark.conf.set(conf_key, prev)
    if name == "events":
        df = _canonical_events_ts(df, df.schema)
    return df


def _content_mtime_ns(path: str):
    """Memo key for a local parquet path: the path's own mtime folded with
    its direct children's (a directory whose part files are rewritten under
    the same names keeps its own mtime). None for non-local/URI paths —
    the memo is skipped there."""
    try:
        st = os.stat(path)
    except OSError:
        return None
    mt = st.st_mtime_ns
    if os.path.isdir(path):
        try:
            with os.scandir(path) as it:
                for e in it:
                    try:
                        mt = max(mt, e.stat().st_mtime_ns)
                    except OSError:
                        pass
        except OSError:
            return None
    return mt


def _canonical_events_ts(df: DataFrame, schema) -> DataFrame:
    """Canonicalize events.ts to TIMESTAMP_NTZ (see load_table docstring).

    The arrival dtype is derived from the (possibly memoized) schema
    object locally — no extra JVM round trip."""
    from pyspark.sql import functions as F

    dt = next(
        (f.dataType.simpleString() for f in schema.fields if f.name == "ts"), None
    )
    epoch = F.lit("1970-01-01 00:00:00").cast("timestamp_ntz")
    if dt == "bigint":
        df = df.withColumn(
            "ts", F.timestamp_add("MICROSECOND", F.expr("ts div 1000"), epoch)
        )
    elif dt == "timestamp":
        df = df.withColumn(
            "ts", F.timestamp_add("MICROSECOND", F.unix_micros("ts"), epoch)
        )
    return df


def epoch_us(col):
    """Microseconds since the naive epoch for a TIMESTAMP_NTZ column.

    ``F.unix_micros`` only accepts LTZ timestamps; a cast NTZ→LTZ would
    re-introduce the session timezone. ``timestamp_diff`` against an NTZ
    epoch literal is pure wall-clock arithmetic — same value in any
    session, matching DuckDB's ``epoch_us(ts)`` on naive timestamps.
    """
    from pyspark.sql import functions as F

    epoch = F.lit("1970-01-01 00:00:00").cast("timestamp_ntz")
    return F.timestamp_diff("MICROSECOND", epoch, F.col(col) if isinstance(col, str) else col)


def fan_out(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Widen a narrow scan to the session's parallelism before CPU-bound work.

    The parquet reader cannot split inside a row group, so a small-file
    corpus (like the testdata: one row group per table) enters the pipeline
    with 1-2 partitions and leaves the other 30 cores idle through the
    expensive per-row stages (md5 shingling, SimHash, regex token stats).
    A round-robin repartition of a few MB buys full CPU parallelism.

    Guarded by a metadata-only size estimate: when the scan is already
    wide (the 100 TB case — thousands of splits) this is a no-op, so
    operators can call it unconditionally without risking a full-table
    shuffle at scale.

    Round-11 optimization (guide §7.3): the guard used to call
    ``df.rdd.getNumPartitions()``, which physically plans the SUBTREE —
    ~26 ms of driver time per call (×69 call sites), all thrown away when
    the real query replans from scratch. The analyzed plan's sizeInBytes
    (~1 ms, no physical planning) answers the same binary question: an
    input below ``target × maxPartitionBytes`` cannot yield ≥ target
    splits, so it is narrow → repartition; anything at or above that is
    wide → no-op. File-source stats are the summed file sizes (never an
    underestimate for scans/unions/projections, the shapes fan_out sees),
    and plans whose size is unknown default to Long.MaxValue → no-op,
    matching the old probe's behaviour on checkpointed inputs. The only
    divergence is many-tiny-files inputs under the byte threshold, where
    the old probe no-opped and this one repartitions a few MB — the
    direction fan_out exists for.
    """
    sc = df.sparkSession.sparkContext
    target = min_partitions or sc.defaultParallelism
    plan = df._jdf.queryExecution().analyzed()
    size = int(str(plan.stats().sizeInBytes()))
    max_pb = _max_partition_bytes(df.sparkSession)
    if size >= target * max_pb:
        return df
    # Narrow by the stats estimate. One rendered-plan pass (still a single
    # py4j round trip) answers two questions; node names are anchored at
    # the start of each tree line, so aliases or string literals containing
    # these words cannot match (round-11 advice):
    #  - already shuffled wide by a caller? Repartition with shuffle=true
    #    renders as "Repartition n, true"; RepartitionByExpression always
    #    shuffles. coalesce() renders "Repartition n, false" and no longer
    #    suppresses the widening.
    #  - any node OUTSIDE the scan/project/union family? File-source stats
    #    are exact summed file sizes only for those shapes; a Filter's
    #    selectivity estimate can underestimate a genuinely WIDE scan into
    #    this branch, and repartitioning it at 100 TB is an unnecessary
    #    full shuffle (round-11 verdict item 6). Those shapes fall back to
    #    the physical partition-count probe (the pre-r11 guard), paying its
    #    ~26 ms only on this rare branch.
    trusted = True
    for line in plan.toString().splitlines():
        body = line.lstrip(" :+-")
        tok = body.split(" ", 1)[0].rstrip(",")
        if not tok:
            continue
        if tok == "RepartitionByExpression" or (
            tok == "Repartition" and body.rstrip().endswith("true")
        ):
            return df
        if tok not in _FANOUT_TRUSTED:
            trusted = False
    if not trusted and df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)


# Logical shapes whose sizeInBytes is the summed file sizes (never an
# estimate): plain file scans, column projections over them, unions, and
# the no-op wrappers. Anything else (Filter, Join, Aggregate, ...) carries
# selectivity estimates that can under-report a wide input.
_FANOUT_TRUSTED = frozenset({
    "LogicalRelation", "Relation", "Project", "Union", "SubqueryAlias",
    "Repartition", "LocalRelation", "Range", "View",
})


def _max_partition_bytes(spark: SparkSession) -> int:
    """spark.sql.files.maxPartitionBytes as an int (handles 128m/1g forms),
    memoized per session object."""
    cached = getattr(spark, "_victor_max_pb", None)
    if cached is not None:
        return cached
    raw = str(spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728"))
    s = raw.strip().lower().rstrip("b")
    mult = 1
    if s and s[-1] in "kmgt":
        mult = 1024 ** ("kmgt".index(s[-1]) + 1)
        s = s[:-1]
    val = int(float(s)) * mult
    spark._victor_max_pb = val
    return val


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view for spark.sql use."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
