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

    events.ts is TIMESTAMP(NANOS) in the files — Spark reads it as a long
    (spark.sql.legacy.parquet.nanosAsLong) and we truncate to microseconds
    here, exactly as DuckDB's reader does, so both engines see the same
    timestamps.

    ``nanosAsLong`` is a *runtime* SQL conf, so it is set here rather than
    only in :func:`victor_spark.session.get_spark`'s builder: callers hand
    us arbitrary SparkSessions (the correctness driver builds its own), and
    without the conf the events scan fails with PARQUET_TYPE_ILLEGAL before
    any query runs.
    """
    if name not in TABLES:
        raise ValueError(f"unknown table {name!r}; expected one of {TABLES}")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        from pyspark.sql import functions as F

        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def fan_out(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Widen a narrow scan to the session's parallelism before CPU-bound work.

    The parquet reader cannot split inside a row group, so a small-file
    corpus (like the testdata: one row group per table) enters the pipeline
    with 1-2 partitions and leaves the other 30 cores idle through the
    expensive per-row stages (md5 shingling, SimHash, regex token stats).
    A round-robin repartition of a few MB buys full CPU parallelism.

    Guarded by a metadata-only partition count: when the scan is already
    wide (the 100 TB case — thousands of splits) this is a no-op, so
    operators can call it unconditionally without risking a full-table
    shuffle at scale.
    """
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view for spark.sql use."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
