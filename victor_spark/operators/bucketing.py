"""Bucketed co-located joins — the remove-the-shuffle-entirely lever.

Every big-to-big equi-join shuffles BOTH sides on the key; at 100 TB
that exchange dominates the job. Spark's answer is bucketing: write the
table hash-partitioned into a fixed number of buckets on the join key
(and sorted within each bucket), record that layout in the catalog, and
every later join/aggregation on that key reads co-located, pre-sorted
buckets — the physical plan contains a SortMergeJoin with NO Exchange
(and with ``sortBy`` no per-task Sort either) on the bucketed sides.

This is the persisted sibling of the catalog's broadcast/salting levers:
broadcast removes the shuffle when one side is small, salting tames a
skewed shuffle, bucketing removes the shuffle for REPEATED joins on a
known key — fact tables joined on the same key every day pay the
exchange once at write time, never at read time.

The bucket layout only co-locates when both sides agree on (key, bucket
count) — the write is the contract. ``tests/test_bucketing.py`` asserts
the no-Exchange plan on real bucketed tables and exact result parity
with the plain join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, key: str, n_buckets: int,
                   path: str | None = None,
                   sort: bool = True) -> None:
    """Persist ``df`` as a bucketed (and bucket-sorted) parquet table in
    the session catalog. ``path`` makes it external (data at ``path``,
    metadata in the catalog) — pass it in tests to keep data in a temp
    dir. Overwrites any existing table of the same name."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    w = df.write.mode("overwrite").format("parquet").bucketBy(n_buckets, key)
    if sort:
        w = w.sortBy(key)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def bucketed_join(spark: SparkSession, left_table: str, right_table: str,
                  on: str, how: str = "inner") -> DataFrame:
    """Join two catalog tables on ``on``. When both were written with
    :func:`write_bucketed` on the same (key, bucket count), the planned
    SortMergeJoin has no Exchange on either side — assert it with
    ``.explain()`` after layout changes. The merge hint keeps the
    cost-based planner from broadcasting a small side in tests, which
    would hide the property under audit."""
    left = spark.table(left_table).hint("merge")
    right = spark.table(right_table)
    return left.join(right, on, how)
