"""Structured Streaming ingest (extension — the reference is fully
synchronous batch, SURVEY.md §2.5 'Streaming: none').

Two shapes a 100 TB pipeline needs:

- append ingest: file-source stream → partitioned parquet sink with
  checkpointing; `availableNow` drains the backlog as micro-batches and
  stops, which is also how the tests exercise it hermetically.
- windowed aggregation: event-time hourly counts with a watermark bounding
  state; the batch twin is the `events_hourly` catalog query, and the test
  asserts stream results == batch results once the stream drains.

At scale the same code runs continuously: the parquet sink partitions by
event_type (or a time bucket) and each micro-batch is an append-only write;
state for the windowed agg is bounded by the watermark horizon, not the
stream length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def ensure_event_time(events: DataFrame, col: str = "ts") -> DataFrame:
    """Watermarks require an LTZ TIMESTAMP event-time column; the parquet
    testdata stores naive (NTZ) timestamps. Cast NTZ -> TIMESTAMP, which
    interprets the wall clock in the session timezone (UTC in our sessions,
    see session.get_spark), so stream windows line up with the batch twin's
    wall-clock hours."""
    if dict(events.dtypes).get(col) == "timestamp_ntz":
        events = events.withColumn(col, F.col(col).cast("timestamp"))
    return events


def stream_events_to_table(
    spark: SparkSession,
    source_dir: str,
    sink_dir: str,
    checkpoint_dir: str,
    schema,
) -> None:
    """Drain a directory of event parquet files into a partitioned table
    via availableNow micro-batches (file-source streaming ingest)."""
    stream = (
        spark.readStream.schema(schema)
        .format("parquet")
        .load(source_dir)
    )
    (
        stream.writeStream.format("parquet")
        .option("path", sink_dir)
        .option("checkpointLocation", checkpoint_dir)
        .partitionBy("event_type")
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


def hourly_event_counts_stream(events: DataFrame) -> DataFrame:
    """Watermarked hourly windowed aggregation over a streaming DataFrame.

    10-minute watermark: late rows beyond it are dropped and state older
    than (max event time − 10 min) is evicted, so executor state stays
    bounded on an unbounded stream.
    """
    return (
        ensure_event_time(events).withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(F.count("*").alias("n_events"))
        .select(
            F.date_format(F.col("win.start"), "yyyy-MM-dd HH").alias("hour"),
            "event_type",
            "n_events",
        )
    )
