"""Structured Streaming ingest: availableNow drain equals batch results."""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from victor_spark.sources import load_table
from victor_spark.streaming import hourly_event_counts_stream, stream_events_to_table


def _stage_dir(tmp_path) -> str:
    """Spark's streaming file source monitors a DIRECTORY; the testdata
    table is a single parquet file, so stage it into one."""
    d = tmp_path / "events_src"
    d.mkdir()
    shutil.copy(os.path.join(SF_SMOKE, "events.parquet"), d / "part-0.parquet")
    return str(d)


def _stream_events(spark, src):
    """readStream over the events file; ts arrives as nanos-long (see
    sources/tables.py) and is truncated to a microsecond timestamp."""
    raw_schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(raw_schema).format("parquet").load(src)
    if dict(stream.dtypes).get("ts") == "bigint":
        stream = stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return stream


def test_stream_ingest_matches_batch(spark, tmp_path):
    src = _stage_dir(tmp_path)
    batch = load_table(spark, SF_SMOKE, "events")
    raw_schema = spark.read.parquet(src).schema
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    stream_events_to_table(spark, src, sink, ckpt, raw_schema)
    out = spark.read.parquet(sink)
    assert out.count() == batch.count()
    # partitioned by event_type on disk
    assert any(p.startswith("event_type=") for p in os.listdir(sink))


def test_windowed_stream_agg_matches_batch(spark, tmp_path):
    src = _stage_dir(tmp_path)
    agg = hourly_event_counts_stream(_stream_events(spark, src))
    sink = str(tmp_path / "agg_sink")
    ckpt = str(tmp_path / "agg_ckpt")
    (
        agg.writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    got = {
        (r["hour"], r["event_type"]): r["n_events"]
        for r in spark.read.parquet(sink).collect()
    }
    expected = {
        (r["hour"], r["event_type"]): r["n"]
        for r in load_table(spark, SF_SMOKE, "events")
        .groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH").alias("hour"),
            "event_type",
        )
        .agg(F.count("*").alias("n"))
        .collect()
    }
    # append mode emits only watermark-closed windows; every emitted window
    # must match its batch twin, and the bulk of windows should be emitted
    assert got
    for k, v in got.items():
        assert expected[k] == v
    assert len(got) >= len(expected) * 2 // 3
