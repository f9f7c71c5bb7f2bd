"""Stream-stream interval join — Structured Streaming's genuinely
bidirectional join, with watermark-bounded state on BOTH sides.

Shape: error incidents (one stream) joined to the events that occur inside
each incident's follow-up window (the other stream, derived from the same
source here but independent in general):

    incidents.ts <= events.ts < incidents.ts + window

Both sides carry a watermark, and the time-range join condition lets Spark
derive each side's state retention: an incident can only ever match events
within ``window`` of its timestamp, so incident state older than
(event watermark − window) is evicted, and event state older than the
incident watermark is evicted. That bounded-state property is exactly what
makes stream-stream joins deployable on an unbounded 100 TB/day stream —
without the range condition Spark would have to keep every row forever.

The batch twin is ``operators/ranges.py::range_join_binned`` (the
events_range_join catalog query); the test asserts the drained stream
equals the batch result.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from victor_spark.streaming.ingest import ensure_event_time


def incident_window_join_stream(events: DataFrame, window_minutes: int = 1440,
                                value_threshold: float = 150.0) -> DataFrame:
    """Join the error-incident substream to the full event stream over the
    incident's follow-up window; emit (incident_id, event_id, lag_sec).

    ``events`` is a STREAMING DataFrame of the events schema. Returns the
    streaming joined frame (append mode; rows finalize as watermarks pass).
    """
    ev = ensure_event_time(events)
    incidents = (
        ev.filter((F.col("event_type") == "error") & (F.col("value") > value_threshold))
        .select(
            F.col("event_id").alias("incident_id"),
            F.col("user_id").alias("incident_user"),
            F.col("ts").alias("inc_ts"),
        )
        .withWatermark("inc_ts", "10 minutes")
    )
    followups = ev.select(
        F.col("event_id"), F.col("user_id"), F.col("ts").alias("ev_ts")
    ).withWatermark("ev_ts", "10 minutes")
    cond = (
        (F.col("incident_user") == F.col("user_id"))
        & (F.col("ev_ts") >= F.col("inc_ts"))
        & (F.col("ev_ts") < F.col("inc_ts") + F.expr(f"INTERVAL {window_minutes} MINUTES"))
        & (F.col("event_id") != F.col("incident_id"))
    )
    return incidents.join(followups, cond).select(
        "incident_id",
        "event_id",
        F.timestamp_diff("SECOND", F.col("inc_ts"), F.col("ev_ts")).alias("lag_sec"),
    )
