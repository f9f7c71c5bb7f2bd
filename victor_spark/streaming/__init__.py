from victor_spark.streaming.ingest import (
    hourly_event_counts_stream,
    stream_events_to_table,
)

__all__ = ["stream_events_to_table", "hourly_event_counts_stream"]
