from victor_spark.streaming.crawl_gate import (
    crawl_frontier_stream,
    gate_urls,
    rules_by_host,
    sitemap_frontier_stream,
)
from victor_spark.streaming.dedup_stream import stream_incremental_dedup
from victor_spark.streaming.enrich import stream_asof_enrich
from victor_spark.streaming.frames import stream_frame_extraction
from victor_spark.streaming.index_ingest import (
    stream_chunked_ingest,
    stream_index_ingest,
)
from victor_spark.streaming.ingest import (
    ensure_event_time,
    hourly_event_counts_stream,
    stream_events_to_table,
)
from victor_spark.streaming.interval_join import incident_window_join_stream
from victor_spark.streaming.search import (
    search_microbatch,
    stream_search,
)
from victor_spark.streaming.bloom_stream import stream_seen_filter
from victor_spark.streaming.hist_stream import (
    quantile_estimate,
    stream_quantile_rollup,
)
from victor_spark.streaming.curation_stream import (
    curate_documents,
    stream_curated_documents,
)
from victor_spark.streaming.media_stream import stream_decode_media
from victor_spark.streaming.warc_stream import stream_warc_documents
from victor_spark.streaming.sketch_stream import (
    distinct_estimate,
    stream_distinct_rollup,
)
from victor_spark.streaming.stateful import (
    dedup_events_stream,
    sessionize_stream,
)
from victor_spark.streaming.screen_stream import (
    screen_conversations,
    stream_screened_conversations,
)
from victor_spark.streaming.tokenize_stream import (
    stream_tokenized_documents,
    tokenize_documents,
)
from victor_spark.streaming.drift_stream import (
    cumulative_drift,
    drift_metrics,
    epoch_drift,
    stream_vocab_drift,
    type_drift,
)

__all__ = [
    "stream_events_to_table",
    "hourly_event_counts_stream",
    "dedup_events_stream",
    "sessionize_stream",
    "search_microbatch",
    "stream_search",
    "stream_asof_enrich",
    "stream_incremental_dedup",
    "stream_index_ingest",
    "stream_frame_extraction",
    "ensure_event_time",
    "incident_window_join_stream",
    "stream_distinct_rollup",
    "distinct_estimate",
    "stream_seen_filter",
    "stream_chunked_ingest",
    "curate_documents",
    "stream_curated_documents",
    "stream_decode_media",
    "stream_quantile_rollup",
    "quantile_estimate",
    "stream_warc_documents",
    "crawl_frontier_stream",
    "gate_urls",
    "rules_by_host",
    "sitemap_frontier_stream",
    "tokenize_documents",
    "stream_tokenized_documents",
    "screen_conversations",
    "stream_screened_conversations",
    "type_drift",
    "drift_metrics",
    "stream_vocab_drift",
    "epoch_drift",
    "cumulative_drift",
]
