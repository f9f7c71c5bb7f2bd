"""Streaming first mile: continuous WARC ingestion as a Structured
Streaming topology (the 16th).

Crawl shards LAND continuously — a fetcher fleet drops ``.warc.gz``
files into a bucket all day — and the batch first mile
(``sources/warc.py``) is a pure narrow pipeline, so its streaming twin
is the straight-pipe shape: ``readStream`` over the ``binaryFile``
source (each newly-arrived shard becomes one task, exactly like the
batch scan; gzip keeps shards whole-file, so a micro-batch's
parallelism is its shard count) → the SAME ``parse_warc_records`` +
``documents_from_warc``/``documents_from_wet`` transforms the batch
side uses → ``writeStream`` append into the documents table. No
watermark, no state store: every output row depends only on its own
shard, so stream == batch holds exactly (asserted in
tests/test_streaming.py) and the topology scales as a pure map. At
100 TB/day the knobs are ``maxFilesPerTrigger`` (shards per
micro-batch — ingestion latency vs task batching) and shard size at
the fetcher, the same knobs as the batch scan.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQuery

from victor_spark.sources.warc import (
    documents_from_warc,
    documents_from_wet,
    parse_warc_records,
)

_TRANSFORMS = {"warc": documents_from_warc, "wet": documents_from_wet}


def stream_warc_documents(
    spark: SparkSession,
    src_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    glob: str = "*.warc*",
    kind: str = "warc",
    max_files_per_trigger: int | None = None,
    available_now: bool = True,
) -> StreamingQuery:
    """Continuously turn arriving crawl shards under ``src_dir`` into
    ``documents`` rows appended at ``out_dir`` (parquet). ``kind``
    picks the payload contract: ``'warc'`` (response records →
    HTML→text extraction) or ``'wet'`` (conversion records →
    whitespace normalization). The transforms are the batch functions
    themselves, so the stream==batch contract is by construction."""
    try:
        fn = _TRANSFORMS[kind]
    except KeyError:
        raise ValueError(
            f"unknown kind {kind!r}; one of {sorted(_TRANSFORMS)}"
        ) from None
    reader = (
        spark.readStream.format("binaryFile")
        # streaming file sources demand an explicit schema even when the
        # format's schema is fixed; this IS binaryFile's fixed schema
        .schema(
            "path string, modificationTime timestamp, "
            "length long, content binary"
        )
        .option("pathGlobFilter", glob)
        .option("recursiveFileLookup", "true")
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    raw = reader.load(src_dir).select("content")
    docs = fn(parse_warc_records(raw), source=kind)
    writer = (
        docs.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        # trigger(availableNow=False) RAISES in pyspark (the kwarg only
        # accepts True); the continuous fetcher-fleet mode — the
        # module's headline case — uses the default trigger
        writer = writer.trigger(availableNow=True)
    return writer.start()
