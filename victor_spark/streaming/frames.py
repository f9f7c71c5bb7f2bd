"""Streaming frame extraction: a media stream fanned out into a frame
table as it arrives.

The production loop this models: encoded videos land continuously (a
crawl, an upload queue); each is split into sampled frames so per-frame
stages (encode, filter, embed) can run downstream without re-reading the
source video. The reference has no streaming or media; this is the
streaming twin of ``operators/multimodal.py::sample_frames``.

Shape note: unlike the foreachBatch topologies, this one is a
STREAMING-NATIVE transformation — ``mapInPandas`` is a stateless
partition-local operator, so the frame sampler runs directly on the
unbounded DataFrame (append mode, no watermark, no per-batch driver
callback). At 100 TB/day of media that matters: every micro-batch is one
Arrow-batched map pass with no shuffle and no driver round-trip, and the
sink directory becomes the frame table downstream jobs read.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from victor_spark.operators.multimodal import sample_frames


def stream_frame_extraction(media_stream: DataFrame, out_dir: str,
                            checkpoint_dir: str, frame_bytes: int = 16,
                            stride: int = 2,
                            available_now: bool = True) -> StreamingQuery:
    """Continuously explode a media stream into sampled frames and append
    them to a parquet frame table at ``out_dir``.

    ``media_stream`` must carry the MEDIA_SCHEMA columns (media_id, kind,
    payload, …); output rows follow ``FRAME_SCHEMA`` (media_id, frame_idx,
    n_frames, frame). Exactly-once into the sink comes from the file-sink
    commit log + checkpoint, same as the event ingest topology.
    """
    frames = sample_frames(media_stream, frame_bytes=frame_bytes, stride=stride)
    writer = (
        frames.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
