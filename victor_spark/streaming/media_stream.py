"""Streaming media decode: the decode farm as a Structured Streaming
topology.

Media rows (MEDIA_SCHEMA binary payloads) arrive continuously — a crawl
or upload feed — and each micro-batch is decoded and reduced to typed
features/statistics on the way into the lake. Decode is STATELESS, so
this is the straight-pipe streaming shape: ``readStream`` → the SAME
Arrow-batched mapInPandas decode operators the batch side uses
(operators/multimodal.py — real PPM/WAV codecs, stubs for compressed
formats) → ``writeStream`` append sink. No watermark, no state store, no
foreachBatch: every row's output depends only on that row, so
stream == batch holds exactly and the topology scales as a pure map —
at 100 TB/day the only knobs are source partitioning and
``spark.sql.execution.arrow.maxRecordsPerBatch`` (bound each pandas
batch's decoded-pixel memory), the same knobs as the batch operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from victor_spark.operators.multimodal import (
    decode_audio_stats,
    decode_image_stats,
    image_dhash,
)

_TRANSFORMS = {
    "image_stats": decode_image_stats,
    "audio_stats": decode_audio_stats,
    "image_dhash": image_dhash,
}


def stream_decode_media(
    media_stream: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    transform: str = "image_stats",
    available_now: bool = True,
) -> StreamingQuery:
    """Decode a media stream into ``out_dir`` (parquet, append).

    ``transform`` picks the decode reduction: ``image_stats`` (real PPM
    decode → pixel statistics), ``audio_stats`` (real WAV decode →
    sample statistics), or ``image_dhash`` (perceptual hash — the
    streaming half of image dedup: hash on ingest, exact-groupBy later).
    The transform functions are the batch operators themselves, so the
    stream==batch contract is by construction, asserted in
    tests/test_streaming.py."""
    try:
        fn = _TRANSFORMS[transform]
    except KeyError:
        raise ValueError(
            f"unknown transform {transform!r}; one of {sorted(_TRANSFORMS)}"
        ) from None
    writer = (
        fn(media_stream)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        # trigger(availableNow=False) RAISES in pyspark (the kwarg only
        # accepts True); continuous mode is the default trigger
        writer = writer.trigger(availableNow=True)
    return writer.start()
