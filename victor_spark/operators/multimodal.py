"""Multimodal column plumbing: image/audio/video as opaque binary columns.

The Spark-side contract is real and tested: a `binary` payload column plus
a typed metadata struct, processed in Arrow batches via mapInPandas so a
1000-executor cluster streams media bytes through Python workers without
ever materializing a partition in driver memory. The actual codecs
(PIL/ffmpeg/torchaudio) are NOT in this container, so the decode kernels
are deterministic fakes behind `_decode_*` seams — swap the function body,
keep the schema/partitioning/batch shape.

Batch sizing note for 100 TB: media rows are large, so the knobs that
matter are spark.sql.files.maxPartitionBytes (keep raw-scan partitions
~128-256 MB) and spark.sql.execution.arrow.maxRecordsPerBatch (bound the
pandas batch's memory, e.g. 64 rows of 4 MB images).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),
        StructField("meta_width", IntegerType()),
        StructField("meta_height", IntegerType()),
        StructField("meta_sample_rate", IntegerType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("n_bytes", LongType()),
        StructField("checksum", LongType()),
        StructField("features", ArrayType(FloatType())),
    ]
)


def synthesize_media(df: DataFrame, id_col: str, text_col: str, kind: str = "image") -> DataFrame:
    """Deterministic fake media table from a text table: payload =
    utf-8 bytes of the text (stands in for encoded media bytes)."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.lit(kind).alias("kind"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        (F.length(text_col) % 1024 + 1).cast("int").alias("meta_width"),
        (F.length(text_col) % 768 + 1).cast("int").alias("meta_height"),
        F.lit(16000).alias("meta_sample_rate"),
    )


def _decode_image(payload: bytes) -> list[float]:
    """STUB — real impl: PIL.Image.open(io.BytesIO(payload)), resize,
    normalize. Deterministic fake: 8 byte-histogram buckets of the payload."""
    hist = [0] * 8
    for b in payload:
        hist[b >> 5] += 1
    n = max(len(payload), 1)
    return [h / n for h in hist]


def _decode_audio(payload: bytes) -> list[float]:
    """STUB — real impl: soundfile/torchaudio decode + frame features.
    Deterministic fake: mean/max/min byte value + length."""
    if not payload:
        return [0.0, 0.0, 0.0, 0.0]
    return [
        sum(payload) / len(payload) / 255.0,
        max(payload) / 255.0,
        min(payload) / 255.0,
        float(len(payload)),
    ]


def _decode_video_frames(payload: bytes, stride: int = 4) -> list[float]:
    """STUB — real impl: ffmpeg frame sampling. Deterministic fake: every
    stride-th byte of the first 32, normalized."""
    frames = payload[:32:stride]
    return [b / 255.0 for b in frames] or [0.0]


_DECODERS = {"image": _decode_image, "audio": _decode_audio, "video": _decode_video_frames}


def _resize_image(payload: bytes, width: int, height: int) -> bytes:
    """STUB — real impl: PIL decode → resize((width, height)) → re-encode.
    Deterministic fake: budget one byte per 8x8 pixel block and
    truncate / zero-pad the encoded payload to that size, so the output
    length is a pure function of (width, height) and the head bytes are a
    stable prefix of the input (both properties the oracle checks)."""
    target = max((width * height) // 64, 1)
    return payload[:target].ljust(target, b"\x00")


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """Batch image resize over Arrow batches (mapInPandas) — same
    MEDIA_SCHEMA out as in, with payload re-encoded at the new geometry
    and the metadata struct updated.

    Non-image rows pass through untouched: a mixed-modality table can be
    resized in one pass without a prior split, and the pipeline stays a
    single mapInPandas stage (no shuffle — partition-local work, which is
    what makes this viable against 100 TB of media)."""

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_payload, out_w, out_h = [], [], []
            for kind, payload, w, h in zip(
                pdf["kind"], pdf["payload"], pdf["meta_width"], pdf["meta_height"]
            ):
                if kind == "image":
                    payload = bytes(payload) if payload is not None else b""
                    out_payload.append(_resize_image(payload, width, height))
                    out_w.append(width)
                    out_h.append(height)
                else:
                    out_payload.append(payload)
                    out_w.append(w)
                    out_h.append(h)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "payload": out_payload,
                    "meta_width": out_w,
                    "meta_height": out_h,
                    "meta_sample_rate": pdf["meta_sample_rate"],
                }
            )

    return media.mapInPandas(_resize, schema=MEDIA_SCHEMA)


def extract_features(media: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over Arrow batches.

    The per-batch loop is vectorizable where the real codec allows; the
    contract (columns in, FEATURE_SCHEMA out, one output row per input row)
    is what a production decode farm needs.
    """

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, nbytes, checks = [], [], []
            for kind, payload in zip(pdf["kind"], pdf["payload"]):
                payload = bytes(payload) if payload is not None else b""
                decoder = _DECODERS.get(kind)
                if decoder is None:
                    raise NotImplementedError(f"no decoder for media kind {kind!r}")
                feats.append([float(x) for x in decoder(payload)])
                nbytes.append(len(payload))
                checks.append(sum(payload) % 2_147_483_647)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": nbytes,
                    "checksum": checks,
                    "features": feats,
                }
            )

    return media.mapInPandas(_extract, schema=FEATURE_SCHEMA)


def media_stats(media: DataFrame) -> DataFrame:
    """Pure-SQL media metadata aggregation (no decode): bytes + dims per
    kind. This is the 'cheap pass' a pipeline runs before paying for
    decode, and it is oracle-verifiable."""
    return (
        media.groupBy("kind")
        .agg(
            F.count("*").alias("n_media"),
            F.sum(F.octet_length("payload")).alias("total_bytes"),
            F.round(F.avg(F.octet_length("payload")), 4).alias("avg_bytes"),
            F.max("meta_width").alias("max_width"),
        )
    )


FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("n_frames", LongType()),
        StructField("frame", BinaryType()),
    ]
)


def sample_frames(media: DataFrame, frame_bytes: int = 16,
                  stride: int = 2) -> DataFrame:
    """Video frame sampling: one output ROW per sampled frame.

    Treats a video payload as consecutive ``frame_bytes``-byte frames
    (standing in for ffmpeg's decoded frame stream — swap the slicing for
    a real demuxer, keep the row-expanding batch shape) and emits every
    ``stride``-th frame as its own row (frame_idx 0, stride, 2·stride, …;
    the tail frame may be short — no padding, mirroring a real stream).
    Non-video rows produce no output rows.

    This is the row-EXPANDING mapInPandas shape a training pipeline needs
    for frame extraction: partition-local (no shuffle), Arrow-batched, and
    the output row count is data-dependent — downstream per-frame stages
    (encode, filter, embed) parallelize over frames, not videos.
    """

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, ns, frames = [], [], [], []
            for mid, kind, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"]
            ):
                if kind != "video" or payload is None:
                    continue
                b = bytes(payload)
                n = (len(b) + frame_bytes - 1) // frame_bytes
                for i in range(0, n, stride):
                    ids.append(mid)
                    idxs.append(i)
                    ns.append(n)
                    frames.append(b[i * frame_bytes:(i + 1) * frame_bytes])
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "n_frames": ns,
                 "frame": frames}
            )

    return media.mapInPandas(_sample, schema=FRAME_SCHEMA)
