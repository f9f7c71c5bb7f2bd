"""File-per-asset media ingestion: a directory of raw media files →
the MEDIA_SCHEMA table.

Real media lakes land as one file per asset (crawl dumps, upload
buckets). Spark's ``binaryFile`` source reads such a tree scalably —
each file becomes a row read executor-side, with pathGlobFilter /
recursiveFileLookup pruning at the listing (and Catalyst pushes a
``length`` filter into the reader) — so ingestion needs no driver-side
directory walk. This module wraps it: one Arrow-batched pass sniffs each
payload's container by magic bytes (the same dispatch rule the decode
operators use), extracts the typed metadata the container actually
declares (PPM geometry, WAV sample rate, y4m geometry), and emits
MEDIA_SCHEMA rows ready for the decode/dedup/frame-sampling operators.

Unknown formats are kept, not dropped: kind='binary' with null metadata,
so a pipeline can quarantine or route them; the decode operators'
compressed-format stubs remain the seam for real codecs.

UPGRADE NOTE (round 6): ``media_id`` derivation changed default. It was
"numeric filename stem, else hash"; it is now ALWAYS the low 63 bits of
md5(full path), with the old stem behavior opt-in via
``numeric_stem_ids=True``. Rationale: stem-derived ids silently collide
across directories (a/1.ppm vs b/1.ppm). Consequence: tables
materialized under the old default get DIFFERENT media_ids when
re-ingested — re-derive downstream joins from a fresh ingest, or pass
``numeric_stem_ids=True`` to keep the old ids (round-6 advisor).
"""

from __future__ import annotations

import hashlib
import os
import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from victor_spark.operators.mp3_probe import looks_like_mp3
from victor_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    _GIF_MAGICS,
    _JPEG_MAGIC,
    _PNG_SIG,
    _is_aiff,
    _is_au,
    _is_simple_raster,
    _is_wave,
    _is_webp,
    _parse_aiff,
    _parse_au,
    _parse_gif,
    _parse_png,
    _parse_ppm,
    _parse_wav,
    _parse_y4m,
)


def _media_id_for(path: str, numeric_stem_ids: bool = False) -> int:
    """Stable media_id from the file path: by default the low 63 bits of
    md5(full path) — deterministic across runs/executors and collision-
    free across directories. With ``numeric_stem_ids``, a purely-numeric
    stem is used as-is (so exported/derived layouts round-trip their
    ids); that mode PRESUMES stems are unique across the whole tree —
    a/1.ppm and b/1.ppm would collide, and a numeric stem can collide
    with another file's hashed id."""
    if numeric_stem_ids:
        stem = os.path.splitext(os.path.basename(path))[0]
        if re.fullmatch(r"\d{1,18}", stem):
            return int(stem)
    return int.from_bytes(hashlib.md5(path.encode()).digest()[:8], "big") >> 1


def load_media_dir(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
    recursive: bool = True,
    numeric_stem_ids: bool = False,
) -> DataFrame:
    """Read a directory tree of media files into a MEDIA_SCHEMA frame.

    ``glob`` maps to binaryFile's pathGlobFilter (listing-time pruning);
    kind and metadata come from each payload's own container header.
    ``numeric_stem_ids`` opts into stem-derived ids for layouts whose
    filenames ARE the ids (uniqueness precondition in _media_id_for)."""
    reader = spark.read.format("binaryFile")
    if glob is not None:
        reader = reader.option("pathGlobFilter", glob)
    if recursive:
        reader = reader.option("recursiveFileLookup", "true")
    raw = reader.load(path).select("path", "content")

    def _sniff(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct

        for pdf in batches:
            rows = {k: [] for k in (
                "media_id", "kind", "payload", "meta_width", "meta_height",
                "meta_sample_rate",
            )}
            for p, content in zip(pdf["path"], pdf["content"]):
                b = bytes(content)
                kind, w, h, rate = "binary", None, None, None
                try:
                    if b.startswith(b"P6"):
                        kind = "image"
                        w, h, _maxval, _arr = _parse_ppm(b)
                    elif b.startswith(_PNG_SIG):
                        kind = "image"
                        w, h, _arr = _parse_png(b)
                    elif b[:6] in _GIF_MAGICS:
                        # an animated GIF is a video for routing purposes
                        # (it feeds the frame sampler); a still is an image
                        w, h, frames = _parse_gif(b)
                        kind = "video" if len(frames) > 1 else "image"
                    elif b.startswith(_JPEG_MAGIC):
                        # header-only probe: ingest must not pay a full
                        # DCT decode per asset just to learn geometry
                        from victor_spark.operators.jpeg_codec import (
                            jpeg_dimensions,
                        )

                        kind = "image"
                        w, h = jpeg_dimensions(b)
                    elif _is_simple_raster(b):
                        # the uncompressed/RLE raster family (PNM,
                        # BMP, Sun raster, SGI, baseline TIFF, XBM) —
                        # decode IS the header-cheap path for these
                        # (verbatim memcpy or byte-RLE)
                        from victor_spark.operators.multimodal import (
                            _parse_image,
                        )

                        kind = "image"
                        w, h, _arr = _parse_image(b)
                    elif _is_wave(b):  # both RIFF magics — bare 'RIFF'
                        # also wraps AVI / WebP (probed below)
                        kind = "audio"
                        rate, _samples = _parse_wav(b)
                    elif _is_aiff(b):
                        kind = "audio"
                        rate, _samples = _parse_aiff(b)
                    elif _is_au(b):
                        kind = "audio"
                        rate, _samples = _parse_au(b)
                    elif (
                        len(b) >= 12
                        and b[:4] == b"RIFF"
                        and b[8:12] == b"AVI "
                    ):
                        # MJPEG-in-AVI: header-only probe (avih), like
                        # the JPEG SOF probe — no per-frame DCT decode
                        # at ingest
                        from victor_spark.operators.multimodal import (
                            _avi_dimensions,
                        )

                        kind = "video"
                        w, h, _n = _avi_dimensions(b)
                    elif _is_webp(b):
                        # header-only probe (VP8X canvas / VP8 keyframe /
                        # VP8L signature, cross-checked): honest image
                        # metadata; pixel decode stays a LOUD stub —
                        # strict farms pre-filter with decodable_image()
                        from victor_spark.operators.multimodal import (
                            webp_dimensions,
                        )

                        kind = "image"
                        w, h = webp_dimensions(b)
                    elif b[:4] == b"fLaC":
                        # header-only probe (STREAMINFO), like the JPEG
                        # SOF probe — no entropy decode at ingest
                        from victor_spark.operators.flac_codec import (
                            flac_streaminfo,
                        )

                        rate, ch, bps, _n = flac_streaminfo(b)
                        if ch > 2 or bps != 16:
                            # outside the codec subset (mono/stereo
                            # 16-bit): quarantine NOW — the strict
                            # decode farm downstream would otherwise
                            # fail the job on this row
                            raise ValueError(
                                f"unsupported FLAC ch={ch} bps={bps}"
                            )
                        kind = "audio"
                    elif b.startswith(b"YUV4MPEG2"):
                        kind = "video"
                        w, h, _chroma, _frames = _parse_y4m(b)
                    elif looks_like_mp3(b):
                        # metadata-only probe: the FULL frame walk must
                        # succeed (lands exactly on end-of-stream), so a
                        # random 0xFF-leading binary desyncs and
                        # quarantines. Honest audio metadata without a
                        # Layer-III entropy decode — which stays a LOUD
                        # NotImplementedError in the decode farms
                        # (mp3_probe module docstring)
                        from victor_spark.operators.mp3_probe import (
                            mp3_probe,
                        )

                        rate = mp3_probe(b)["sample_rate"]
                        kind = "audio"
                except (ValueError, struct.error):
                    # right magic, corrupt container — quarantined, never
                    # fails the ingest job (struct.error caught as a
                    # belt-and-braces backstop; the parsers' contract is
                    # ValueError)
                    kind = "binary"
                    w = h = rate = None
                rows["media_id"].append(_media_id_for(p, numeric_stem_ids))
                rows["kind"].append(kind)
                rows["payload"].append(b)
                rows["meta_width"].append(w)
                rows["meta_height"].append(h)
                rows["meta_sample_rate"].append(rate)
            yield pd.DataFrame(rows)

    return raw.mapInPandas(_sniff, schema=MEDIA_SCHEMA)
