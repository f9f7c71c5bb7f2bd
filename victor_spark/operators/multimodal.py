"""Multimodal column plumbing: image/audio/video as opaque binary columns.

The Spark-side contract is real and tested: a `binary` payload column plus
a typed metadata struct, processed in Arrow batches via mapInPandas so a
1000-executor cluster streams media bytes through Python workers without
ever materializing a partition in driver memory.

Decode is REAL for every format with a stdlib-expressible codec —
binary PPM (uncompressed), PNG (compressed lossless: zlib
inflate/deflate, chunk CRCs, all five scanline filters), GIF
(compressed lossless over its palette: real LZW with dictionary growth
and resets, animated demux), JPEG — baseline AND progressive SOF2
(compressed LOSSY: the full DCT/quantize/Huffman pipeline incl.
Annex-G multi-scan decode, operators/jpeg_codec.py), RIFF/WAVE
audio (PCM16 mono/stereo, PCM8, G.711 mu-law), FLAC (compressed
lossless audio: rice-coded fixed predictors + frame CRCs,
operators/flac_codec.py), and YUV4MPEG2 video — dispatched by magic
bytes inside the same Arrow-batched seams.
Remaining compressed formats (MP3/H.264/WebP) stay deterministic-fake
stubs behind the same `_decode_*` seams, because their codecs
(ffmpeg/torchaudio) are not stdlib-expressible — swap the stub body,
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
    DoubleType,
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


# ---------------------------------------------------------------------------
# REAL uncompressed-format codecs (pure python/numpy, zero dependencies)
# ---------------------------------------------------------------------------


def _parse_ppm(payload: bytes):
    """Decode a binary PPM (P6) image: 'P6', then width/height/maxval as
    whitespace-separated ASCII tokens with '#' comments allowed, one
    whitespace byte, then width*height*3 raster bytes. Returns
    (width, height, maxval, uint8 ndarray of shape (h, w, 3)).
    Netpbm spec only; maxval must fit one byte."""
    import numpy as np

    if not payload.startswith(b"P6"):
        raise ValueError("not a P6 PPM payload")
    pos, vals = 2, []
    while len(vals) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            nl = payload.find(b"\n", pos)
            pos = len(payload) if nl < 0 else nl + 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        if pos == start:
            raise ValueError("truncated PPM header")
        vals.append(int(payload[start:pos]))
    pos += 1  # exactly one whitespace byte separates maxval from raster
    width, height, maxval = vals
    if not 0 < maxval <= 255:
        raise ValueError(f"unsupported PPM maxval {maxval}")
    need = width * height * 3
    raster = payload[pos : pos + need]
    if len(raster) != need:
        raise ValueError(f"PPM raster short: {len(raster)} != {need}")
    return width, height, maxval, np.frombuffer(raster, dtype=np.uint8).reshape(
        height, width, 3
    )


def _encode_ppm(arr) -> bytes:
    """Encode an (h, w, 3) uint8 array as binary PPM (P6, maxval 255)."""
    import numpy as np

    h, w, _ = arr.shape
    return b"P6\n%d %d\n255\n" % (w, h) + np.ascontiguousarray(
        arr, dtype=np.uint8
    ).tobytes()


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _parse_png(payload: bytes):
    """Decode a PNG image — a REAL COMPRESSED format, handled with the
    stdlib only (zlib inflate + chunk CRCs via zlib.crc32): walk the
    chunk list, parse IHDR, concatenate IDAT, inflate, then reverse the
    per-scanline filters (None/Sub/Up/Average/Paeth — the full filter
    set of the spec). Supports all five color types — 0 (grayscale,
    replicated to 3 channels), 2 (RGB), 3 (palette via PLTE), 4
    (grayscale+alpha — alpha dropped, gray replicated), 6 (RGBA —
    alpha dropped) — at every legal bit depth for each (1/2/4-bit
    packed samples unpacked MSB-first and rescaled; 16-bit reduced to
    the high byte, the standard 8-bit reduction), both non-interlaced
    and Adam7-interlaced (seven independently filtered passes
    scattered onto the pixel grid).
    Returns (width, height, uint8 ndarray (h, w, 3)).

    Reference parity note: the reference treats media as opaque bytes
    (no decode at all); this codec is part of the training-data-pipeline
    extension surface. Spec: RFC 2083."""
    import struct
    import zlib

    import numpy as np

    if not payload.startswith(_PNG_SIG):
        raise ValueError("not a PNG payload")
    pos, ihdr, idat, plte = len(_PNG_SIG), None, [], None
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        if len(data) != length or pos + 12 + length > len(payload):
            raise ValueError("truncated PNG chunk")
        (crc,) = struct.unpack(
            ">I", payload[pos + 8 + length : pos + 12 + length]
        )
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk CRC mismatch in {ctype!r}")
        if ctype == b"IHDR":
            if len(data) != 13:  # ValueError, not struct.error — the
                # parsers' quarantine contract
                raise ValueError(f"PNG IHDR length {len(data)} != 13")
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"PLTE":
            if length == 0 or length % 3:
                raise ValueError(f"invalid PNG PLTE length {length}")
            plte = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, depth, color, _comp, _filt, interlace = ihdr
    if interlace not in (0, 1):
        raise ValueError(f"unsupported PNG: interlace={interlace}")
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color)
    legal_depths = {
        0: (1, 2, 4, 8, 16), 2: (8, 16), 3: (1, 2, 4, 8),
        4: (8, 16), 6: (8, 16),
    }
    if channels is None:
        raise ValueError(f"unsupported PNG color type {color}")
    if depth not in legal_depths[color]:
        raise ValueError(f"illegal PNG depth {depth} for color type {color}")
    if color == 3 and plte is None:
        raise ValueError("palette PNG missing PLTE chunk")
    if w == 0 or h == 0:
        raise ValueError("zero-dimension PNG")
    try:
        raw = zlib.decompress(b"".join(idat))
    except zlib.error as e:  # corrupt deflate stream → quarantine path
        raise ValueError(f"PNG IDAT inflate failed: {e}") from e
    bpp = max(1, channels * depth // 8)  # filter distance (spec §6)

    def _read_sub(pos: int, w_: int, h_: int):
        """Unfilter one (sub-)image of w_ x h_ pixels starting at byte
        ``pos`` of the inflated stream; returns ((h_, w_, channels)
        uint8 samples, next pos). Interlace passes are independently
        filtered sub-images, so the non-interlaced case is just the
        single full-size call."""
        stride = (w_ * channels * depth + 7) // 8
        need = h_ * (1 + stride)
        if pos + need > len(raw):
            raise ValueError(f"PNG scanline data short: {len(raw)}")
        out = np.empty((h_, stride), dtype=np.uint8)
        prev = np.zeros(stride, dtype=np.uint8)
        for y in range(h_):
            line = raw[pos + y * (1 + stride) : pos + (y + 1) * (1 + stride)]
            ftype, row = line[0], np.frombuffer(line[1:], dtype=np.uint8)
            out[y] = _unfilter_scanline(ftype, row, prev, bpp)
            prev = out[y]
        if depth == 8:
            sub = out[:, : w_ * channels].reshape(h_, w_, channels)
        elif depth == 16:
            # big-endian sample pairs; keep the high byte (the
            # standard 16 -> 8 reduction)
            sub = out.reshape(h_, w_ * channels, 2)[..., 0].reshape(
                h_, w_, channels
            )
        else:  # 1/2/4-bit packed samples, MSB-first within each byte
            bits = np.unpackbits(out, axis=1)[:, : w_ * channels * depth]
            weights = 1 << np.arange(depth - 1, -1, -1)
            sub = (
                bits.reshape(h_, w_ * channels, depth) @ weights
            ).astype(np.uint8).reshape(h_, w_, channels)
        return sub, pos + need

    if interlace == 0:
        px, end = _read_sub(0, w, h)
    else:  # Adam7: seven passes, each an independently filtered
        # sub-image scattered onto the (x0 + i*dx, y0 + j*dy) grid
        px = np.zeros((h, w, channels), dtype=np.uint8)
        end = 0
        for x0, y0, dx, dy in (
            (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
            (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
        ):
            pw_ = -(-(w - x0) // dx) if w > x0 else 0
            ph_ = -(-(h - y0) // dy) if h > y0 else 0
            if pw_ == 0 or ph_ == 0:
                continue  # empty pass contributes no bytes (spec §8.2)
            sub, end = _read_sub(end, pw_, ph_)
            px[y0::dy, x0::dx] = sub
    if end != len(raw):
        raise ValueError(f"PNG scanline data length mismatch: {len(raw)}")
    if color == 3:
        if int(px.max()) >= len(plte):
            raise ValueError("PNG palette index out of range")
        px = plte[px[..., 0]]
    elif depth in (1, 2, 4):  # grayscale sub-byte: rescale to 0-255
        px = (px.astype(np.uint16) * 255 // ((1 << depth) - 1)).astype(
            np.uint8
        )
    if px.shape[2] == 1:
        px = np.repeat(px, 3, axis=2)
    elif px.shape[2] == 2:  # gray+alpha: drop alpha, replicate gray
        px = np.repeat(px[..., :1], 3, axis=2)
    elif px.shape[2] == 4:
        px = px[..., :3]
    return w, h, np.ascontiguousarray(px)


def _unfilter_scanline(ftype: int, row, prev, bpp: int):
    """Reverse one PNG scanline filter (spec §6): ``row`` is the filtered
    bytes, ``prev`` the reconstructed previous scanline, ``bpp`` the
    bytes per pixel. Sub/Paeth recurrences are sequential in x by
    definition, so those loop per byte; None/Up/Average-top vectorize."""
    import numpy as np

    x = row.astype(np.int32)
    p = prev.astype(np.int32)
    n = len(x)
    if ftype == 0:  # None
        return row.copy()
    if ftype == 2:  # Up
        return ((x + p) & 0xFF).astype(np.uint8)
    out = np.empty(n, dtype=np.int32)
    if ftype == 1:  # Sub
        out[:bpp] = x[:bpp]
        for i in range(bpp, n):
            out[i] = (x[i] + out[i - bpp]) & 0xFF
    elif ftype == 3:  # Average
        for i in range(n):
            a = out[i - bpp] if i >= bpp else 0
            out[i] = (x[i] + (a + p[i]) // 2) & 0xFF
    elif ftype == 4:  # Paeth
        for i in range(n):
            a = out[i - bpp] if i >= bpp else 0
            c = p[i - bpp] if i >= bpp else 0
            b = p[i]
            pa, pb, pc = abs(b - c), abs(a - c), abs(a + b - 2 * c)
            pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
            out[i] = (x[i] + pred) & 0xFF
    else:
        raise ValueError(f"unknown PNG filter type {ftype}")
    return out.astype(np.uint8)


def _filter_scanline(ftype: int, row, prev, bpp: int):
    """Apply one PNG scanline filter (the encoder side of
    _unfilter_scanline): returns the filtered bytes for reconstructed
    ``row`` given reconstructed ``prev``."""
    import numpy as np

    r = row.astype(np.int32)
    p = prev.astype(np.int32)
    a = np.concatenate([np.zeros(bpp, np.int32), r[:-bpp]]) if bpp <= len(r) else np.zeros_like(r)
    c = np.concatenate([np.zeros(bpp, np.int32), p[:-bpp]]) if bpp <= len(p) else np.zeros_like(p)
    if ftype == 0:
        f = r
    elif ftype == 1:
        f = r - a
    elif ftype == 2:
        f = r - p
    elif ftype == 3:
        f = r - (a + p) // 2
    elif ftype == 4:
        pa, pb, pc = np.abs(p - c), np.abs(a - c), np.abs(a + p - 2 * c)
        pred = np.where(
            (pa <= pb) & (pa <= pc), a, np.where(pb <= pc, p, c)
        )
        f = r - pred
    else:
        raise ValueError(f"unknown PNG filter type {ftype}")
    return (f & 0xFF).astype(np.uint8)


def _encode_png(arr, filter_type: int | str = 0) -> bytes:
    """Encode an (h, w, 3) uint8 array as a REAL PNG (color type 2,
    bit depth 8): filtered scanlines → zlib deflate → signed chunks.
    ``filter_type`` picks the per-scanline filter — an int 0-4,
    'cycle' to use filter (y mod 5) on scanline y (makes a single
    image exercise every unfilter path of the decoder), or 'adaptive'
    for the standard libpng heuristic (per scanline, the filter
    minimizing the sum of absolute signed residuals — smaller deflate
    input, same lossless pixels). Any PNG reader opens the output; the
    bytes are deterministic for a fixed zlib."""
    import struct
    import zlib

    import numpy as np

    a = np.ascontiguousarray(arr, dtype=np.uint8)
    h, w, _ = a.shape
    flat = a.reshape(h, w * 3)
    lines = []
    prev = np.zeros(w * 3, dtype=np.uint8)
    for y in range(h):
        if filter_type == "adaptive":
            best = best_cost = None
            for cand in range(5):
                fl = _filter_scanline(cand, flat[y], prev, 3)
                signed = fl.astype(np.int32)
                cost = int(np.where(signed < 128, signed, 256 - signed).sum())
                if best_cost is None or cost < best_cost:
                    best, best_cost, ft = fl, cost, cand
            lines.append(bytes([ft]))
            lines.append(best.tobytes())
            prev = flat[y]
            continue
        ft = (y % 5) if filter_type == "cycle" else int(filter_type)
        lines.append(bytes([ft]))
        lines.append(_filter_scanline(ft, flat[y], prev, 3).tobytes())
        prev = flat[y]

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    idat = zlib.compress(b"".join(lines), 6)
    return (
        _PNG_SIG + chunk(b"IHDR", ihdr) + chunk(b"IDAT", idat)
        + chunk(b"IEND", b"")
    )


# ---------------------------------------------------------------------------
# GIF codec — a second REAL compressed format, with REAL LZW compression
# (variable-width codes, dictionary growth, code-size bumps, 4095-reset),
# pure stdlib. GIF is lossless over its palette, so decoded pixels are
# bit-exactly oracle-replayable; multi-image GIFs are the classic
# compressed ANIMATION container, which gives sample_frames a genuinely
# compressed video-ish format next to uncompressed y4m.
# ---------------------------------------------------------------------------


def _lzw_encode(data: bytes, min_code_size: int) -> bytes:
    """GIF-flavor LZW: LSB-first bit packing, CLEAR/EOI codes, code width
    grows from min_code_size+1 up to 12 bits, dictionary reset at 4095.
    A real compressor (longest-match dictionary), not a degenerate
    clear-per-symbol stream — so decoding it exercises every decoder
    path."""
    clear, eoi = 1 << min_code_size, (1 << min_code_size) + 1
    out = bytearray()
    buf = nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal buf, nbits
        buf |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(buf & 0xFF)
            buf >>= 8
            nbits -= 8

    width = min_code_size + 1
    table = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    emit(clear, width)
    w = b""
    for ch in data:
        wc = w + bytes([ch])
        if wc in table:
            w = wc
            continue
        emit(table[w], width)
        table[wc] = next_code
        next_code += 1
        if next_code == (1 << width) + 1 and width < 12:
            width += 1
        if next_code == 4096:  # dictionary full: reset
            emit(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        w = bytes([ch])
    if w:
        emit(table[w], width)
    emit(eoi, width)
    if nbits:
        out.append(buf & 0xFF)
    return bytes(out)


def _lzw_decode(data: bytes, min_code_size: int) -> bytes:
    """Inverse of _lzw_encode (the GIF appendix-F algorithm), including
    the deferred (cScSc) case, width bumps and CLEAR resets."""
    clear, eoi = 1 << min_code_size, (1 << min_code_size) + 1
    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    out = bytearray()
    buf = nbits = pos = 0
    width = min_code_size + 1
    table = list(base)
    prev: bytes | None = None
    while True:
        while nbits < width:
            if pos >= len(data):
                return bytes(out)  # missing EOI: tolerate, stream ended
            buf |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = buf & ((1 << width) - 1)
        buf >>= width
        nbits -= width
        if code == clear:
            table = list(base)
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            return bytes(out)
        if code < len(table) and (code < clear or code > eoi):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]  # the cScSc special case
        else:
            raise ValueError(f"corrupt LZW stream: code {code}")
        out += entry
        if prev is not None:
            table.append(prev + entry[:1])
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry


_GIF_MAGICS = (b"GIF87a", b"GIF89a")


def _encode_gif(frames, width: int, height: int, palette=None) -> bytes:
    """Mux palette-index frames into a real GIF89a: logical screen +
    256-entry global color table, per-frame image descriptors, REAL LZW
    image data in 255-byte sub-blocks. ``frames`` are (h, w) uint8 index
    arrays; ``palette`` is a 256×3 array (default: the SQL-replayable
    formula (i, 2i mod 256, 7i mod 256)). Multi-frame input produces the
    classic compressed animation container."""
    import struct

    import numpy as np

    if palette is None:
        i = np.arange(256, dtype=np.int64)
        palette = np.stack([i, (2 * i) % 256, (7 * i) % 256], 1)
    pal = np.asarray(palette, dtype=np.uint8)
    if pal.shape != (256, 3):
        raise ValueError("palette must be 256x3")
    out = [b"GIF89a", struct.pack("<HHBBB", width, height, 0xF7, 0, 0),
           pal.tobytes()]
    for f in frames:
        a = np.ascontiguousarray(f, dtype=np.uint8)
        if a.shape != (height, width):
            raise ValueError(f"frame shape {a.shape} != {(height, width)}")
        out.append(b"\x2c" + struct.pack("<HHHHB", 0, 0, width, height, 0))
        lzw = _lzw_encode(a.tobytes(), 8)
        out.append(bytes([8]))  # LZW minimum code size
        for i in range(0, len(lzw), 255):
            block = lzw[i : i + 255]
            out.append(bytes([len(block)]) + block)
        out.append(b"\x00")  # block terminator
    out.append(b"\x3b")  # trailer
    return b"".join(out)


def _parse_gif(payload: bytes):
    """Demux + decode a GIF: global color table, extension skipping, per
    image LZW decode (full-frame, non-interlaced images — what
    _encode_gif writes; anything else raises ValueError for the
    quarantine path). Returns (width, height, [frame (h,w,3) uint8
    arrays]) with pixels already palette-resolved."""
    w, h, frames = _parse_gif_indexed(payload)
    return w, h, [table[idx] for idx, table in frames]


def _parse_gif_indexed(payload: bytes):
    """_parse_gif without the palette resolution: returns (width,
    height, [(index (h,w) uint8 array, palette (n,3) uint8 array),
    ...]) — the form a lossless re-encode (resize) needs."""
    import struct

    import numpy as np

    if payload[:6] not in _GIF_MAGICS:
        raise ValueError("not a GIF payload")
    if len(payload) < 13:
        raise ValueError("truncated GIF header")
    width, height, packed, _bg, _ar = struct.unpack("<HHBBB", payload[6:13])
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(payload[pos : pos + 3 * n], dtype=np.uint8)
        if len(gct) != 3 * n:
            raise ValueError("truncated GIF color table")
        gct = gct.reshape(n, 3)
        pos += 3 * n
    frames = []
    while pos < len(payload):
        marker = payload[pos]
        pos += 1
        if marker == 0x3B:  # trailer
            break
        if marker == 0x21:  # extension: label + sub-blocks, skip
            pos += 1
            while pos < len(payload) and payload[pos]:
                pos += 1 + payload[pos]
            pos += 1
            continue
        if marker != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{marker:02x}")
        if pos + 9 > len(payload):
            raise ValueError("truncated GIF image descriptor")
        left, top, w, h, ipacked = struct.unpack(
            "<HHHHB", payload[pos : pos + 9]
        )
        pos += 9
        if (left, top, w, h) != (0, 0, width, height):
            raise ValueError("unsupported GIF: partial-frame image")
        if ipacked & 0x40:
            raise ValueError("unsupported GIF: interlaced image")
        table = gct
        if ipacked & 0x80:  # local color table overrides
            n = 2 << (ipacked & 0x07)
            table = np.frombuffer(
                payload[pos : pos + 3 * n], dtype=np.uint8
            )
            if len(table) != 3 * n:
                raise ValueError("truncated GIF local color table")
            table = table.reshape(n, 3)
            pos += 3 * n
        if table is None:
            raise ValueError("GIF image with no color table")
        if pos >= len(payload):
            raise ValueError("truncated GIF image data")
        min_code = payload[pos]
        pos += 1
        if not 2 <= min_code <= 8:
            raise ValueError(f"bad LZW minimum code size {min_code}")
        chunks = []
        while pos < len(payload) and payload[pos]:
            ln = payload[pos]
            chunk = payload[pos + 1 : pos + 1 + ln]
            if len(chunk) != ln:
                raise ValueError("truncated GIF data sub-block")
            chunks.append(chunk)
            pos += 1 + ln
        pos += 1  # the 0x00 terminator
        idx = _lzw_decode(b"".join(chunks), min_code)
        if len(idx) < w * h:
            raise ValueError(f"GIF frame short: {len(idx)} < {w * h}")
        indices = np.frombuffer(idx[: w * h], dtype=np.uint8)
        if int(indices.max(initial=0)) >= len(table):
            raise ValueError("GIF index out of palette range")
        frames.append((indices.reshape(h, w), table))
    if not frames:
        raise ValueError("GIF with no image data")
    return width, height, frames


_JPEG_MAGIC = b"\xff\xd8\xff"


def _is_simple_raster(payload: bytes) -> bool:
    """Magic check for the raster family handled by
    operators/raster_codecs.py: PNM P1-P5 (P6 is the original PPM
    path), BMP, Sun raster, SGI, baseline TIFF, XBM, and the ICO
    favicon container (whose entries re-enter via parse_bmp or
    _parse_png)."""
    from victor_spark.operators.raster_codecs import is_ico

    return (
        payload[:2] in (b"P1", b"P2", b"P3", b"P4", b"P5")
        or payload[:2] == b"BM"
        or payload[:4] == b"\x59\xa6\x6a\x95"
        or payload[:2] == b"\x01\xda"
        or payload[:4] in (b"II*\x00", b"MM\x00*")
        or is_ico(payload)
        or (payload[:7] == b"#define" and b"_bits[]" in payload[:4096])
    )


def _is_webp(payload: bytes) -> bool:
    return (
        len(payload) >= 12
        and payload[:4] == b"RIFF"
        and payload[8:12] == b"WEBP"
    )


def webp_dimensions(payload: bytes) -> tuple[int, int]:
    """Header-only WebP probe -> (width, height) — the MP3-probe stance
    for the image modality: the container and frame-header layers are
    tiny public structures (RIFF chunks; VP8 keyframe tag + 0x9D012A
    start code + 14-bit dims; VP8L 0x2F signature + packed 14-bit
    dims-minus-one; VP8X 24-bit canvas-minus-one fields), while the
    entropy layers stay a loud stub. When a VP8X extended header AND a
    VP8/VP8L frame are both present, their dims must AGREE for a still
    image — a free structural cross-check this probe enforces (real
    encoders emit both; a wrong table/offset desyncs one of them).
    ValueError on anything malformed — the shared parser contract."""
    import struct

    if not _is_webp(payload):
        raise ValueError("not a WebP payload")
    # the RIFF declared size must tile the file exactly (file size - 8),
    # and the chunk walk below must land exactly on end-of-payload — the
    # same self-validating strictness as the MP3 frame walk; corrupt or
    # trailing-garbage containers quarantine, they don't half-parse
    (riff_size,) = struct.unpack("<I", payload[4:8])
    if riff_size != len(payload) - 8:
        raise ValueError(
            f"webp: RIFF size {riff_size} != payload size {len(payload) - 8}"
        )
    canvas = frame = None
    pos = 12
    while pos < len(payload):
        if pos + 8 > len(payload):
            raise ValueError("webp: trailing bytes shorter than a chunk header")
        tag = payload[pos : pos + 4]
        (size,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + size]
        if len(body) < size:
            raise ValueError("webp: truncated chunk")
        if tag == b"VP8X":
            if size < 10:
                raise ValueError("webp: short VP8X header")
            if body[0] & 0x02:
                # ANIM flag: frames live inside ANMF sub-chunks this
                # walk does not descend into — an animated WebP is NOT a
                # still image, and unlike animated GIF there is no frame
                # sampler for it; quarantine rather than mislabel
                raise ValueError("webp: animated (ANIM flag) — not a still")
            w = int.from_bytes(body[4:7], "little") + 1
            h = int.from_bytes(body[7:10], "little") + 1
            canvas = (w, h)
        elif tag == b"VP8 ":
            if size < 10:
                raise ValueError("webp: short VP8 frame")
            if body[0] & 1:
                raise ValueError("webp: VP8 first frame is not a keyframe")
            if body[3:6] != b"\x9d\x01\x2a":
                raise ValueError("webp: bad VP8 keyframe start code")
            w = struct.unpack("<H", body[6:8])[0] & 0x3FFF
            h = struct.unpack("<H", body[8:10])[0] & 0x3FFF
            frame = frame or (w, h)
        elif tag == b"VP8L":
            if size < 5 or body[0] != 0x2F:
                raise ValueError("webp: bad VP8L signature")
            bits = struct.unpack("<I", body[1:5])[0]
            if (bits >> 29) & 0x7:
                raise ValueError("webp: unsupported VP8L version")
            frame = frame or ((bits & 0x3FFF) + 1, ((bits >> 14) & 0x3FFF) + 1)
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if pos != len(payload) and pos != len(payload) + 1:
        # +1: a final odd-sized chunk's pad byte may be omitted by some
        # writers at end-of-file; anything else is framing damage
        raise ValueError("webp: chunk walk did not land on end-of-payload")
    if canvas and frame and canvas != frame:
        # legal for animations (frames tile a larger canvas), but this
        # probe only classifies stills — surface the mismatch
        raise ValueError(f"webp: canvas {canvas} != frame {frame}")
    dims = canvas or frame
    if dims is None:
        raise ValueError("webp: no VP8/VP8L/VP8X chunk found")
    if dims[0] < 1 or dims[1] < 1 or dims[0] * dims[1] > 100_000_000:
        raise ValueError(f"webp: implausible dimensions {dims}")
    return dims


def decodable_image(payload_col) -> "Column":
    """JVM-side predicate: the payload is a container the STRICT image
    farms (decode_image_stats, image_dhash, resize) can fully decode.
    A positive ALLOWLIST of the magics _parse_image actually dispatches
    (PNG, GIF, JPEG, the PNM family, BMP, Sun raster, SGI, baseline
    TIFF, ICO, XBM) — the same fail-closed shape as decodable_audio, so
    WebP (honest metadata, loud pixel stub), any future probe-only
    format, and arbitrary binary all filter OUT instead of crashing the
    farm. Pure substring comparisons — whole-stage codegen."""
    from pyspark.sql import functions as F

    c = F.col(payload_col) if isinstance(payload_col, str) else payload_col
    p2 = F.substring(c, 1, 2)
    magics2 = [b"P1", b"P2", b"P3", b"P4", b"P5", b"P6", b"BM", b"\x01\xda"]
    cond = (F.substring(c, 1, 8) == F.lit(_PNG_SIG))
    for m in _GIF_MAGICS:
        cond = cond | (F.substring(c, 1, 6) == F.lit(m))
    cond = cond | (F.substring(c, 1, 3) == F.lit(_JPEG_MAGIC))
    for m in magics2:
        cond = cond | (p2 == F.lit(m))
    for m in (b"\x59\xa6\x6a\x95", b"II*\x00", b"MM\x00*", b"\x00\x00\x01\x00"):
        cond = cond | (F.substring(c, 1, 4) == F.lit(m))
    return cond | (F.substring(c, 1, 7) == F.lit(b"#define"))


def _parse_image(payload: bytes):
    """Decode any supported image container to (w, h, (h,w,3) uint8):
    the PNM family (PPM/PGM/PBM, binary and ASCII), PNG (compressed,
    lossless), GIF (compressed, palette-resolved first frame), JPEG —
    baseline and progressive SOF2 (compressed, LOSSY — the full
    DCT/Huffman pipeline in operators/jpeg_codec.py) — plus the
    simple-raster tier in operators/raster_codecs.py: BMP, Sun raster
    (incl. byte-RLE), SGI (incl. scanline-RLE), baseline TIFF (incl.
    PackBits) and XBM. The single dispatch point for the image decode
    farm operators."""
    if _is_webp(payload):
        # LOUD stub, deliberately — the MP3 stance applied to images:
        # webp_dimensions() gives honest header metadata (the sniffer
        # classifies WebP as kind='image' with real dims), but the
        # VP8/VP8L entropy layers' constant tables are not available
        # in-sandbox. NotImplementedError, not ValueError: faking pixels
        # for a KNOWN format would poison perceptual dedup. Pre-filter
        # mixed lakes with decodable_image().
        raise NotImplementedError(
            "WebP entropy decode is deliberately not implemented (no "
            "trusted VP8/VP8L spec tables in-sandbox); use "
            "webp_dimensions for container metadata"
        )
    if payload.startswith(_PNG_SIG):
        return _parse_png(payload)
    if payload[:6] in _GIF_MAGICS:
        w, h, frames = _parse_gif(payload)
        return w, h, frames[0]
    if payload.startswith(_JPEG_MAGIC):
        from victor_spark.operators.jpeg_codec import decode_jpeg

        return decode_jpeg(payload)
    if _is_simple_raster(payload):
        from victor_spark.operators import raster_codecs as rc

        if payload[:2] in (b"P1", b"P2", b"P3", b"P4", b"P5"):
            return rc.parse_pnm(payload)
        if payload[:2] == b"BM":
            return rc.parse_bmp(payload)
        if payload[:4] == b"\x59\xa6\x6a\x95":
            return rc.parse_ras(payload)
        if payload[:2] == b"\x01\xda":
            return rc.parse_sgi(payload)
        if payload[:4] in (b"II*\x00", b"MM\x00*"):
            return rc.parse_tiff(payload)
        if rc.is_ico(payload):
            return rc.parse_ico(payload)
        return rc.parse_xbm(payload)
    w, h, _maxval, arr = _parse_ppm(payload)
    return w, h, arr


def _mulaw_decode(u):
    """G.711 μ-law byte → linear int16, the standard expansion (ITU-T
    G.711 table 2a, as implemented by every telephony stack): complement,
    split sign/exponent/mantissa, reconstruct with the +33 bias."""
    import numpy as np

    u = (~np.asarray(u, dtype=np.uint8)).astype(np.int32) & 0xFF
    t = (((u & 0x0F) << 3) + 0x84) << ((u >> 4) & 0x07)
    return np.where(u & 0x80, 0x84 - t, t - 0x84).astype(np.int16)


def _pcm_to_int32(data: bytes, bits: int, little: bool):
    """Raw PCM bytes → int32 samples at the lake's 16-bit scale: 16-bit
    as-is, SIGNED 8-bit ×256, 24/32-bit truncated to the top 16 bits —
    the shared normalization behind the WAV/AIFF/AU parsers (one
    implementation, or cross-container fingerprints silently diverge).
    WAV's UNSIGNED PCM8 is handled by its own parser before calling
    this."""
    import numpy as np

    if bits == 16:
        return np.frombuffer(
            data[: len(data) // 2 * 2], dtype="<i2" if little else ">i2"
        ).astype(np.int32)
    if bits == 8:
        return np.frombuffer(data, dtype=np.int8).astype(np.int32) * 256
    if bits == 24:
        b3 = np.frombuffer(
            data[: len(data) // 3 * 3], dtype=np.uint8
        ).reshape(-1, 3).astype(np.int32)
        if little:
            v = b3[:, 0] | (b3[:, 1] << 8) | (b3[:, 2] << 16)
        else:
            v = b3[:, 2] | (b3[:, 1] << 8) | (b3[:, 0] << 16)
        v -= (v & 0x800000) << 1  # sign-extend 24 -> 32
        return v >> 8
    if bits == 32:
        return (
            np.frombuffer(
                data[: len(data) // 4 * 4], dtype="<i4" if little else ">i4"
            )
            >> 16
        ).astype(np.int32)
    raise ValueError(f"unsupported PCM bit depth {bits}")


def _downmix_int16(samples, channels: int):
    """Stereo → mono (l+r)//2 floor downmix (the cross-container
    fingerprint normalization), then int16."""
    import numpy as np

    if channels == 2:
        samples = samples[: len(samples) // 2 * 2]
        samples = (samples[0::2] + samples[1::2]) // 2
    return samples.astype(np.int16)


def _is_aiff(payload: bytes) -> bool:
    return (
        len(payload) >= 12
        and payload[:4] == b"FORM"
        and payload[8:12] in (b"AIFF", b"AIFC")
    )


def _is_au(payload: bytes) -> bool:
    return payload[:4] == _AU_MAGIC


def _parse_wav(payload: bytes):
    """Decode a RIFF/WAVE container: walks the chunk list (so extra
    chunks like LIST/fact are tolerated). REAL decode for the common
    encodings — PCM 16-bit, PCM 8-bit (unsigned, rescaled by ×256 after
    centering), PCM 24/32-bit (truncated to the top 16 bits — the
    int16-lake normalization), G.711 μ-law (format 7), and
    WAVE_FORMAT_EXTENSIBLE (0xFFFE) wrappers whose SubFormat GUID names
    one of those PCM codes — each mono or stereo (stereo is downmixed
    (l+r)//2, floor semantics) — all to a mono int16 stream. Returns
    (sample_rate, int16 ndarray)."""
    import struct

    import numpy as np

    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            if len(body) < 16:  # truncated/corrupt chunk: ValueError (not
                # struct.error) so ingest sniffers quarantine, not crash
                raise ValueError(f"WAV fmt chunk short: {len(body)} < 16")
            fmt = list(struct.unpack("<HHIIHH", body[:16]))
            if fmt[0] == 0xFFFE:  # WAVE_FORMAT_EXTENSIBLE: the actual
                # format code is the first 2 bytes of the SubFormat GUID
                # (offset 24 in the chunk: 16 base + cbSize + validBits
                # + channelMask)
                if len(body) < 26:
                    raise ValueError("WAV extensible fmt chunk short")
                (fmt[0],) = struct.unpack("<H", body[24:26])
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # RIFF chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_format, channels, rate, _byte_rate, _block_align, bits = fmt
    if channels not in (1, 2):
        raise ValueError(f"unsupported WAV channel count {channels}")
    if (audio_format, bits) == (1, 8):  # WAV PCM8 is UNSIGNED per
        # the spec (AIFF/AU PCM8 are signed — _pcm_to_int32's path)
        samples = (
            np.frombuffer(data, dtype=np.uint8).astype(np.int32) - 128
        ) * 256
    elif audio_format == 1 and bits in (16, 24, 32):
        samples = _pcm_to_int32(data, bits, little=True)
    elif (audio_format, bits) == (7, 8):
        samples = _mulaw_decode(np.frombuffer(data, dtype=np.uint8)).astype(
            np.int32
        )
    else:
        raise ValueError(
            f"unsupported WAV encoding: fmt={audio_format} bits={bits}"
        )
    return rate, _downmix_int16(samples, channels)


def _alaw_decode(a):
    """G.711 A-law byte → linear int16, the standard expansion (ITU-T
    G.711; the µ-law twin lives in _mulaw_decode): undo the even-bit
    toggle (XOR 0x55), split sign/segment/mantissa, reconstruct with
    the +8 rounding offset (+0x108 and a shift for segments ≥ 1). Sign
    bit SET means positive in A-law."""
    import numpy as np

    a = np.asarray(a, dtype=np.uint8).astype(np.int32) ^ 0x55
    seg = (a >> 4) & 0x07
    t = (a & 0x0F) << 4
    t = np.where(seg > 0, (t + 0x108) << np.maximum(seg - 1, 0), t + 8)
    return np.where(a & 0x80, t, -t).astype(np.int16)


def _float80(b: bytes) -> float:
    """IEEE 754 80-bit extended float (big-endian) — how AIFF's COMM
    chunk stores the sample rate (the format's classic quirk)."""
    exp = ((b[0] & 0x7F) << 8) | b[1]
    mant = int.from_bytes(b[2:10], "big")
    if exp == 0 and mant == 0:
        return 0.0
    e = exp - 16383 - 63
    if e > 64:  # corrupt/NaN-range exponent: would overflow float64;
        # return inf so the caller's rate sanity check raises ValueError
        return float("inf")
    v = mant * 2.0 ** e
    return -v if b[0] & 0x80 else v


def _parse_aiff(payload: bytes):
    """Decode an AIFF / AIFF-C container: IFF chunk walk, COMM (incl.
    the 80-bit extended-float sample rate and the AIFC compression
    id), SSND with its offset field. PCM 8 (SIGNED — unlike WAV's
    unsigned PCM8) / 16 / 24 / 32-bit BIG-endian, plus AIFC G.711
    'ulaw'/'alaw' (both case conventions). Stereo downmixed (l+r)//2
    and 24/32-bit truncated to the top 16 bits — the same int16-lake
    normalization as _parse_wav, so cross-container fingerprints
    match. Returns (sample_rate, int16 ndarray)."""
    import struct

    import numpy as np

    try:
        if (
            len(payload) < 12
            or payload[:4] != b"FORM"
            or payload[8:12] not in (b"AIFF", b"AIFC")
        ):
            raise ValueError("not an AIFF payload")
        is_aifc = payload[8:12] == b"AIFC"
        pos, comm, sound, comp = 12, None, None, b"NONE"
        while pos + 8 <= len(payload):
            cid = payload[pos : pos + 4]
            (size,) = struct.unpack(">I", payload[pos + 4 : pos + 8])
            body = payload[pos + 8 : pos + 8 + size]
            if len(body) != size:
                raise ValueError("AIFF chunk short")
            if cid == b"COMM":
                if len(body) < 18:
                    raise ValueError("AIFF COMM chunk short")
                ch, nframes, bits = struct.unpack(">hIh", body[:8])
                rate = _float80(body[8:18])
                if is_aifc:
                    if len(body) < 22:
                        raise ValueError("AIFC COMM missing compression")
                    comp = body[18:22]
                comm = (ch, nframes, bits, rate)
            elif cid == b"SSND":
                if len(body) < 8:
                    raise ValueError("AIFF SSND chunk short")
                off, _blk = struct.unpack(">II", body[:8])
                sound = body[8 + off :]
            pos += 8 + size + (size & 1)  # IFF chunks are word-aligned
        if comm is None or sound is None:
            raise ValueError("AIFF missing COMM/SSND chunk")
        ch, nframes, bits, rate = comm
        if ch not in (1, 2):
            raise ValueError(f"unsupported AIFF channel count {ch}")
        if not 0 < rate <= 1e7:
            raise ValueError(f"AIFF sample rate implausible: {rate}")
        if comp in (b"ulaw", b"ULAW", b"alaw", b"ALAW"):
            # SSND may carry blockSize-alignment padding: COMM's
            # numSampleFrames bounds the real data (spec rule — extra
            # pad bytes are NOT samples)
            sound = sound[: nframes * ch]
            dec = _mulaw_decode if comp in (b"ulaw", b"ULAW") else _alaw_decode
            samples = dec(np.frombuffer(sound, dtype=np.uint8)).astype(
                np.int32
            )
        elif comp in (b"NONE", b"twos", b"sowt"):
            # 'twos' = AIFC's explicit big-endian PCM id (same as
            # NONE); 'sowt' is the little-endian variant
            if bits not in (8, 16, 24, 32):
                raise ValueError(f"unsupported AIFF bit depth {bits}")
            sound = sound[: nframes * ch * (bits // 8)]
            samples = _pcm_to_int32(sound, bits, little=comp == b"sowt")
        else:
            raise ValueError(f"unsupported AIFC compression {comp!r}")
        return int(round(rate)), _downmix_int16(samples, ch)
    except (struct.error, IndexError) as e:
        raise ValueError(f"corrupt AIFF stream: {e}") from e


_AU_MAGIC = b".snd"


def _parse_au(payload: bytes):
    """Decode a Sun/NeXT AU container: big-endian 24-byte header
    (magic, data offset, data size, encoding, rate, channels);
    encodings 1 (µ-law), 2 (SIGNED PCM8), 3/4/5 (PCM 16/24/32
    big-endian) and 27 (A-law). Same downmix/truncation normalization
    as _parse_wav. Returns (sample_rate, int16 ndarray)."""
    import struct

    import numpy as np

    try:
        if len(payload) < 24 or payload[:4] != _AU_MAGIC:
            raise ValueError("not an AU payload")
        off, size, enc, rate, ch = struct.unpack(">5I", payload[4:24])
        if off < 24 or off > len(payload):
            raise ValueError(f"AU data offset implausible: {off}")
        if ch not in (1, 2):
            raise ValueError(f"unsupported AU channel count {ch}")
        if not 0 < rate <= 10_000_000:
            raise ValueError(f"AU sample rate implausible: {rate}")
        data = payload[off:]
        if size != 0xFFFFFFFF:  # all-ones means "unknown/rest of file"
            if size > len(data):
                raise ValueError("AU data short")
            data = data[:size]
        if enc == 1:
            samples = _mulaw_decode(
                np.frombuffer(data, dtype=np.uint8)
            ).astype(np.int32)
        elif enc == 27:
            samples = _alaw_decode(
                np.frombuffer(data, dtype=np.uint8)
            ).astype(np.int32)
        elif enc in (2, 3, 4, 5):  # SIGNED PCM 8/16/24/32 big-endian
            samples = _pcm_to_int32(data, 8 * (enc - 1), little=False)
        else:
            raise ValueError(f"unsupported AU encoding {enc}")
        return int(rate), _downmix_int16(samples, ch)
    except (struct.error, IndexError) as e:
        raise ValueError(f"corrupt AU stream: {e}") from e


def _encode_aiff(rate: int, samples, channels: int = 1) -> bytes:
    """Encode int16 samples (interleaved if stereo) as PCM16 AIFF —
    big-endian SSND, 80-bit extended-float rate in COMM."""
    import struct

    import numpy as np

    s = np.asarray(samples, dtype=np.int16)
    nframes = len(s) // channels
    # 80-bit float for an integer rate: normalize to 1.m * 2^e
    r = int(rate)
    e = r.bit_length() - 1
    mant = r << (63 - e)
    f80 = struct.pack(">HQ", 16383 + e, mant)
    comm = struct.pack(">hIh", channels, nframes, 16) + f80
    ssnd = struct.pack(">II", 0, 0) + s.astype(">i2").tobytes()
    body = (
        b"AIFF"
        + b"COMM" + struct.pack(">I", len(comm)) + comm
        + b"SSND" + struct.pack(">I", len(ssnd)) + ssnd
    )
    return b"FORM" + struct.pack(">I", len(body)) + body


def _encode_au(rate: int, samples, channels: int = 1,
               encoding: int = 3) -> bytes:
    """Encode samples as Sun AU: encoding 3 (PCM16 big-endian, int16
    input) or 1 (µ-law, raw codepoint bytes input)."""
    import struct

    import numpy as np

    if encoding == 3:
        data = np.asarray(samples, dtype=np.int16).astype(">i2").tobytes()
    elif encoding == 1:
        data = np.asarray(samples, dtype=np.uint8).tobytes()
    else:
        raise ValueError(f"unsupported AU encode {encoding}")
    head = _AU_MAGIC + struct.pack(
        ">5I", 24, len(data), encoding, int(rate), channels
    )
    return head + data


def _parse_audio(payload: bytes):
    """Decode any supported audio container to (sample_rate, int16
    ndarray): RIFF/WAVE (PCM 8/16/24/32, µ-law, extensible), AIFF /
    AIFF-C (big-endian PCM, µ-law/A-law), Sun AU (PCM, µ-law/A-law)
    or FLAC (compressed lossless — rice-coded fixed + LPC predictors,
    operators/flac_codec.py). The single dispatch point for the audio
    decode farm operators."""
    import numpy as np

    if payload[:4] == b"fLaC":
        from victor_spark.operators.flac_codec import decode_flac

        rate, samples = decode_flac(payload)
        return rate, np.asarray(samples, dtype=np.int16)
    from victor_spark.operators.mp3_probe import looks_like_mp3

    if looks_like_mp3(payload):
        # LOUD stub, deliberately: the Layer-III spectral Huffman tables
        # are not available in-sandbox and a from-memory decoder would be
        # self-consistent-but-wrong (mp3_probe module docstring). The
        # sniffer still classifies MP3 honestly (kind='audio' + real
        # sample rate via the frame-header walk); only sample DECODE is
        # refused. NotImplementedError, not ValueError: the tolerant
        # operators' stub fallback catches ValueError, and faking
        # samples for a KNOWN format would poison fingerprint dedup.
        raise NotImplementedError(
            "MP3 Layer-III entropy decode is deliberately not implemented "
            "(no trusted spec tables in-sandbox); use "
            "operators.mp3_probe.mp3_probe for container metadata"
        )
    if _is_aiff(payload):
        return _parse_aiff(payload)
    if _is_au(payload):
        return _parse_au(payload)
    return _parse_wav(payload)


def _is_audio_magic(payload: bytes) -> bool:
    return (
        _is_wave(payload)
        or payload[:4] == b"fLaC"
        or _is_aiff(payload)
        or _is_au(payload)
    )


def decodable_audio(payload_col) -> "Column":
    """JVM-side predicate: the payload is a container the STRICT audio
    farms (decode_audio_stats, audio_fingerprint) can fully decode —
    RIFF/WAVE, FLAC, AIFF/AIFF-C or Sun AU. The sniffer classifies MP3
    as kind='audio' too (honest metadata via the frame-header probe),
    but its sample decode is a deliberate loud stub, so mixed lakes
    pre-filter with this before the strict farms:

        audio = media.filter((F.col("kind") == "audio")
                             & decodable_audio("payload"))

    Pure substring comparisons — stays in whole-stage codegen, prunes
    before any Arrow hop."""
    from pyspark.sql import functions as F

    c = F.col(payload_col) if isinstance(payload_col, str) else payload_col
    p4 = F.substring(c, 1, 4)
    at8 = F.substring(c, 9, 4)
    return (
        ((p4 == F.lit(b"RIFF")) & (at8 == F.lit(b"WAVE")))
        | (p4 == F.lit(b"fLaC"))
        | (
            (p4 == F.lit(b"FORM"))
            & ((at8 == F.lit(b"AIFF")) | (at8 == F.lit(b"AIFC")))
        )
        | (p4 == F.lit(b".snd"))
    )


def _is_wave(payload: bytes) -> bool:
    """True only for a genuine RIFF/WAVE container (both magics). RIFF
    alone also wraps AVI/WebP — dispatching the WAV decoder on the bare
    prefix would crash the decode farm on any such payload."""
    return (
        len(payload) >= 12
        and payload[:4] == b"RIFF"
        and payload[8:12] == b"WAVE"
    )


def _encode_wav(
    samples,
    sample_rate: int = 16000,
    channels: int = 1,
    bits: int = 16,
    audio_format: int = 1,
) -> bytes:
    """Encode samples as a canonical RIFF/WAVE. Default (and the only
    shape victor_spark itself writes): PCM16 mono from int16 samples.
    The other parser-supported encodings can also be built — stereo
    (``samples`` interleaved l,r), 8-bit PCM (unsigned 0-255 values) and
    μ-law (``audio_format=7``, raw companded bytes) — so tests and
    synthesis can produce real containers for every decode path."""
    import struct

    import numpy as np

    if bits == 16:
        data = np.asarray(samples, dtype="<i2").tobytes()
    elif bits == 8:
        data = np.asarray(samples, dtype=np.uint8).tobytes()
    else:
        raise ValueError(f"unsupported bits {bits}")
    block_align = channels * (bits // 8)
    return (
        struct.pack(
            "<4sI4s4sIHHIIHH4sI",
            b"RIFF", 36 + len(data), b"WAVE",
            b"fmt ", 16, audio_format, channels, sample_rate,
            sample_rate * block_align, block_align, bits,
            b"data", len(data),
        )
        + data
    )


def _encode_avi_mjpeg(
    jpeg_frames: list, width: int, height: int, fps: int = 10
) -> bytes:
    """Mux baseline-JPEG frames into a REAL RIFF/AVI MJPEG container
    (the classic compressed-video interchange everything from cameras
    to OpenCV writes): hdrl (avih + one 'vids'/'MJPG' stream with
    strh/strf BITMAPINFOHEADER), a movi list of word-aligned '00dc'
    chunks, and an idx1 keyframe index — every MJPEG frame is a
    keyframe, which is exactly why the format splits cleanly in a
    distributed decode farm. Composes the two REAL codecs this repo
    already has: the RIFF chunk discipline of the WAV writer and the
    JPEG encoder's streams."""
    import struct

    def chunk(fourcc: bytes, data: bytes) -> bytes:
        pad = b"\x00" if len(data) & 1 else b""
        return fourcc + struct.pack("<I", len(data)) + data + pad

    n = len(jpeg_frames)
    avih = struct.pack(
        "<14I",
        1_000_000 // max(fps, 1), 0, 0, 0x10, n, 0, 1, 0,
        width, height, 0, 0, 0, 0,
    )
    strh = (
        b"vidsMJPG"
        + struct.pack("<IHH8I", 0, 0, 0, 0, 1, fps, 0, n, 0, 10_000, 0)
        + struct.pack("<4H", 0, 0, width, height)
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40, width, height, 1, 24, b"MJPG", width * height * 3, 0, 0, 0, 0,
    )
    hdrl = chunk(
        b"LIST",
        b"hdrl"
        + chunk(b"avih", avih)
        + chunk(b"LIST", b"strl" + chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi_body = b"movi"
    offsets = []
    for f in jpeg_frames:
        offsets.append((len(movi_body), len(f)))
        movi_body += chunk(b"00dc", bytes(f))
    movi = chunk(b"LIST", movi_body)
    idx1 = chunk(
        b"idx1",
        b"".join(
            b"00dc" + struct.pack("<III", 0x10, off, sz)
            for off, sz in offsets
        ),
    )
    return chunk(b"RIFF", b"AVI " + hdrl + movi + idx1)


def _parse_avi_mjpeg(payload: bytes):
    """Demux a RIFF/AVI MJPEG container: returns (width, height,
    [jpeg bytes per frame]) from the avih header and the movi list's
    '..dc'/'..db' chunks. Every frame must be a baseline JPEG stream
    (SOI-checked here; the DCT decode happens per frame downstream) —
    anything else, and any truncated/misaligned chunk, raises
    ValueError for the quarantine path."""
    import struct

    if (
        len(payload) < 12
        or payload[:4] != b"RIFF"
        or payload[8:12] != b"AVI "
    ):
        raise ValueError("not a RIFF/AVI payload")
    dims: list = [None, None]
    frames: list[bytes] = []

    def walk(pos: int, end: int) -> None:
        while pos + 8 <= end:
            cid = payload[pos : pos + 4]
            (size,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
            body_start = pos + 8
            body_end = body_start + size
            if body_end > end:
                raise ValueError("truncated AVI chunk")
            if cid == b"LIST":
                if size < 4:
                    raise ValueError("truncated AVI LIST")
                walk(body_start + 4, body_end)
            elif cid == b"avih":
                if size < 40:
                    raise ValueError("short AVI avih header")
                vals = struct.unpack(
                    "<10I", payload[body_start : body_start + 40]
                )
                dims[0], dims[1] = vals[8], vals[9]
                if dims[0] * dims[1] > 100_000_000:  # same 100 MP cap
                    # as the JPEG decoder: corrupt headers must not
                    # drive huge allocations downstream
                    raise ValueError(
                        f"AVI dimensions implausible: {dims[0]}x{dims[1]}"
                    )
            elif cid[2:4] in (b"dc", b"db"):
                body = payload[body_start:body_end]
                if body[:2] != b"\xff\xd8":
                    raise ValueError(
                        "non-JPEG AVI frame chunk (MJPEG only)"
                    )
                frames.append(body)
                if len(frames) > 1_000_000:
                    raise ValueError("AVI frame count implausible")
            pos = body_end + (size & 1)  # RIFF word alignment

    walk(12, len(payload))
    if dims[0] is None:
        raise ValueError("AVI missing avih header")
    return dims[0], dims[1], frames


def _avi_dimensions(payload: bytes):
    """(width, height, n_frames) from the avih header alone — the cheap
    ingest probe (no JPEG entropy decode per asset), reading
    total_frames from the header the way jpeg_dimensions reads SOF."""
    import struct

    if (
        len(payload) < 12
        or payload[:4] != b"RIFF"
        or payload[8:12] != b"AVI "
    ):
        raise ValueError("not a RIFF/AVI payload")
    pos = 12
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        if cid == b"LIST":
            pos += 12  # descend into the list (hdrl leads)
            continue
        if cid == b"avih":
            if size < 40:
                raise ValueError("short AVI avih header")
            vals = struct.unpack("<10I", payload[pos + 8 : pos + 48])
            return vals[8], vals[9], vals[4]
        pos += 8 + size + (size & 1)
    raise ValueError("AVI missing avih header")


_Y4M_CHROMA_FACTOR = {
    # chroma subsampling -> chroma bytes per luma pixel (frame size =
    # w*h * (1 + factor)); keys cover the C tags y4m defines
    "420": 0.5, "420jpeg": 0.5, "420paldv": 0.5, "420mpeg2": 0.5,
    "422": 1.0, "444": 2.0, "mono": 0.0,
}


def _parse_y4m(payload: bytes):
    """Demux a YUV4MPEG2 (y4m) stream — the standard UNCOMPRESSED video
    container (ffmpeg's -f yuv4mpegpipe): one ASCII header line
    ('YUV4MPEG2 W<w> H<h> F<n>:<d> ... C<chroma>'), then per frame a
    'FRAME[ params]\\n' marker followed by the raw planar YUV bytes.
    Returns (width, height, chroma, [frame_bytes, ...])."""
    if not payload.startswith(b"YUV4MPEG2"):
        raise ValueError("not a YUV4MPEG2 payload")
    nl = payload.find(b"\n")
    if nl < 0:
        raise ValueError("truncated y4m header")
    width = height = None
    chroma = "420"  # the spec's default when no C tag is present
    for tok in payload[9:nl].decode("ascii").split():
        if tok.startswith("W"):
            width = int(tok[1:])
        elif tok.startswith("H"):
            height = int(tok[1:])
        elif tok.startswith("C"):
            chroma = tok[1:]
    if not width or not height:
        raise ValueError("y4m header missing W/H")
    factor = _Y4M_CHROMA_FACTOR.get(chroma)
    if factor is None:
        raise ValueError(f"unsupported y4m chroma {chroma!r}")
    frame_size = int(width * height * (1 + factor))
    frames, pos = [], nl + 1
    while pos < len(payload):
        fnl = payload.find(b"\n", pos)
        if fnl < 0 or not payload[pos:fnl].startswith(b"FRAME"):
            raise ValueError("corrupt y4m FRAME marker")
        start = fnl + 1
        frame = payload[start : start + frame_size]
        if len(frame) != frame_size:
            raise ValueError(
                f"y4m frame short: {len(frame)} != {frame_size}"
            )
        frames.append(frame)
        pos = start + frame_size
    return width, height, chroma, frames


def _encode_y4m(
    frames, width: int, height: int, chroma: str = "420", fps: str = "30:1"
) -> bytes:
    """Mux raw planar frames into a YUV4MPEG2 stream (header + FRAME
    markers). Frame byte lengths must match the geometry/chroma."""
    frame_size = int(width * height * (1 + _Y4M_CHROMA_FACTOR[chroma]))
    out = [f"YUV4MPEG2 W{width} H{height} F{fps} Ip A1:1 C{chroma}\n".encode()]
    for f in frames:
        if len(f) != frame_size:
            raise ValueError(f"frame size {len(f)} != {frame_size}")
        out.append(b"FRAME\n")
        out.append(bytes(f))
    return b"".join(out)


def _decode_image(payload: bytes) -> list[float]:
    """Image features. REAL paths: a P6 PPM (uncompressed), PNG
    (compressed — stdlib-zlib codec), GIF (compressed — LZW codec,
    first frame) or JPEG incl. progressive (compressed LOSSY —
    DCT/Huffman) payload is actually decoded and the features are pixel statistics
    [w, h, mean_r, mean_g, mean_b, min_px, max_px, std_gray]. STUB path
    for other compressed formats (real impl: PIL.Image.open) —
    deterministic fake: 8 byte-histogram buckets of the payload; a
    corrupt/unsupported container with a known magic also falls back to
    the stub rather than failing the extract job."""
    if (payload.startswith(b"P6") or payload.startswith(_PNG_SIG)
            or payload[:6] in _GIF_MAGICS
            or payload.startswith(_JPEG_MAGIC)
            or _is_simple_raster(payload)):
        import numpy as np

        try:
            w, h, arr = _parse_image(payload)
        except ValueError:
            pass  # corrupt or unsupported variant: stub path below
        else:
            a = arr.astype(np.float64)
            return [
                float(w), float(h),
                float(a[..., 0].mean()), float(a[..., 1].mean()),
                float(a[..., 2].mean()),
                float(a.min()), float(a.max()),
                float(a.mean(axis=2).std()),
            ]
    hist = [0] * 8
    for b in payload:
        hist[b >> 5] += 1
    n = max(len(payload), 1)
    return [h / n for h in hist]


def _decode_audio(payload: bytes) -> list[float]:
    """Audio features. REAL paths: a RIFF/WAVE or FLAC (compressed
    lossless) payload is actually decoded into [sample_rate, n_samples,
    mean_amp, rms_amp]. STUB path for other compressed formats (real
    impl: soundfile/torchaudio) — deterministic fake: mean/max/min byte
    value + length. WAV dispatch requires BOTH RIFF magics (bare 'RIFF'
    also wraps AVI/WebP), and an unsupported/corrupt encoding falls back
    to the stub rather than failing the whole extract job."""
    if _is_audio_magic(payload):
        import numpy as np

        try:
            rate, samples = _parse_audio(payload)
        except ValueError:
            pass  # unsupported encoding or corrupt: stub path below
        else:
            a = samples.astype(np.float64)
            n = max(len(a), 1)
            return [
                float(rate), float(len(a)),
                float(a.sum() / n),
                float(np.sqrt((a * a).sum() / n)),
            ]
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


def _decode_binary(payload: bytes) -> list[float]:
    """Features for QUARANTINED assets (kind='binary' — what
    load_media_dir assigns to unknown magics and corrupt containers):
    the 8-bucket byte histogram, deterministic over arbitrary bytes, so
    a quarantined asset flows through the feature farm instead of
    failing the job (the 'kept, not dropped' contract end-to-end)."""
    hist = [0] * 8
    for b in payload:
        hist[b >> 5] += 1
    n = max(len(payload), 1)
    return [h / n for h in hist]


_DECODERS = {
    "image": _decode_image,
    "audio": _decode_audio,
    "video": _decode_video_frames,
    "binary": _decode_binary,
}


def _resize_image(payload: bytes, width: int, height: int) -> bytes:
    """Image resize. REAL paths: a P6 PPM, PNG, GIF or JPEG (incl.
    progressive) payload is decoded, resized by nearest-neighbor (pure numpy index
    selection — the same sampling PIL's Image.NEAREST does), and
    re-encoded in its OWN container (PNG in → PNG out through the full
    deflate/filter pipeline; GIF in → GIF out by resampling the INDEX
    plane per frame and re-encoding with the original palette, which
    commutes with palette lookup so it is exactly the pixel-space NN
    resize — and keeps an animation an animation; JPEG in → JPEG out
    at quality 90, lossy like every real JPEG pipeline). A corrupt container with a known
    magic falls back to the stub rather than failing the job (same
    contract as _decode_image/_decode_audio). STUB path for other
    compressed formats (real impl: PIL decode → resize → re-encode) —
    deterministic fake: budget one byte per 8x8 pixel block and
    truncate / zero-pad the encoded payload to that size, so the output
    length is a pure function of (width, height) and the head bytes are
    a stable prefix of the input (both properties the oracle checks)."""
    import struct

    import numpy as np

    def nn(h0: int, w0: int):
        return ((np.arange(height) * h0) // height,
                (np.arange(width) * w0) // width)

    try:
        if payload.startswith(b"P6"):
            w0, h0, _maxval, arr = _parse_ppm(payload)
            ys, xs = nn(h0, w0)
            return _encode_ppm(arr[ys][:, xs])
        if payload.startswith(_PNG_SIG):
            w0, h0, arr = _parse_png(payload)
            ys, xs = nn(h0, w0)
            return _encode_png(arr[ys][:, xs])
        if payload.startswith(_JPEG_MAGIC):
            from victor_spark.operators.jpeg_codec import (
                decode_jpeg,
                encode_jpeg,
            )

            w0, h0, arr = decode_jpeg(payload)
            ys, xs = nn(h0, w0)
            return encode_jpeg(arr[ys][:, xs], quality=90)
        if payload[:6] in _GIF_MAGICS:
            w0, h0, frames = _parse_gif_indexed(payload)
            ys, xs = nn(h0, w0)
            # all frames must share one palette for a single-table
            # re-encode (what _encode_gif writes); mixed local tables
            # take the ValueError fallback below
            table = frames[0][1]
            if any(t is not table and not np.array_equal(t, table)
                   for _idx, t in frames):
                raise ValueError("GIF with per-frame palettes")
            pal = np.zeros((256, 3), dtype=np.uint8)
            pal[: len(table)] = table
            return _encode_gif(
                [idx[ys][:, xs] for idx, _t in frames], width, height,
                palette=pal,
            )
    except (ValueError, struct.error):
        # corrupt/unsupported variant, or a re-encode whose geometry
        # exceeds the container's 16-bit header fields (e.g. resize to
        # 70000px JPEG/GIF): degrade to the stub, never fail the job
        pass
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

    REAL paths: a YUV4MPEG2 payload is demuxed (_parse_y4m — header
    geometry + chroma, FRAME markers) and every ``stride``-th decoded
    frame's raw planar bytes become a row; an animated GIF — a REAL
    COMPRESSED animation container — is LZW-decoded and the sampled
    frames' palette-resolved RGB raster bytes become rows; an
    MJPEG-in-AVI container is demuxed (_parse_avi_mjpeg) and only the
    sampled frames pay the JPEG DCT decode, emitting RGB raster bytes.
    STUB path for
    other compressed containers (real impl: ffmpeg): the payload is treated as
    consecutive ``frame_bytes``-byte frames (frame_idx 0, stride,
    2·stride, …; the tail frame may be short — no padding, mirroring a
    real stream). Non-video rows produce no output rows.

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
                if b.startswith(b"YUV4MPEG2"):
                    _w, _h, _c, decoded = _parse_y4m(b)
                    n = len(decoded)
                    for i in range(0, n, stride):
                        ids.append(mid)
                        idxs.append(i)
                        ns.append(n)
                        frames.append(decoded[i])
                    continue
                if b[:6] in _GIF_MAGICS:
                    # animated GIF: a REAL COMPRESSED animation container
                    # — LZW-decode every image and emit the sampled
                    # frames' palette-resolved RGB raster bytes
                    _w, _h, decoded = _parse_gif(b)
                    n = len(decoded)
                    for i in range(0, n, stride):
                        ids.append(mid)
                        idxs.append(i)
                        ns.append(n)
                        frames.append(decoded[i].tobytes())
                    continue
                if len(b) >= 12 and b[:4] == b"RIFF" and b[8:12] == b"AVI ":
                    # MJPEG-in-AVI: demux the movi chunks, DCT-decode
                    # only the SAMPLED frames (stride pruning before
                    # the expensive step), emit RGB raster bytes
                    from victor_spark.operators.jpeg_codec import (
                        decode_jpeg,
                    )

                    _w, _h, jpegs = _parse_avi_mjpeg(b)
                    n = len(jpegs)
                    for i in range(0, n, stride):
                        _w2, _h2, arr = decode_jpeg(jpegs[i])
                        ids.append(mid)
                        idxs.append(i)
                        ns.append(n)
                        frames.append(arr.tobytes())
                    continue
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


FRAME_STATS_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_idx", LongType()),
        StructField("n_frames", LongType()),
        StructField("n_bytes", LongType()),
        StructField("mean_r", DoubleType()),
        StructField("mean_g", DoubleType()),
        StructField("mean_b", DoubleType()),
    ]
)


def frame_stats(frames: DataFrame) -> DataFrame:
    """Per-frame channel statistics over sample_frames output whose
    ``frame`` column is packed (h, w, 3) RGB raster bytes (the GIF and
    MJPEG-AVI paths): mean per channel, numpy-vectorized per frame —
    the per-frame twin of decode_image_stats, and the check stage of a
    frame-level quality filter. Partition-local (no shuffle added)."""
    import numpy as np

    def _stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in (
                "media_id", "frame_idx", "n_frames", "n_bytes",
                "mean_r", "mean_g", "mean_b",
            )}
            for mid, idx, n, frame in zip(
                pdf["media_id"], pdf["frame_idx"], pdf["n_frames"],
                pdf["frame"],
            ):
                b = bytes(frame)
                px = np.frombuffer(
                    b[: len(b) // 3 * 3], dtype=np.uint8
                ).reshape(-1, 3)
                out["media_id"].append(mid)
                out["frame_idx"].append(idx)
                out["n_frames"].append(n)
                out["n_bytes"].append(len(b))
                for c, ch in enumerate(("mean_r", "mean_g", "mean_b")):
                    out[ch].append(
                        float(px[:, c].mean()) if len(px) else None
                    )
            yield pd.DataFrame(out)

    return frames.mapInPandas(_stats, schema=FRAME_STATS_SCHEMA)


def synthesize_avi_mjpeg(
    df: DataFrame,
    id_col: str,
    text_col: str,
    width: int = 16,
    height: int = 16,
    n_frames: int = 4,
    quality: int = 90,
) -> DataFrame:
    """A real MJPEG-in-AVI media table from a text table: frame f's
    channel c is the synthesize_jpeg gradient with a per-frame base —
    ord(text[(c + f) mod len]) + 2y — each frame DCT/Huffman-encoded
    and muxed into a genuine RIFF/AVI container. Smooth content keeps
    every frame's lossy roundtrip inside the JPEG tolerance, and the
    per-frame SOURCE means are exact integers an oracle can compute
    (ord(text[(c+f) mod len]) + height - 1 for even heights).
    Arrow-batched (entropy coding + container muxing are byte-level)."""
    import numpy as np

    from victor_spark.operators.jpeg_codec import encode_jpeg

    src = df.select(F.col(id_col).alias("media_id"), F.col(text_col).alias("text"))

    def _synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for text in pdf["text"]:
                t = text or "000"
                jpegs = []
                for f in range(n_frames):
                    base = np.array(
                        [ord(t[(c + f) % len(t)]) for c in range(3)],
                        dtype=np.float64,
                    )
                    y = 2.0 * np.arange(height)[:, None, None]
                    arr = np.clip(
                        base[None, None, :] + y, 0, 255
                    ).astype(np.uint8)
                    arr = np.broadcast_to(arr, (height, width, 3))
                    jpegs.append(
                        encode_jpeg(np.ascontiguousarray(arr), quality)
                    )
                payloads.append(
                    _encode_avi_mjpeg(jpegs, width, height)
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": "video",
                    "payload": payloads,
                    "meta_width": width,
                    "meta_height": height,
                    "meta_sample_rate": None,
                }
            )

    return src.mapInPandas(_synth, schema=MEDIA_SCHEMA)


def synthesize_y4m(
    df: DataFrame,
    id_col: str,
    text_col: str,
    width: int = 4,
    height: int = 4,
    n_frames: int = 6,
) -> DataFrame:
    """A real YUV4MPEG2 media table from a text table: C420 planar frames
    whose bytes are the text cycled with a per-frame offset (frame f byte
    i = text[(f*frame_size + i) mod len]) — a VALID stream any y4m reader
    (ffmpeg, mplayer) demuxes, and frame bytes an integer-only oracle can
    replay. Arrow-batched (the container needs byte-level muxing)."""
    frame_size = int(width * height * 1.5)  # C420: Y + quarter-res U,V

    src = df.select(F.col(id_col).alias("media_id"), F.col(text_col).alias("text"))

    def _synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for text in pdf["text"]:
                t = text or " "
                frames = [
                    bytes(
                        ord(t[(f * frame_size + i) % len(t)])
                        for i in range(frame_size)
                    )
                    for f in range(n_frames)
                ]
                payloads.append(_encode_y4m(frames, width, height, "420"))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": "video",
                    "payload": payloads,
                    "meta_width": width,
                    "meta_height": height,
                    "meta_sample_rate": None,
                }
            )

    return src.mapInPandas(_synth, schema=MEDIA_SCHEMA)


# ---------------------------------------------------------------------------
# REAL-format synthesis + decode operators. synthesize_ppm builds genuine
# P6 images with pure SQL expressions (all-ASCII source text → the raster
# bytes ARE the cycled text bytes, which is what makes the decode
# DuckDB-oracle-replayable end-to-end); synthesize_wav builds genuine
# RIFF/WAVE PCM16 files (binary header → Arrow-batched Python, but the
# sample values are a pure function of the text so the decode oracle
# replays them too).
# ---------------------------------------------------------------------------


def synthesize_ppm(
    df: DataFrame, id_col: str, text_col: str, width: int = 8, height: int = 8
) -> DataFrame:
    """A real binary-PPM media table from a text table: payload =
    'P6\\n{w} {h}\\n255\\n' + the first w*h*3 bytes of the text cycled —
    a VALID image any Netpbm reader decodes. Pure SQL (the text is
    ASCII, so chars == bytes); no Python in the synthesis path."""
    n = width * height * 3
    raster = F.expr(
        f"substring(repeat({text_col}, CAST(ceil({n}.0 / length({text_col})) "
        f"AS INT)), 1, {n})"
    )
    header = f"P6\n{width} {height}\n255\n"
    return df.select(
        F.col(id_col).alias("media_id"),
        F.lit("image").alias("kind"),
        F.encode(F.concat(F.lit(header), raster), "utf-8").alias("payload"),
        F.lit(width).cast("int").alias("meta_width"),
        F.lit(height).cast("int").alias("meta_height"),
        F.lit(None).cast("int").alias("meta_sample_rate"),
    )


def synthesize_png(
    df: DataFrame,
    id_col: str,
    text_col: str,
    width: int = 8,
    height: int = 8,
    filter_type: int | str = "cycle",
) -> DataFrame:
    """A real PNG media table from a text table: the pixel bytes are the
    text cycled to w*h*3 (the same derivation as synthesize_ppm, so the
    same integer-only oracle replays the DECODED pixels), deflate-
    compressed and filtered into a genuine PNG container any reader
    opens. The default 'cycle' filter uses scanline filter (y mod 5), so
    one 8-row image exercises every unfilter path (None/Sub/Up/Average/
    Paeth) of the decoder — an oracle match is therefore end-to-end
    proof of the real compressed-format pipeline, not just of zlib.
    Arrow-batched (the container needs byte-level packing)."""
    n = width * height * 3

    src = df.select(F.col(id_col).alias("media_id"), F.col(text_col).alias("text"))

    def _synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            payloads = []
            for text in pdf["text"]:
                t = (text or " ").encode("utf-8")
                raster = (t * (n // len(t) + 1))[:n]
                arr = np.frombuffer(raster, dtype=np.uint8).reshape(
                    height, width, 3
                )
                payloads.append(_encode_png(arr, filter_type=filter_type))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": "image",
                    "payload": payloads,
                    "meta_width": width,
                    "meta_height": height,
                    "meta_sample_rate": None,
                }
            )

    return src.mapInPandas(_synth, schema=MEDIA_SCHEMA)


def synthesize_gif(
    df: DataFrame,
    id_col: str,
    text_col: str,
    width: int = 8,
    height: int = 8,
    n_frames: int = 1,
) -> DataFrame:
    """A real GIF media table from a text table: palette index at global
    position k (= frame*w*h + offset) is (ord(text[k mod len]) + 91*k)
    mod 256, LZW-compressed into a genuine GIF89a with the default
    SQL-replayable palette (i, 2i mod 256, 7i mod 256). ``n_frames`` > 1
    produces the classic compressed ANIMATION container (kind='video')
    for the frame-sampling path; 1 produces a still (kind='image') for
    the decode farm. Arrow-batched (LZW needs byte-level packing)."""
    import numpy as np

    size = width * height
    kind = "video" if n_frames > 1 else "image"

    src = df.select(F.col(id_col).alias("media_id"), F.col(text_col).alias("text"))

    def _synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for text in pdf["text"]:
                t = text or " "
                frames = []
                for f in range(n_frames):
                    idx = [
                        (ord(t[(f * size + j) % len(t)]) + 91 * (f * size + j))
                        % 256
                        for j in range(size)
                    ]
                    frames.append(
                        np.array(idx, dtype=np.uint8).reshape(height, width)
                    )
                payloads.append(_encode_gif(frames, width, height))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": kind,
                    "payload": payloads,
                    "meta_width": width,
                    "meta_height": height,
                    "meta_sample_rate": None,
                }
            )

    return src.mapInPandas(_synth, schema=MEDIA_SCHEMA)


def synthesize_flac(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_samples: int = 64,
    sample_rate: int = 16000,
    stereo_mode: str | None = None,
    lpc_order: int | None = None,
) -> DataFrame:
    """A real FLAC media table from a text table: the SAME sample
    derivation as synthesize_wav's PCM16 path (sample j =
    (ord(text[j mod len]) - 80) * 128, wrapped into int16 exactly the
    way synthesize_wav's '<i2' pack wraps — so codepoints > 335 in raw
    text survive instead of failing the job), rice-coded COMPRESSED
    into a genuine FLAC stream — lossless, so the decode oracle replays
    the samples bit-exactly, exactly like the WAV twin. With
    ``stereo_mode`` set, each mono sample s becomes a STEREO pair
    (s + d, s - d) with a deterministic per-index detune d — the
    (l+r)//2 downmix is s EXACTLY, so the decoded stream equals the
    mono rendition while exercising the full stereo (side-channel)
    decode path; ``lpc_order`` forces Levinson-Durbin LPC subframes
    (what real flac encoders emit). Arrow-batched (bit-level entropy
    packing)."""
    from victor_spark.operators.flac_codec import encode_flac

    src = df.select(F.col(id_col).alias("media_id"), F.col(text_col).alias("text"))

    def _synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for text in pdf["text"]:
                t = text or " "
                samples = [
                    ((ord(t[j % len(t)]) - 80) * 128 + 32768) % 65536 - 32768
                    for j in range(n_samples)
                ]
                if stereo_mode is not None:
                    inter: list[int] = []
                    for j, s in enumerate(samples):
                        d = (j % 7 - 3) * 100
                        if not -32768 <= s - abs(d) <= s + abs(d) <= 32767:
                            d = 0  # wrapped-codepoint extremes: no detune
                        inter += [s + d, s - d]
                    payloads.append(
                        encode_flac(
                            inter, sample_rate, channels=2,
                            stereo_mode=stereo_mode, lpc_order=lpc_order,
                        )
                    )
                    continue
                payloads.append(
                    encode_flac(samples, sample_rate, lpc_order=lpc_order)
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": "audio",
                    "payload": payloads,
                    "meta_width": None,
                    "meta_height": None,
                    "meta_sample_rate": sample_rate,
                }
            )

    return src.mapInPandas(_synth, schema=MEDIA_SCHEMA)


def synthesize_jpeg(
    df: DataFrame,
    id_col: str,
    text_col: str,
    width: int = 16,
    height: int = 16,
    quality: int = 90,
    progressive: bool = False,
    optimize_huffman: bool = False,
) -> DataFrame:
    """A real JPEG media table from a text table: channel c of
    every pixel row y is ord(text[c]) + 2y (a smooth vertical gradient —
    md5-hex ords are 48..102, so 2y stays unclipped for heights ≤ 76),
    pushed through the full DCT/Huffman encoder. Smooth content keeps
    the lossy roundtrip inside a small, testable tolerance: the SOURCE
    channel means are exact integers an oracle can compute
    (ord(text[c]) + height - 1 for even heights), and the decoded means
    must land within the DC-quantization + color-transform bound the
    multimodal_jpeg_roundtrip query asserts. ``progressive=True`` emits
    SOF2 multi-scan streams instead — same quantized coefficients, so
    the same oracle bound holds (multimodal_jpeg_progressive);
    ``optimize_huffman=True`` adds the 2-pass frequency-optimal
    entropy tables (smaller payloads, decode unchanged).
    Arrow-batched (entropy coding needs byte-level packing)."""
    import numpy as np

    from victor_spark.operators.jpeg_codec import encode_jpeg

    src = df.select(F.col(id_col).alias("media_id"), F.col(text_col).alias("text"))

    def _synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for text in pdf["text"]:
                t = text or "000"
                base = np.array(
                    [ord(t[c % len(t)]) for c in range(3)], dtype=np.float64
                )
                y = 2.0 * np.arange(height)[:, None, None]
                arr = np.clip(base[None, None, :] + y, 0, 255).astype(np.uint8)
                arr = np.broadcast_to(arr, (height, width, 3))
                payloads.append(
                    encode_jpeg(
                        np.ascontiguousarray(arr), quality,
                        progressive=progressive,
                        optimize_huffman=optimize_huffman,
                    )
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": "image",
                    "payload": payloads,
                    "meta_width": width,
                    "meta_height": height,
                    "meta_sample_rate": None,
                }
            )

    return src.mapInPandas(_synth, schema=MEDIA_SCHEMA)


def synthesize_wav(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_samples: int = 64,
    sample_rate: int = 16000,
    channels: int = 1,
    bits: int = 16,
    audio_format: int = 1,
) -> DataFrame:
    """A real RIFF/WAVE media table from a text table. Default (PCM16
    mono): sample j = (ord(text[j mod len]) - 80) * 128 (int16, covers
    negative and positive amplitudes). For the 8-bit encodings (PCM8, or
    μ-law with ``audio_format=7``): byte j = (ord(text[j mod len]) +
    91*j) mod 256, which sweeps both sign branches of the μ-law
    expansion. ``n_samples`` counts stored values, so a stereo container
    holds n_samples/2 frames. Packed via _encode_wav into a canonical
    container; Arrow-batched (the binary header needs struct packing),
    deterministic, and decode-oracle-replayable because the stored
    values are a pure function of the text."""

    src = df.select(F.col(id_col).alias("media_id"), F.col(text_col).alias("text"))

    def _synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for text in pdf["text"]:
                t = text or " "
                if bits == 8:
                    samples = [
                        (ord(t[j % len(t)]) + 91 * j) % 256
                        for j in range(n_samples)
                    ]
                else:
                    samples = [
                        (ord(t[j % len(t)]) - 80) * 128
                        for j in range(n_samples)
                    ]
                payloads.append(
                    _encode_wav(
                        samples, sample_rate, channels=channels, bits=bits,
                        audio_format=audio_format,
                    )
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": "audio",
                    "payload": payloads,
                    "meta_width": None,
                    "meta_height": None,
                    "meta_sample_rate": sample_rate,
                }
            )

    return src.mapInPandas(_synth, schema=MEDIA_SCHEMA)


IMAGE_STATS_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("mean_r", DoubleType()),
        StructField("mean_g", DoubleType()),
        StructField("mean_b", DoubleType()),
        StructField("min_px", LongType()),
        StructField("max_px", LongType()),
    ]
)

AUDIO_STATS_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("sample_rate", LongType()),
        StructField("n_samples", LongType()),
        StructField("mean_amp", DoubleType()),
        StructField("rms_amp", DoubleType()),
        StructField("min_amp", LongType()),
        StructField("max_amp", LongType()),
    ]
)


def decode_image_stats(media: DataFrame) -> DataFrame:
    """REAL image decode → per-image pixel statistics: every payload is
    parsed by its container's codec (binary PPM, or PNG through the full
    inflate+unfilter pipeline) and the statistics are computed from the
    decoded pixel array, not the container bytes. Arrow-batched
    mapInPandas, partition-local (no shuffle) — the per-image decode
    farm shape for a 100 TB media column."""

    def _stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = {k: [] for k in (
                "media_id", "width", "height", "mean_r", "mean_g", "mean_b",
                "min_px", "max_px",
            )}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                w, h, arr = _parse_image(bytes(payload))
                a = arr.astype(np.float64)
                rows["media_id"].append(mid)
                rows["width"].append(w)
                rows["height"].append(h)
                rows["mean_r"].append(float(a[..., 0].mean()))
                rows["mean_g"].append(float(a[..., 1].mean()))
                rows["mean_b"].append(float(a[..., 2].mean()))
                rows["min_px"].append(int(arr.min()))
                rows["max_px"].append(int(arr.max()))
            yield pd.DataFrame(rows)

    return media.mapInPandas(_stats, schema=IMAGE_STATS_SCHEMA)


DHASH_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("dhash", StringType()),
    ]
)


def image_dhash(media: DataFrame) -> DataFrame:
    """Perceptual difference-hash over DECODED image pixels — the
    image-dedup primitive (near-duplicate images hash equal; in
    particular the hash is invariant under resize, which is the point
    of perceptual hashing vs byte hashing).

    Per image: decode (PPM or PNG codec), grayscale as the INTEGER channel sum
    (r+g+b — no division, so every comparison is exact and the hash is
    bit-replayable by an integer-only oracle), nearest-neighbor resample
    to a 9-wide × 8-tall grid, then one bit per horizontal neighbor
    pair: bit = gray[i, j] < gray[i, j+1]. Returns (media_id, dhash) with
    the hash as a 64-char '0'/'1' string (no 64-bit sign pitfalls, and
    Hamming distance is a cheap zip-compare downstream).

    Arrow-batched mapInPandas, partition-local; dedup is then an exact
    groupBy on the hash — banding/bucketing semantics identical to the
    text-dedup family, so the 100 TB story is the same hash-shuffle."""

    def _hash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, hashes = [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                _w, _h, arr = _parse_image(bytes(payload))
                ids.append(mid)
                hashes.append(_dhash_bits(arr))
            yield pd.DataFrame({"media_id": ids, "dhash": hashes})

    return media.mapInPandas(_hash, schema=DHASH_SCHEMA)


def _dhash_bits(arr) -> str:
    """The pure dHash kernel over a decoded (h, w, 3) pixel array — see
    image_dhash for the contract. Module-level so the invariance property
    is unit-testable without a Spark job."""
    import numpy as np

    h, w = arr.shape[0], arr.shape[1]
    gray = arr.astype(np.int64).sum(axis=2)
    ys = (np.arange(8) * h) // 8
    xs = (np.arange(9) * w) // 9
    g = gray[ys][:, xs]
    bits = (g[:, :-1] < g[:, 1:]).astype(np.uint8).ravel()
    return "".join("1" if b else "0" for b in bits)


def resample_audio(media: DataFrame, factor: int = 2) -> DataFrame:
    """REAL audio resample (zero-order hold): every RIFF/WAVE or FLAC
    payload is decoded, each sample repeated ``factor`` times, the
    sample rate scaled by ``factor``, and the clip re-encoded IN ITS OWN
    CONTAINER (FLAC in → FLAC out, through the full rice/predictor
    pipeline) — the same duration at a higher rate (the crude analog of
    nearest-neighbor image upscale, and exactly what audio_fingerprint
    must be invariant to). Unrecognized rows — and encodings the codecs
    don't support — pass through untouched, so a mixed table resamples
    in one shuffle-free mapInPandas pass without a single bad asset
    failing the job."""

    def _resample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            payloads, rates = [], []
            for payload, rate in zip(pdf["payload"], pdf["meta_sample_rate"]):
                b = bytes(payload) if payload is not None else b""
                decoded = None
                if _is_audio_magic(b):
                    try:
                        decoded = _parse_audio(b)
                    except ValueError:
                        decoded = None  # unsupported encoding: pass through
                if decoded is not None:
                    r, samples = decoded
                    up = np.repeat(samples, factor)
                    try:
                        if b[:4] == b"fLaC":
                            from victor_spark.operators.flac_codec import (
                                encode_flac,
                            )

                            payloads.append(
                                encode_flac([int(s) for s in up], r * factor)
                            )
                        else:
                            payloads.append(_encode_wav(up, r * factor))
                        rates.append(r * factor)
                    except ValueError:
                        # the scaled rate overflows the container's
                        # field (FLAC: 20 bits): pass through untouched
                        # rather than emit a corrupt asset or fail
                        payloads.append(payload)
                        rates.append(rate)
                else:
                    payloads.append(payload)
                    rates.append(rate)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "payload": payloads,
                    "meta_width": pdf["meta_width"],
                    "meta_height": pdf["meta_height"],
                    "meta_sample_rate": rates,
                }
            )

    return media.mapInPandas(_resample, schema=MEDIA_SCHEMA)


def audio_fingerprint(media: DataFrame) -> DataFrame:
    """Perceptual audio fingerprint over DECODED samples — the audio-dedup
    primitive. STRICT like decode_audio_stats: every row must be a
    fully-decodable container (WAV/FLAC/AIFF/AU) — pre-filter mixed
    lakes with ``decodable_audio("payload")``, since MP3 rows are
    kind='audio' but refuse sample decode loudly (faked samples would
    poison the dedup). Per clip: decode (WAV codec), nearest-neighbor resample
    the int16 samples to a 65-point grid, one bit per consecutive grid
    pair (bit = s[j] < s[j+1]) → a 64-char '0'/'1' string.

    Invariant under zero-order-hold resampling by ANY integer factor:
    grid index (j*f*n)//65 // f == (j*n)//65 exactly (floor(floor(f*x)/f)
    = floor(x)), so a clip and its resample fingerprint identically while
    different clips differ — dedup is then the same exact hash groupBy as
    image dHash / the text dedup family. Integer comparisons only, so an
    integer-only SQL oracle replays every bit."""

    def _fp(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, fps = [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                _rate, samples = _parse_audio(bytes(payload))
                ids.append(mid)
                fps.append(_audio_fp_bits(samples))
            yield pd.DataFrame({"media_id": ids, "dhash": fps})

    return media.mapInPandas(_fp, schema=DHASH_SCHEMA)


def _audio_fp_bits(samples) -> str:
    """The pure fingerprint kernel over decoded int16 samples — see
    audio_fingerprint for the contract. Module-level so the
    resample-invariance property is unit-testable without a Spark job."""
    import numpy as np

    samples = np.asarray(samples)
    n = len(samples)
    if n == 0:  # degenerate empty clip: all-flat fingerprint
        return "0" * 64
    idx = (np.arange(65) * n) // 65
    g = samples[idx].astype(np.int64)
    bits = (g[:-1] < g[1:]).astype(np.uint8)
    return "".join("1" if b else "0" for b in bits)


def decode_audio_stats(media: DataFrame) -> DataFrame:
    """REAL audio decode → per-clip sample statistics: every payload is
    parsed by its container's codec (RIFF/WAVE chunk walker, or FLAC
    through the full rice/fixed-predictor pipeline) and the statistics
    are computed from the decoded int16 samples. Same Arrow-batched,
    shuffle-free shape as decode_image_stats.

    STRICT contract: every row must be a fully-decodable container
    (WAV/FLAC/AIFF/AU). The sniffer quarantines unknown formats to
    kind='binary', but since round 8 it classifies MP3 as kind='audio'
    WITH metadata while sample decode stays a loud NotImplementedError —
    so mixed lakes pre-filter with ``decodable_audio("payload")`` before
    this stage; the tolerant mixed-table operators are extract_features
    / resample_audio."""

    def _stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = {k: [] for k in (
                "media_id", "sample_rate", "n_samples", "mean_amp",
                "rms_amp", "min_amp", "max_amp",
            )}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                rate, samples = _parse_audio(bytes(payload))
                a = samples.astype(np.float64)
                n = max(len(a), 1)
                rows["media_id"].append(mid)
                rows["sample_rate"].append(rate)
                rows["n_samples"].append(len(samples))
                rows["mean_amp"].append(float(a.sum() / n))
                rows["rms_amp"].append(float(np.sqrt((a * a).sum() / n)))
                rows["min_amp"].append(int(samples.min()) if len(samples) else 0)
                rows["max_amp"].append(int(samples.max()) if len(samples) else 0)
            yield pd.DataFrame(rows)

    return media.mapInPandas(_stats, schema=AUDIO_STATS_SCHEMA)
