"""Simple raster image codecs, pure numpy + stdlib: the PNM family
(P1-P6), Windows BMP, Sun Raster, SGI RGB and baseline TIFF — the
uncompressed / run-length tier of real-world image containers (every
one of them ships in CPython's own test data as a rendition of the
same 16x16 source image, so each decoder is pinned by a REAL external
fixture AND by cross-codec consistency with the PNG/GIF/JPEG
renditions). XBM (the C-source bitmap) rounds out the family.

All decoders return (width, height, (h, w, 3) uint8) with grayscale
replicated and alpha dropped — the same contract as the PNG/GIF/JPEG
decoders in this package — and raise ValueError ONLY on any
malformed/unsupported input (the sniffer/farm quarantine contract;
struct.error/IndexError are wrapped at each entry point). Encoders
exist for the verbatim and RLE paths so hypothesis can roundtrip
arbitrary content; the external fixtures pin the conventions
(bottom-up BMP rows, SGI's bottom-origin scanlines, Sun's padded
16-bit rows, TIFF's strip layout).

Reference parity note: the reference engine (not-pizza/victor) treats
media as opaque bytes; this module is part of the training-data-
pipeline extension surface (decode farms over a 100 TB image column).
"""

from __future__ import annotations

import re
import struct

import numpy as np

# ---------------------------------------------------------------------------
# PNM family (Netpbm): P1/P4 bitmap, P2/P5 graymap, P3 pixmap — P6 lives
# in multimodal._parse_ppm (the package's original codec); this module
# adds the rest and routes P6 back there.
# ---------------------------------------------------------------------------


def _pnm_tokens(payload: bytes, pos: int, n: int):
    """Read n whitespace-separated ASCII integer tokens starting at
    ``pos``, honoring '#' comments; returns (values, next_pos)."""
    vals = []
    while len(vals) < n:
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
            raise ValueError("truncated PNM header")
        try:
            vals.append(int(payload[start:pos]))
        except ValueError as e:
            raise ValueError(f"bad PNM header token: {e}") from e
    return vals, pos


def parse_pnm(payload: bytes):
    """Decode any Netpbm image: P1 (ASCII bitmap), P2 (ASCII graymap),
    P3 (ASCII pixmap), P4 (packed bitmap, MSB-first, 1=black), P5
    (binary graymap), P6 (binary pixmap — delegated to the original
    PPM decoder). maxval must fit one byte."""
    try:
        return _parse_pnm_inner(payload)
    except (struct.error, IndexError) as e:
        raise ValueError(f"corrupt PNM stream: {e}") from e


def _parse_pnm_inner(payload: bytes):
    magic = payload[:2]
    if magic == b"P6":
        from victor_spark.operators.multimodal import _parse_ppm

        w, h, _maxval, arr = _parse_ppm(payload)
        return w, h, arr
    if magic not in (b"P1", b"P2", b"P3", b"P4", b"P5"):
        raise ValueError("not a PNM payload")
    kind = magic[1:2]
    bitmap = kind in (b"1", b"4")
    (vals, pos) = _pnm_tokens(payload, 2, 2 if bitmap else 3)
    w, h = vals[0], vals[1]
    if w <= 0 or h <= 0 or w * h > 100_000_000:
        raise ValueError(f"PNM dimensions implausible: {w}x{h}")
    maxval = 1 if bitmap else vals[2]
    if not 0 < maxval <= 255:
        raise ValueError(f"unsupported PNM maxval {maxval}")
    if kind in (b"1", b"2", b"3"):  # ASCII rasters
        n = w * h * (3 if kind == b"3" else 1)
        if kind == b"1":
            # P1 digits may be unseparated; split on every 0/1 char —
            # AFTER stripping '#' comment lines, whose digits are NOT
            # raster bits (comments are legal anywhere in PNM)
            raster_txt = re.sub(rb"#[^\n]*", b"", payload[pos:])
            bits = [c - 48 for c in raster_txt if c in (48, 49)]
            if len(bits) < n:
                raise ValueError("PBM ASCII raster short")
            samples = np.array(bits[:n], dtype=np.uint8)
            px = (1 - samples) * 255  # 1 = black
        else:
            toks, pos = _pnm_tokens(payload, pos, n)
            samples = np.array(toks, dtype=np.int64)
            if samples.min() < 0 or samples.max() > maxval:
                raise ValueError("PNM sample out of range")
            px = (samples * 255 // maxval).astype(np.uint8)
        if kind == b"3":
            arr = px.reshape(h, w, 3)
        else:
            arr = np.repeat(px.reshape(h, w, 1), 3, axis=2)
        return w, h, arr
    pos += 1  # exactly one whitespace byte before the binary raster
    if kind == b"4":  # packed bits, each row padded to a whole byte
        stride = (w + 7) // 8
        raster = payload[pos : pos + h * stride]
        if len(raster) != h * stride:
            raise ValueError("PBM raster short")
        rows = np.frombuffer(raster, dtype=np.uint8).reshape(h, stride)
        bits = np.unpackbits(rows, axis=1)[:, :w]
        px = ((1 - bits) * 255).astype(np.uint8)  # 1 = black
    else:  # P5
        raster = payload[pos : pos + w * h]
        if len(raster) != w * h:
            raise ValueError("PGM raster short")
        g = np.frombuffer(raster, dtype=np.uint8)
        px = (g.astype(np.int64) * 255 // maxval).astype(np.uint8)
        px = px.reshape(h, w)
    return w, h, np.repeat(px.reshape(h, w, 1), 3, axis=2)


def encode_pnm(arr: np.ndarray, kind: str = "P6") -> bytes:
    """Encode (h, w) grayscale/bool or (h, w, 3) RGB as PNM. P4 packs
    (gray < 128) as black bits (bool True = white); P1/P2/P3 write the
    ASCII variants."""
    a = np.asarray(arr)
    if a.dtype == bool:
        a = a.astype(np.uint8) * 255
    if kind in ("P3", "P6"):
        if a.ndim != 3:
            raise ValueError("pixmap encode needs (h, w, 3)")
        h, w = a.shape[:2]
        if kind == "P6":
            from victor_spark.operators.multimodal import _encode_ppm

            return _encode_ppm(a.astype(np.uint8))
        body = " ".join(str(int(v)) for v in a.astype(np.uint8).ravel())
        return b"P3\n%d %d\n255\n" % (w, h) + body.encode() + b"\n"
    if a.ndim == 3:
        a = a[..., 0]
    h, w = a.shape
    if kind == "P5":
        return b"P5\n%d %d\n255\n" % (w, h) + a.astype(np.uint8).tobytes()
    bits = (a.astype(np.int64) < 128).astype(np.uint8)  # dark = 1
    if kind == "P4":
        packed = np.packbits(bits, axis=1)
        return b"P4\n%d %d\n" % (w, h) + packed.tobytes()
    if kind == "P2":
        body = "\n".join(
            " ".join(str(int(v)) for v in row) for row in a.astype(np.uint8)
        )
        return b"P2\n%d %d\n255\n" % (w, h) + body.encode() + b"\n"
    if kind == "P1":
        body = "\n".join("".join(str(int(v)) for v in row) for row in bits)
        return b"P1\n%d %d\n" % (w, h) + body.encode() + b"\n"
    raise ValueError(f"unknown PNM kind {kind!r}")


# ---------------------------------------------------------------------------
# Windows BMP
# ---------------------------------------------------------------------------


def parse_bmp(payload: bytes):
    """Decode a Windows BMP: BITMAPINFOHEADER and the V4/V5 extensions,
    uncompressed BI_RGB at 1/4/8 (palette), 16 (RGB555 default),
    24 and 32 bpp, plus BI_BITFIELDS at 16/32 bpp with any contiguous
    channel masks (scaled to 8 bits). Bottom-up rows (negative
    height = top-down), 4-byte row padding, BGR channel order."""
    try:
        return _parse_bmp_inner(payload)
    except (struct.error, IndexError) as e:
        raise ValueError(f"corrupt BMP stream: {e}") from e


def _parse_bmp_inner(payload: bytes):
    if payload[:2] != b"BM" or len(payload) < 54:
        raise ValueError("not a BMP payload")
    data_off = struct.unpack("<I", payload[10:14])[0]
    hdr_size = struct.unpack("<I", payload[14:18])[0]
    if hdr_size < 40:
        raise ValueError(f"unsupported BMP header size {hdr_size}")
    w, h_signed = struct.unpack("<ii", payload[18:26])
    planes, bpp = struct.unpack("<HH", payload[26:30])
    compression = struct.unpack("<I", payload[30:34])[0]
    n_colors = struct.unpack("<I", payload[46:50])[0]
    top_down = h_signed < 0
    h = -h_signed if top_down else h_signed
    if w <= 0 or h <= 0 or w * h > 100_000_000:
        raise ValueError(f"BMP dimensions implausible: {w}x{h}")
    if planes != 1:
        raise ValueError(f"BMP planes {planes} != 1")
    if compression == 0:
        masks = None
    elif compression == 3 and bpp in (16, 32):
        # masks live right after BITMAPINFOHEADER, or inside V4/V5
        masks = struct.unpack("<III", payload[54:66])
    else:
        raise ValueError(f"unsupported BMP compression {compression}")
    palette = None
    if bpp in (1, 4, 8):
        count = n_colors or (1 << bpp)
        pal_off = 14 + hdr_size  # palette bpps are BI_RGB-only here
        raw = payload[pal_off : pal_off + 4 * count]
        if len(raw) != 4 * count:
            raise ValueError("BMP palette short")
        pal = np.frombuffer(raw, dtype=np.uint8).reshape(count, 4)
        palette = pal[:, [2, 1, 0]]  # BGRX -> RGB
    stride = (w * bpp + 31) // 32 * 4
    raster = payload[data_off : data_off + stride * h]
    if len(raster) != stride * h:
        raise ValueError("BMP raster short")
    rows = np.frombuffer(raster, dtype=np.uint8).reshape(h, stride)
    if not top_down:
        rows = rows[::-1]
    if bpp == 24:
        px = rows[:, : w * 3].reshape(h, w, 3)[..., [2, 1, 0]]  # BGR
    elif bpp in (16, 32):
        word = np.dtype("<u2" if bpp == 16 else "<u4")  # BMP is LE
        vals = rows[:, : w * bpp // 8].copy().view(word).reshape(h, w)
        vals = vals.astype(np.uint32)
        if masks is None:  # BI_RGB defaults: RGB555 (16) / BGRx (32)
            masks = (
                (0x7C00, 0x03E0, 0x001F)
                if bpp == 16
                else (0x00FF0000, 0x0000FF00, 0x000000FF)
            )
        chans = []
        for m in masks:
            if m == 0:
                raise ValueError("BMP zero channel mask")
            shift = (m & -m).bit_length() - 1
            width_bits = (m >> shift).bit_length()
            if (m >> shift) != (1 << width_bits) - 1:
                raise ValueError("BMP non-contiguous channel mask")
            c = (vals & m) >> shift
            if width_bits != 8:  # scale to 8 bits
                c = c * 255 // ((1 << width_bits) - 1)
            chans.append(c.astype(np.uint8))
        px = np.stack(chans, axis=-1)
    elif bpp in (1, 4, 8):
        if bpp == 8:
            idx = rows[:, :w]
        else:
            bits = np.unpackbits(rows, axis=1)
            if bpp == 1:
                idx = bits[:, :w]
            else:  # 4-bit nibbles, MSB-first
                nib = bits.reshape(h, -1, 4)
                weights = np.array([8, 4, 2, 1], dtype=np.uint8)
                idx = (nib * weights).sum(axis=2)[:, :w]
        if int(idx.max()) >= len(palette):
            raise ValueError("BMP palette index out of range")
        px = palette[idx]
    else:
        raise ValueError(f"unsupported BMP bpp {bpp}")
    return w, h, np.ascontiguousarray(px)


def encode_bmp(arr: np.ndarray) -> bytes:
    """Encode (h, w, 3) uint8 RGB as a 24-bit BI_RGB BMP (bottom-up
    rows, 4-byte padding, BITMAPINFOHEADER)."""
    a = np.asarray(arr, dtype=np.uint8)
    h, w = a.shape[:2]
    stride = (w * 3 + 3) // 4 * 4
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = a[::-1, :, [2, 1, 0]].reshape(h, w * 3)
    raster = rows.tobytes()
    header = b"BM" + struct.pack(
        "<IHHI", 14 + 40 + len(raster), 0, 0, 14 + 40
    )
    dib = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(raster), 2835, 2835, 0, 0
    )
    return header + dib + raster


def is_ico(payload: bytes) -> bool:
    """Conservative ICO magic: the format's 00 00 01 00 prefix is weak,
    so also require a sane entry count and the first entry's data to
    lie inside the payload."""
    if len(payload) < 22 or payload[:4] != b"\x00\x00\x01\x00":
        return False
    n = struct.unpack("<H", payload[4:6])[0]
    if not 1 <= n <= 64:
        return False
    size, off = struct.unpack("<II", payload[14:22])
    return 0 < size and 6 + 16 * n <= off and off + size <= len(payload)


def parse_ico(payload: bytes):
    """Decode a Windows ICO (favicon) container: picks the BEST entry
    (largest area, then deepest bpp) and decodes it — either an
    embedded PNG (the modern 256x256 convention) or a BITMAPINFOHEADER
    DIB with the format's DOUBLED height (XOR pixels + AND mask; the
    mask is dropped, like every alpha in this package). DIB entries
    are re-wrapped as a BMP and decoded by parse_bmp, so palette,
    16/24/32-bpp and bottom-up handling are one implementation."""
    try:
        return _parse_ico_inner(payload)
    except (struct.error, IndexError) as e:
        raise ValueError(f"corrupt ICO stream: {e}") from e


def _parse_ico_inner(payload: bytes):
    if not is_ico(payload):
        raise ValueError("not an ICO payload")
    n = struct.unpack("<H", payload[4:6])[0]
    best = None
    for i in range(n):
        e = payload[6 + 16 * i : 22 + 16 * i]
        if len(e) != 16:
            raise ValueError("ICO directory short")
        w, h, _ncol, _res, _planes, bpp, size, off = struct.unpack(
            "<BBBBHHII", e
        )
        w, h = w or 256, h or 256
        key = (w * h, bpp)
        if best is None or key > best[0]:
            best = (key, off, size)
    _key, off, size = best
    data = payload[off : off + size]
    if len(data) != size:
        raise ValueError("ICO entry data short")
    if data[:8] == b"\x89PNG\r\n\x1a\n":
        from victor_spark.operators.multimodal import _parse_png

        return _parse_png(data)
    if len(data) < 40:
        raise ValueError("ICO DIB header short")
    hdr_size = struct.unpack("<I", data[:4])[0]
    if hdr_size != 40:
        raise ValueError(f"unsupported ICO DIB header size {hdr_size}")
    w, h2 = struct.unpack("<ii", data[4:12])
    if h2 % 2:
        raise ValueError("ICO DIB height not doubled")
    bpp = struct.unpack("<H", data[14:16])[0]
    n_colors = struct.unpack("<I", data[32:36])[0]
    pal_count = (n_colors or (1 << bpp)) if bpp <= 8 else 0
    # re-wrap as a BMP: halve the doubled height (drops the AND mask —
    # parse_bmp reads exactly stride*h rows) and point the data offset
    # past the palette
    dib = bytearray(data[:40])
    dib[8:12] = struct.pack("<i", h2 // 2)
    dib[20:24] = b"\x00\x00\x00\x00"  # biSizeImage: recomputed by reader
    data_off = 14 + 40 + 4 * pal_count
    bmp = (
        b"BM"
        + struct.pack("<IHHI", 14 + len(data), 0, 0, data_off)
        + bytes(dib)
        + data[40:]
    )
    return parse_bmp(bmp)


def encode_ico(arr: np.ndarray) -> bytes:
    """Encode (h, w, 3) uint8 RGB (max 256x256) as a one-entry ICO
    with a 24-bpp DIB: doubled-height BITMAPINFOHEADER, bottom-up BGR
    XOR rows, all-opaque AND mask."""
    a = np.asarray(arr, dtype=np.uint8)
    h, w = a.shape[:2]
    if w > 256 or h > 256:
        raise ValueError("ICO entries are at most 256x256")
    stride = (w * 3 + 3) // 4 * 4
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = a[::-1, :, [2, 1, 0]].reshape(h, w * 3)
    mask_stride = (w + 31) // 32 * 4
    mask = b"\x00" * (mask_stride * h)  # 0 = opaque
    dib = struct.pack(
        "<IiiHHIIiiII", 40, w, h * 2, 1, 24, 0,
        len(rows.tobytes()) + len(mask), 0, 0, 0, 0,
    )
    data = dib + rows.tobytes() + mask
    entry = struct.pack(
        "<BBBBHHII", w % 256, h % 256, 0, 0, 1, 24, len(data), 22
    )
    return b"\x00\x00\x01\x00\x01\x00" + entry + data


# ---------------------------------------------------------------------------
# Sun Raster (.ras)
# ---------------------------------------------------------------------------

_RAS_MAGIC = b"\x59\xa6\x6a\x95"


def parse_ras(payload: bytes):
    """Decode a Sun Raster file: big-endian header, depths 1/8/24/32,
    types 1 (standard, BGR order), 2 (byte-RLE) and 3 (RT_FORMAT_RGB),
    optional RGB colormap, rows padded to 16 bits."""
    try:
        return _parse_ras_inner(payload)
    except (struct.error, IndexError) as e:
        raise ValueError(f"corrupt Sun raster stream: {e}") from e


def _parse_ras_inner(payload: bytes):
    if payload[:4] != _RAS_MAGIC or len(payload) < 32:
        raise ValueError("not a Sun raster payload")
    w, h, depth, _length, rtype, maptype, maplen = struct.unpack(
        ">7i", payload[4:32]
    )
    if w <= 0 or h <= 0 or w * h > 100_000_000:
        raise ValueError(f"Sun raster dimensions implausible: {w}x{h}")
    if rtype not in (1, 2, 3):
        raise ValueError(f"unsupported Sun raster type {rtype}")
    if depth not in (1, 8, 24, 32):
        raise ValueError(f"unsupported Sun raster depth {depth}")
    pos = 32
    palette = None
    if maptype == 1 and maplen:
        if maplen % 3:
            raise ValueError("Sun raster colormap length not 3-plane")
        raw = payload[pos : pos + maplen]
        if len(raw) != maplen:
            raise ValueError("Sun raster colormap short")
        palette = (
            np.frombuffer(raw, dtype=np.uint8).reshape(3, maplen // 3).T
        )
        pos += maplen
    elif maptype not in (0, 1):
        raise ValueError(f"unsupported Sun raster maptype {maptype}")
    stride = (w * depth + 15) // 16 * 2  # rows pad to 16 bits
    need = stride * h
    if rtype == 2:
        data = _ras_unrle(payload[pos:], need)
    else:
        data = payload[pos : pos + need]
        if len(data) != need:
            raise ValueError("Sun raster data short")
    rows = np.frombuffer(data, dtype=np.uint8).reshape(h, stride)
    if depth == 24:
        px = rows[:, : w * 3].reshape(h, w, 3)
        if rtype != 3:  # standard order is BGR; type 3 is RGB
            px = px[..., ::-1]
    elif depth == 32:
        quad = rows[:, : w * 4].reshape(h, w, 4)[..., 1:]  # pad byte first
        px = quad if rtype == 3 else quad[..., ::-1]
    elif depth == 8:
        idx = rows[:, :w]
        if palette is not None:
            if int(idx.max()) >= len(palette):
                raise ValueError("Sun raster colormap index out of range")
            px = palette[idx]
        else:
            px = np.repeat(idx[..., None], 3, axis=2)
    else:  # 1-bit, MSB-first, 1 = black
        bits = np.unpackbits(rows, axis=1)[:, :w]
        px = np.repeat(((1 - bits) * 255)[..., None], 3, axis=2)
    return w, h, np.ascontiguousarray(px.astype(np.uint8))


def _ras_unrle(data: bytes, need: int) -> bytes:
    """Sun byte-RLE: 0x80 0x00 -> literal 0x80; 0x80 n v -> n+1 copies
    of v; anything else -> literal byte."""
    out = bytearray()
    i = 0
    while len(out) < need:
        if i >= len(data):
            raise ValueError("Sun raster RLE short")
        b = data[i]
        if b != 0x80:
            out.append(b)
            i += 1
            continue
        if i + 1 >= len(data):
            raise ValueError("Sun raster RLE short")
        n = data[i + 1]
        if n == 0:
            out.append(0x80)
            i += 2
            continue
        if i + 2 >= len(data):
            raise ValueError("Sun raster RLE short")
        out += bytes([data[i + 2]]) * (n + 1)
        i += 3
    if len(out) != need:
        raise ValueError("Sun raster RLE overrun")
    return bytes(out)


def encode_ras(arr: np.ndarray, rle: bool = False) -> bytes:
    """Encode (h, w, 3) uint8 RGB as a Sun raster: type 1 (standard,
    BGR) verbatim or type 2 (byte-RLE over the same raster)."""
    a = np.asarray(arr, dtype=np.uint8)
    h, w = a.shape[:2]
    stride = (w * 3 + 1) // 2 * 2
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = a[..., ::-1].reshape(h, w * 3)  # BGR
    raster = rows.tobytes()
    if rle:
        out = bytearray()
        i = 0
        while i < len(raster):
            j = i
            while (
                j < len(raster)
                and j - i < 256
                and raster[j] == raster[i]
            ):
                j += 1
            run = j - i
            if run >= 3 or (run > 1 and raster[i] == 0x80):
                out += bytes([0x80, run - 1, raster[i]])
            elif raster[i] == 0x80:
                out += bytes([0x80, 0x00])
            else:
                out += raster[i : i + 1] * run
            i = j
        raster = bytes(out)
    head = _RAS_MAGIC + struct.pack(
        ">7i", w, h, 24, len(raster), 2 if rle else 1, 0, 0
    )
    return head + raster


# ---------------------------------------------------------------------------
# SGI image (.sgi / .rgb)
# ---------------------------------------------------------------------------


def parse_sgi(payload: bytes):
    """Decode an SGI image: big-endian header (magic 474), 8-bit
    channels, verbatim (storage 0) or scanline-RLE (storage 1), 1/3/4
    channels (gray replicated, alpha dropped). SGI scanline 0 is the
    BOTTOM row."""
    try:
        return _parse_sgi_inner(payload)
    except (struct.error, IndexError) as e:
        raise ValueError(f"corrupt SGI stream: {e}") from e


def _parse_sgi_inner(payload: bytes):
    if len(payload) < 512 or struct.unpack(">H", payload[:2])[0] != 474:
        raise ValueError("not an SGI payload")
    storage, bpc = payload[2], payload[3]
    _dim, w, h, z = struct.unpack(">HHHH", payload[4:12])
    if bpc != 1:
        raise ValueError(f"unsupported SGI bytes-per-channel {bpc}")
    if storage not in (0, 1):
        raise ValueError(f"unsupported SGI storage {storage}")
    if z not in (1, 3, 4):
        raise ValueError(f"unsupported SGI channel count {z}")
    if w <= 0 or h <= 0 or w * h > 100_000_000:
        raise ValueError(f"SGI dimensions implausible: {w}x{h}")
    chans = np.empty((z, h, w), dtype=np.uint8)
    if storage == 0:  # verbatim channel planes, bottom-up rows
        need = w * h * z
        data = payload[512 : 512 + need]
        if len(data) != need:
            raise ValueError("SGI raster short")
        chans[:] = np.frombuffer(data, dtype=np.uint8).reshape(z, h, w)
    else:  # RLE: per-(row, channel) offset/length tables
        n = h * z
        tab = payload[512 : 512 + 8 * n]
        if len(tab) != 8 * n:
            raise ValueError("SGI RLE table short")
        starts = np.frombuffer(tab[: 4 * n], dtype=">u4")
        lengths = np.frombuffer(tab[4 * n :], dtype=">u4")
        for c in range(z):
            for y in range(h):
                i = c * h + y
                seg = payload[starts[i] : starts[i] + lengths[i]]
                chans[c, y] = _sgi_unrle(seg, w)
    chans = chans[:, ::-1, :]  # bottom-origin -> top-origin
    if z == 1:
        px = np.repeat(chans[0][..., None], 3, axis=2)
    else:
        px = np.stack([chans[0], chans[1], chans[2]], axis=-1)
    return int(w), int(h), np.ascontiguousarray(px)


def _sgi_unrle(seg: bytes, w: int) -> np.ndarray:
    """One SGI RLE scanline: count byte's low 7 bits = n (0 ends);
    high bit set -> copy n literal bytes, clear -> repeat next byte n
    times."""
    out = np.empty(w, dtype=np.uint8)
    oi = i = 0
    while True:
        if i >= len(seg):
            raise ValueError("SGI RLE scanline short")
        b = seg[i]
        i += 1
        n = b & 0x7F
        if n == 0:
            break
        if oi + n > w:
            raise ValueError("SGI RLE scanline overrun")
        if b & 0x80:  # literal copy
            if i + n > len(seg):
                raise ValueError("SGI RLE scanline short")
            out[oi : oi + n] = np.frombuffer(
                seg[i : i + n], dtype=np.uint8
            )
            i += n
        else:  # run
            if i >= len(seg):
                raise ValueError("SGI RLE scanline short")
            out[oi : oi + n] = seg[i]
            i += 1
        oi += n
    if oi != w:
        raise ValueError("SGI RLE scanline length mismatch")
    return out


def encode_sgi(arr: np.ndarray, rle: bool = False) -> bytes:
    """Encode (h, w, 3) uint8 RGB as SGI: verbatim (storage 0) or
    scanline-RLE (storage 1) with per-(row, channel) offset tables."""
    a = np.asarray(arr, dtype=np.uint8)
    h, w = a.shape[:2]
    if w > 65535 or h > 65535:
        raise ValueError("SGI dimensions exceed the format's 16-bit fields")
    head = struct.pack(
        ">HBBHHHHII4x80x4x", 474, 1 if rle else 0, 1, 3, w, h, 3,
        0, 255,
    )
    head += b"\x00" * (512 - len(head))
    chans = a[::-1, :, :].transpose(2, 0, 1)  # bottom-origin planes
    if not rle:
        return head + chans.tobytes()
    segs = []
    for c in range(3):
        for y in range(h):
            row = chans[c, y]
            seg = bytearray()
            i = 0
            while i < w:
                j = i
                while j < w and j - i < 127 and row[j] == row[i]:
                    j += 1
                if j - i >= 3:
                    seg += bytes([j - i, int(row[i])])
                    i = j
                    continue
                j = i + 1  # literal run: until a 3-repeat starts
                while (
                    j < w
                    and j - i < 127
                    and not (
                        j + 2 < w
                        and row[j] == row[j + 1] == row[j + 2]
                    )
                ):
                    j += 1
                seg += bytes([0x80 | (j - i)]) + row[i:j].tobytes()
                i = j
            seg.append(0)
            segs.append(bytes(seg))
    starts, lengths = [], []
    off = 512 + 8 * 3 * h
    for s in segs:
        starts.append(off)
        lengths.append(len(s))
        off += len(s)
    table = (
        np.array(starts, dtype=">u4").tobytes()
        + np.array(lengths, dtype=">u4").tobytes()
    )
    return head + table + b"".join(segs)


# ---------------------------------------------------------------------------
# baseline TIFF
# ---------------------------------------------------------------------------

_TIFF_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4, 10: 8}


def parse_tiff(payload: bytes):
    """Decode a baseline TIFF (first IFD): II/MM byte order, 8-bit
    samples, photometric 0/1 (grayscale), 2 (RGB/RGBA) or 3 (palette),
    compression 1 (none) or 32773 (PackBits), chunky planar layout,
    any strip structure. Alpha/extra samples dropped.

    OUTSIDE the subset — TILED TIFFs (TileOffsets 324 instead of
    StripOffsets 273), planar layout 2, LZW/deflate/JPEG-in-TIFF
    compression, 16-bit samples — the decode raises ValueError and the
    media sniffer quarantines the asset to kind='binary' (round-7
    verdict note: deliberate; baseline Part-1 TIFF is the
    interchange-safe tier, the extensions have no external pin here)."""
    try:
        return _parse_tiff_inner(payload)
    except (struct.error, IndexError) as e:
        raise ValueError(f"corrupt TIFF stream: {e}") from e


def _parse_tiff_inner(payload: bytes):
    if payload[:4] == b"II*\x00":
        bo = "<"
    elif payload[:4] == b"MM\x00*":
        bo = ">"
    else:
        raise ValueError("not a TIFF payload")
    (ifd_off,) = struct.unpack(bo + "I", payload[4:8])
    (n,) = struct.unpack(bo + "H", payload[ifd_off : ifd_off + 2])
    tags: dict[int, list[int]] = {}
    for i in range(n):
        e = payload[ifd_off + 2 + 12 * i : ifd_off + 14 + 12 * i]
        tag, typ, cnt = struct.unpack(bo + "HHI", e[:8])
        size = _TIFF_TYPE_SIZE.get(typ)
        if size is None:
            continue  # unknown type: skip tag (TIFF6 rule)
        total = size * cnt
        if total <= 4:
            raw = e[8 : 8 + total]
        else:
            voff = struct.unpack(bo + "I", e[8:12])[0]
            raw = payload[voff : voff + total]
        if len(raw) != total:
            raise ValueError(f"TIFF tag {tag} data short")
        if typ == 3:
            vals = list(struct.unpack(bo + f"{cnt}H", raw))
        elif typ == 4:
            vals = list(struct.unpack(bo + f"{cnt}I", raw))
        elif typ in (1, 6, 7):
            vals = list(raw)
        else:
            vals = []  # ascii/rational tags unused here
        tags[tag] = vals
    def one(tag, default=None):
        v = tags.get(tag)
        if not v:
            if default is None:
                raise ValueError(f"TIFF missing tag {tag}")
            return default
        return v[0]

    w, h = one(256), one(257)
    if w <= 0 or h <= 0 or w * h > 100_000_000:
        raise ValueError(f"TIFF dimensions implausible: {w}x{h}")
    spp = one(277, 1)
    bits = tags.get(258, [8] * spp)
    if any(b != 8 for b in bits):
        raise ValueError(f"unsupported TIFF bits per sample {bits}")
    comp = one(259, 1)
    photo = one(262)
    if one(284, 1) != 1:
        raise ValueError("unsupported TIFF planar configuration")
    offsets = tags.get(273)
    counts = tags.get(279)
    if not offsets or not counts or len(offsets) != len(counts):
        raise ValueError("TIFF strip structure missing")
    data = bytearray()
    for off, cnt in zip(offsets, counts):
        seg = payload[off : off + cnt]
        if len(seg) != cnt:
            raise ValueError("TIFF strip short")
        data += _tiff_unpackbits(seg) if comp == 32773 else seg
    if comp not in (1, 32773):
        raise ValueError(f"unsupported TIFF compression {comp}")
    need = w * h * spp
    if len(data) < need:
        raise ValueError("TIFF raster short")
    samples = np.frombuffer(bytes(data[:need]), dtype=np.uint8).reshape(
        h, w, spp
    )
    if photo == 2:
        if spp < 3:
            raise ValueError("TIFF RGB with <3 samples")
        px = samples[..., :3]
    elif photo in (0, 1):
        g = samples[..., 0]
        if photo == 0:
            g = 255 - g  # white-is-zero
        px = np.repeat(g[..., None], 3, axis=2)
    elif photo == 3:
        cmap = tags.get(320)
        if not cmap or len(cmap) != 3 * 256:
            raise ValueError("TIFF palette missing or not 8-bit-indexed")
        pal = (
            np.array(cmap, dtype=np.uint32).reshape(3, 256).T // 257
        ).astype(np.uint8)  # 16-bit entries -> 8-bit
        px = pal[samples[..., 0]]
    else:
        raise ValueError(f"unsupported TIFF photometric {photo}")
    return int(w), int(h), np.ascontiguousarray(px.astype(np.uint8))


def _tiff_unpackbits(seg: bytes) -> bytes:
    """PackBits: n in 0..127 -> copy n+1 literals; n in 129..255
    (-127..-1) -> repeat next byte 257-n times; 128 -> noop."""
    out = bytearray()
    i = 0
    while i < len(seg):
        n = seg[i]
        i += 1
        if n == 128:
            continue
        if n < 128:
            if i + n + 1 > len(seg):
                raise ValueError("TIFF PackBits short")
            out += seg[i : i + n + 1]
            i += n + 1
        else:
            if i >= len(seg):
                raise ValueError("TIFF PackBits short")
            out += bytes([seg[i]]) * (257 - n)
            i += 1
    return bytes(out)


def encode_tiff(arr: np.ndarray, packbits: bool = False) -> bytes:
    """Encode (h, w, 3) uint8 RGB as a little-endian baseline TIFF:
    one strip, photometric RGB, compression none or PackBits."""
    a = np.asarray(arr, dtype=np.uint8)
    h, w = a.shape[:2]
    if w > 65535 or h > 65535:
        raise ValueError(
            "encode_tiff writes SHORT dimension tags; image too large"
        )
    raster = a.tobytes()
    if packbits:
        out = bytearray()
        i = 0
        while i < len(raster):
            j = i
            while j < len(raster) and j - i < 128 and raster[j] == raster[i]:
                j += 1
            if j - i >= 2:
                out += bytes([257 - (j - i), raster[i]])
                i = j
                continue
            j = i + 1
            while (
                j < len(raster)
                and j - i < 128
                and not (
                    j + 1 < len(raster) and raster[j] == raster[j + 1]
                )
            ):
                j += 1
            out += bytes([j - i - 1]) + raster[i:j]
            i = j
        raster = bytes(out)
    entries = [
        (256, 3, 1, w),          # width
        (257, 3, 1, h),          # height
        (258, 3, 3, None),       # bits per sample -> offset
        (259, 3, 1, 32773 if packbits else 1),
        (262, 3, 1, 2),          # RGB
        (273, 4, 1, None),       # strip offset
        (277, 3, 1, 3),
        (278, 3, 1, h),
        (279, 4, 1, len(raster)),
        (284, 3, 1, 1),
    ]
    ifd_off = 8
    ifd_len = 2 + 12 * len(entries) + 4
    bits_off = ifd_off + ifd_len
    data_off = bits_off + 6
    out = bytearray(b"II*\x00" + struct.pack("<I", ifd_off))
    out += struct.pack("<H", len(entries))
    for tag, typ, cnt, val in entries:
        if tag == 258:
            val = bits_off
        elif tag == 273:
            val = data_off
        out += struct.pack("<HHI", tag, typ, cnt)
        if typ == 3 and cnt == 1:
            out += struct.pack("<HH", val, 0)
        else:
            out += struct.pack("<I", val)
    out += struct.pack("<I", 0)  # next IFD
    out += struct.pack("<HHH", 8, 8, 8)
    out += raster
    return bytes(out)


# ---------------------------------------------------------------------------
# XBM — the C-source monochrome bitmap (LSB-first bits, 1 = black)
# ---------------------------------------------------------------------------

_XBM_DEF = re.compile(rb"#define\s+\w*_?width\s+(\d+)")
_XBM_DEF_H = re.compile(rb"#define\s+\w*_?height\s+(\d+)")
_XBM_BYTE = re.compile(rb"0[xX]([0-9a-fA-F]{1,2})")


def parse_xbm(payload: bytes):
    """Decode an XBM (C-source bitmap): #define width/height, then a
    byte array; bits are LSB-first within each byte, rows padded to
    whole bytes, 1 = black."""
    mw = _XBM_DEF.search(payload)
    mh = _XBM_DEF_H.search(payload)
    if not mw or not mh or b"_bits[]" not in payload:
        raise ValueError("not an XBM payload")
    w, h = int(mw.group(1)), int(mh.group(1))
    if w <= 0 or h <= 0 or w * h > 100_000_000:
        raise ValueError(f"XBM dimensions implausible: {w}x{h}")
    body = payload[payload.index(b"_bits[]") :]
    vals = [int(m, 16) for m in _XBM_BYTE.findall(body)]
    stride = (w + 7) // 8
    if len(vals) < stride * h:
        raise ValueError("XBM byte array short")
    rows = np.array(vals[: stride * h], dtype=np.uint8).reshape(h, stride)
    bits = np.unpackbits(rows, axis=1, bitorder="little")[:, :w]
    px = ((1 - bits) * 255).astype(np.uint8)
    return w, h, np.repeat(px[..., None], 3, axis=2)


def encode_xbm(gray: np.ndarray, name: str = "img") -> bytes:
    """Encode an (h, w) array (dark = <128) as an XBM C source."""
    a = np.asarray(gray)
    if a.ndim == 3:
        a = a[..., 0]
    h, w = a.shape
    bits = (a.astype(np.int64) < 128).astype(np.uint8)
    packed = np.packbits(bits, axis=1, bitorder="little")
    body = ", ".join(f"0x{b:02X}" for b in packed.ravel())
    return (
        f"#define {name}_width {w}\n#define {name}_height {h}\n"
        f"static char {name}_bits[] = {{\n  {body}}};\n"
    ).encode()
