"""Baseline JFIF/JPEG codec, pure numpy + stdlib — the real DCT pipeline:
level shift → 8x8 2-D DCT → quality-scaled quantization → zigzag →
Huffman entropy coding (DC prediction, AC run/size with ZRL/EOB, byte
stuffing), and the exact inverse. Encoder writes 4:4:4 baseline SOF0
(or single-component grayscale) with the quant/Huffman tables embedded
in DQT/DHT, so ANY baseline decoder opens the output; the decoder reads
whatever tables the stream carries (it does not assume ours), supports
1- or 3-component interleaved scans with ARBITRARY sampling factors
1-4 (4:4:4, 4:2:0 — the dominant camera/web layout — 4:2:2, ...;
nearest-neighbor chroma upsampling) and restart markers, and raises
ValueError on everything else (progressive, 12-bit) — the quarantine
path.

JPEG is LOSSY, so unlike the PPM/PNG/GIF codecs the decoded pixels are
not SQL-replayable; its oracle contract is a bounded-error roundtrip
(see the multimodal_jpeg_roundtrip catalog query): solid blocks decode
near-exactly, smooth content within a small tolerance that the tests
pin. Reference parity note: the reference engine treats media as opaque
bytes; this codec is part of the training-data-pipeline extension
surface (decode farms over a 100 TB image column).
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# constant tables
# ---------------------------------------------------------------------------

# ITU-T T.81 Annex K base quantization tables (natural row-major order)
_Q_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32)

_Q_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int32)


def _zigzag_order() -> np.ndarray:
    """The 64-entry zigzag scan as natural-order indices, generated from
    the anti-diagonal rule rather than hand-typed (typo-proof)."""
    out = []
    for s in range(15):
        rows = range(max(0, s - 7), min(s, 7) + 1)
        if s % 2 == 0:
            rows = reversed(rows)  # even diagonals walk up-right
        for r in rows:
            out.append(r * 8 + (s - r))
    return np.array(out, dtype=np.int64)


_ZIGZAG = _zigzag_order()

# Annex K "typical" Huffman tables: (bits[1..16], symbol values). The
# decoder never assumes these — they are written to DHT and read back —
# so the codec's correctness is independent of the table CONTENT; the
# canonical structure (sum(bits) == len(vals)) is validated at import.
_DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
            list(range(12)))
_DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
              list(range(12)))
_AC_LUMA = ([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125], [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
])
_AC_CHROMA = ([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119], [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
])

for _bits, _vals in (_DC_LUMA, _DC_CHROMA, _AC_LUMA, _AC_CHROMA):
    assert sum(_bits) == len(_vals), "Huffman table structure invalid"

# orthonormal 8-point DCT-II basis: C[u, x] = a(u) cos((2x+1)uπ/16)
_DCT_C = np.zeros((8, 8))
for _u in range(8):
    _a = np.sqrt(0.125) if _u == 0 else 0.5
    for _x in range(8):
        _DCT_C[_u, _x] = _a * np.cos((2 * _x + 1) * _u * np.pi / 16.0)


def _dct2(block: np.ndarray) -> np.ndarray:
    return _DCT_C @ block @ _DCT_C.T


def _idct2(coef: np.ndarray) -> np.ndarray:
    return _DCT_C.T @ coef @ _DCT_C


def _quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """libjpeg's quality→scale mapping over the Annex K base tables."""
    q = min(max(int(quality), 1), 100)
    scale = 5000 // q if q < 50 else 200 - 2 * q
    out = []
    for base in (_Q_LUMA, _Q_CHROMA):
        t = (base * scale + 50) // 100
        out.append(np.clip(t, 1, 255).astype(np.int32))
    return out[0], out[1]


# ---------------------------------------------------------------------------
# bit I/O with JPEG byte stuffing
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, length: int) -> None:
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            b = (self.acc >> (self.n - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self) -> bytes:
        if self.n:
            self.write(0x7F, 8 - self.n)  # pad with 1-bits per spec
        return bytes(self.out)

    def restart(self, idx: int) -> None:
        """Byte-align (1-fill) and emit restart marker RSTn (n = idx
        mod 8) — markers sit OUTSIDE the entropy stream, so no byte
        stuffing applies to the marker itself."""
        if self.n:
            self.write(0x7F, 8 - self.n)
        self.out += bytes([0xFF, 0xD0 + (idx % 8)])


class _BitReader:
    """Entropy-segment reader: unstuffs 0xFF00, stops at markers, and
    can skip restart markers at MCU boundaries."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0

    def _fill(self) -> None:
        if self.pos >= len(self.data):
            raise ValueError("JPEG entropy data exhausted")
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1] if self.pos + 1 < len(self.data) else None
            if nxt == 0x00:
                self.pos += 2
            else:
                raise ValueError("JPEG marker inside entropy segment")
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.n += 8

    def read_bit(self) -> int:
        if self.n == 0:
            self._fill()
        self.n -= 1
        return (self.acc >> self.n) & 1

    def receive(self, length: int) -> int:
        v = 0
        for _ in range(length):
            v = (v << 1) | self.read_bit()
        return v

    def at_restart(self) -> bool:
        return (
            self.pos + 1 < len(self.data)
            and self.data[self.pos] == 0xFF
            and 0xD0 <= self.data[self.pos + 1] <= 0xD7
        )

    def skip_restart(self) -> None:
        self.acc = 0
        self.n = 0  # restart markers are byte-aligned; drop pad bits
        self.pos += 2


# ---------------------------------------------------------------------------
# canonical Huffman construction
# ---------------------------------------------------------------------------


def _build_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length), canonical JPEG assignment."""
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _build_decoder(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _huff_decode(reader: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | reader.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid JPEG Huffman code")


def _extend(v: int, size: int) -> int:
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def _category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------


def _rgb_to_ycbcr(arr: np.ndarray) -> np.ndarray:
    a = arr.astype(np.float64)
    r, g, b = a[..., 0], a[..., 1], a[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(planes: np.ndarray) -> np.ndarray:
    y, cb, cr = planes[..., 0], planes[..., 1] - 128.0, planes[..., 2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.rint(np.stack([r, g, b], axis=-1)), 0, 255).astype(np.uint8)


def _encode_blocks(
    writer: _BitWriter,
    plane: np.ndarray,
    qtbl: np.ndarray,
    dc_codes,
    ac_codes,
    pred: int,
) -> int:
    """Encode one 8x8 block of a single padded plane (called per MCU in
    the interleave loop via single-block slices). ``qtbl`` is in NATURAL
    (row-major) order — coefficients are quantized natural-order and
    only THEN zigzag-scanned (zigzag is not an involution, so dividing
    natural coefficients by a zigzag-ordered table silently applies the
    wrong step size to every AC coefficient)."""
    block = _dct2(plane - 128.0)
    coef = np.rint(block.ravel() / qtbl).astype(np.int64)
    zz = coef[_ZIGZAG]
    diff = int(zz[0]) - pred
    pred = int(zz[0])
    s = _category(diff)
    code, length = dc_codes[s]
    writer.write(code, length)
    if s:
        writer.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
    run = 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run >= 16:
            code, length = ac_codes[0xF0]  # ZRL
            writer.write(code, length)
            run -= 16
        s = _category(v)
        code, length = ac_codes[(run << 4) | s]
        writer.write(code, length)
        writer.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if run:
        code, length = ac_codes[0x00]  # EOB
        writer.write(code, length)
    return pred


def encode_jpeg(
    arr: np.ndarray,
    quality: int = 90,
    subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """Encode (h, w, 3) RGB or (h, w) grayscale uint8 as baseline JFIF:
    4:4:4 (default, no chroma subsampling), 4:2:0 (``subsampling="420"``
    — 2x2-averaged chroma, 16x16 MCUs of 4 luma + 1 Cb + 1 Cr blocks,
    the dominant real-world layout; lets property tests synthesize
    subsampled streams at arbitrary sizes) or single-component; edges
    padded by replication to MCU multiples; Annex-K tables scaled by
    ``quality`` and embedded in the stream. ``restart_interval`` > 0
    emits a DRI segment and byte-aligned RSTn markers every that many
    MCUs with DC-prediction reset — what real encoders write for
    error resilience, and the decoder's restart path's only exercise
    besides crafted streams."""
    a = np.asarray(arr, dtype=np.uint8)
    gray = a.ndim == 2
    if subsampling not in ("444", "420"):
        raise ValueError(f"unsupported subsampling {subsampling!r}")
    sub420 = subsampling == "420" and not gray
    h, w = a.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image")
    qy, qc = _quality_tables(quality)
    qy_z, qc_z = qy[_ZIGZAG], qc[_ZIGZAG]

    mcu = 16 if sub420 else 8
    ph, pw = -(-h // mcu) * mcu, -(-w // mcu) * mcu
    if gray:
        planes = a[..., None].astype(np.float64)
    else:
        planes = _rgb_to_ycbcr(a)
    padded = np.empty((ph, pw, planes.shape[-1]))
    padded[:h, :w] = planes
    padded[h:, :w] = planes[h - 1 : h, :]  # replicate edges
    padded[:, w:] = padded[:, w - 1 : w]
    if sub420:  # chroma: 2x2 box-average to half resolution
        cb = padded[..., 1].reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
        cr = padded[..., 2].reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))

    out = bytearray()
    out += b"\xff\xd8"  # SOI
    out += (b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00"
            + struct.pack(">HHBB", 1, 1, 0, 0))
    out += b"\xff\xdb" + struct.pack(">HB", 67, 0) + bytes(int(x) for x in qy_z)
    if not gray:
        out += b"\xff\xdb" + struct.pack(">HB", 67, 1) + bytes(int(x) for x in qc_z)
    ncomp = 1 if gray else 3
    sof = struct.pack(">HBHHB", 8 + 3 * ncomp, 8, h, w, ncomp)
    for c in range(ncomp):
        samp = 0x22 if (sub420 and c == 0) else 0x11
        sof += bytes([c + 1, samp, 0 if c == 0 else 1])
    out += b"\xff\xc0" + sof
    tables = [(0x00, _DC_LUMA), (0x10, _AC_LUMA)]
    if not gray:
        tables += [(0x01, _DC_CHROMA), (0x11, _AC_CHROMA)]
    for tc, (bits, vals) in tables:
        out += b"\xff\xc4" + struct.pack(">HB", 3 + 16 + len(vals), tc)
        out += bytes(bits) + bytes(vals)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    sos = struct.pack(">HB", 6 + 2 * ncomp, ncomp)
    for c in range(ncomp):
        sos += bytes([c + 1, 0x00 if c == 0 else 0x11])
    sos += b"\x00\x3f\x00"
    out += b"\xff\xda" + sos

    dc_y, ac_y = _build_codes(*_DC_LUMA), _build_codes(*_AC_LUMA)
    dc_c, ac_c = _build_codes(*_DC_CHROMA), _build_codes(*_AC_CHROMA)
    writer = _BitWriter()
    preds = [0] * ncomp
    mcu_i = 0

    def _maybe_restart() -> None:
        nonlocal mcu_i
        if restart_interval and mcu_i and mcu_i % restart_interval == 0:
            writer.restart(mcu_i // restart_interval - 1)
            preds[:] = [0] * ncomp
        mcu_i += 1

    if sub420:
        for by in range(0, ph, 16):
            for bx in range(0, pw, 16):
                _maybe_restart()
                # 4 luma blocks, v-then-h order (T.81 A.2.3), then Cb, Cr
                for bv in range(2):
                    for bh in range(2):
                        preds[0] = _encode_blocks(
                            writer,
                            padded[
                                by + bv * 8 : by + bv * 8 + 8,
                                bx + bh * 8 : bx + bh * 8 + 8, 0,
                            ],
                            qy, dc_y, ac_y, preds[0],
                        )
                cy, cx = by // 2, bx // 2
                for c, plane in ((1, cb), (2, cr)):
                    preds[c] = _encode_blocks(
                        writer, plane[cy : cy + 8, cx : cx + 8],
                        qc, dc_c, ac_c, preds[c],
                    )
    else:
        for by in range(0, ph, 8):
            for bx in range(0, pw, 8):
                _maybe_restart()
                for c in range(ncomp):
                    # NATURAL-order table here; the zigzag variants above
                    # are only for the DQT segment (which the spec stores
                    # zigzag-scanned)
                    qn = qy if c == 0 else qc
                    dc = dc_y if c == 0 else dc_c
                    ac = ac_y if c == 0 else ac_c
                    preds[c] = _encode_blocks(
                        writer, padded[by : by + 8, bx : bx + 8, c],
                        qn, dc, ac, preds[c],
                    )
    out += writer.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


def jpeg_dimensions(payload: bytes) -> tuple[int, int]:
    """(width, height) from the SOF header alone — the cheap
    metadata-sniff pass (no entropy decode; ingest shouldn't pay a full
    DCT per asset just to learn the geometry)."""
    if payload[:3] != b"\xff\xd8\xff":
        raise ValueError("not a JPEG payload")
    pos = 2
    try:
        while pos + 4 <= len(payload):
            if payload[pos] != 0xFF:
                raise ValueError("JPEG marker sync lost")
            while payload[pos + 1] == 0xFF:  # T.81 B.1.1.2 fill bytes
                pos += 1
            marker = payload[pos + 1]
            pos += 2
            if marker == 0xD8:
                continue
            if marker in (0xD9, 0xDA):
                break
            (seglen,) = struct.unpack(">H", payload[pos : pos + 2])
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                if marker not in (0xC0, 0xC1):
                    raise ValueError(
                        f"non-baseline JPEG (SOF 0x{marker:02x})"
                    )
                h, w = struct.unpack(">HH", payload[pos + 3 : pos + 7])
                return w, h
            pos += seglen
    except (struct.error, IndexError) as e:  # truncated header: the
        # parsers' contract is ValueError (quarantine, never crash)
        raise ValueError(f"truncated JPEG header: {e}") from e
    raise ValueError("JPEG without SOF header")


def decode_jpeg(payload: bytes):
    """Decode a baseline JPEG: marker walk, DQT/DHT/SOF0/SOS/DRI parsed
    from the stream, interleaved MCUs (any 1-4 sampling factors, incl.
    4:2:0) entropy-decoded with restart handling, dequantized,
    inverse-zigzagged, IDCT'd, chroma-upsampled (nearest) and color-
    converted. Returns (width, height, (h, w, 3) uint8) — grayscale
    replicated. Raises ValueError on non-baseline streams and on any
    truncated/corrupt input (never struct.error/IndexError — the
    quarantine contract)."""
    try:
        return _decode_jpeg_inner(payload)
    except (struct.error, IndexError) as e:
        raise ValueError(f"corrupt JPEG stream: {e}") from e


def _decode_jpeg_inner(payload: bytes):
    if payload[:3] != b"\xff\xd8\xff":
        raise ValueError("not a JPEG payload")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict] = {}
    sof = None
    restart_interval = 0
    while True:
        if pos + 4 > len(payload):
            raise ValueError("truncated JPEG (no SOS)")
        if payload[pos] != 0xFF:
            raise ValueError("JPEG marker sync lost")
        while payload[pos + 1] == 0xFF and pos + 4 < len(payload):
            pos += 1  # T.81 B.1.1.2: optional 0xFF fill bytes
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD8:
            continue
        (seglen,) = struct.unpack(">H", payload[pos : pos + 2])
        seg = payload[pos + 2 : pos + seglen]
        if len(seg) != seglen - 2:
            raise ValueError("truncated JPEG segment")
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0x0F
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                t = np.frombuffer(seg[p + 1 : p + 65], dtype=np.uint8)
                if len(t) != 64:
                    raise ValueError("truncated quant table")
                nat = np.zeros(64, dtype=np.int64)
                nat[_ZIGZAG] = t  # stored zigzag -> natural
                qtables[tq] = nat
                p += 65
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0x0F
                bits = list(seg[p + 1 : p + 17])
                n = sum(bits)
                vals = list(seg[p + 17 : p + 17 + n])
                if len(vals) != n:
                    raise ValueError("truncated Huffman table")
                htables[(tc, th)] = _build_decoder(bits, vals)
                p += 17 + n
        elif marker == 0xC0 or marker == 0xC1:  # baseline SOF
            prec, h, w, ncomp = seg[0], *struct.unpack(">HH", seg[1:5]), seg[5]
            if prec != 8:
                raise ValueError("only 8-bit JPEG supported")
            comps = []
            for c in range(ncomp):
                cid, samp, tq = seg[6 + 3 * c : 9 + 3 * c]
                hi, vi = samp >> 4, samp & 0x0F
                if not (1 <= hi <= 4 and 1 <= vi <= 4):
                    raise ValueError(
                        f"invalid JPEG sampling factors {hi}x{vi}"
                    )
                comps.append((cid, tq, hi, vi))
            sof = (h, w, comps)
        elif marker in (0xC2, 0xC3) or 0xC5 <= marker <= 0xCF and marker != 0xC8:
            raise ValueError(f"non-baseline JPEG (SOF 0x{marker:02x})")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS — entropy data follows
            if sof is None:
                raise ValueError("JPEG SOS before SOF")
            ns = seg[0]
            scan = []
            for c in range(ns):
                cs, tt = seg[1 + 2 * c], seg[2 + 2 * c]
                scan.append((cs, tt >> 4, tt & 0x0F))
            pos += seglen
            break
        pos += seglen

    h, w, comps = sof
    if h * w > 100_000_000:  # 100 MP sanity cap: a corrupted SOF must
        # not trigger a multi-GB allocation before entropy decode fails
        raise ValueError(f"JPEG dimensions implausible: {w}x{h}")
    if len(scan) != len(comps):
        raise ValueError("JPEG scan/frame component mismatch")
    ncomp = len(comps)
    # General sampling factors (T.81 A.2): the MCU is 8*Hmax x 8*Vmax
    # pixels; component ci contributes Hi x Vi blocks per MCU into its
    # OWN (subsampled) plane. 1x1-everything degenerates to the one-
    # block-per-MCU layout; 4:2:0 (luma 2x2) is the dominant real-world
    # camera/web layout (round-6 verdict item 4).
    hmax = max(hi for _cid, _tq, hi, _vi in comps)
    vmax = max(vi for _cid, _tq, _hi, vi in comps)
    mcux, mcuy = -(-w // (8 * hmax)), -(-h // (8 * vmax))
    cplanes = [
        np.zeros((mcuy * vi * 8, mcux * hi * 8))
        for _cid, _tq, hi, vi in comps
    ]
    reader = _BitReader(payload, pos)
    preds = [0] * ncomp
    comp_by_id = {cid: i for i, (cid, _tq, _hi, _vi) in enumerate(comps)}
    mcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu and mcu % restart_interval == 0:
                if not reader.at_restart():
                    raise ValueError("expected JPEG restart marker")
                reader.skip_restart()
                preds = [0] * ncomp
            for cs, td, ta in scan:
                ci = comp_by_id.get(cs)
                if ci is None:
                    raise ValueError("scan references unknown component")
                _cid, tq, hi, vi = comps[ci]
                qt = qtables.get(tq)
                dc = htables.get((0, td))
                ac = htables.get((1, ta))
                if qt is None or dc is None or ac is None:
                    raise ValueError("JPEG scan before its tables")
                for bv in range(vi):
                    for bh in range(hi):
                        zz = np.zeros(64, dtype=np.int64)
                        s = _huff_decode(reader, dc)
                        diff = _extend(reader.receive(s), s)
                        preds[ci] += diff
                        zz[0] = preds[ci]
                        k = 1
                        while k < 64:
                            rs = _huff_decode(reader, ac)
                            if rs == 0x00:  # EOB
                                break
                            if rs == 0xF0:  # ZRL
                                k += 16
                                continue
                            k += rs >> 4
                            if k > 63:
                                raise ValueError("JPEG AC run overflow")
                            zz[k] = _extend(
                                reader.receive(rs & 0x0F), rs & 0x0F
                            )
                            k += 1
                        coef = np.zeros(64, dtype=np.float64)
                        coef[_ZIGZAG] = zz * qt[_ZIGZAG]
                        by = (my * vi + bv) * 8
                        bx = (mx * hi + bh) * 8
                        cplanes[ci][by : by + 8, bx : bx + 8] = _idct2(
                            coef.reshape(8, 8)
                        ) + 128.0
            mcu += 1

    # assemble at full resolution: nearest-neighbor chroma upsampling
    # (index map handles any Hi/Vi vs Hmax/Vmax ratio, integral or not)
    planes = np.empty((h, w, ncomp))
    for ci, (_cid, _tq, hi, vi) in enumerate(comps):
        yy = (np.arange(h) * vi) // vmax
        xx = (np.arange(w) * hi) // hmax
        planes[..., ci] = cplanes[ci][np.ix_(yy, xx)]
    if ncomp == 1:
        y = np.clip(np.rint(planes[..., 0]), 0, 255).astype(np.uint8)
        return w, h, np.repeat(y[..., None], 3, axis=2)
    if ncomp != 3:
        raise ValueError(f"unsupported JPEG component count {ncomp}")
    return w, h, _ycbcr_to_rgb(planes)
