"""JFIF/JPEG codec, pure numpy + stdlib — the real DCT pipeline:
level shift → 8x8 2-D DCT → quality-scaled quantization → zigzag →
Huffman entropy coding (DC prediction, AC run/size with ZRL/EOB, byte
stuffing), and the exact inverse. Encoder writes baseline SOF0 (4:4:4,
4:2:0, 4:2:2, 4:4:0, 4:1:1 or single-component grayscale) or
progressive SOF2 (spectral
selection + successive approximation over a scan script, T.81 Annex G)
with the quant/Huffman tables embedded in DQT/DHT, so ANY decoder opens
the output; the decoder reads whatever tables the stream carries (it
does not assume ours), supports 1- or 3-component interleaved baseline
scans with ARBITRARY sampling factors 1-4 (4:4:4, 4:2:0 — the dominant
camera/web layout — 4:2:2, ...; nearest-neighbor chroma upsampling),
multi-scan PROGRESSIVE streams (DC/AC first + refinement scans, EOB
runs — the dominant WEB delivery layout) and restart markers in both
modes, and raises ValueError on everything else (hierarchical,
arithmetic-coded, 12-bit) — the quarantine path.

Progressive transmission is a lossless REORDERING of the same quantized
coefficients, so a progressive encode decodes bit-exactly equal to the
baseline encode at the same quality — the property the tests pin.

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


def _encode_block_zz(
    writer: _BitWriter,
    zz: np.ndarray,
    dc_codes,
    ac_codes,
    pred: int,
) -> int:
    """Entropy-code one block's precomputed quantized ZIGZAG
    coefficients (from ``_dct_coef_grid`` — which quantizes in NATURAL
    order and only THEN zigzag-scans; zigzag is not an involution, so
    dividing natural coefficients by a zigzag-ordered table silently
    applies the wrong step size to every AC coefficient). Both encode
    passes of ``optimize_huffman`` and the plain single pass all pull
    from the same grid, so the DCT runs exactly once per block."""
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


class _CountingCodes(dict):
    """Stand-in Huffman code table for the statistics pass of 2-pass
    (``optimize_huffman``) encoding: every lookup counts the symbol and
    returns a dummy 1-bit code into a throwaway writer. The extra-bit
    writes that follow each symbol don't consult the table, so the same
    scan loop serves both passes."""

    def __init__(self):
        super().__init__()
        self.counts: dict[int, int] = {}

    def __getitem__(self, sym):
        self.counts[sym] = self.counts.get(sym, 0) + 1
        return (0, 1)


def _optimal_table(counts: dict[int, int], alphabet: int):
    """Optimal length-limited Huffman table from symbol frequencies —
    T.81 Annex K.2's procedure (libjpeg's jpeg_gen_optimal_table): a
    reserved pseudo-symbol of frequency 1 claims the all-1s codeword
    the spec forbids, pairwise merges accumulate code sizes, sizes past
    16 are folded down (Figure K.10's adjustment), and the reserved
    symbol's code is dropped at the end. Returns (bits[16], huffval) in
    the DHT wire layout. Any canonical ≤16-bit prefix code is a LEGAL
    table (DHT carries it), so decodability does not depend on
    reproducing libjpeg's tie-breaks — only optimality does."""
    nsym = alphabet + 1  # + reserved
    freq = [0] * nsym
    for s, c in counts.items():
        freq[s] = c
    freq[alphabet] = 1
    codesize = [0] * nsym
    others = [-1] * nsym
    while True:
        # two least-frequent live symbols; ties → larger symbol value
        # (the spec's rule — keeps long codes on rare symbols)
        v1 = v2 = -1
        f1 = f2 = None
        for i, f in enumerate(freq):
            if f <= 0:
                continue
            if f1 is None or f <= f1:
                v2, f2 = v1, f1
                v1, f1 = i, f
            elif f2 is None or f <= f2:
                v2, f2 = i, f
        if v2 < 0:
            break  # one tree left
        freq[v1] += freq[v2]
        freq[v2] = 0
        codesize[v1] += 1
        while others[v1] >= 0:
            v1 = others[v1]
            codesize[v1] += 1
        others[v1] = v2
        codesize[v2] += 1
        while others[v2] >= 0:
            v2 = others[v2]
            codesize[v2] += 1
    bits = [0] * 33
    for cs in codesize:
        if cs:
            if cs > 32:
                raise ValueError("JPEG Huffman code size overflow")
            bits[cs] += 1
    for i in range(32, 16, -1):  # fold sizes 17..32 down to <=16
        while bits[i] > 0:
            j = i - 2
            while bits[j] == 0:
                j -= 1
            bits[i] -= 2
            bits[i - 1] += 1
            bits[j + 1] += 2
            bits[j] -= 1
    i = 16
    while bits[i] == 0 and i > 0:
        i -= 1
    if i:
        bits[i] -= 1  # drop the reserved symbol's (longest) code
    vals = sorted(
        (s for s in range(alphabet) if codesize[s]),
        key=lambda s: (codesize[s], s),
    )
    return bits[1:17], vals


def _write_jpeg_headers(
    sof_marker, h, w, gray, fh, fv, qy_z, qc_z, tables, restart_interval
) -> bytearray:
    """SOI/APP0/DQT/SOF/DHT/DRI prelude shared by the baseline and
    progressive encoders — only the SOF marker and the DHT table set
    differ between the two."""
    ncomp = 1 if gray else 3
    out = bytearray()
    out += b"\xff\xd8"  # SOI
    out += (
        b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00"
        + struct.pack(">HHBB", 1, 1, 0, 0)
    )
    out += b"\xff\xdb" + struct.pack(">HB", 67, 0) + bytes(int(x) for x in qy_z)
    if not gray:
        out += b"\xff\xdb" + struct.pack(">HB", 67, 1) + bytes(int(x) for x in qc_z)
    sof = struct.pack(">HBHHB", 8 + 3 * ncomp, 8, h, w, ncomp)
    for c in range(ncomp):
        samp = ((fh << 4) | fv) if c == 0 else 0x11
        sof += bytes([c + 1, samp, 0 if c == 0 else 1])
    out += sof_marker + sof
    for tc, (bits, vals) in tables:
        out += b"\xff\xc4" + struct.pack(">HB", 3 + 16 + len(vals), tc)
        out += bytes(bits) + bytes(vals)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    return out


def _validate_scan_script(scans, ncomp) -> None:
    """Reject spec-illegal scan scripts at ENCODE time (T.81 G.1):
    silent acceptance would persist payloads strict external decoders
    flag (libjpeg's JWRN_BOGUS_PROGRESSION) into a media lake with no
    error at write time. Checks each scan's shape AND the cross-scan
    progression rules (G.1.1.1.1): a component's DC scan precedes its
    AC scans, every coefficient's first scan has Ah=0, refinements
    descend one bit plane at a time from the prior Al, and no band is
    first-transmitted twice."""
    # cur_al[c][k]: None until coefficient k of component c is first
    # coded, then the Al its approximation currently sits at
    cur_al: list[list] = [[None] * 64 for _ in range(ncomp)]
    for comp_list, ss, se, ahi, alo in scans:
        if not comp_list or any(
            not 0 <= c < ncomp for c in comp_list
        ) or len(set(comp_list)) != len(comp_list):
            raise ValueError(f"scan script: bad component list {comp_list}")
        if ss == 0:
            if se != 0:
                raise ValueError("scan script: DC scan needs Se=0")
        elif len(comp_list) != 1:
            raise ValueError("scan script: AC scan must be single-component")
        elif not 1 <= ss <= se <= 63:
            raise ValueError(f"scan script: bad band {ss}..{se}")
        if not (0 <= alo <= 13 and (ahi == 0 or ahi == alo + 1)):
            raise ValueError(
                f"scan script: bad successive approximation {ahi}/{alo}"
            )
        for c in comp_list:
            if ss > 0 and cur_al[c][0] is None:
                raise ValueError(
                    f"scan script: AC scan before DC scan for component {c}"
                )
            for k in range(ss, se + 1):
                if ahi == 0:
                    if cur_al[c][k] is not None:
                        raise ValueError(
                            f"scan script: coefficient {k} of component "
                            f"{c} first-transmitted twice"
                        )
                elif cur_al[c][k] != ahi:
                    raise ValueError(
                        f"scan script: refinement Ah={ahi} of coefficient "
                        f"{k} of component {c} does not continue from "
                        f"{cur_al[c][k]}"
                    )
                cur_al[c][k] = alo
    for c in range(ncomp):
        if cur_al[c][0] is None:
            raise ValueError(f"scan script: component {c} has no DC scan")


def encode_jpeg(
    arr: np.ndarray,
    quality: int = 90,
    subsampling: str = "444",
    restart_interval: int = 0,
    progressive: bool = False,
    scan_script=None,
    optimize_huffman: bool = False,
) -> bytes:
    """Encode (h, w, 3) RGB or (h, w) grayscale uint8 as baseline JFIF:
    4:4:4 (default, no chroma subsampling), 4:2:0 (``"420"`` —
    2x2-averaged chroma, 16x16 MCUs of 4 luma + 1 Cb + 1 Cr blocks, the
    dominant real-world layout), 4:2:2 (``"422"`` — horizontally-halved
    chroma, 16x8 MCUs, the broadcast/intermediate layout), 4:4:0
    (``"440"`` — vertically-halved chroma) and 4:1:1 (``"411"`` —
    quarter-width chroma, 32x8 MCUs, the DV-camera layout; together
    they sweep the decoder's general Hi x Vi path over non-square and
    non-power-of-two-ratio grids at arbitrary sizes) or
    single-component; edges
    padded by replication to MCU multiples; Annex-K tables scaled by
    ``quality`` and embedded in the stream. ``restart_interval`` > 0
    emits a DRI segment and byte-aligned RSTn markers every that many
    MCUs with DC-prediction reset — what real encoders write for
    error resilience, and the decoder's restart path's only exercise
    besides crafted streams. ``progressive=True`` writes SOF2 with a
    libjpeg-style scan script (or a custom ``scan_script``: a list of
    ``(component_tuple, Ss, Se, Ah, Al)``) — the same quantized
    coefficients as the baseline stream, reordered, so both decode
    bit-exactly equal. ``optimize_huffman=True`` runs the 2-pass
    statistics encode (T.81 K.2): frequency-optimal length-limited
    tables replace the Annex-K defaults (baseline) or the generic
    256-symbol AC table (progressive) — what real encoders emit, and
    a pure entropy-layer change, so the decode stays bit-identical."""
    a = np.asarray(arr, dtype=np.uint8)
    gray = a.ndim == 2
    factors = {
        "444": (1, 1), "420": (2, 2), "422": (2, 1),
        "440": (1, 2), "411": (4, 1),
    }.get(subsampling)
    if factors is None:
        raise ValueError(f"unsupported subsampling {subsampling!r}")
    fh, fv = (1, 1) if gray else factors  # luma sampling factors
    subsampled = (fh, fv) != (1, 1)
    h, w = a.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image")
    qy, qc = _quality_tables(quality)
    qy_z, qc_z = qy[_ZIGZAG], qc[_ZIGZAG]

    mcuw, mcuh = 8 * fh, 8 * fv
    ph, pw = -(-h // mcuh) * mcuh, -(-w // mcuw) * mcuw
    if gray:
        planes = a[..., None].astype(np.float64)
    else:
        planes = _rgb_to_ycbcr(a)
    padded = np.empty((ph, pw, planes.shape[-1]))
    padded[:h, :w] = planes
    padded[h:, :w] = planes[h - 1 : h, :]  # replicate edges
    padded[:, w:] = padded[:, w - 1 : w]
    if subsampled:  # chroma: fv x fh box-average to subsampled resolution
        cb = padded[..., 1].reshape(ph // fv, fv, pw // fh, fh).mean(axis=(1, 3))
        cr = padded[..., 2].reshape(ph // fv, fv, pw // fh, fh).mean(axis=(1, 3))

    if progressive:
        ncomp = 1 if gray else 3
        if subsampled:
            grids = [
                _dct_coef_grid(padded[..., 0], qy),
                _dct_coef_grid(cb, qc),
                _dct_coef_grid(cr, qc),
            ]
            samp = {0: (fh, fv), 1: (1, 1), 2: (1, 1)}
            hmax, vmax = fh, fv
        else:
            grids = [
                _dct_coef_grid(padded[..., c], qy if c == 0 else qc)
                for c in range(ncomp)
            ]
            samp = {c: (1, 1) for c in range(ncomp)}
            hmax = vmax = 1
        mcux = -(-w // (8 * hmax))
        mcuy = -(-h // (8 * vmax))
        scans = scan_script
        if scans is None:
            scans = _PROG_SCRIPT_GRAY if gray else _PROG_SCRIPT_COLOR
        _validate_scan_script(scans, ncomp)
        if optimize_huffman:  # statistics pass over ALL scans
            cdy, cdc, cac = (_CountingCodes() for _ in range(3))
            cnt_dc_by_comp = {c: (cdy if c == 0 else cdc)
                              for c in range(ncomp)}
            for comp_list, ss, se, ahi, alo in scans:
                _encode_prog_scan(
                    grids, comp_list, ss, se, ahi, alo, samp, mcux,
                    mcuy, w, h, hmax, vmax, restart_interval,
                    cnt_dc_by_comp, cac,
                )
            t_dc_y = _optimal_table(cdy.counts, 12)
            t_dc_c = _optimal_table(cdc.counts, 12)
            # a DC-only script counts no AC symbols; keep the generic
            # table rather than emitting a zero-symbol DHT some strict
            # validators reject
            t_ac = (
                _optimal_table(cac.counts, 256)
                if cac.counts else _AC_GENERIC
            )
        else:
            t_dc_y, t_dc_c, t_ac = _DC_LUMA, _DC_CHROMA, _AC_GENERIC
        tables = [(0x00, t_dc_y), (0x10, t_ac)]
        if not gray:
            tables.append((0x01, t_dc_c))
        out = _write_jpeg_headers(
            b"\xff\xc2", h, w, gray, fh, fv, qy_z, qc_z, tables,
            restart_interval,
        )  # SOF2: progressive DCT
        dc_codes_by_comp = {
            c: _build_codes(*(t_dc_y if c == 0 else t_dc_c))
            for c in range(ncomp)
        }
        ac_codes = _build_codes(*t_ac)
        for comp_list, ss, se, ahi, alo in scans:
            sos = struct.pack(
                ">HB", 6 + 2 * len(comp_list), len(comp_list)
            )
            for c in comp_list:
                sos += bytes([c + 1, ((0 if c == 0 else 1) << 4) | 0])
            sos += bytes([ss, se, (ahi << 4) | alo])
            out += b"\xff\xda" + sos
            out += _encode_prog_scan(
                grids, comp_list, ss, se, ahi, alo, samp, mcux, mcuy,
                w, h, hmax, vmax, restart_interval, dc_codes_by_comp,
                ac_codes,
            )
        out += b"\xff\xd9"
        return bytes(out)

    ncomp = 1 if gray else 3
    # Quantized coefficient grids, computed ONCE (shared by both passes
    # of optimize_huffman, and the same derivation the progressive
    # branch uses). NATURAL-order tables here; the zigzag variants are
    # only for the DQT segment (which the spec stores zigzag-scanned).
    if gray:
        base_grids = [_dct_coef_grid(padded[..., 0], qy)]
    elif subsampled:
        base_grids = [
            _dct_coef_grid(padded[..., 0], qy),
            _dct_coef_grid(cb, qc),
            _dct_coef_grid(cr, qc),
        ]
    else:
        base_grids = [
            _dct_coef_grid(padded[..., c], qy if c == 0 else qc)
            for c in range(3)
        ]

    def scan_pass(writer, dc_y, ac_y, dc_c, ac_c):
        """One interleaved-scan emission: identical loop for the
        statistics pass (counting tables + throwaway writer) and the
        real pass."""
        preds = [0] * ncomp
        mcu_i = 0

        def _maybe_restart() -> None:
            nonlocal mcu_i
            if restart_interval and mcu_i and mcu_i % restart_interval == 0:
                writer.restart(mcu_i // restart_interval - 1)
                preds[:] = [0] * ncomp
            mcu_i += 1

        if subsampled:
            for my in range(ph // mcuh):
                for mx in range(pw // mcuw):
                    _maybe_restart()
                    # fh*fv luma blocks, v-then-h order (T.81 A.2.3),
                    # then one Cb and one Cr block
                    for bv in range(fv):
                        for bh in range(fh):
                            preds[0] = _encode_block_zz(
                                writer,
                                base_grids[0][my * fv + bv, mx * fh + bh],
                                dc_y, ac_y, preds[0],
                            )
                    for c in (1, 2):
                        preds[c] = _encode_block_zz(
                            writer, base_grids[c][my, mx],
                            dc_c, ac_c, preds[c],
                        )
        else:
            for by in range(ph // 8):
                for bx in range(pw // 8):
                    _maybe_restart()
                    for c in range(ncomp):
                        preds[c] = _encode_block_zz(
                            writer, base_grids[c][by, bx],
                            dc_y if c == 0 else dc_c,
                            ac_y if c == 0 else ac_c,
                            preds[c],
                        )

    if optimize_huffman:  # statistics pass → frequency-optimal tables
        cdy, cay, cdc, cac = (_CountingCodes() for _ in range(4))
        scan_pass(_BitWriter(), cdy, cay, cdc, cac)
        t_dc_y = _optimal_table(cdy.counts, 12)
        t_ac_y = _optimal_table(cay.counts, 256)
        t_dc_c = _optimal_table(cdc.counts, 12)
        t_ac_c = _optimal_table(cac.counts, 256)
    else:
        t_dc_y, t_ac_y = _DC_LUMA, _AC_LUMA
        t_dc_c, t_ac_c = _DC_CHROMA, _AC_CHROMA
    tables = [(0x00, t_dc_y), (0x10, t_ac_y)]
    if not gray:
        tables += [(0x01, t_dc_c), (0x11, t_ac_c)]
    out = _write_jpeg_headers(
        b"\xff\xc0", h, w, gray, fh, fv, qy_z, qc_z, tables,
        restart_interval,
    )  # SOF0: baseline DCT
    sos = struct.pack(">HB", 6 + 2 * ncomp, ncomp)
    for c in range(ncomp):
        sos += bytes([c + 1, 0x00 if c == 0 else 0x11])
    sos += b"\x00\x3f\x00"
    out += b"\xff\xda" + sos

    writer = _BitWriter()
    scan_pass(
        writer,
        _build_codes(*t_dc_y), _build_codes(*t_ac_y),
        _build_codes(*t_dc_c), _build_codes(*t_ac_c),
    )
    out += writer.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# progressive encoder (T.81 Annex G) — transmits the SAME quantized
# coefficients as the baseline path, reordered by a scan script of
# spectral bands and successive-approximation bit planes, so the decode
# is bit-exactly the baseline decode.
# ---------------------------------------------------------------------------

# Generic AC Huffman table covering ALL 256 run/size symbols at 8 or 9
# bits (canonical: codes 0..127 at length 8, 256..383 at length 9) —
# progressive AC-first scans emit EOBn symbols (r<<4, r<15) that the
# Annex-K baseline tables lack. Inefficient but valid; table content is
# carried in DHT, so any decoder reads it back.
_AC_GENERIC = (
    [0, 0, 0, 0, 0, 0, 0, 128, 128, 0, 0, 0, 0, 0, 0, 0],
    list(range(256)),
)

# libjpeg-style standard scripts: DC first at Al=1, luma low band early,
# chroma full-band, then the AC/DC refinement passes down to Al=0.
_PROG_SCRIPT_COLOR = [
    ((0, 1, 2), 0, 0, 0, 1),
    ((0,), 1, 5, 0, 2),
    ((2,), 1, 63, 0, 1),
    ((1,), 1, 63, 0, 1),
    ((0,), 6, 63, 0, 2),
    ((0,), 1, 63, 2, 1),
    ((0, 1, 2), 0, 0, 1, 0),
    ((2,), 1, 63, 1, 0),
    ((1,), 1, 63, 1, 0),
    ((0,), 1, 63, 1, 0),
]
_PROG_SCRIPT_GRAY = [
    ((0,), 0, 0, 0, 1),
    ((0,), 1, 5, 0, 2),
    ((0,), 6, 63, 0, 2),
    ((0,), 1, 63, 2, 1),
    ((0,), 0, 0, 1, 0),
    ((0,), 1, 63, 1, 0),
]


def _dct_coef_grid(plane: np.ndarray, qtbl: np.ndarray) -> np.ndarray:
    """Quantized ZIGZAG coefficients for every 8x8 block of a padded
    plane — (bh, bw, 64) int64, BIT-IDENTICAL math to the baseline
    path (the same per-block ``_dct2`` matmul expression, rint divide
    by the NATURAL-order table, zigzag scan), so progressive
    transmission is a pure reordering of identical data. A batched
    einsum is NOT equivalent: it sums in a different float order, and
    a last-ulp difference flips ``rint`` at a coefficient landing on a
    .5 boundary — one quant step of divergence (caught by the
    hypothesis sweep at 26x38 q=94)."""
    bh, bw = plane.shape[0] // 8, plane.shape[1] // 8
    out = np.empty((bh, bw, 64), dtype=np.int64)
    for by in range(bh):
        for bx in range(bw):
            block = _dct2(plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - 128.0)
            out[by, bx] = np.rint(block.ravel() / qtbl).astype(np.int64)
    return out[..., _ZIGZAG]


class _ProgScanState:
    """Deferred EOB run + the correction bits that ride with it."""

    __slots__ = ("eobrun", "bits")

    def __init__(self):
        self.eobrun = 0
        self.bits: list[int] = []


def _flush_eob(writer, ac_codes, st) -> None:
    if st.eobrun:
        r = st.eobrun.bit_length() - 1
        code, ln = ac_codes[r << 4]
        writer.write(code, ln)
        if r:
            writer.write(st.eobrun - (1 << r), r)
        st.eobrun = 0
    for b in st.bits:
        writer.write(b, 1)
    st.bits = []


def _enc_ac_first(writer, ac_codes, blk, ss, se, al, st) -> None:
    """AC FIRST scan, one block (G.1.2.2): run/size over the band with
    the point transform (magnitude shifted right by al, truncation
    toward zero) and cross-block EOB-run accumulation."""
    r = 0
    for k in range(ss, se + 1):
        v = int(blk[k])
        t = abs(v) >> al
        if t == 0:
            r += 1
            continue
        _flush_eob(writer, ac_codes, st)
        while r > 15:
            code, ln = ac_codes[0xF0]
            writer.write(code, ln)
            r -= 16
        s = t.bit_length()
        code, ln = ac_codes[(r << 4) | s]
        writer.write(code, ln)
        writer.write(t if v > 0 else (~t) & ((1 << s) - 1), s)
        r = 0
    if r:
        st.eobrun += 1
        if st.eobrun == 0x7FFF:  # EOB14's ceiling
            _flush_eob(writer, ac_codes, st)


def _enc_ac_refine(writer, ac_codes, blk, ss, se, al, st) -> None:
    """AC REFINEMENT scan, one block (G.1.2.3): ±1 bit-plane additions
    for newly-nonzero coefficients positioned by zero-history runs;
    already-nonzero coefficients contribute buffered correction bits
    that trail the next emitted symbol (or ride with the EOB run)."""
    absv = [abs(int(blk[k])) >> al for k in range(ss, se + 1)]
    eob = ss - 1  # last NEWLY-nonzero index; runs beyond it fold
    for i, t in enumerate(absv):  # into the EOB run
        if t == 1:
            eob = ss + i
    r = 0
    br: list[int] = []
    for k in range(ss, se + 1):
        t = absv[k - ss]
        if t == 0:
            r += 1
            continue
        while r > 15 and k <= eob:
            _flush_eob(writer, ac_codes, st)
            code, ln = ac_codes[0xF0]
            writer.write(code, ln)
            r -= 16
            for b in br:
                writer.write(b, 1)
            br = []
        if t > 1:  # nonzero history: correction bit only, no run entry
            br.append(t & 1)
            continue
        _flush_eob(writer, ac_codes, st)
        code, ln = ac_codes[(r << 4) | 1]
        writer.write(code, ln)
        writer.write(1 if int(blk[k]) > 0 else 0, 1)
        for b in br:
            writer.write(b, 1)
        br = []
        r = 0
    if r or br:
        st.eobrun += 1
        st.bits.extend(br)
        if st.eobrun == 0x7FFF:
            _flush_eob(writer, ac_codes, st)


def _encode_prog_scan(
    grids, comp_list, ss, se, ah, al, samp, mcux, mcuy, w, h, hmax,
    vmax, restart_interval, dc_codes_by_comp, ac_codes,
):
    """Entropy segment for one progressive scan — the mirror of
    ``_progressive_scan``'s traversal (interleaved MCU grid for
    multi-component DC scans, the component's own block grid
    otherwise)."""
    writer = _BitWriter()
    st = _ProgScanState()
    interleaved = len(comp_list) > 1
    is_dc = ss == 0
    if interleaved:
        nmcu = mcux * mcuy
    else:
        hi0, vi0 = samp[comp_list[0]]
        bw_n, bh_n = _noninterleaved_blocks(w, h, hi0, vi0, hmax, vmax)
        nmcu = bw_n * bh_n
    preds = {c: 0 for c in comp_list}
    rst = 0
    for m in range(nmcu):
        if restart_interval and m and m % restart_interval == 0:
            _flush_eob(writer, ac_codes, st)
            writer.restart(rst)
            rst += 1
            preds = {c: 0 for c in comp_list}
        for c in comp_list:
            hi, vi = samp[c]
            if interleaved:
                my, mx = divmod(m, mcux)
                blocks = [
                    (my * vi + bv, mx * hi + bh)
                    for bv in range(vi)
                    for bh in range(hi)
                ]
            else:
                blocks = [divmod(m, bw_n)]
            for by, bx in blocks:
                blk = grids[c][by, bx]
                if is_dc:
                    if ah == 0:
                        v = int(blk[0]) >> al  # G.1.2.1: arithmetic shift
                        diff = v - preds[c]
                        preds[c] = v
                        s = _category(diff)
                        code, ln = dc_codes_by_comp[c][s]
                        writer.write(code, ln)
                        if s:
                            writer.write(
                                diff if diff >= 0 else diff + (1 << s) - 1,
                                s,
                            )
                    else:  # DC refinement: one raw magnitude bit
                        writer.write((int(blk[0]) >> al) & 1, 1)
                elif ah == 0:
                    _enc_ac_first(writer, ac_codes, blk, ss, se, al, st)
                else:
                    _enc_ac_refine(writer, ac_codes, blk, ss, se, al, st)
    _flush_eob(writer, ac_codes, st)
    return writer.flush()


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
                if marker not in (0xC0, 0xC1, 0xC2):
                    raise ValueError(
                        f"unsupported JPEG (SOF 0x{marker:02x})"
                    )
                h, w = struct.unpack(">HH", payload[pos + 3 : pos + 7])
                return w, h
            pos += seglen
    except (struct.error, IndexError) as e:  # truncated header: the
        # parsers' contract is ValueError (quarantine, never crash)
        raise ValueError(f"truncated JPEG header: {e}") from e
    raise ValueError("JPEG without SOF header")


def decode_jpeg(payload: bytes):
    """Decode a baseline (SOF0/1) or progressive (SOF2) JPEG: marker
    walk, DQT/DHT/SOF/SOS/DRI parsed from the stream; baseline
    interleaved MCUs (any 1-4 sampling factors, incl. 4:2:0) or
    progressive multi-scan coefficient accumulation (spectral
    selection, successive approximation, EOB runs — T.81 Annex G)
    entropy-decoded with restart handling, dequantized,
    inverse-zigzagged, IDCT'd, chroma-upsampled (nearest) and color-
    converted. Returns (width, height, (h, w, 3) uint8) — grayscale
    replicated. Raises ValueError on hierarchical/arithmetic/12-bit
    streams and on any truncated/corrupt input (never
    struct.error/IndexError — the quarantine contract)."""
    try:
        return _decode_jpeg_inner(payload)
    except (struct.error, IndexError) as e:
        raise ValueError(f"corrupt JPEG stream: {e}") from e


def _next_marker(payload: bytes, pos: int) -> int:
    """Offset of the next marker at/after ``pos`` (the 0xFF byte),
    skipping entropy pad bytes, stuffed 0xFF00 pairs and stray restart
    markers — how the walk re-syncs after a progressive scan's entropy
    segment (B.1.1.2 permits fill bytes before any marker)."""
    while pos + 1 < len(payload):
        if (
            payload[pos] == 0xFF
            and payload[pos + 1] != 0x00
            and not (0xD0 <= payload[pos + 1] <= 0xD7)
        ):
            return pos
        pos += 1
    raise ValueError("JPEG truncated after scan")


def _ac_first_block(reader, ac, blk, ss, se, al, eobrun):
    """One block of a progressive AC FIRST scan (T.81 G.2.2): band
    [ss..se] run/size decoding with the point transform applied
    (values arrive shifted left by ``al``) and EOB-run skips. Returns
    the remaining EOB run."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = _huff_decode(reader, ac)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:  # ZRL: sixteen zero coefficients
                k += 16
                continue
            eobrun = (1 << r) - 1  # EOBn: this block ends the band and
            if r:  # starts a run of (1<<r)+ext blocks (itself included)
                eobrun += reader.receive(r)
            break
        k += r
        if k > se:
            raise ValueError("JPEG AC run overflow")
        blk[k] = _extend(reader.receive(s), s) << al
        k += 1
    return eobrun


def _ac_refine_block(reader, ac, blk, ss, se, al, eobrun):
    """One block of a progressive AC REFINEMENT scan (T.81 G.2.3): a
    correction bit per already-nonzero coefficient, interleaved with
    runs that position newly-nonzero ±1<<al values; zero-history runs
    count only zero coefficients. Returns the remaining EOB run (whose
    blocks still carry correction bits, read in the tail)."""
    p1 = 1 << al
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = _huff_decode(reader, ac)
            r, s = rs >> 4, rs & 0x0F
            newval = 0
            if s == 0:
                if r != 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += reader.receive(r)
                    break
                # r == 15: ZRL — pass 16 zero-history coefficients
            elif s == 1:
                newval = p1 if reader.read_bit() else -p1
            else:
                raise ValueError("invalid JPEG AC refinement magnitude")
            while k <= se:
                v = int(blk[k])
                if v != 0:
                    if reader.read_bit() and (abs(v) & p1) == 0:
                        blk[k] = v + (p1 if v > 0 else -p1)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if newval and k <= se:
                blk[k] = newval
            k += 1
    if eobrun > 0:
        while k <= se:  # correction bits for the rest of the band
            v = int(blk[k])
            if v != 0:
                if reader.read_bit() and (abs(v) & p1) == 0:
                    blk[k] = v + (p1 if v > 0 else -p1)
            k += 1
        eobrun -= 1
    return eobrun


def _noninterleaved_blocks(w, h, hi, vi, hmax, vmax):
    """(block_cols, block_rows) of a component's OWN grid — what a
    single-component (non-interleaved) scan traverses (T.81 A.2.2:
    ceil of the effective component dimensions, NOT the MCU-padded
    grid the interleaved layout uses)."""
    cw, ch = -(-w * hi // hmax), -(-h * vi // vmax)
    return -(-cw // 8), -(-ch // 8)


def _progressive_scan(
    payload, pos, scan, ss, se, ah, al, comps, comp_by_id, coefs,
    htables, restart_interval, mcux, mcuy, hmax, vmax, w, h,
):
    """Decode one SOF2 scan's entropy segment into the per-component
    zigzag coefficient planes; returns the payload offset where the
    entropy data ended. DC scans (ss==se==0) may be interleaved over
    the frame MCU grid or single-component; AC scans are always
    single-component over the component's own block grid."""
    ns = len(scan)
    is_dc = ss == 0
    if is_dc and se != 0:
        raise ValueError("JPEG progressive DC scan needs Se=0")
    if not is_dc and (ns != 1 or se < ss or se > 63):
        raise ValueError("JPEG bad progressive AC scan header")
    members = []
    for cs, td, ta in scan:
        ci = comp_by_id.get(cs)
        if ci is None:
            raise ValueError("scan references unknown component")
        _cid, _tq, hi, vi = comps[ci]
        tbl = None
        if is_dc and ah == 0:
            tbl = htables.get((0, td))
        elif not is_dc:
            tbl = htables.get((1, ta))
        if tbl is None and not (is_dc and ah != 0):
            raise ValueError("JPEG scan before its tables")
        members.append((ci, hi, vi, tbl))
    interleaved = ns > 1
    if interleaved:
        nmcu = mcux * mcuy
    else:
        ci0, hi0, vi0, _t = members[0]
        bw_n, bh_n = _noninterleaved_blocks(w, h, hi0, vi0, hmax, vmax)
        nmcu = bw_n * bh_n
    reader = _BitReader(payload, pos)
    preds = [0] * len(comps)
    eobrun = 0
    for m in range(nmcu):
        if restart_interval and m and m % restart_interval == 0:
            if not reader.at_restart():
                raise ValueError("expected JPEG restart marker")
            reader.skip_restart()
            preds = [0] * len(comps)
            eobrun = 0
        for ci, hi, vi, tbl in members:
            if interleaved:
                my, mx = divmod(m, mcux)
                blocks = [
                    (my * vi + bv, mx * hi + bh)
                    for bv in range(vi)
                    for bh in range(hi)
                ]
            else:
                blocks = [divmod(m, bw_n)]
            for by, bx in blocks:
                blk = coefs[ci][by, bx]
                if is_dc:
                    if ah == 0:
                        s = _huff_decode(reader, tbl)
                        if s > 11:  # T.81 F.1.2.1: 8-bit DC categories 0-11
                            raise ValueError("JPEG DC category out of range")
                        preds[ci] += _extend(reader.receive(s), s)
                        blk[0] = preds[ci] << al
                    elif reader.read_bit():
                        # appending one magnitude bit commutes with the
                        # sign in two's complement: OR into bit ``al``
                        blk[0] = int(blk[0]) | (1 << al)
                elif ah == 0:
                    eobrun = _ac_first_block(
                        reader, tbl, blk, ss, se, al, eobrun
                    )
                else:
                    eobrun = _ac_refine_block(
                        reader, tbl, blk, ss, se, al, eobrun
                    )
    return reader.pos


def _decode_jpeg_inner(payload: bytes):
    if payload[:3] != b"\xff\xd8\xff":
        raise ValueError("not a JPEG payload")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict] = {}
    sof = None
    progressive = False
    restart_interval = 0
    coefs = None  # progressive: per-component zigzag coefficient grids
    geom_done = False  # frame geometry locals fixed at the first scan
    while True:
        if pos + 2 > len(payload):
            raise ValueError("truncated JPEG (no SOS)")
        if payload[pos] != 0xFF:
            raise ValueError("JPEG marker sync lost")
        while payload[pos + 1] == 0xFF and pos + 4 < len(payload):
            pos += 1  # T.81 B.1.1.2: optional 0xFF fill bytes
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD8:
            continue
        if marker == 0xD9:  # EOI terminates a progressive scan sequence
            if coefs is not None:
                break
            raise ValueError("JPEG EOI before scan data")
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
        elif marker in (0xC0, 0xC1, 0xC2):  # baseline / progressive SOF
            progressive = marker == 0xC2
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
        elif marker == 0xC3 or 0xC5 <= marker <= 0xCF and marker != 0xC8:
            raise ValueError(f"unsupported JPEG (SOF 0x{marker:02x})")
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
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ah, al = seg[3 + 2 * ns] >> 4, seg[3 + 2 * ns] & 0x0F
            pos += seglen
            if not geom_done:
                h, w, comps = sof
                if h * w > 100_000_000:  # 100 MP sanity cap: a
                    # corrupted SOF must not trigger a multi-GB
                    # allocation before entropy decode fails
                    raise ValueError(
                        f"JPEG dimensions implausible: {w}x{h}"
                    )
                # General sampling factors (T.81 A.2): the MCU is
                # 8*Hmax x 8*Vmax pixels; component ci contributes
                # Hi x Vi blocks per MCU into its OWN (subsampled)
                # plane. 1x1-everything degenerates to the one-block-
                # per-MCU layout; 4:2:0 (luma 2x2) is the dominant
                # real-world camera/web layout.
                hmax = max(hi for _cid, _tq, hi, _vi in comps)
                vmax = max(vi for _cid, _tq, _hi, vi in comps)
                mcux, mcuy = -(-w // (8 * hmax)), -(-h // (8 * vmax))
                geom_done = True
                comp_by_id = {
                    cid: i for i, (cid, _tq, _hi, _vi) in enumerate(comps)
                }
            if not progressive:
                break  # baseline: ONE interleaved scan, decoded below
            if coefs is None:
                coefs = [
                    np.zeros((mcuy * vi, mcux * hi, 64), dtype=np.int64)
                    for _cid, _tq, hi, vi in comps
                ]
            pos = _progressive_scan(
                payload, pos, scan, ss, se, ah, al, comps, comp_by_id,
                coefs, htables, restart_interval, mcux, mcuy, hmax,
                vmax, w, h,
            )
            pos = _next_marker(payload, pos)
            continue
        pos += seglen

    ncomp = len(comps)
    if progressive:
        # Dequantize + IDCT every accumulated block with EXACTLY the
        # baseline path's per-block expressions — an einsum/batched-
        # matmul sums in a different float order, and a last-ulp
        # difference can flip an rint at a .5 boundary, breaking the
        # bit-exact progressive==baseline contract (found by the
        # hypothesis sweep at 26x38 q=94).
        cplanes = []
        for ci, (_cid, tq, hi, vi) in enumerate(comps):
            qt = qtables.get(tq)
            if qt is None:
                raise ValueError("JPEG scan before its tables")
            grid = coefs[ci]
            gh, gw = grid.shape[:2]
            plane = np.empty((gh * 8, gw * 8))
            for by in range(gh):
                for bx in range(gw):
                    coef = np.zeros(64, dtype=np.float64)
                    coef[_ZIGZAG] = grid[by, bx] * qt[_ZIGZAG]
                    plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                        _idct2(coef.reshape(8, 8)) + 128.0
                    )
            cplanes.append(plane)
        return _assemble_jpeg(w, h, comps, cplanes, hmax, vmax)

    if len(scan) != len(comps):
        raise ValueError("JPEG scan/frame component mismatch")
    cplanes = [
        np.zeros((mcuy * vi * 8, mcux * hi * 8))
        for _cid, _tq, hi, vi in comps
    ]
    reader = _BitReader(payload, pos)
    preds = [0] * ncomp
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
                        if s > 11:  # T.81 F.1.2.1: 8-bit DC categories 0-11
                            raise ValueError("JPEG DC category out of range")
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

    return _assemble_jpeg(w, h, comps, cplanes, hmax, vmax)


def _assemble_jpeg(w, h, comps, cplanes, hmax, vmax):
    """Assemble decoded component planes at full resolution: nearest-
    neighbor chroma upsampling (index map handles any Hi/Vi vs
    Hmax/Vmax ratio, integral or not) + color conversion."""
    ncomp = len(comps)
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
