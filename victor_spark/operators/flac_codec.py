"""FLAC codec (mono 16-bit subset), pure python — REAL lossless audio
compression: fixed linear predictors (orders 0-4) with Rice-coded
residuals, frame CRC-8/CRC-16 integrity, STREAMINFO metadata, UTF-8
coded frame numbers. Lossless ⇒ decoded samples are bit-exact, so the
catalog oracle replays them integer-exactly (the audio analog of the
GIF/PNG story; mu-law covers the lossy-companding regime).

Encoder subset: one stream = STREAMINFO + fixed-blocksize frames, mono,
16 bps, subframe per frame chosen from CONSTANT / VERBATIM / FIXED
order 0-2 by residual cost, Rice method 0 with partition order 0.
Decoder superset of that: any fixed-blocksize mono 16-bit stream with
CONSTANT / VERBATIM / FIXED 0-4 subframes, Rice methods 0 and 1, any
partition order, multiple frames; everything else (stereo, LPC, wasted
bits, variable blocksize) raises ValueError — the decode-farm
quarantine contract. CRCs are VERIFIED on decode, so corruption is
caught rather than mis-decoded.

Reference parity note: the reference engine has no codecs; this is the
training-data-pipeline extension surface. Format: the public FLAC
specification (xiph.org).
"""

from __future__ import annotations

import struct


def _crc8(data: bytes) -> int:
    """CRC-8, polynomial x^8+x^2+x^1+1 (0x07), init 0 — the FLAC frame
    header checksum."""
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    """CRC-16, polynomial x^16+x^15+x^2+1 (0x8005), init 0 — the FLAC
    whole-frame checksum."""
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
    return crc


class _Bits:
    """MSB-first bit writer/reader (FLAC is big-endian bit-packed).
    Read mode keeps the caller's bytes WITHOUT copying (a per-frame copy
    of a multi-MB stream would make decode O(frames × size)); the
    mutable buffer exists only for write mode."""

    def __init__(self, data: bytes = b""):
        self.data = data if data else bytearray()
        self.acc = 0
        self.nacc = 0  # write side
        self.pos = 0
        self.bit = 0  # read side

    # -- write --
    def write(self, value: int, nbits: int) -> None:
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.nacc += 1
            if self.nacc == 8:
                self.data.append(self.acc)
                self.acc = 0
                self.nacc = 0

    def write_unary(self, q: int) -> None:
        for _ in range(q):
            self.write(0, 1)
        self.write(1, 1)

    def align(self) -> None:
        if self.nacc:
            self.write(0, 8 - self.nacc)

    def getvalue(self) -> bytes:
        assert self.nacc == 0
        return bytes(self.data)

    # -- read --
    def read(self, nbits: int) -> int:
        v = 0
        for _ in range(nbits):
            if self.pos >= len(self.data):
                raise ValueError("FLAC bitstream exhausted")
            v = (v << 1) | ((self.data[self.pos] >> (7 - self.bit)) & 1)
            self.bit += 1
            if self.bit == 8:
                self.bit = 0
                self.pos += 1
        return v

    def read_unary(self) -> int:
        q = 0
        while self.read(1) == 0:
            q += 1
            if q > 1 << 20:
                raise ValueError("runaway FLAC unary code")
        return q

    def read_align(self) -> None:
        if self.bit:
            self.bit = 0
            self.pos += 1


def _utf8_number(n: int) -> bytes:
    """FLAC's UTF-8-style coded number (frame index): an nbytes-byte
    form carries 6*(nbytes-1) + (7-nbytes) payload bits."""
    if n < 0x80:
        return bytes([n])
    for nbytes in range(2, 8):
        if n < (1 << (6 * (nbytes - 1) + (7 - nbytes))):
            break
    out = [((0xFF << (8 - nbytes)) & 0xFF) | (n >> (6 * (nbytes - 1)))]
    for i in range(nbytes - 2, -1, -1):
        out.append(0x80 | ((n >> (6 * i)) & 0x3F))
    return bytes(out)


def _read_utf8_number(bits: _Bits) -> int:
    b0 = bits.read(8)
    if b0 < 0x80:
        return b0
    nbytes = 0
    mask = 0x80
    while b0 & mask:
        nbytes += 1
        mask >>= 1
    if nbytes < 2 or nbytes > 7:
        raise ValueError("invalid FLAC coded number")
    n = b0 & (0xFF >> (nbytes + 1))
    for _ in range(nbytes - 1):
        c = bits.read(8)
        if c & 0xC0 != 0x80:
            raise ValueError("invalid FLAC coded-number continuation")
        n = (n << 6) | (c & 0x3F)
    return n


_FIXED_COEFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def _fixed_residuals(samples: list[int], order: int) -> list[int]:
    coefs = _FIXED_COEFS[order]
    return [
        s - sum(c * samples[i - j - 1] for j, c in enumerate(coefs))
        for i, s in enumerate(samples)
        if i >= order
    ] if order else list(samples)


def _rice_param(residuals: list[int]) -> int:
    if not residuals:
        return 0
    mean = sum(abs(r) for r in residuals) / len(residuals)
    k = 0
    while (1 << k) < mean and k < 14:
        k += 1
    return k


def _zigzag_u(r: int) -> int:
    """The folded value the rice coder actually emits for residual r."""
    return (r << 1) ^ (r >> 63)


def encode_flac(samples, sample_rate: int = 16000, block_size: int = 4096) -> bytes:
    """Encode int16 mono samples as a real FLAC stream: STREAMINFO, then
    fixed-blocksize frames whose subframe is the cheapest of CONSTANT /
    VERBATIM / FIXED order 0-2 with Rice-coded residuals. Raises
    ValueError for samples outside int16 or a sample rate beyond the
    format's 20-bit STREAMINFO field (silently truncating either would
    emit a corrupt, self-inconsistent asset)."""
    samples = [int(s) for s in samples]
    if any(not -32768 <= s <= 32767 for s in samples):
        raise ValueError("samples must be int16")
    if not 0 < sample_rate < (1 << 20):
        raise ValueError(f"sample rate {sample_rate} exceeds FLAC's 20-bit field")
    n = len(samples)

    out = bytearray(b"fLaC")
    info = _Bits()
    info.write(block_size, 16)  # min block size
    info.write(block_size, 16)  # max block size
    info.write(0, 24)  # min frame size unknown
    info.write(0, 24)  # max frame size unknown
    info.write(sample_rate, 20)
    info.write(0, 3)  # channels - 1
    info.write(15, 5)  # bps - 1
    info.write(n, 36)
    body = info.getvalue() + b"\x00" * 16  # md5 unset (legal: all zero)
    out += bytes([0x80]) + struct.pack(">I", len(body))[1:] + body

    for fi, start in enumerate(range(0, max(n, 1), block_size)):
        blk = samples[start : start + block_size]
        if not blk:
            break
        out += _encode_frame(blk, fi, sample_rate)
    return bytes(out)


def _encode_frame(blk: list[int], frame_idx: int, sample_rate: int) -> bytes:
    header = _Bits()
    header.write(0b11111111111110, 14)  # sync
    header.write(0, 1)  # reserved
    header.write(0, 1)  # fixed blocksize stream
    header.write(0b0111, 4)  # blocksize: explicit 16-bit at header end
    header.write(0, 4)  # sample rate: from STREAMINFO
    header.write(0, 4)  # channel assignment: mono
    header.write(0b100, 3)  # 16 bps
    header.write(0, 1)  # reserved
    header.align()
    hdr = header.getvalue() + _utf8_number(frame_idx)
    hdr += struct.pack(">H", len(blk) - 1)
    hdr += bytes([_crc8(hdr)])

    # choose the cheapest subframe representation
    best = None
    if all(s == blk[0] for s in blk):
        best = ("constant", 0, [])
    else:
        for order in (0, 1, 2):
            if len(blk) <= order:
                continue
            res = _fixed_residuals(blk, order)
            k = _rice_param(res)
            # exact cost of what the coder will emit: unary quotient of
            # the FOLDED value + stop bit + k remainder bits
            cost = sum(
                (_zigzag_u(r) >> k) + 1 + k for r in res
            ) + 16 * order
            if best is None or cost < best[1]:
                best = (order, cost, res, k)
        verbatim_cost = 16 * len(blk)
        if best is None or best[1] > verbatim_cost:
            best = ("verbatim", verbatim_cost, [])

    body = _Bits()
    if best[0] == "constant":
        body.write(0, 1)
        body.write(0, 6)  # CONSTANT
        body.write(0, 1)  # no wasted bits
        body.write(blk[0] & 0xFFFF, 16)
    elif best[0] == "verbatim":
        body.write(0, 1)
        body.write(1, 6)  # VERBATIM
        body.write(0, 1)
        for s in blk:
            body.write(s & 0xFFFF, 16)
    else:
        order, _cost, res, k = best
        body.write(0, 1)
        body.write(0b001000 | order, 6)  # FIXED
        body.write(0, 1)
        for s in blk[:order]:  # warmup samples
            body.write(s & 0xFFFF, 16)
        body.write(0, 2)  # residual method: rice, 4-bit params
        body.write(0, 4)  # partition order 0
        body.write(k, 4)
        for r in res:
            u = _zigzag_u(r)
            body.write_unary(u >> k)
            if k:
                body.write(u & ((1 << k) - 1), k)
    body.align()
    frame = hdr + body.getvalue()
    return frame + struct.pack(">H", _crc16(frame))


def _walk_metadata(payload: bytes):
    """Walk the metadata blocks once: returns ((rate, channels, bps,
    total), first_frame_pos). The single parser both the cheap
    STREAMINFO probe and the full decoder share."""
    if payload[:4] != b"fLaC":
        raise ValueError("not a FLAC payload")
    pos = 4
    streaminfo = None
    while True:
        if pos + 4 > len(payload):
            raise ValueError("truncated FLAC metadata")
        hdr = payload[pos]
        (length,) = struct.unpack(">I", b"\x00" + payload[pos + 1 : pos + 4])
        block = payload[pos + 4 : pos + 4 + length]
        if len(block) != length:
            raise ValueError("truncated FLAC metadata block")
        if hdr & 0x7F == 0:  # STREAMINFO
            bits = _Bits(block)
            bits.read(16)
            bits.read(16)
            bits.read(24)
            bits.read(24)
            rate = bits.read(20)
            channels = bits.read(3) + 1
            bps = bits.read(5) + 1
            total = bits.read(36)
            streaminfo = (rate, channels, bps, total)
        pos += 4 + length
        if hdr & 0x80:  # last metadata block
            break
    if streaminfo is None:
        raise ValueError("FLAC missing STREAMINFO")
    return streaminfo, pos


def flac_streaminfo(payload: bytes):
    """(sample_rate, channels, bps, total_samples) from the STREAMINFO
    block alone — the cheap metadata-sniff pass (ingest shouldn't pay a
    full entropy decode per asset just to learn the rate)."""
    info, _pos = _walk_metadata(payload)
    return info


def decode_flac(payload: bytes):
    """Decode a mono 16-bit fixed-blocksize FLAC stream. Returns
    (sample_rate, list[int] samples). Verifies the frame CRC-8/CRC-16
    and the sync code; raises ValueError on corruption or on features
    outside the supported subset (stereo, LPC, wasted bits)."""
    (rate, channels, bps, total), pos = _walk_metadata(payload)
    if channels != 1 or bps != 16:
        raise ValueError(
            f"unsupported FLAC: channels={channels} bps={bps} (mono/16 only)"
        )

    samples: list[int] = []
    while pos < len(payload) and (total == 0 or len(samples) < total):
        pos, blk = _decode_frame(payload, pos, rate)
        samples.extend(blk)
    if total and len(samples) > total:
        samples = samples[:total]
    if any(not -32768 <= s <= 32767 for s in samples):
        # a valid 16-bps stream cannot reconstruct outside int16; a
        # crafted rice residual that does must not silently wrap (or
        # raise numpy OverflowError) downstream
        raise ValueError("FLAC sample outside 16-bit range")
    return rate, samples


def _decode_frame(payload: bytes, start: int, rate: int):
    bits = _Bits(payload)
    bits.pos = start
    if bits.read(14) != 0b11111111111110:
        raise ValueError("FLAC frame sync lost")
    bits.read(1)  # reserved
    if bits.read(1) != 0:
        raise ValueError("variable-blocksize FLAC unsupported")
    bs_code = bits.read(4)
    sr_code = bits.read(4)
    chan = bits.read(4)
    size_code = bits.read(3)
    bits.read(1)
    if chan != 0:
        raise ValueError("unsupported FLAC channel assignment")
    if size_code not in (0, 0b100):
        raise ValueError("unsupported FLAC sample size")
    _frame_no = _read_utf8_number(bits)
    if bs_code == 0b0110:
        block_size = bits.read(8) + 1
    elif bs_code == 0b0111:
        block_size = bits.read(16) + 1
    elif 2 <= bs_code <= 5:
        block_size = 576 << (bs_code - 2)
    elif bs_code >= 8:
        block_size = 256 << (bs_code - 8)
    else:
        raise ValueError(f"unsupported FLAC blocksize code {bs_code}")
    if sr_code not in (0,):  # we always defer to STREAMINFO
        raise ValueError("unsupported FLAC sample-rate code")
    bits.read_align()
    crc8 = bits.read(8)
    if _crc8(payload[start : bits.pos - 1]) != crc8:
        raise ValueError("FLAC frame header CRC mismatch")

    # one mono subframe
    if bits.read(1) != 0:
        raise ValueError("invalid FLAC subframe padding")
    stype = bits.read(6)
    if bits.read(1) != 0:
        raise ValueError("FLAC wasted-bits unsupported")

    def s16(v: int) -> int:
        return v - 0x10000 if v & 0x8000 else v

    if stype == 0:  # CONSTANT
        blk = [s16(bits.read(16))] * block_size
    elif stype == 1:  # VERBATIM
        blk = [s16(bits.read(16)) for _ in range(block_size)]
    elif 8 <= stype <= 12:  # FIXED order 0-4
        order = stype - 8
        warm = [s16(bits.read(16)) for _ in range(order)]
        method = bits.read(2)
        if method not in (0, 1):
            raise ValueError("unsupported FLAC residual method")
        pbits = 4 if method == 0 else 5
        escape = (1 << pbits) - 1
        porder = bits.read(4)
        nparts = 1 << porder
        if block_size % nparts or block_size // nparts <= order and porder:
            raise ValueError("invalid FLAC partition order")
        res: list[int] = []
        for p in range(nparts):
            count = block_size // nparts - (order if p == 0 else 0)
            k = bits.read(pbits)
            if k == escape:
                raw = bits.read(5)
                for _ in range(count):
                    v = bits.read(raw) if raw else 0
                    res.append(v - (1 << raw) if raw and v >> (raw - 1) else v)
                continue
            for _ in range(count):
                q = bits.read_unary()
                u = (q << k) | (bits.read(k) if k else 0)
                res.append((u >> 1) ^ -(u & 1))  # zigzag unfold
        blk = list(warm)
        coefs = _FIXED_COEFS[order]
        for r in res:
            pred = sum(c * blk[len(blk) - j - 1] for j, c in enumerate(coefs))
            blk.append(r + pred)
    else:
        raise ValueError(f"unsupported FLAC subframe type {stype}")

    bits.read_align()
    frame_end = bits.pos + 2
    if frame_end > len(payload):
        raise ValueError("truncated FLAC frame footer")
    (crc,) = struct.unpack(">H", payload[bits.pos : frame_end])
    if _crc16(payload[start : bits.pos]) != crc:
        raise ValueError("FLAC frame CRC-16 mismatch")
    if len(blk) != block_size:
        raise ValueError("FLAC subframe sample count mismatch")
    return frame_end, blk
