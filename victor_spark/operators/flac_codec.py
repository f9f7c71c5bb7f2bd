"""FLAC codec (16-bit subset), pure python — REAL lossless audio
compression: fixed (orders 0-4) AND arbitrary LPC linear predictors
with Rice-coded residuals, frame CRC-8/CRC-16 integrity, STREAMINFO
metadata, UTF-8 coded frame numbers. Lossless ⇒ decoded samples are
bit-exact, so the catalog oracle replays them integer-exactly (the
audio analog of the GIF/PNG story; mu-law covers the lossy-companding
regime).

Encoder subset: one stream = STREAMINFO + fixed-blocksize frames, mono
or stereo (independent / left-side / right-side / mid-side channel
assignments), 16 bps, subframe per channel chosen from CONSTANT /
VERBATIM / FIXED order 0-2 by residual cost — or forced LPC
(quantized Levinson-Durbin coefficients) via ``lpc_order`` — Rice
method 0 with partition order 0.
Decoder superset of that: any fixed-blocksize mono/stereo 16-bit
stream with CONSTANT / VERBATIM / FIXED 0-4 / LPC 1-32 subframes,
wasted bits, all four stereo channel assignments (decoded channels
downmixed (l+r)//2 to the mono int16 lake normalization — the same
semantics as the WAV parser), Rice methods 0 and 1, any partition
order, multiple frames; everything else (>2 channels, non-16 bps,
variable blocksize) raises ValueError — the decode-farm quarantine
contract. CRCs are VERIFIED on decode, so corruption is caught rather
than mis-decoded.

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


_STEREO_CODES = {
    "independent": 1, "left_side": 8, "right_side": 9, "mid_side": 10,
}


def encode_flac(
    samples,
    sample_rate: int = 16000,
    block_size: int = 4096,
    channels: int = 1,
    stereo_mode: str = "independent",
    lpc_order: int | None = None,
) -> bytes:
    """Encode int16 samples as a real FLAC stream: STREAMINFO, then
    fixed-blocksize frames whose subframes are the cheapest of CONSTANT
    / VERBATIM / FIXED order 0-2 with Rice-coded residuals — or forced
    LPC of ``lpc_order`` (quantized Levinson-Durbin coefficients, the
    subframe type real ``flac`` encoders emit almost always). With
    ``channels=2``, ``samples`` is interleaved l,r (the _encode_wav
    convention) and ``stereo_mode`` picks the channel assignment
    (independent / left_side / right_side / mid_side). Raises
    ValueError for samples outside int16 or a sample rate beyond the
    format's 20-bit STREAMINFO field (silently truncating either would
    emit a corrupt, self-inconsistent asset)."""
    samples = [int(s) for s in samples]
    if any(not -32768 <= s <= 32767 for s in samples):
        raise ValueError("samples must be int16")
    if not 0 < sample_rate < (1 << 20):
        raise ValueError(f"sample rate {sample_rate} exceeds FLAC's 20-bit field")
    if channels not in (1, 2):
        raise ValueError(f"unsupported channel count {channels}")
    if stereo_mode not in _STEREO_CODES:
        raise ValueError(f"unknown stereo_mode {stereo_mode!r}")
    if channels == 2:
        samples = samples[: len(samples) // 2 * 2]
        chans = [samples[0::2], samples[1::2]]
    else:
        chans = [samples]
    n = len(chans[0])  # STREAMINFO counts interchannel samples

    out = bytearray(b"fLaC")
    info = _Bits()
    info.write(block_size, 16)  # min block size
    info.write(block_size, 16)  # max block size
    info.write(0, 24)  # min frame size unknown
    info.write(0, 24)  # max frame size unknown
    info.write(sample_rate, 20)
    info.write(channels - 1, 3)
    info.write(15, 5)  # bps - 1
    info.write(n, 36)
    body = info.getvalue() + b"\x00" * 16  # md5 unset (legal: all zero)
    out += bytes([0x80]) + struct.pack(">I", len(body))[1:] + body

    for fi, start in enumerate(range(0, max(n, 1), block_size)):
        blks = [c[start : start + block_size] for c in chans]
        if not blks[0]:
            break
        out += _encode_frame(blks, fi, sample_rate, stereo_mode, lpc_order)
    return bytes(out)


def _lpc_model(blk: list[int], order: int, precision: int = 12):
    """Quantized LPC coefficients for ``blk``: autocorrelation →
    Levinson-Durbin → scale to ``precision``-bit signed integers with a
    shift. Returns (coefs, shift, precision) or None when the block is
    too short / degenerate (caller falls back to FIXED). ANY quantized
    model is lossless — the residuals are computed against the exact
    integer prediction the decoder will reproduce."""
    import math

    nb = len(blk)
    if nb <= order or order < 1 or order > 32:
        return None
    ac = [
        float(sum(blk[i] * blk[i + j] for i in range(nb - j)))
        for j in range(order + 1)
    ]
    if ac[0] == 0.0:
        return None
    err = ac[0]
    a: list[float] = []
    for i in range(order):
        acc = ac[i + 1] - sum(a[j] * ac[i - j] for j in range(i))
        if err == 0.0:
            return None
        k = acc / err
        a = [a[j] - k * a[i - 1 - j] for j in range(i)] + [k]
        err *= 1.0 - k * k
    cmax = max(abs(c) for c in a)
    if cmax == 0.0 or not math.isfinite(cmax):
        return None
    shift = precision - 1 - max(0, int(math.floor(math.log2(cmax))) + 1)
    shift = max(0, min(15, shift))
    lim = 1 << (precision - 1)
    coefs = [
        max(-lim, min(lim - 1, int(round(c * (1 << shift))))) for c in a
    ]
    if all(c == 0 for c in coefs):
        return None
    return coefs, shift, precision


def _encode_frame(
    blks: list[list[int]],
    frame_idx: int,
    sample_rate: int,
    stereo_mode: str,
    lpc_order: int | None,
) -> bytes:
    nch = len(blks)
    chan_code = 0 if nch == 1 else _STEREO_CODES[stereo_mode]
    header = _Bits()
    header.write(0b11111111111110, 14)  # sync
    header.write(0, 1)  # reserved
    header.write(0, 1)  # fixed blocksize stream
    header.write(0b0111, 4)  # blocksize: explicit 16-bit at header end
    header.write(0, 4)  # sample rate: from STREAMINFO
    header.write(chan_code, 4)
    header.write(0b100, 3)  # 16 bps
    header.write(0, 1)  # reserved
    header.align()
    hdr = header.getvalue() + _utf8_number(frame_idx)
    hdr += struct.pack(">H", len(blks[0]) - 1)
    hdr += bytes([_crc8(hdr)])

    # derive the coded channels from the assignment; the side channel
    # carries bps+1
    if nch == 1 or chan_code == 1:
        coded = [(b, 16) for b in blks]
    else:
        left, right = blks
        side = [l - r for l, r in zip(left, right)]
        if chan_code == 8:
            coded = [(left, 16), (side, 17)]
        elif chan_code == 9:
            coded = [(side, 17), (right, 16)]
        else:  # mid/side
            mid = [(l + r) >> 1 for l, r in zip(left, right)]
            coded = [(mid, 16), (side, 17)]

    body = _Bits()
    for blk, bps in coded:
        _write_subframe(body, blk, bps, lpc_order)
    body.align()
    frame = hdr + body.getvalue()
    return frame + struct.pack(">H", _crc16(frame))


def _write_subframe(
    body: _Bits, blk: list[int], bps: int, lpc_order: int | None
) -> None:
    mask = (1 << bps) - 1

    def _write_rice(res: list[int], k: int) -> None:
        body.write(0, 2)  # residual method: rice, 4-bit params
        body.write(0, 4)  # partition order 0
        body.write(k, 4)
        for r in res:
            u = _zigzag_u(r)
            body.write_unary(u >> k)
            if k:
                body.write(u & ((1 << k) - 1), k)

    if all(s == blk[0] for s in blk):
        body.write(0, 1)
        body.write(0, 6)  # CONSTANT
        body.write(0, 1)  # no wasted bits
        body.write(blk[0] & mask, bps)
        return

    if lpc_order is not None:
        model = _lpc_model(blk, lpc_order)
        if model is not None:
            coefs, shift, prec = model
            order = len(coefs)
            res = [
                s
                - (
                    sum(c * blk[i - j - 1] for j, c in enumerate(coefs))
                    >> shift
                )
                for i, s in enumerate(blk)
                if i >= order
            ]
            body.write(0, 1)
            body.write(0b100000 | (order - 1), 6)  # LPC
            body.write(0, 1)  # no wasted bits
            for s in blk[:order]:  # warmup
                body.write(s & mask, bps)
            body.write(prec - 1, 4)
            body.write(shift, 5)
            pmask = (1 << prec) - 1
            for c in coefs:
                body.write(c & pmask, prec)
            _write_rice(res, _rice_param(res))
            return

    # cheapest of FIXED 0-2 vs VERBATIM
    best = None
    for order in (0, 1, 2):
        if len(blk) <= order:
            continue
        res = _fixed_residuals(blk, order)
        k = _rice_param(res)
        # exact cost of what the coder will emit: unary quotient of
        # the FOLDED value + stop bit + k remainder bits
        cost = sum((_zigzag_u(r) >> k) + 1 + k for r in res) + bps * order
        if best is None or cost < best[1]:
            best = (order, cost, res, k)
    verbatim_cost = bps * len(blk)
    if best is None or best[1] > verbatim_cost:
        body.write(0, 1)
        body.write(1, 6)  # VERBATIM
        body.write(0, 1)
        for s in blk:
            body.write(s & mask, bps)
        return
    order, _cost, res, k = best
    body.write(0, 1)
    body.write(0b001000 | order, 6)  # FIXED
    body.write(0, 1)
    for s in blk[:order]:  # warmup samples
        body.write(s & mask, bps)
    _write_rice(res, k)


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
    """Decode a mono or stereo 16-bit fixed-blocksize FLAC stream to
    the mono int16 lake normalization (stereo downmixed (l+r)//2, floor
    semantics — mirroring the WAV parser). Returns (sample_rate,
    list[int] samples). Verifies the frame CRC-8/CRC-16 and the sync
    code; raises ValueError on corruption or on features outside the
    supported subset (>2 channels, non-16 bps, variable blocksize)."""
    (rate, channels, bps, total), pos = _walk_metadata(payload)
    if channels not in (1, 2) or bps != 16:
        raise ValueError(
            f"unsupported FLAC: channels={channels} bps={bps} "
            "(mono/stereo 16-bit only)"
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


def _decode_subframe(bits: _Bits, block_size: int, bps: int) -> list[int]:
    """Decode one subframe at an effective ``bps`` (17 for the side
    channel of a stereo side-coded frame): CONSTANT / VERBATIM / FIXED
    0-4 / LPC 1-32, with wasted-bits handling (samples coded at
    bps - wasted, shifted back up on output)."""
    if bits.read(1) != 0:
        raise ValueError("invalid FLAC subframe padding")
    stype = bits.read(6)
    wasted = 0
    if bits.read(1):  # wasted-bits flag: unary count - 1 follows
        wasted = bits.read_unary() + 1
        if wasted >= bps:
            raise ValueError("FLAC wasted bits exceed sample size")
        bps -= wasted

    def signed(nbits: int) -> int:
        v = bits.read(nbits)
        return v - (1 << nbits) if v >> (nbits - 1) else v

    if stype == 0:  # CONSTANT
        blk = [signed(bps)] * block_size
    elif stype == 1:  # VERBATIM
        blk = [signed(bps) for _ in range(block_size)]
    elif 8 <= stype <= 12 or stype >= 32:  # FIXED 0-4 or LPC
        if stype >= 32:
            order = (stype & 0x1F) + 1
            warm = [signed(bps) for _ in range(order)]
            prec = bits.read(4)
            if prec == 15:
                raise ValueError("invalid FLAC LPC precision escape")
            prec += 1
            shift = bits.read(5)
            if shift >> 4:  # the field is signed; negative is invalid
                raise ValueError("negative FLAC LPC shift")
            coefs = [signed(prec) for _ in range(order)]
        else:
            order = stype - 8
            warm = [signed(bps) for _ in range(order)]
            shift = 0
            coefs = _FIXED_COEFS[order]
        res = _decode_residual(bits, block_size, order)
        blk = list(warm)
        for r in res:
            pred = sum(c * blk[len(blk) - j - 1] for j, c in enumerate(coefs))
            blk.append(r + (pred >> shift))
    else:
        raise ValueError(f"unsupported FLAC subframe type {stype}")
    if wasted:
        blk = [s << wasted for s in blk]
    return blk


def _decode_residual(bits: _Bits, block_size: int, order: int) -> list[int]:
    """Rice-coded residual section (methods 0 and 1, any partition
    order), shared by the FIXED and LPC subframe paths."""
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
    return res


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
    # 0=mono, 1=two independent, 8=left/side, 9=right/side, 10=mid/side
    if chan in (0, 1):
        nch = chan + 1
    elif chan in (8, 9, 10):
        nch = 2
    else:
        raise ValueError(f"unsupported FLAC channel assignment {chan}")
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

    # one subframe per channel; in the side-coded assignments the SIDE
    # channel carries one extra bit of sample resolution (spec §9.1.3)
    subs: list[list[int]] = []
    for ch in range(nch):
        side_ch = (
            (chan == 8 and ch == 1)
            or (chan == 9 and ch == 0)
            or (chan == 10 and ch == 1)
        )
        subs.append(_decode_subframe(bits, block_size, 16 + side_ch))

    if nch == 1:
        blk = subs[0]
    else:
        if chan == 1:  # independent L, R
            left, right = subs
        elif chan == 8:  # left/side: side = left - right
            left = subs[0]
            right = [l - s for l, s in zip(subs[0], subs[1])]
        elif chan == 9:  # right/side: side = left - right
            right = subs[1]
            left = [r + s for s, r in zip(subs[0], subs[1])]
        else:  # mid/side: mid = (l+r)>>1 with side's low bit restoring
            left, right = [], []
            for m, s in zip(subs[0], subs[1]):
                m2 = (m << 1) | (s & 1)
                left.append((m2 + s) >> 1)
                right.append((m2 - s) >> 1)
        # the mono lake normalization, floor semantics like _parse_wav
        blk = [(l + r) // 2 for l, r in zip(left, right)]

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
