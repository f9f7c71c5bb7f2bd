"""MP3 (MPEG-1/2/2.5 Audio Layer I-III) metadata probe — frame-header
walk ONLY, no entropy decode.

The dominant real-world audio interchange format deserves better than
kind='binary' quarantine, but this repo DELIBERATELY does not decode
Layer III audio: the spectral Huffman tables (ISO/IEC 11172-3 Table B.7)
are not available in this sandbox and cannot be trusted from memory, and
a self-consistent-but-wrong decoder is exactly the interop failure mode
the external-fixture gate exists to prevent (same stance as WebP/H.264 —
SURVEY §8). What IS public, tiny, and structurally self-validating is
the FRAME HEADER layer: 4-byte headers with an 11-bit sync word, version
/ layer / bitrate / sample-rate fields, and a declared-length frame walk
(``frame_len = samples_per_frame/8 * bitrate / rate + padding``). A walk
that lands exactly on end-of-stream across hundreds of frames validates
the tables against the file itself — a wrong bitrate entry desyncs
immediately.

So: :func:`mp3_probe` walks every frame and returns honest container
metadata (sample rate, channels, frame/sample counts, duration, mean
bitrate); the sniffer (``sources/media.py``) uses it to classify MP3 as
kind='audio' with a real ``meta_sample_rate``; and the strict decode
farms raise a LOUD ``NotImplementedError`` on the payload rather than
silently faking samples. Pinned by a real external fixture
(``tests/fixtures/real_mpeg2l3_mono.mp3``).

Format facts: ISO/IEC 11172-3 (MPEG-1) and 13818-3 (MPEG-2/2.5 LSF)
public header layout; ID3v2 header framing from the public id3.org
spec (syncsafe sizes); ID3v1 is a fixed 128-byte 'TAG' trailer.
"""

from __future__ import annotations

# kbps by (version-key, layer), index 1..14; index 0 is 'free format'
# and 15 is forbidden — both rejected (free-format frame sizing needs a
# sync search this probe deliberately does not do). MPEG-2 and 2.5 share
# the LSF tables (version-key 2).
_BITRATES = {
    (1, 1): (32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448),
    (1, 2): (32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384),
    (1, 3): (32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320),
    (2, 1): (32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256),
    (2, 2): (8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
}
_BITRATES[(2, 3)] = _BITRATES[(2, 2)]

# Hz by version bits (11=MPEG1, 10=MPEG2, 00=MPEG2.5), sample-rate index
_RATES = {3: (44100, 48000, 32000), 2: (22050, 24000, 16000), 0: (11025, 12000, 8000)}


def looks_like_mp3(b: bytes) -> bool:
    """Cheap pre-filter for the sniffer's dispatch chain: an ID3v2 tag
    or a leading frame-sync byte pair. A true classification still
    requires the FULL :func:`mp3_probe` walk to succeed — random binary
    passing this check desyncs within a frame or two and quarantines."""
    return len(b) >= 4 and (
        b[:3] == b"ID3" or (b[0] == 0xFF and (b[1] & 0xE0) == 0xE0)
    )


def _skip_id3v2(b: bytes) -> int:
    """Byte offset of the first audio frame past an optional leading
    ID3v2 tag (10-byte header, syncsafe 28-bit size, optional footer)."""
    if b[:3] != b"ID3" or len(b) < 10:
        return 0
    size = 0
    for x in b[6:10]:
        if x & 0x80:
            raise ValueError("mp3: non-syncsafe ID3v2 size byte")
        size = (size << 7) | x
    total = 10 + size + (10 if b[5] & 0x10 else 0)
    if total > len(b):
        raise ValueError("mp3: ID3v2 tag longer than file")
    return total


def _frame_header(b: bytes, i: int) -> tuple[int, int, int, int, int]:
    """Parse the 4-byte frame header at offset ``i`` ->
    (frame_len_bytes, samples_per_frame, sample_rate, channels, kbps)."""
    h = int.from_bytes(b[i : i + 4], "big")
    if (h >> 21) & 0x7FF != 0x7FF:
        raise ValueError(f"mp3: lost frame sync at offset {i}")
    vbits = (h >> 19) & 3  # 3=MPEG1, 2=MPEG2, 0=MPEG2.5, 1=reserved
    if vbits == 1:
        raise ValueError("mp3: reserved version id")
    lbits = (h >> 17) & 3  # 3=Layer I, 2=Layer II, 1=Layer III
    if lbits == 0:
        raise ValueError("mp3: reserved layer")
    layer = 4 - lbits
    bridx = (h >> 12) & 0xF
    if bridx in (0, 15):
        raise ValueError("mp3: free-format or forbidden bitrate index")
    sridx = (h >> 10) & 3
    if sridx == 3:
        raise ValueError("mp3: reserved sample-rate index")
    padding = (h >> 9) & 1
    mode = (h >> 6) & 3  # 3 = single channel
    kbps = _BITRATES[(1 if vbits == 3 else 2, layer)][bridx - 1]
    rate = _RATES[vbits][sridx]
    if layer == 1:
        spf = 384
        frame_len = (12000 * kbps // rate + padding) * 4  # slots are 4 bytes
    else:
        # Layer II is always 1152; Layer III halves under LSF (MPEG2/2.5)
        spf = 576 if (layer == 3 and vbits != 3) else 1152
        frame_len = spf // 8 * kbps * 1000 // rate + padding
    return frame_len, spf, rate, (1 if mode == 3 else 2), kbps


def mp3_probe(b: bytes) -> dict:
    """Walk every frame of an MP3 stream (optional ID3v2 head and ID3v1
    'TAG' trailer tolerated) and return its container metadata::

        {sample_rate, channels, n_frames, n_samples, duration_s,
         mean_kbps}

    STRICT: any desync, truncated frame, mid-stream sample-rate change,
    or trailing garbage raises ValueError (the shared parser contract —
    the sniffer quarantines such payloads). A leading Xing/Info VBR
    header frame is a legal first frame and is simply counted; duration
    is therefore within one frame of the player-reported value.
    Samples are NOT decoded — see the module docstring."""
    pos = _skip_id3v2(b)
    end = len(b)
    if end - pos >= 128 and b[end - 128 : end - 125] == b"TAG":
        end -= 128  # ID3v1 trailer
    frames = samples = kbps_sum = 0
    rate0 = ch0 = None
    while pos < end:
        if end - pos < 4:
            raise ValueError("mp3: trailing bytes shorter than a header")
        frame_len, spf, rate, ch, kbps = _frame_header(b, pos)
        if rate0 is None:
            rate0, ch0 = rate, ch
        elif rate != rate0:
            raise ValueError("mp3: sample-rate change mid-stream")
        if pos + frame_len > end:
            raise ValueError("mp3: truncated final frame")
        frames += 1
        samples += spf
        kbps_sum += kbps
        pos += frame_len
    if frames == 0:
        raise ValueError("mp3: no audio frames")
    return {
        "sample_rate": rate0,
        "channels": ch0,
        "n_frames": frames,
        "n_samples": samples,
        "duration_s": samples / rate0,
        "mean_kbps": kbps_sum / frames,
    }
