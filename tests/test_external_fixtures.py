"""Decoders vs REAL third-party encoder output (tests/fixtures/ — see
its README for provenance). These pin the interoperable conventions a
self-encoded roundtrip can't: table layouts, subsampled MCU order,
filter mixes, container wrappers as real encoders emit them."""

from __future__ import annotations

import os

import numpy as np
import pytest

FIX = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures")


def _load(name: str) -> bytes:
    with open(os.path.join(FIX, name), "rb") as f:
        return f.read()


def test_real_420_jpeg_decodes():
    """A real libjpeg-family baseline JPEG with 4:2:0 subsampling (luma
    sampling 0x22, separate luma/chroma quant+Huffman tables) decodes
    end-to-end: every Huffman code in the entropy stream resolves, the
    MCU block order matches the encoder's, and the output is the pinned
    16x16 image (channel means recorded from the first successful
    decode; the decoder is deterministic, so drift = regression)."""
    from victor_spark.operators.jpeg_codec import decode_jpeg, jpeg_dimensions

    payload = _load("real_16x16_420.jpg")
    assert jpeg_dimensions(payload) == (16, 16)
    w, h, arr = decode_jpeg(payload)
    assert (w, h) == (16, 16) and arr.shape == (16, 16, 3)
    means = [float(arr[..., c].mean()) for c in range(3)]
    assert means == pytest.approx([97.890625, 102.29296875, 76.36328125])


def test_real_jpeg_gif_png_agree_cross_codec():
    """python.jpg, python.gif and python.png are THREE real encoders'
    renditions of the SAME 16x16 source image (lossy 4:2:0 JPEG, GIF
    palette quantization, PNG color-type-3 palette). Decoding all three
    through three independent decoders must agree within lossy/palette
    tolerance — a three-way cross-encoder consistency oracle."""
    from victor_spark.operators.jpeg_codec import decode_jpeg
    from victor_spark.operators.multimodal import _parse_gif, _parse_png

    _, _, jarr = decode_jpeg(_load("real_16x16_420.jpg"))
    gw, gh, frames = _parse_gif(_load("real_16x16.gif"))
    assert (gw, gh) == (16, 16) and len(frames) == 1
    garr = frames[0]
    pw, ph, parr = _parse_png(_load("real_16x16_palette.png"))
    assert (pw, ph) == (16, 16)
    for c in range(3):
        means = [
            float(a[..., c].mean()) for a in (jarr, garr, parr)
        ]
        assert max(means) - min(means) < 12, f"channel {c}: {means}"


def test_real_gif_pinned():
    from victor_spark.operators.multimodal import _parse_gif

    w, h, frames = _parse_gif(_load("real_16x16.gif"))
    means = [float(frames[0][..., c].mean()) for c in range(3)]
    assert means == pytest.approx([91.6016, 97.1406, 67.457], abs=1e-3)


def test_real_png_gray_alpha():
    """rust-docs favicon: PNG color type 4 (grayscale+alpha). The glyph
    lives entirely in the ALPHA channel (gray is all 0), so the public
    decode (alpha dropped) is all-black; the test therefore ALSO
    re-inflates the IDAT manually and pins the alpha statistics, which
    proves the zlib stream + scanline layout parse byte-exactly."""
    import struct
    import zlib

    from victor_spark.operators.multimodal import (
        _parse_png,
        _unfilter_scanline,
    )

    payload = _load("real_32x32_gray_alpha.png")
    w, h, arr = _parse_png(payload)
    assert (w, h) == (32, 32) and arr.shape == (32, 32, 3)
    assert int(arr.sum()) == 0  # black glyph on transparency

    pos, idat = 8, b""
    while pos + 8 <= len(payload):
        ln, typ = struct.unpack(">I4s", payload[pos : pos + 8])
        if typ == b"IDAT":
            idat += payload[pos + 8 : pos + 8 + ln]
        pos += 12 + ln
    raw = zlib.decompress(idat)
    stride = 32 * 2  # gray+alpha
    out = np.empty((32, stride), np.uint8)
    prev = np.zeros(stride, np.uint8)
    for y in range(32):
        line = raw[y * (1 + stride) : (y + 1) * (1 + stride)]
        out[y] = _unfilter_scanline(
            line[0], np.frombuffer(line[1:], np.uint8), prev, 2
        )
        prev = out[y]
    alpha = out.reshape(32, 32, 2)[..., 1]
    assert float(alpha.mean()) == pytest.approx(131.2294921875)


def test_real_png_rgba():
    from victor_spark.operators.multimodal import _parse_png

    w, h, arr = _parse_png(_load("real_196x196_rgba.png"))
    assert (w, h) == (196, 196)
    assert float(arr.mean()) == pytest.approx(80.40264473136193)
    assert int((arr.sum(axis=2) > 0).sum()) == 29220


def test_real_png_palette_16bit_and_gray():
    """The round-7 PNG depth/color-type extensions against real
    streams: a color-type-3 palette icon (PLTE resolution), a 16-bit
    RGBA icon (high-byte reduction), and a plain 8-bit grayscale
    2x2 (means pinned from the first successful decode)."""
    from victor_spark.operators.multimodal import _parse_png

    w, h, arr = _parse_png(_load("real_16x16_palette.png"))
    assert (w, h) == (16, 16)
    means = [float(arr[..., c].mean()) for c in range(3)]
    assert means == pytest.approx([96.418, 101.8945, 70.1172], abs=1e-3)

    w, h, arr = _parse_png(_load("real_16x16_rgba16.png"))
    assert (w, h) == (16, 16)
    means = [float(arr[..., c].mean()) for c in range(3)]
    assert means == pytest.approx([181.9727, 183.207, 170.1562], abs=1e-3)

    w, h, arr = _parse_png(_load("real_2x2_gray.png"))
    assert (w, h) == (2, 2)
    assert float(arr.mean()) == 128.0


def test_real_progressive_jpegs_decode():
    """Two REAL progressive (SOF2) JPEGs — the dominant web delivery
    layout — decode end-to-end. thin-white-stripe (nodejs docs) is a
    spectral-selection-only script with per-component non-interleaved
    DC scans and genuine multi-block EOB runs; Spark's grayscale.jpg
    uses FULL successive approximation (DC Al=1 + refinement, AC first
    at Al=2, refinement passes Ah=2→1 and 1→0), so together they
    exercise every Annex-G decode path against real encoder output.
    Channel means pinned from the first successful decode (the decoder
    is deterministic; drift = regression). A stream truncated before
    the final scan still decodes (progressive's defining property) and
    approximates the full image."""
    from victor_spark.operators.jpeg_codec import decode_jpeg, jpeg_dimensions

    payload = _load("real_493x58_progressive.jpg")
    assert jpeg_dimensions(payload) == (493, 58)
    w, h, arr = decode_jpeg(payload)
    assert (w, h, arr.shape) == (493, 58, (58, 493, 3))
    means = [float(arr[..., c].mean()) for c in range(3)]
    assert means == pytest.approx([231.664, 238.489, 230.139], abs=1e-2)

    payload = _load("real_300x215_progressive_gray.jpg")
    assert jpeg_dimensions(payload) == (300, 215)
    w, h, arr = decode_jpeg(payload)
    assert (w, h, arr.shape) == (300, 215, (215, 300, 3))
    assert np.array_equal(arr[..., 0], arr[..., 1])  # gray replicated
    assert float(arr.mean()) == pytest.approx(142.136, abs=1e-2)

    # truncate after the 4th of 6 scans, re-terminate with EOI: the
    # partial stream must decode to an approximation of the full image.
    # Proper marker walk (a raw FF-DA byte scan false-positives inside
    # DHT/DQT table content); after each SOS, skip the entropy segment
    # to the next non-stuffed, non-restart marker.
    sos_offsets, i = [], 2
    while i + 4 < len(payload):
        assert payload[i] == 0xFF
        marker = payload[i + 1]
        if marker == 0xD9:
            break
        seglen = int.from_bytes(payload[i + 2 : i + 4], "big")
        if marker == 0xDA:
            sos_offsets.append(i)
            i += 2 + seglen
            while i + 1 < len(payload) and not (
                payload[i] == 0xFF
                and payload[i + 1] != 0x00
                and not (0xD0 <= payload[i + 1] <= 0xD7)
            ):
                i += 1
            continue
        i += 2 + seglen
    assert len(sos_offsets) == 6
    partial = payload[: sos_offsets[4]] + b"\xff\xd9"
    _w, _h, approx = decode_jpeg(partial)
    mad = float(np.abs(approx.astype(int) - arr.astype(int)).mean())
    assert 0 < mad < 8  # close but not equal: refinement scans missing


def test_real_raster_family_decodes_bit_exact_cross_codec():
    """EIGHT more real renditions of the SAME 16x16 source image, one
    per simple-raster container: P6 PPM (pins the package's ORIGINAL
    codec against an external encoder for the first time), P5 PGM,
    P4 PBM, 32-bit BI_BITFIELDS BMP (V5 header), byte-RLE Sun raster,
    scanline-RLE SGI, uncompressed-RGBA little-endian TIFF and XBM.
    The five RGB containers are LOSSLESS, so they must decode to
    BIT-IDENTICAL pixels — a five-way cross-encoder, cross-compression
    equality oracle — and the monochrome pair (PBM/XBM) must agree
    with each other bit-exactly and with the thresholded luminance of
    the RGB rendition on most pixels."""
    import numpy as np

    from victor_spark.operators.multimodal import _parse_image

    rgb = {}
    for name in (
        "real_16x16.ppm",
        "real_16x16_bitfields.bmp",
        "real_16x16_rle.ras",
        "real_16x16_rle.sgi",
        "real_16x16_rgba.tiff",
    ):
        w, h, arr = _parse_image(_load(name))
        assert (w, h, arr.shape) == (16, 16, (16, 16, 3)), name
        rgb[name] = arr
    ref = rgb["real_16x16.ppm"]
    for name, arr in rgb.items():
        assert np.array_equal(arr, ref), name  # five-way bit-exact
    means = [float(ref[..., c].mean()) for c in range(3)]
    assert means == pytest.approx([96.4180, 101.8945, 70.1172], abs=1e-3)

    w, h, gray = _parse_image(_load("real_16x16.pgm"))
    assert (w, h) == (16, 16)
    assert np.array_equal(gray[..., 0], gray[..., 1])
    assert float(gray.mean()) == pytest.approx(98.41015625, abs=1e-3)

    w, h, pbm = _parse_image(_load("real_16x16.pbm"))
    w, h, xbm = _parse_image(_load("real_16x16.xbm"))
    assert np.array_equal(pbm, xbm)  # same bitmap, two containers
    assert set(np.unique(pbm)) <= {0, 255}
    # the bitmap is a threshold of the color art: agree on >=75% of px
    lum = ref.mean(axis=2)
    agree = ((pbm[..., 0] == 0) == (lum < 128)).mean()
    assert agree >= 0.75, agree


def test_real_wavs_cross_depth_consistency():
    """Five REAL renditions of the same recording (stereo, at PCM
    8/16/24/32 bits plus an EXTENSIBLE wrapper) all decode to the same
    mono-int16 stream: 16/24/32/extensible agree within 1 LSB of the
    lake normalization (24/32-bit dither lives below the truncated
    bits), PCM8 within its 8-bit quantization step."""
    from victor_spark.operators.multimodal import _parse_wav

    decoded = {}
    for name in (
        "real_pluck_pcm8_stereo.wav",
        "real_pluck_pcm16_stereo.wav",
        "real_pluck_pcm24_stereo.wav",
        "real_pluck_pcm32_stereo.wav",
        "real_pluck_pcm24_extensible.wav",
    ):
        rate, s = _parse_wav(_load(name))
        assert rate == 11025
        decoded[name] = s.astype(np.int32)
    ref = decoded["real_pluck_pcm16_stereo.wav"]
    assert len(ref) == 3307
    for name in (
        "real_pluck_pcm24_stereo.wav",
        "real_pluck_pcm32_stereo.wav",
        "real_pluck_pcm24_extensible.wav",
    ):
        assert len(decoded[name]) == len(ref)
        # per-channel truncation to 16 bits happens BEFORE the stereo
        # downmix floor-divide, so each of l and r can sit 1 below the
        # 16-bit rendition's value: bound is 2, not 1
        assert int(np.abs(decoded[name] - ref).max()) <= 2, name
    s8 = decoded["real_pluck_pcm8_stereo.wav"]
    assert len(s8) == len(ref)
    assert int(np.abs(s8 - ref).max()) <= 256  # one 8-bit step


def test_real_ico_favicons_decode():
    """Two real multi-resolution Windows ICOs (IDLE's icon from two
    CPython eras): the modern one's best entry is an EMBEDDED PNG at
    256x256; the classic one's is a 32-bpp DIB at 48x48 (doubled-
    height header, AND mask dropped), alongside 4/8-bit palette
    entries. The 48x48 32-bpp entry is byte-identical in both files,
    so decoding it from either container must agree bit-exactly —
    pinned via the means below (decoders are deterministic)."""
    import numpy as np

    from victor_spark.operators.multimodal import _parse_image

    w, h, arr = _parse_image(_load("real_multires_png_entry.ico"))
    assert (w, h, arr.shape) == (256, 256, (256, 256, 3))
    means = [float(arr[..., c].mean()) for c in range(3)]
    assert means == pytest.approx([162.28, 163.15, 155.69], abs=1e-2)

    w, h, arr = _parse_image(_load("real_multires_palette.ico"))
    assert (w, h, arr.shape) == (48, 48, (48, 48, 3))
    means = [float(arr[..., c].mean()) for c in range(3)]
    assert means == pytest.approx([150.09, 150.72, 143.57], abs=1e-2)


def test_real_aiff_au_cross_container_consistency():
    """EIGHT real renditions of the pluck recording in THREE more
    audio containers — AIFF PCM 8 (SIGNED, unlike WAV)/16/24 with the
    format's 80-bit extended-float sample rate, AIFF-C G.711 µ-law AND
    A-law (the A-law expansion's only real-encoder pin), Sun AU PCM
    16/24 and µ-law — all decode to the same mono-int16 stream as the
    WAV reference: PCM within the cross-master dither (≤3 at 16-bit+,
    one step at 8-bit), companded within the G.711 quantization
    interval. A wrong A-law segment formula or AU/AIFF byte order
    lands hundreds of times outside these bounds."""
    import numpy as np

    from victor_spark.operators.multimodal import _parse_audio, _parse_wav

    ref_rate, ref = _parse_wav(_load("real_pluck_pcm16_stereo.wav"))
    ref = ref.astype(np.int32)
    bounds = {
        "real_pluck_pcm8.aiff": 256,
        "real_pluck_pcm16.aiff": 3,
        "real_pluck_pcm24.aiff": 3,
        "real_pluck_ulaw.aifc": 400,
        "real_pluck_alaw.aifc": 400,
        "real_pluck_pcm16.au": 3,
        "real_pluck_pcm24.au": 3,
        "real_pluck_ulaw.au": 400,
    }
    for name, bound in bounds.items():
        rate, s = _parse_audio(_load(name))
        assert rate == ref_rate == 11025, name
        assert len(s) == len(ref) == 3307, name
        assert int(np.abs(s.astype(np.int32) - ref).max()) <= bound, name


def test_real_fixtures_route_through_media_ingest(spark, tmp_path):
    """End-to-end: a directory holding every external fixture ingests
    through load_media_dir with the right kind + metadata per file —
    the 4:2:0 JPEG and type-4 PNG land as decodable images, the
    24/32-bit and extensible WAVs as audio with the real sample rate,
    nothing quarantined to kind='binary'."""
    import shutil

    from victor_spark.sources.media import load_media_dir

    lake = tmp_path / "lake"
    lake.mkdir()
    for name in os.listdir(FIX):
        if name.endswith((".jpg", ".gif", ".png", ".wav", ".ppm", ".pgm",
                          ".pbm", ".bmp", ".ras", ".sgi", ".tiff", ".xbm",
                          ".aiff", ".aifc", ".au", ".ico")):
            shutil.copy(os.path.join(FIX, name), lake / name)
    rows = load_media_dir(spark, str(lake)).collect()
    assert len(rows) == 32
    assert all(r["kind"] in ("image", "audio") for r in rows)  # none binary
    audio = [r for r in rows if r["kind"] == "audio"]
    assert len(audio) == 13
    assert all(r["meta_sample_rate"] == 11025 for r in audio)
    widths = sorted(
        r["meta_width"] for r in rows if r["kind"] == "image"
    )
    assert widths == [2] + [16] * 12 + [32, 48, 196, 256, 300, 493]


def test_real_mp3_frame_walk_and_loud_decode_stub():
    """A real MPEG-2 Layer III MP3 (gsutil test data, ID3v2.4-tagged,
    22050 Hz mono): the frame-header walk must traverse EVERY frame and
    land exactly on end-of-stream — a single wrong bitrate/rate table
    entry desyncs immediately, so a clean walk pins the public header
    tables against a real encoder. Decode stays a LOUD stub."""
    from victor_spark.operators.mp3_probe import (
        looks_like_mp3,
        mp3_probe,
    )
    from victor_spark.operators.multimodal import _parse_audio

    payload = _load("real_mpeg2l3_mono.mp3")
    assert looks_like_mp3(payload)
    info = mp3_probe(payload)
    assert info["sample_rate"] == 22050
    assert info["channels"] == 1
    assert info["n_frames"] == 45
    assert info["n_samples"] == 45 * 576  # MPEG-2 Layer III LSF frames
    assert abs(info["duration_s"] - 25920 / 22050) < 1e-9
    assert info["mean_kbps"] == 64.0

    # entropy decode is deliberately NOT implemented — loudly
    with pytest.raises(NotImplementedError):
        _parse_audio(payload)

    # corruption / false-positive quarantine: ValueError only
    with pytest.raises(ValueError):
        mp3_probe(payload[: len(payload) - 7])  # truncated final frame
    with pytest.raises(ValueError):
        mp3_probe(b"\xff\xe3" + b"\x00" * 100)  # sync then garbage
    tagged = payload + b"junk-after-stream"
    with pytest.raises(ValueError):
        mp3_probe(tagged)
    # ID3v1 'TAG' trailer is legal and skipped
    info2 = mp3_probe(payload + b"TAG" + b"\x00" * 125)
    assert info2 == info


def test_real_mp3_sniffs_as_audio_with_metadata(spark, tmp_path):
    """load_media_dir routes the real MP3 to kind='audio' with its true
    sample rate (the round-7 verdict item: honest metadata instead of
    kind='binary' quarantine), while a corrupted copy quarantines."""
    import shutil

    from victor_spark.sources.media import load_media_dir

    d = tmp_path / "m"
    d.mkdir()
    shutil.copy(os.path.join(FIX, "real_mpeg2l3_mono.mp3"), d / "ok.mp3")
    good = _load("real_mpeg2l3_mono.mp3")
    (d / "bad.mp3").write_bytes(good[: len(good) - 7])
    rows = {
        os.path.basename("ok.mp3" if r["meta_sample_rate"] else "bad.mp3"): r
        for r in load_media_dir(spark, str(d)).collect()
    }
    assert rows["ok.mp3"]["kind"] == "audio"
    assert rows["ok.mp3"]["meta_sample_rate"] == 22050
    assert rows["bad.mp3"]["kind"] == "binary"
    assert rows["bad.mp3"]["meta_sample_rate"] is None


def test_decodable_audio_prefilter_guards_strict_farms(spark, tmp_path):
    """The strict audio farms refuse MP3 loudly (no entropy decode), and
    since the sniffer now classifies MP3 as kind='audio', mixed lakes
    pre-filter with the JVM-side decodable_audio predicate: filtered,
    the farm decodes every remaining row; unfiltered, the job fails with
    the loud stub rather than faking samples."""
    import shutil

    from pyspark.sql import functions as F

    from victor_spark.operators.multimodal import (
        decodable_audio,
        decode_audio_stats,
    )
    from victor_spark.sources.media import load_media_dir

    d = tmp_path / "lake"
    d.mkdir()
    shutil.copy(os.path.join(FIX, "real_mpeg2l3_mono.mp3"), d / "song.mp3")
    shutil.copy(os.path.join(FIX, "real_pluck_pcm16_stereo.wav"), d / "a.wav")
    shutil.copy(os.path.join(FIX, "real_pluck_pcm16.aiff"), d / "b.aiff")
    shutil.copy(os.path.join(FIX, "real_pluck_ulaw.au"), d / "c.au")
    media = load_media_dir(spark, str(d)).filter("kind = 'audio'")
    assert media.count() == 4  # MP3 included, honestly

    ok = media.filter(decodable_audio("payload"))
    stats = decode_audio_stats(ok).collect()
    assert len(stats) == 3 and all(r["n_samples"] > 0 for r in stats)

    with pytest.raises(Exception, match="MP3"):
        decode_audio_stats(media).collect()  # loud, not faked


def test_mp3_frame_walk_full_header_grid():
    """Sweep the ENTIRE legal header space — every (version, layer,
    bitrate index, sample-rate index, padding) combination: synthesize a
    3-frame stream whose frame lengths follow the spec formula and
    assert the walk traverses it exactly (counts, rate, samples per
    frame), plus ID3v2(+footer) and ID3v1 tag skipping on top. A single
    wrong table entry or formula branch desyncs the walk immediately."""
    from victor_spark.operators.mp3_probe import (
        _BITRATES,
        _RATES,
        _frame_header,
        mp3_probe,
    )

    def synth(vbits, lbits, bridx, sridx, pad, n_frames=3):
        h = (
            (0x7FF << 21) | (vbits << 19) | (lbits << 17) | (0 << 16)
            | (bridx << 12) | (sridx << 10) | (pad << 9) | (3 << 6)
        )
        hdr = h.to_bytes(4, "big")
        frame_len, spf, rate, ch, kbps = _frame_header(hdr, 0)
        return (hdr + b"\x00" * (frame_len - 4)) * n_frames, spf, rate

    checked = 0
    for vbits in (0, 2, 3):  # 2.5, 2, 1
        for lbits in (1, 2, 3):  # III, II, I
            layer = 4 - lbits
            vkey = 1 if vbits == 3 else 2
            for bridx in range(1, 15):
                for sridx in range(3):
                    for pad in (0, 1):
                        stream, spf, rate = synth(vbits, lbits, bridx, sridx, pad)
                        info = mp3_probe(stream)
                        assert info["n_frames"] == 3
                        assert info["n_samples"] == 3 * spf
                        assert info["sample_rate"] == rate == _RATES[vbits][sridx]
                        assert info["mean_kbps"] == _BITRATES[(vkey, layer)][bridx - 1]
                        checked += 1
    assert checked == 3 * 3 * 14 * 3 * 2  # 756 legal headers

    # tags wrap transparently: ID3v2 with footer flag + ID3v1 trailer
    stream, spf, rate = synth(3, 1, 9, 0, 0)
    size = 100
    id3v2 = (b"ID3\x04\x00\x10" + bytes([0, 0, size >> 7, size & 0x7F])
             + b"\x00" * (size + 10))
    wrapped = id3v2 + stream + b"TAG" + b"\x00" * 125
    assert mp3_probe(wrapped)["n_frames"] == 3
    # a desynced stream (frame truncated by one byte) still quarantines
    with pytest.raises(ValueError):
        mp3_probe(stream[:-1])


def test_real_webp_header_probe_and_loud_stub(spark, tmp_path):
    """A real VP8X WebP (CPython test data — ALPH + lossy VP8, the same
    16x16 source image as the JPEG/GIF/PNG fixtures): the header probe
    must read 16x16 from BOTH the extended canvas and the VP8 keyframe
    (they cross-check each other), the sniffer classifies it as image
    with real dims, pixel decode stays a loud stub, and decodable_image
    pre-filters it out of the strict farms."""
    import shutil

    from pyspark.sql import functions as F

    from victor_spark.operators.multimodal import (
        _parse_image,
        decodable_image,
        decode_image_stats,
        webp_dimensions,
    )
    from victor_spark.sources.media import load_media_dir

    payload = _load("real_16x16_vp8x.webp")
    assert webp_dimensions(payload) == (16, 16)
    with pytest.raises(NotImplementedError, match="WebP"):
        _parse_image(payload)
    # corruption: ValueError only (bad start code; truncated chunk;
    # trailing garbage; lying RIFF size; animated container)
    bad = bytearray(payload)
    i = payload.index(b"\x9d\x01\x2a")
    bad[i] = 0x00
    with pytest.raises(ValueError):
        webp_dimensions(bytes(bad))
    with pytest.raises(ValueError):
        webp_dimensions(payload[:20])
    with pytest.raises(ValueError, match="RIFF size"):
        webp_dimensions(payload + b"\x00" * 7)  # strict: walk must tile
    import struct as _struct

    lying = payload[:4] + _struct.pack("<I", 99) + payload[8:]
    with pytest.raises(ValueError, match="RIFF size"):
        webp_dimensions(lying)
    vp8x = (b"VP8X" + _struct.pack("<I", 10) + b"\x02\x00\x00\x00"
            + (15).to_bytes(3, "little") + (15).to_bytes(3, "little"))
    body = b"WEBP" + vp8x
    anim = b"RIFF" + _struct.pack("<I", len(body)) + body
    with pytest.raises(ValueError, match="animated"):
        webp_dimensions(anim)  # ANIM flag: not a still, quarantine

    d = tmp_path / "lake"
    d.mkdir()
    shutil.copy(os.path.join(FIX, "real_16x16_vp8x.webp"), d / "w.webp")
    shutil.copy(os.path.join(FIX, "real_16x16_palette.png"), d / "p.png")
    media = load_media_dir(spark, str(d)).filter("kind = 'image'")
    rows = {r["meta_width"]: r for r in media.collect()}
    assert len(rows) == 1  # both are 16 wide — one bucket
    assert media.count() == 2  # webp included, honestly, with dims
    ok = media.filter(decodable_image("payload"))
    stats = decode_image_stats(ok).collect()
    assert len(stats) == 1 and stats[0]["width"] == 16
    with pytest.raises(Exception, match="WebP"):
        decode_image_stats(media).collect()  # loud, not faked
