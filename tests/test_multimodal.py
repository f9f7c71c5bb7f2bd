"""Multimodal binary-column plumbing: schema, batch shape, determinism."""

from __future__ import annotations

import pytest

from victor_spark.operators import multimodal as M


def _media(spark):
    df = spark.createDataFrame(
        [(1, "hello world"), (2, "another doc"), (3, "x")], "id long, text string"
    )
    return M.synthesize_media(df, "id", "text", kind="image")


def test_media_schema(spark):
    m = _media(spark)
    assert [f.name for f in m.schema.fields] == [
        "media_id", "kind", "payload", "meta_width", "meta_height", "meta_sample_rate",
    ]
    assert m.schema["payload"].dataType.typeName() == "binary"


def test_extract_features_one_row_per_input(spark):
    m = _media(spark)
    feats = M.extract_features(m)
    rows = {r["media_id"]: r for r in feats.collect()}
    assert set(rows) == {1, 2, 3}
    assert rows[1]["n_bytes"] == len(b"hello world")
    assert rows[1]["checksum"] == sum(b"hello world")
    assert len(rows[1]["features"]) == 8  # image histogram stub


def test_extract_features_deterministic(spark):
    m = _media(spark)
    a = sorted(M.extract_features(m).collect())
    b = sorted(M.extract_features(m).collect())
    assert a == b


def test_unknown_kind_raises(spark):
    df = spark.createDataFrame([(1, "x")], "id long, text string")
    bad = M.synthesize_media(df, "id", "text", kind="hologram")
    with pytest.raises(Exception, match="hologram"):
        M.extract_features(bad).collect()


def test_kinds_route_to_decoders(spark):
    df = spark.createDataFrame([(1, "abc")], "id long, text string")
    audio = M.extract_features(M.synthesize_media(df, "id", "text", kind="audio"))
    assert len(audio.first()["features"]) == 4  # audio stub: mean/max/min/len


def test_resize_images_byte_contract(spark):
    m = _media(spark)  # all images
    out = {r["media_id"]: r for r in M.resize_images(m, 64, 64).collect()}
    # 64x64 at 1 byte per 8x8 block = 64-byte payload, truncated or zero-padded
    assert all(len(bytes(r["payload"])) == 64 for r in out.values())
    assert out[1]["meta_width"] == 64 and out[1]["meta_height"] == 64
    assert bytes(out[1]["payload"]).rstrip(b"\x00") == b"hello world"
    assert bytes(out[3]["payload"])[:1] == b"x"


def test_resize_non_image_passthrough(spark):
    df = spark.createDataFrame([(1, "some audio doc")], "id long, text string")
    audio = M.synthesize_media(df, "id", "text", kind="audio")
    r = M.resize_images(audio, 64, 64).first()
    assert bytes(r["payload"]) == b"some audio doc"  # untouched
    assert r["meta_width"] != 64 or r["meta_height"] != 64


def test_sample_frames_contract(spark):
    from victor_spark.operators.multimodal import sample_frames

    media = spark.createDataFrame(
        [
            (1, "video", bytes(range(40)), 1, 1, 0),   # 40 B -> frames 0,1,2 (tail 8 B); sampled 0,2
            (2, "image", b"\x00" * 64, 1, 1, 0),        # non-video: no rows
            (3, "video", b"", 1, 1, 0),                 # empty: no rows
        ],
        "media_id long, kind string, payload binary, meta_width int, meta_height int, meta_sample_rate int",
    )
    rows = sorted(
        sample_frames(media, frame_bytes=16, stride=2).collect(),
        key=lambda r: (r["media_id"], r["frame_idx"]),
    )
    assert [(r["media_id"], r["frame_idx"], r["n_frames"]) for r in rows] == [
        (1, 0, 3), (1, 2, 3)
    ]
    assert bytes(rows[0]["frame"]) == bytes(range(16))
    assert bytes(rows[1]["frame"]) == bytes(range(32, 40))  # short tail, no padding


# ---------------------------------------------------------------------------
# REAL uncompressed-format codecs (round-4 verdict task 2)
# ---------------------------------------------------------------------------


def test_ppm_codec_roundtrip_and_comments():
    import numpy as np

    arr = np.arange(8 * 8 * 3, dtype=np.uint8).reshape(8, 8, 3)
    payload = M._encode_ppm(arr)
    w, h, maxval, back = M._parse_ppm(payload)
    assert (w, h, maxval) == (8, 8, 255) and (back == arr).all()
    # header comments and arbitrary token whitespace per the Netpbm spec
    commented = b"P6\n# a comment\n8  8\n# another\n255\n" + arr.tobytes()
    _, _, _, back2 = M._parse_ppm(commented)
    assert (back2 == arr).all()
    with pytest.raises(ValueError, match="raster short"):
        M._parse_ppm(payload[:-1])
    with pytest.raises(ValueError, match="not a P6"):
        M._parse_ppm(b"P5\n8 8\n255\n" + b"\x00" * 64)


def test_wav_codec_roundtrip_and_chunk_walk():
    import numpy as np
    import struct

    samples = np.arange(-32, 32, dtype=np.int16) * 512
    payload = M._encode_wav(samples, 22050)
    rate, back = M._parse_wav(payload)
    assert rate == 22050 and (back == samples).all()
    # an extra chunk between fmt and data must be walked over, not choked on
    fmt_end = 12 + 8 + 16
    extra = b"LIST" + struct.pack("<I", 4) + b"INFO"
    with_extra = payload[:fmt_end] + extra + payload[fmt_end:]
    rate2, back2 = M._parse_wav(with_extra)
    assert rate2 == 22050 and (back2 == samples).all()
    # stereo is now REALLY decoded: the same byte stream re-labelled as
    # 2-channel downmixes each adjacent pair with floor semantics
    two_ch = bytearray(payload)
    two_ch[22] = 2  # num_channels = 2
    _, mixed = M._parse_wav(bytes(two_ch))
    assert (mixed == (samples[0::2].astype(int)
                      + samples[1::2].astype(int)) // 2).all()
    # genuinely unsupported encodings are rejected, not mis-decoded
    bad = bytearray(payload)
    bad[20] = 3  # audio_format = IEEE float
    with pytest.raises(ValueError, match="unsupported WAV encoding"):
        M._parse_wav(bytes(bad))
    with pytest.raises(ValueError, match="RIFF"):
        M._parse_wav(b"OggS" + payload[4:])


def test_decode_image_real_vs_stub_dispatch():
    import numpy as np

    arr = np.zeros((4, 4, 3), dtype=np.uint8)
    arr[..., 0] = 200  # solid red-ish
    feats = M._decode_image(M._encode_ppm(arr))
    # [w, h, mean_r, mean_g, mean_b, min, max, std_gray]
    assert feats[:5] == [4.0, 4.0, 200.0, 0.0, 0.0]
    assert feats[5] == 0.0 and feats[6] == 200.0
    # non-PPM payloads still take the byte-histogram stub (8 buckets, sum 1)
    stub = M._decode_image(b"\x89PNG fake compressed bytes")
    assert len(stub) == 8 and abs(sum(stub) - 1.0) < 1e-9


def test_decode_audio_real_vs_stub_dispatch():
    samples = [0, 100, -100, 300]
    feats = M._decode_audio(M._encode_wav(samples, 8000))
    assert feats[0] == 8000.0 and feats[1] == 4.0
    assert abs(feats[2] - 75.0) < 1e-12  # mean
    assert abs(feats[3] - (sum(s * s for s in samples) / 4) ** 0.5) < 1e-9
    assert len(M._decode_audio(b"not riff")) == 4  # stub path


def test_resize_ppm_nearest_neighbor():
    import numpy as np

    rng = np.random.default_rng(7)
    arr = rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8)
    out = M._resize_image(M._encode_ppm(arr), 4, 4)
    w, h, _, small = M._parse_ppm(out)
    assert (w, h) == (4, 4)
    assert (small == arr[[0, 2, 4, 6]][:, [0, 2, 4, 6]]).all()
    # upscale repeats source pixels (true nearest-neighbor, not padding)
    up = M._resize_image(M._encode_ppm(arr), 16, 16)
    _, _, _, big = M._parse_ppm(up)
    assert (big[::2, ::2] == arr).all() and (big[1::2, 1::2] == arr).all()


def test_synthesize_ppm_is_valid_and_decodes(spark):
    df = spark.createDataFrame(
        [(1, "abcdefghij" * 6), (2, "zz")], "id long, text string"
    )
    media = M.synthesize_ppm(df, "id", "text", width=8, height=8)
    rows = {r["media_id"]: r for r in media.collect()}
    w, h, maxval, arr = M._parse_ppm(bytes(rows[1]["payload"]))
    assert (w, h, maxval) == (8, 8, 255)
    expected = ("abcdefghij" * 20)[:192].encode()
    assert arr.tobytes() == expected
    # the SQL cycling handles texts shorter than the raster
    _, _, _, arr2 = M._parse_ppm(bytes(rows[2]["payload"]))
    assert arr2.tobytes() == (b"zz" * 96)
    stats = {r["media_id"]: r for r in M.decode_image_stats(media).collect()}
    assert stats[2]["mean_r"] == float(ord("z"))
    assert stats[2]["min_px"] == stats[2]["max_px"] == ord("z")


def test_synthesize_wav_is_valid_and_decodes(spark):
    df = spark.createDataFrame([(5, "AB")], "id long, text string")
    media = M.synthesize_wav(df, "id", "text", n_samples=4, sample_rate=8000)
    r = media.first()
    rate, samples = M._parse_wav(bytes(r["payload"]))
    # sample j = (ord(text[j % len]) - 80) * 128, cycled A,B,A,B
    exp = [(ord(c) - 80) * 128 for c in "ABAB"]
    assert rate == 8000 and list(samples) == exp
    stats = M.decode_audio_stats(media).first()
    assert stats["sample_rate"] == 8000 and stats["n_samples"] == 4
    assert stats["mean_amp"] == sum(exp) / 4
    assert stats["min_amp"] == min(exp) and stats["max_amp"] == max(exp)


def test_image_dhash_resize_invariant(spark):
    """The perceptual property the operator exists for: a nearest-neighbor
    upscale hashes identically to its source image, while a genuinely
    different image hashes differently."""
    df = spark.createDataFrame(
        [(1, "0123456789abcdef0123456789abcdef"),
         (2, "fedcba9876543210fedcba9876543210")],
        "id long, text string",
    )
    base = M.synthesize_ppm(df, "id", "text", width=8, height=8)
    up = M.resize_images(
        base.withColumn("media_id", base["media_id"] + 100), 16, 16
    )
    hashes = {r["media_id"]: r["dhash"]
              for r in M.image_dhash(base.unionByName(up)).collect()}
    assert len(hashes[1]) == 64 and set(hashes[1]) <= {"0", "1"}
    assert hashes[1] == hashes[101]   # resize-invariant
    assert hashes[2] == hashes[102]
    assert hashes[1] != hashes[2]     # different images differ


def test_resample_audio_zero_order_hold(spark):
    import numpy as np

    df = spark.createDataFrame([(1, "AbCd")], "id long, text string")
    base = M.synthesize_wav(df, "id", "text", n_samples=8, sample_rate=1000)
    out = M.resample_audio(base, factor=3).first()
    rate, samples = M._parse_wav(bytes(out["payload"]))
    _, orig = M._parse_wav(bytes(base.first()["payload"]))
    assert rate == 3000 and out["meta_sample_rate"] == 3000
    assert (samples == np.repeat(orig, 3)).all()
    # non-RIFF rows pass through untouched
    img = M.synthesize_ppm(df, "id", "text", 4, 4)
    passthrough = M.resample_audio(img, factor=2).first()
    assert bytes(passthrough["payload"]) == bytes(img.first()["payload"])


def test_audio_fingerprint_resample_invariant(spark):
    df = spark.createDataFrame(
        [(1, "0123456789abcdef0123456789abcdef"),
         (2, "fedcba9876543210fedcba9876543210")],
        "id long, text string",
    )
    base = M.synthesize_wav(df, "id", "text", n_samples=64, sample_rate=16000)
    for factor in (2, 3, 5):
        clones = M.resample_audio(
            base.withColumn("media_id", base["media_id"] + 100 * factor),
            factor=factor,
        )
        fps = {r["media_id"]: r["dhash"]
               for r in M.audio_fingerprint(base.unionByName(clones)).collect()}
        assert len(fps[1]) == 64 and set(fps[1]) <= {"0", "1"}
        assert fps[1] == fps[1 + 100 * factor]    # invariant at this factor
        assert fps[2] == fps[2 + 100 * factor]
        assert fps[1] != fps[2]                   # different clips differ


def test_y4m_codec_roundtrip_and_chroma():
    frames = [bytes(range(24)), bytes(range(100, 124))]  # 4x4 C420 = 24 B
    payload = M._encode_y4m(frames, 4, 4, "420")
    w, h, chroma, back = M._parse_y4m(payload)
    assert (w, h, chroma) == (4, 4, "420") and back == frames
    # C444 frames are 3x the luma plane; mono is luma only
    f444 = [bytes(48)]
    w, h, c, back = M._parse_y4m(M._encode_y4m(f444, 4, 4, "444"))
    assert c == "444" and back == f444
    w, h, c, back = M._parse_y4m(M._encode_y4m([bytes(16)], 4, 4, "mono"))
    assert c == "mono" and back == [bytes(16)]
    # truncated tail frame and corrupt markers are rejected
    import pytest as _pytest

    with _pytest.raises(ValueError, match="frame short"):
        M._parse_y4m(payload[:-1])
    with _pytest.raises(ValueError, match="FRAME"):
        M._parse_y4m(payload.replace(b"FRAME", b"FRANE", 1))
    with _pytest.raises(ValueError, match="not a YUV4MPEG2"):
        M._parse_y4m(b"RIFF" + payload)


def test_sample_frames_real_y4m_demux(spark):
    """sample_frames dispatches on the y4m magic: real demux yields the
    exact decoded frame bytes at stride positions with the TRUE frame
    count, while non-y4m video payloads keep the byte-slicing stub."""
    df = spark.createDataFrame(
        [(1, "0123456789abcdef0123456789abcdef")], "id long, text string"
    )
    media = M.synthesize_y4m(df, "id", "text", width=4, height=4, n_frames=5)
    rows = sorted(
        M.sample_frames(media, stride=2).collect(),
        key=lambda r: r["frame_idx"],
    )
    assert [(r["frame_idx"], r["n_frames"]) for r in rows] == [
        (0, 5), (2, 5), (4, 5)
    ]
    t = "0123456789abcdef0123456789abcdef"
    for r in rows:
        f = r["frame_idx"]
        expect = bytes(ord(t[(f * 24 + i) % 32]) for i in range(24))
        assert bytes(r["frame"]) == expect
    # the stub path still handles opaque (compressed) video bytes
    stub = spark.createDataFrame(
        [(2, "video", bytes(range(40)), 1, 1, 0)],
        "media_id long, kind string, payload binary, meta_width int, "
        "meta_height int, meta_sample_rate int",
    )
    srows = M.sample_frames(stub, frame_bytes=16, stride=2).collect()
    assert [(r["frame_idx"], r["n_frames"]) for r in sorted(
        srows, key=lambda r: r["frame_idx"])] == [(0, 3), (2, 3)]


def test_synthesize_png_is_valid_and_decodes(spark):
    """synthesize_png emits genuine PNG containers (signature, CRC'd
    chunks, deflate stream, cycling scanline filters) whose DECODED
    pixels equal the cycled text bytes — the compressed-format twin of
    synthesize_ppm — and the whole image operator family (stats farm,
    perceptual hash, resize) runs on them."""
    import numpy as np

    from victor_spark.operators import multimodal as M

    df = spark.createDataFrame(
        [(1, "0123456789abcdef0123456789abcdef")], "doc_id long, text string"
    )
    media = M.synthesize_png(df, "doc_id", "text", width=8, height=8)
    row = media.collect()[0]
    payload = bytes(row["payload"])
    assert payload.startswith(M._PNG_SIG)
    assert row["kind"] == "image" and row["meta_width"] == 8

    w, h, arr = M._parse_png(payload)
    t = "0123456789abcdef0123456789abcdef".encode()
    expect = np.frombuffer((t * 6)[:192], dtype=np.uint8).reshape(8, 8, 3)
    assert (w, h) == (8, 8) and (arr == expect).all()
    # the container is smaller than the raw raster+header would be for
    # this repetitive content — i.e. the deflate is real compression
    assert len(payload) < len(M._encode_ppm(expect))

    stats = M.decode_image_stats(media).collect()[0]
    assert stats["width"] == 8 and stats["mean_r"] == float(
        expect[..., 0].mean()
    )
    dh = M.image_dhash(media).collect()[0]["dhash"]
    assert dh == M._dhash_bits(expect)
    resized = M.resize_images(media, 4, 4).collect()[0]
    out = bytes(resized["payload"])
    assert out.startswith(M._PNG_SIG)  # PNG in -> PNG out
    _, _, small = M._parse_png(out)
    ys = (np.arange(4) * 8) // 4
    assert (small == expect[ys][:, ys]).all()


def test_load_media_dir_sniffs_png(spark, tmp_path):
    """A real .png file on disk ingests as kind='image' with geometry
    from its own IHDR; a corrupt PNG quarantines as binary."""
    import numpy as np

    from victor_spark.operators import multimodal as M
    from victor_spark.sources.media import load_media_dir

    d = tmp_path / "lake"
    d.mkdir()
    arr = np.arange(5 * 3 * 3, dtype=np.uint8).reshape(3, 5, 3)
    (d / "img.png").write_bytes(M._encode_png(arr, "cycle"))
    bad = bytearray(M._encode_png(arr))
    bad[-5] ^= 0xFF  # IEND CRC
    (d / "bad.png").write_bytes(bytes(bad))

    rows = {r["kind"]: r for r in load_media_dir(spark, str(d)).collect()}
    assert (rows["image"]["meta_width"], rows["image"]["meta_height"]) == (5, 3)
    assert rows["binary"]["meta_width"] is None


def test_gif_external_fixture_and_structure():
    """The decoder opens the canonical 35-byte 1x1 white-pixel GIF89a —
    an EXTERNAL fixture (documented byte-for-byte in the 'smallest GIF'
    references, not produced by our encoder) — pinning the LZW bit
    packing and width conventions to the interoperable ones. Corrupt
    containers raise ValueError for the quarantine path."""
    import pytest

    from victor_spark.operators import multimodal as M

    g = bytes.fromhex(
        "474946383961"          # GIF89a
        "01000100800000"        # 1x1 logical screen, 2-entry GCT
        "ffffff000000"          # palette: white, black
        "2c000000000100010000"  # full-frame image descriptor
        "0202440100"            # LZW min=2, [44 01], terminator
        "3b"
    )
    w, h, frames = M._parse_gif(g)
    assert (w, h) == (1, 1) and frames[0].tolist() == [[[255, 255, 255]]]

    with pytest.raises(ValueError, match="not a GIF"):
        M._parse_gif(b"GIF99a" + g[6:])
    with pytest.raises(ValueError, match="truncated GIF data sub-block"):
        M._parse_gif(g[:-3])
    bad = bytearray(g)
    bad[30] = 0x07  # declare a 7-byte sub-block where 2 bytes follow
    with pytest.raises(ValueError, match="truncated GIF"):
        M._parse_gif(bytes(bad))


def test_synthesize_gif_decodes_and_samples_frames(spark):
    """synthesize_gif emits genuine LZW-compressed containers: a still
    feeds the image decode farm (stats/dHash); an animated one is a
    compressed video container whose frames sample_frames really
    demuxes, matching the index/palette derivation exactly."""
    import numpy as np

    from victor_spark.operators import multimodal as M

    df = spark.createDataFrame(
        [(1, "0123456789abcdef0123456789abcdef")], "doc_id long, text string"
    )
    t = "0123456789abcdef0123456789abcdef"
    i = np.arange(256, dtype=np.int64)
    pal = np.stack([i, (2 * i) % 256, (7 * i) % 256], 1).astype(np.uint8)

    still = M.synthesize_gif(df, "doc_id", "text", width=8, height=8)
    row = still.collect()[0]
    assert row["kind"] == "image"
    idx = np.array(
        [(ord(t[j % 32]) + 91 * j) % 256 for j in range(64)], dtype=np.uint8
    )
    expect = pal[idx].reshape(8, 8, 3)
    stats = M.decode_image_stats(still).collect()[0]
    assert stats["width"] == 8
    assert stats["mean_r"] == float(expect[..., 0].mean())
    assert stats["min_px"] == int(expect.min())
    assert M.image_dhash(still).collect()[0]["dhash"] == M._dhash_bits(expect)

    anim = M.synthesize_gif(df, "doc_id", "text", width=4, height=4,
                            n_frames=4)
    arow = anim.collect()[0]
    assert arow["kind"] == "video"
    got = {
        (r["frame_idx"], r["n_frames"], bytes(r["frame"]))
        for r in M.sample_frames(anim, stride=2).collect()
    }
    want = set()
    for f in (0, 2):
        fi = np.array(
            [(ord(t[(f * 16 + j) % 32]) + 91 * (f * 16 + j)) % 256
             for j in range(16)],
            dtype=np.uint8,
        )
        want.add((f, 4, pal[fi].reshape(4, 4, 3).tobytes()))
    assert got == want


def test_load_media_dir_sniffs_gif_kinds(spark, tmp_path):
    """A still .gif ingests as image, an animated one as video, with
    geometry from the logical screen; corrupt GIFs quarantine."""
    import numpy as np

    from victor_spark.operators import multimodal as M
    from victor_spark.sources.media import load_media_dir

    d = tmp_path / "lake"
    d.mkdir()
    rng = np.random.default_rng(2)
    frame = rng.integers(0, 256, (3, 5), dtype=np.uint8)
    (d / "still.gif").write_bytes(M._encode_gif([frame], 5, 3))
    (d / "anim.gif").write_bytes(M._encode_gif([frame, frame], 5, 3))
    bad = bytearray(M._encode_gif([frame], 5, 3))
    # first sub-block LENGTH byte: header 6 + LSD 7 + GCT 768 + image
    # descriptor 10 + min-code 1 = offset 792; declare 255 bytes where
    # far fewer follow -> truncated sub-block -> quarantined
    bad[792] = 0xFF
    (d / "bad.gif").write_bytes(bytes(bad))

    rows = sorted(load_media_dir(spark, str(d)).collect(),
                  key=lambda r: r["kind"])
    assert [r["kind"] for r in rows] == ["binary", "image", "video"]
    assert all(
        (r["meta_width"], r["meta_height"]) == (5, 3)
        for r in rows if r["kind"] != "binary"
    )


def test_review_fixes_png_ihdr_gif_resize_and_fallbacks():
    """Round-6 self-review closures: (1) an IHDR chunk with a valid CRC
    but a non-13 length raises ValueError (not struct.error), keeping
    the quarantine contract; (2) _resize_image handles GIF for real —
    index-plane NN resample re-encoded with the original palette, which
    equals the pixel-space resize exactly and keeps animations
    animated; (3) a corrupt container with a known magic falls back to
    the resize stub instead of failing the job."""
    import struct
    import zlib

    import numpy as np
    import pytest

    from victor_spark.operators import multimodal as M

    # (1) crafted PNG: IHDR declares 12 bytes with a CORRECT CRC
    def chunk(ctype, data):
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))

    bad = (M._PNG_SIG
           + chunk(b"IHDR", struct.pack(">IIBBBB", 2, 2, 8, 2, 0, 0))
           + chunk(b"IDAT", zlib.compress(b"\x00" * 14))
           + chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="IHDR length"):
        M._parse_png(bad)
    # ...and the tolerant seams stub it rather than crash
    assert len(M._decode_image(bad)) == 8

    # (2) GIF resize: still and animated
    rng = np.random.default_rng(9)
    idx = rng.integers(0, 256, (8, 8), dtype=np.uint8)
    i = np.arange(256, dtype=np.int64)
    pal = np.stack([i, (2 * i) % 256, (7 * i) % 256], 1).astype(np.uint8)
    out = M._resize_image(M._encode_gif([idx], 8, 8), 4, 4)
    assert out[:6] in M._GIF_MAGICS  # GIF in -> GIF out
    _w, _h, frames = M._parse_gif(out)
    ys = (np.arange(4) * 8) // 4
    assert np.array_equal(frames[0], pal[idx[ys][:, ys]])
    anim = M._resize_image(M._encode_gif([idx, idx.T.copy()], 8, 8), 16, 16)
    _w, _h, aframes = M._parse_gif(anim)
    assert len(aframes) == 2  # the animation stayed an animation
    ys16 = (np.arange(16) * 8) // 16
    assert np.array_equal(aframes[1], pal[idx.T[ys16][:, ys16]])
    # dHash invariance survives the GIF resize path too (integer
    # UPSCALE — the invariance property's precondition)
    assert M._dhash_bits(aframes[0]) == M._dhash_bits(pal[idx])

    # (3) corrupt-with-known-magic falls back to the stub
    broken = bytearray(M._encode_png(np.zeros((4, 4, 3), np.uint8)))
    broken[-5] ^= 0xFF  # IEND CRC
    stub = M._resize_image(bytes(broken), 8, 8)
    assert len(stub) == 1 and not stub.startswith(M._PNG_SIG)


def test_synthesize_jpeg_decodes_within_tolerance(spark, tmp_path):
    """synthesize_jpeg emits genuine baseline JFIF containers; the
    decode farm, resize (JPEG in -> JPEG out), and binaryFile sniffer
    (header-only dimension probe) all handle them; and the lossy
    roundtrip honors the bounded-error contract the catalog query
    asserts (decoded channel means within 2 of the exact source means)."""
    import numpy as np

    from victor_spark.operators import multimodal as M
    from victor_spark.sources.media import load_media_dir

    df = spark.createDataFrame(
        [(1, "3a9f"), (2, "ff00")], "doc_id long, text string"
    )
    media = M.synthesize_jpeg(df, "doc_id", "text", width=16, height=16)
    rows = {r["media_id"]: bytes(r["payload"]) for r in media.collect()}
    assert all(p.startswith(b"\xff\xd8\xff") for p in rows.values())

    stats = {r["media_id"]: r for r in M.decode_image_stats(media).collect()}
    for mid, text in [(1, "3a9f"), (2, "ff00")]:
        exp = [ord(text[c]) + 15 for c in range(3)]  # mean of +2y, y<16
        got = stats[mid]
        assert (got["width"], got["height"]) == (16, 16)
        for c, name in enumerate(["mean_r", "mean_g", "mean_b"]):
            assert abs(got[name] - exp[c]) <= 2.0, (mid, name)

    # resize keeps the container: JPEG in -> JPEG out, decodable
    rz = M.resize_images(media, 8, 8).collect()[0]
    out = bytes(rz["payload"])
    assert out.startswith(b"\xff\xd8\xff")
    w, h, arr = M._parse_image(out)
    assert (w, h) == (8, 8) and arr.shape == (8, 8, 3)

    # ingest sniffer: dims from the SOF header, corrupt jpeg quarantined
    d = tmp_path / "lake"
    d.mkdir()
    (d / "a.jpg").write_bytes(rows[1])
    (d / "bad.jpg").write_bytes(rows[2][:40])  # truncated mid-header
    srows = sorted(load_media_dir(spark, str(d)).collect(),
                   key=lambda r: r["kind"])
    assert [r["kind"] for r in srows] == ["binary", "image"]
    assert (srows[1]["meta_width"], srows[1]["meta_height"]) == (16, 16)


def test_jpeg_review_fixes_quant_order_fill_bytes_huge_resize():
    """Round-6 JPEG-review closures: (1) coefficients are quantized with
    the NATURAL-order table (the zigzag/natural mixup measured ~2.5x
    this textured-error bound); (2) T.81 fill bytes (extra 0xFF before a
    marker) are legal and skipped; (3) a resize whose target exceeds the
    container's 16-bit header fields degrades to the stub instead of
    escaping as struct.error."""
    import numpy as np

    from victor_spark.operators.jpeg_codec import decode_jpeg, encode_jpeg
    from victor_spark.operators.multimodal import _resize_image

    rng = np.random.default_rng(42)
    tex = rng.integers(0, 256, (64, 64, 3), np.uint8)
    _, _, back = decode_jpeg(encode_jpeg(tex, 90))
    d = np.abs(back.astype(int) - tex.astype(int))
    assert d.mean() <= 8.0 and d.max() <= 60  # buggy table: 15.4 / 95

    payload = encode_jpeg(tex, 90)
    i = payload.index(b"\xff\xdb")
    stuffed = payload[:i] + b"\xff\xff" + payload[i:]
    _, _, b2 = decode_jpeg(stuffed)
    assert np.array_equal(b2, back)

    out = _resize_image(payload, 70000, 1)
    assert len(out) == max(70000 // 64, 1)  # the documented stub shape


def test_localfs_rename_falls_back_when_hardlinks_denied(tmp_path, monkeypatch):
    """fs.protected_hardlinks (EPERM) or a no-hardlink filesystem must
    degrade file renames to the checked form, not make them impossible —
    otherwise a stale lock owned by another user could never be broken."""
    import errno
    import os

    from victor_spark.fs import LocalFS

    real_link = os.link

    def deny(*a, **k):
        raise OSError(errno.EPERM, "Operation not permitted")

    monkeypatch.setattr(os, "link", deny)
    fs = LocalFS()
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    fs.write_bytes(a, b"x")
    fs.rename(a, b)  # checked fallback path
    assert fs.read_bytes(b) == b"x" and not os.path.exists(a)
    fs.write_bytes(a, b"y")
    import pytest

    with pytest.raises(FileExistsError):
        fs.rename(a, b)
    monkeypatch.setattr(os, "link", real_link)


def test_ingest_cache_keys_on_code_and_publishes_atomically(tmp_path):
    """The ingest staging cache must invalidate when builder code
    changes (source text is part of the key) and publish via one rename
    so concurrent builders can't clobber a dir under a running read."""
    import os

    from victor_spark.plans.catalog import (
        _ingest_build_dir,
        _ingest_cache_dir,
        _publish_ingest_dir,
    )

    def v1():
        return 1

    def v2():
        return 2

    p1, _ = _ingest_cache_dir("t", str(tmp_path), code_of=(v1,))
    p2, _ = _ingest_cache_dir("t", str(tmp_path), code_of=(v2,))
    assert p1 != p2  # a code edit is a new key

    # build privately, publish atomically
    b = _ingest_build_dir(p1)
    os.makedirs(b)
    with open(os.path.join(b, "data"), "w") as f:
        f.write("shard")
    _publish_ingest_dir(b, p1)
    _, built = _ingest_cache_dir("t", str(tmp_path), code_of=(v1,))
    assert built and not os.path.exists(b)

    # losing the publish race discards the private build, keeps the winner
    b2 = _ingest_build_dir(p1)
    os.makedirs(b2)
    with open(os.path.join(b2, "data"), "w") as f:
        f.write("other")
    _publish_ingest_dir(b2, p1)
    assert not os.path.exists(b2)
    with open(os.path.join(p1, "data")) as f:
        assert f.read() == "shard"  # the first publish survived


def test_synthesize_flac_decodes_and_composes(spark, tmp_path):
    """synthesize_flac emits genuine rice-compressed FLAC streams whose
    DECODED samples equal the md5 derivation bit-exactly; the stats
    farm, fingerprint dedup, zero-order-hold resample (FLAC in -> FLAC
    out) and the binaryFile sniffer (STREAMINFO-only probe) all handle
    them; and the gradient content genuinely compresses."""
    import numpy as np

    from victor_spark.operators import multimodal as M
    from victor_spark.operators.flac_codec import decode_flac
    from victor_spark.sources.media import load_media_dir

    t = "0123456789abcdef0123456789abcdef"
    df = spark.createDataFrame([(1, t)], "doc_id long, text string")
    media = M.synthesize_flac(df, "doc_id", "text", n_samples=64,
                              sample_rate=16000)
    row = media.collect()[0]
    payload = bytes(row["payload"])
    assert payload[:4] == b"fLaC"
    expect = [(ord(t[j % 32]) - 80) * 128 for j in range(64)]
    rate, got = decode_flac(payload)
    assert rate == 16000 and got == expect
    # the stream header (fLaC + 38-byte STREAMINFO block) dominates a
    # 64-sample clip; the FRAME portion must still beat raw PCM16 —
    # i.e., the rice/predictor compression is real
    assert len(payload) - 46 < 2 * 64

    stats = M.decode_audio_stats(media).collect()[0]
    assert stats["n_samples"] == 64
    assert stats["min_amp"] == min(expect) and stats["max_amp"] == max(expect)

    # fingerprint matches the WAV twin of the same samples (container-
    # independent perceptual dedup, the audio analog of cross-format
    # image dedup)
    wav = M.synthesize_wav(df, "doc_id", "text", n_samples=64,
                           sample_rate=16000)
    fp_flac = M.audio_fingerprint(media).collect()[0]["dhash"]
    fp_wav = M.audio_fingerprint(wav).collect()[0]["dhash"]
    assert fp_flac == fp_wav

    # resample keeps the container and the fingerprint invariance
    rs = M.resample_audio(media, factor=2).collect()[0]
    assert bytes(rs["payload"])[:4] == b"fLaC"
    assert rs["meta_sample_rate"] == 32000
    r2, up = decode_flac(bytes(rs["payload"]))
    assert r2 == 32000 and up == list(np.repeat(expect, 2))

    # ingest sniffer: STREAMINFO rate; a HEADER-corrupt flac quarantines
    # (the sniffer is a header-only probe — frame-body corruption passes
    # ingest by design and is caught downstream by the CRC-16)
    d = tmp_path / "lake"
    d.mkdir()
    (d / "a.flac").write_bytes(payload)
    bad = bytearray(payload)
    bad[7] = 0xFF  # STREAMINFO length byte now claims 255 bytes...
    (d / "bad.flac").write_bytes(bytes(bad[:40]))  # ...in a 40-byte file
    rows = sorted(load_media_dir(spark, str(d)).collect(),
                  key=lambda r: r["kind"])
    kinds = [r["kind"] for r in rows]
    assert kinds == ["audio", "binary"]
    assert rows[0]["meta_sample_rate"] == 16000
    # ...and the frame-CRC layer catches body corruption in the farm
    crc_bad = bytearray(payload)
    crc_bad[-1] ^= 0xFF
    import pytest

    with pytest.raises(ValueError, match="CRC"):
        decode_flac(bytes(crc_bad))


def test_flac_review_fixes(spark):
    """Round-6 FLAC-review closures: (1) a CRC-valid stream whose rice
    residuals reconstruct outside int16 raises ValueError (never wraps
    silently / never a numpy OverflowError in the farm); (2) encode
    rejects rates beyond the 20-bit STREAMINFO field, and resample_audio
    passes such a clip through untouched instead of emitting a corrupt
    asset; (3) the ingest sniffer quarantines stereo/24-bit FLAC (the
    strict farm would otherwise fail the job); (4) synthesize_flac
    wraps unicode-derived samples exactly like synthesize_wav's int16
    pack."""
    import struct

    import pytest

    from victor_spark.operators import multimodal as M
    from victor_spark.operators.flac_codec import (
        _Bits,
        _crc8,
        _crc16,
        _utf8_number,
        decode_flac,
        encode_flac,
    )

    # (1) crafted FIXED-order-0 frame with a 2e6 residual, CRCs valid
    out = bytearray(b"fLaC")
    info = _Bits()
    for v, n in [(4096, 16), (4096, 16), (0, 24), (0, 24), (8000, 20),
                 (0, 3), (15, 5), (1, 36)]:
        info.write(v, n)
    body = info.getvalue() + b"\x00" * 16
    out += bytes([0x80]) + struct.pack(">I", len(body))[1:] + body
    h = _Bits()
    for v, n in [(0b11111111111110, 14), (0, 1), (0, 1), (0b0111, 4),
                 (0, 4), (0, 4), (0b100, 3), (0, 1)]:
        h.write(v, n)
    h.align()
    hdr = h.getvalue() + _utf8_number(0) + struct.pack(">H", 0)
    hdr += bytes([_crc8(hdr)])
    b = _Bits()
    for v, n in [(0, 1), (8, 6), (0, 1), (0, 2), (0, 4), (14, 4)]:
        b.write(v, n)
    u = 2_000_000
    b.write_unary(u >> 14)
    b.write(u & ((1 << 14) - 1), 14)
    b.align()
    frame = hdr + b.getvalue()
    frame += struct.pack(">H", _crc16(frame))
    with pytest.raises(ValueError, match="16-bit range"):
        decode_flac(bytes(out) + frame)

    # (2) rate overflow rejected on encode; resample passes through
    with pytest.raises(ValueError, match="20-bit"):
        encode_flac([1, 2], 1 << 20)
    hi = encode_flac([3, 4, 5], 655_350)
    media = spark.createDataFrame(
        [(1, "audio", bytearray(hi), None, None, 655_350)], M.MEDIA_SCHEMA
    )
    rs = M.resample_audio(media, factor=2).collect()[0]
    assert bytes(rs["payload"]) == hi  # untouched, not corrupt
    assert rs["meta_sample_rate"] == 655_350

    # (3) 3-channel FLAC: STREAMINFO parses but it's outside the
    # decode subset (mono/stereo since round 7) — the sniffer must
    # quarantine
    info2 = _Bits()
    for v, n in [(4096, 16), (4096, 16), (0, 24), (0, 24), (8000, 20),
                 (2, 3), (15, 5), (2, 36)]:  # channels-1 = 2 -> 3ch
        info2.write(v, n)
    body2 = info2.getvalue() + b"\x00" * 16
    stereo = (b"fLaC" + bytes([0x80])
              + struct.pack(">I", len(body2))[1:] + body2)
    from victor_spark.sources.media import load_media_dir
    import tempfile, os
    d = tempfile.mkdtemp()
    with open(os.path.join(d, "s.flac"), "wb") as f:
        f.write(stereo)
    rows = load_media_dir(spark, d).collect()
    assert [r["kind"] for r in rows] == ["binary"]

    # (4) unicode text doesn't kill synthesize_flac
    df = spark.createDataFrame([(1, "héllo 世界")], "doc_id long, text string")
    row = M.synthesize_flac(df, "doc_id", "text", n_samples=8).collect()[0]
    _rate, got = decode_flac(bytes(row["payload"]))
    assert len(got) == 8


def test_flac_wasted_bits_and_invalid_lpc_headers():
    """Round-7 decoder extensions, the paths our encoder never emits:
    (1) wasted-bits subframes (samples coded at bps-wasted, shifted
    back on output) decode bit-exactly for VERBATIM and CONSTANT; (2) a
    crafted LPC subframe with the invalid precision escape (0b1111) or
    a negative predictor shift raises ValueError, not garbage audio."""
    import struct

    from victor_spark.operators.flac_codec import (
        _Bits,
        _crc8,
        _crc16,
        _utf8_number,
        decode_flac,
    )

    def stream_with_subframe(n_samples, write_subframe_body):
        info = _Bits()
        for v, nb in [(n_samples, 16), (n_samples, 16), (0, 24), (0, 24),
                      (8000, 20), (0, 3), (15, 5), (n_samples, 36)]:
            info.write(v, nb)
        body = info.getvalue() + b"\x00" * 16
        out = bytearray(b"fLaC")
        out += bytes([0x80]) + struct.pack(">I", len(body))[1:] + body
        header = _Bits()
        header.write(0b11111111111110, 14)
        header.write(0, 2)
        header.write(0b0111, 4)  # explicit 16-bit blocksize
        header.write(0, 4)  # rate from STREAMINFO
        header.write(0, 4)  # mono
        header.write(0b100, 3)  # 16 bps
        header.write(0, 1)
        header.align()
        hdr = header.getvalue() + _utf8_number(0)
        hdr += struct.pack(">H", n_samples - 1)
        hdr += bytes([_crc8(hdr)])
        fb = _Bits()
        write_subframe_body(fb)
        fb.align()
        frame = hdr + fb.getvalue()
        return bytes(out + frame + struct.pack(">H", _crc16(frame)))

    # VERBATIM with 2 wasted bits: samples are multiples of 4, coded
    # at 14 bits
    samples = [4 * v for v in (-2000, 1500, 0, 8191, -8192, 77)]

    def verbatim_wasted(fb):
        fb.write(0, 1)
        fb.write(1, 6)  # VERBATIM
        fb.write(1, 1)  # wasted flag
        fb.write_unary(1)  # wasted = 1 + 1 = 2
        for s in samples:
            fb.write((s >> 2) & 0x3FFF, 14)

    rate, got = decode_flac(stream_with_subframe(len(samples), verbatim_wasted))
    assert rate == 8000 and got == samples

    # CONSTANT with 3 wasted bits
    def constant_wasted(fb):
        fb.write(0, 1)
        fb.write(0, 6)  # CONSTANT
        fb.write(1, 1)
        fb.write_unary(2)  # wasted = 3
        fb.write((-1024 >> 3) & 0x1FFF, 13)

    rate, got = decode_flac(stream_with_subframe(4, constant_wasted))
    assert got == [-1024] * 4

    # LPC precision escape 0b1111 must raise
    def lpc_bad_precision(fb):
        fb.write(0, 1)
        fb.write(0b100000, 6)  # LPC order 1
        fb.write(0, 1)
        fb.write(123 & 0xFFFF, 16)  # warmup
        fb.write(15, 4)  # precision escape — invalid

    with pytest.raises(ValueError, match="precision"):
        decode_flac(stream_with_subframe(4, lpc_bad_precision))

    # negative LPC shift must raise
    def lpc_negative_shift(fb):
        fb.write(0, 1)
        fb.write(0b100000, 6)
        fb.write(0, 1)
        fb.write(123 & 0xFFFF, 16)
        fb.write(11, 4)  # precision 12
        fb.write(0b10000, 5)  # sign bit set — negative shift

    with pytest.raises(ValueError, match="shift"):
        decode_flac(stream_with_subframe(4, lpc_negative_shift))


def test_avi_mjpeg_mux_demux_and_frame_sampling(spark):
    """MJPEG-in-AVI (round-7): the RIFF muxer writes a genuine AVI
    (hdrl avih/strh/strf, movi '00dc' chunks, idx1) that the demuxer
    and sample_frames reverse; corrupt containers raise ValueError and
    the ingest sniffer routes AVIs to kind='video' via the header-only
    probe."""
    import struct

    import numpy as np

    from victor_spark.operators.jpeg_codec import decode_jpeg, encode_jpeg
    from victor_spark.operators.multimodal import (
        _avi_dimensions,
        _encode_avi_mjpeg,
        _parse_avi_mjpeg,
        frame_stats,
        sample_frames,
    )

    jpegs = [
        encode_jpeg(np.full((8, 12, 3), 40 + 25 * f, np.uint8), 90)
        for f in range(5)
    ]
    avi = _encode_avi_mjpeg(jpegs, 12, 8, fps=5)
    w, h, back = _parse_avi_mjpeg(avi)
    assert (w, h) == (12, 8) and back == jpegs
    assert _avi_dimensions(avi) == (12, 8, 5)

    media = spark.createDataFrame(
        [(7, "video", bytearray(avi), 12, 8, None)], M.MEDIA_SCHEMA
    )
    rows = sorted(
        sample_frames(media, stride=2).collect(), key=lambda r: r["frame_idx"]
    )
    assert [(r["frame_idx"], r["n_frames"]) for r in rows] == [
        (0, 5), (2, 5), (4, 5)
    ]
    for r in rows:
        _, _, arr = decode_jpeg(jpegs[r["frame_idx"]])
        assert bytes(r["frame"]) == arr.tobytes()
    stats = {r["frame_idx"]: r for r in frame_stats(
        sample_frames(media, stride=2)).collect()}
    assert stats[0]["n_bytes"] == 8 * 12 * 3
    assert abs(stats[4]["mean_r"] - 140.0) <= 2.0

    # corruption: truncated chunk, non-JPEG frame, oversized dims
    with pytest.raises(ValueError, match="truncated"):
        _parse_avi_mjpeg(avi[:-30])
    bad = bytearray(avi)
    i = bad.index(b"\xff\xd8", 100)  # first frame SOI inside movi
    bad[i] = 0x00
    with pytest.raises(ValueError, match="non-JPEG"):
        _parse_avi_mjpeg(bytes(bad))
    huge = bytearray(avi)
    j = huge.index(b"avih") + 8 + 32  # width field of avih
    huge[j : j + 4] = struct.pack("<I", 1 << 30)
    with pytest.raises(ValueError, match="implausible"):
        _parse_avi_mjpeg(bytes(huge))

    # sniffer: AVI -> kind=video with avih geometry; a WebP-ish RIFF
    # stays binary
    import os
    import tempfile

    from victor_spark.sources.media import load_media_dir

    d = tempfile.mkdtemp()
    with open(os.path.join(d, "clip.avi"), "wb") as f:
        f.write(avi)
    with open(os.path.join(d, "img.webp"), "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", 12) + b"WEBPVP8 " + b"\x00" * 8)
    got = {r["kind"]: r for r in load_media_dir(spark, d).collect()}
    assert set(got) == {"video", "binary"}
    assert (got["video"]["meta_width"], got["video"]["meta_height"]) == (12, 8)


def test_png_subbyte_depths_and_palette_crafted():
    """Round-7 PNG depth extensions on CRAFTED streams (our encoder
    writes only 8-bit RGB, so these paths need hand-built containers):
    1/2/4-bit grayscale rescales to 0-255, sub-byte palette indices
    resolve through PLTE unscaled, out-of-range indices and a missing
    PLTE raise ValueError."""
    import struct
    import zlib

    import numpy as np

    def chunk(typ, data):
        return (
            struct.pack(">I", len(data)) + typ + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    def png(w, h, depth, color, raw_rows, plte=None):
        ihdr = struct.pack(">IIBBBBB", w, h, depth, color, 0, 0, 0)
        body = b"".join(b"\x00" + r for r in raw_rows)  # filter None
        out = b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
        if plte is not None:
            out += chunk(b"PLTE", plte)
        return out + chunk(b"IDAT", zlib.compress(body)) + chunk(b"IEND", b"")

    from victor_spark.operators.multimodal import _parse_png

    # depth-1 grayscale, 4x2: bits 1011 0... -> 255,0,255,255
    w, h, arr = _parse_png(png(4, 2, 1, 0, [b"\xb0", b"\x40"]))
    assert (w, h) == (4, 2)
    assert arr[0, :, 0].tolist() == [255, 0, 255, 255]
    assert arr[1, :, 0].tolist() == [0, 255, 0, 0]

    # depth-2 grayscale: values 0..3 -> 0,85,170,255
    w, h, arr = _parse_png(png(4, 1, 2, 0, [bytes([0b00011011])]))
    assert arr[0, :, 0].tolist() == [0, 85, 170, 255]

    # depth-4 grayscale: 0xF -> 255, 0x8 -> 136
    w, h, arr = _parse_png(png(2, 1, 4, 0, [bytes([0xF8])]))
    assert arr[0, :, 0].tolist() == [255, 136]

    # depth-4 palette: indices 0,1 resolve PLTE rows verbatim
    plte = bytes([10, 20, 30, 200, 150, 100])
    w, h, arr = _parse_png(png(2, 1, 4, 3, [bytes([0x01])], plte))
    assert arr[0, 0].tolist() == [10, 20, 30]
    assert arr[0, 1].tolist() == [200, 150, 100]

    # out-of-range palette index
    with pytest.raises(ValueError, match="palette index"):
        _parse_png(png(2, 1, 4, 3, [bytes([0x0F])], plte))
    # palette stream without PLTE
    with pytest.raises(ValueError, match="missing PLTE"):
        _parse_png(png(2, 1, 4, 3, [bytes([0x01])]))
    # illegal depth for color type (16-bit palette)
    with pytest.raises(ValueError, match="illegal PNG depth"):
        _parse_png(png(2, 1, 16, 3, [bytes([0, 0, 0, 0])], plte))


def test_png_adam7_interlace_decodes_bit_exact():
    """Adam7-interlaced PNGs (round-7): seven independently filtered
    passes scatter onto the pixel grid; the decode must be bit-exact
    against the source for any geometry, including sizes where late
    passes are EMPTY and must contribute no bytes (1x1 has only pass
    1; 8x2 skips passes 3/5/7's rows). Filters are per-pass: a
    Sub/Up-filtered pass must unfilter against the PASS's own
    neighbors, not the full image's."""
    import struct
    import zlib

    import numpy as np

    from victor_spark.operators.multimodal import (
        _filter_scanline,
        _parse_png,
    )

    def chunk(typ, data):
        return (
            struct.pack(">I", len(data)) + typ + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    def adam7_png(arr, ftype=0):
        h, w, _ = arr.shape
        ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 1)
        body = b""
        for x0, y0, dx, dy in [
            (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
            (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
        ]:
            sub = arr[y0::dy, x0::dx]
            if sub.shape[0] == 0 or sub.shape[1] == 0:
                continue
            prev = np.zeros(sub.shape[1] * 3, np.uint8)
            for row in sub:
                flat = row.reshape(-1)
                body += bytes([ftype]) + _filter_scanline(
                    ftype, flat, prev, 3
                ).tobytes()
                prev = flat
        return (
            b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(body)) + chunk(b"IEND", b"")
        )

    rng = np.random.default_rng(9)
    for (h, w) in [(16, 16), (7, 13), (1, 1), (3, 9), (8, 2)]:
        arr = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        for ftype in (0, 1, 2, 4):  # None / Sub / Up / Paeth per pass
            w2, h2, back = _parse_png(adam7_png(arr, ftype))
            assert (w2, h2) == (w, h) and np.array_equal(back, arr), (
                h, w, ftype,
            )
    # truncated interlaced stream quarantines
    full = adam7_png(rng.integers(0, 256, (16, 16, 3), dtype=np.uint8))
    import pytest as _pytest
    with _pytest.raises(ValueError):
        _parse_png(full[:-20])
