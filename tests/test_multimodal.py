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
