"""JSONL/CSV interchange: explicit-schema round trips, index export/import."""

from __future__ import annotations

from pyspark.sql import functions as F

from victor_spark.sources.formats import read_csv, read_jsonl, write_csv, write_jsonl

CORPUS_SCHEMA = "doc_id long, text string, tags array<string>, vec array<double>"


def _corpus(spark):
    return spark.createDataFrame(
        [
            (1, "hello world", ["a", "b"], [0.1, 0.2]),
            (2, "spark engine", ["b"], [0.3, 0.4]),
            (3, "no tags here", [], [0.5, 0.6]),
        ],
        CORPUS_SCHEMA,
    )


def test_jsonl_round_trip(spark, tmp_path):
    d = _corpus(spark)
    write_jsonl(d, str(tmp_path / "j"))
    back = read_jsonl(spark, str(tmp_path / "j"), CORPUS_SCHEMA)
    assert sorted(back.collect(), key=lambda r: r["doc_id"]) == sorted(
        d.collect(), key=lambda r: r["doc_id"]
    )


def test_jsonl_gzip_round_trip(spark, tmp_path):
    """compression='gzip' writes real .gz shards (the .jsonl.gz
    interchange format) that read_jsonl decompresses transparently,
    losslessly through newlines and unicode — the payloads raw text
    lines can't carry without escaping."""
    import glob
    import gzip
    import json

    docs = spark.createDataFrame(
        [(1, "line one\nline two", ["a"], [0.1]),
         (2, "unicode é世界", [], [0.2])],
        CORPUS_SCHEMA,
    )
    out = tmp_path / "jz"
    write_jsonl(docs, str(out), compression="gzip")
    shards = glob.glob(str(out / "*.json.gz"))
    assert shards  # the codec actually produced gzip members
    # a 2-row frame over a 32-slot session leaves most shards EMPTY;
    # prove gzip+line format on a shard that actually carries a row
    lines = []
    for s in shards:
        with gzip.open(s, "rt") as f:  # genuine gzip, line-oriented
            lines += [json.loads(line) for line in f if line.strip()]
    assert len(lines) == 2
    back = read_jsonl(spark, str(out), CORPUS_SCHEMA)
    assert sorted(back.collect(), key=lambda r: r["doc_id"]) == sorted(
        docs.collect(), key=lambda r: r["doc_id"]
    )


def test_csv_round_trip_with_array_columns(spark, tmp_path):
    d = _corpus(spark)
    write_csv(d, str(tmp_path / "c"))
    back = read_csv(spark, str(tmp_path / "c"), CORPUS_SCHEMA)
    got = {r["doc_id"]: r for r in back.collect()}
    for r in d.collect():
        assert got[r["doc_id"]]["tags"] == r["tags"]
        assert got[r["doc_id"]]["vec"] == r["vec"]


def test_index_export_import_round_trip(spark, tmp_path):
    from victor_spark.index import VectorIndex

    src = VectorIndex(spark, str(tmp_path / "src"))
    src.insert(
        [
            ("alpha", [1.0, 0.0, 0.0], ["x"]),
            ("beta", [0.0, 1.0, 0.0], ["x", "y"]),
            ("gamma", [0.0, 0.0, 1.0], []),
        ]
    )
    src.export_jsonl(str(tmp_path / "dump"))

    dst = VectorIndex(spark, str(tmp_path / "dst"))
    dst.import_jsonl(str(tmp_path / "dump"))

    assert dst.scan().count() == 3
    # quantize(dequantize(quantize(v))) is idempotent (packed_vector.rs
    # repack test), so search results match the source index exactly
    for q in ([1.0, 0.0, 0.0], [0.0, 1.0, 0.0]):
        a = src.search(q, k=1).select("content", F.round("score", 6).alias("s")).collect()
        b = dst.search(q, k=1).select("content", F.round("score", 6).alias("s")).collect()
        assert a == b
    # tag filtering survives the round trip
    assert {r["content"] for r in dst.search([1, 0, 0], k=5, tags=["y"]).collect()} == {"beta"}


def test_orc_round_trip(spark, tmp_path):
    from victor_spark.sources.formats import read_orc, write_orc

    df = spark.createDataFrame(
        [("a", ["x", "y"], [1.5, 2.5]), ("b", [], [0.25])],
        "content string, tags array<string>, embedding array<double>",
    )
    path = str(tmp_path / "orc")
    write_orc(df, path)
    back = read_orc(spark, path)
    assert back.schema == df.schema
    assert sorted(back.collect()) == sorted(df.collect())


def test_events_nanos_parquet_readable_in_any_session(spark, tmp_path):
    """Files regenerated with TIMESTAMP(NANOS) must not kill the catalog:
    vanilla Spark rejects NANOS at schema inference (the round-1 events
    outage), so load_table retries with nanosAsLong and normalizes to NTZ."""
    import pyarrow as pa
    import pyarrow.parquet as papq

    from victor_spark.sources import load_table
    from victor_spark.sources.tables import epoch_us

    t = pa.table({
        "event_id": pa.array([1, 2], pa.int64()),
        "ts": pa.array([1_700_000_000_000_000_123, 1_700_000_111_000_000_456],
                       pa.timestamp("ns")),
        "user_id": pa.array([7, 8], pa.int64()),
        "event_type": pa.array(["view", "click"]),
        "value": pa.array([1.0, 2.0]),
        "props": pa.array(["{}", "{}"]),
    })
    papq.write_table(t, str(tmp_path / "events.parquet"),
                     coerce_timestamps=None, version="2.6")
    # ensure this session has no leftover conf from another test
    spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
    df = load_table(spark, str(tmp_path), "events")
    assert dict(df.dtypes)["ts"] == "timestamp_ntz"
    got = sorted(r[0] for r in df.select(epoch_us("ts")).collect())
    # nanos truncated to micros
    assert got == [1_700_000_000_000_000, 1_700_000_111_000_000]
    # load_table must restore the caller's conf (here: unset → the "false"
    # default) after the retried read, so unrelated NANOS reads in the same
    # session keep their own interpretation
    assert spark.conf.get("spark.sql.legacy.parquet.nanosAsLong") == "false"


def test_text_corpus_one_doc_per_file(spark, tmp_path):
    from victor_spark.sources.formats import read_text_corpus

    src = tmp_path / "corpus"
    src.mkdir()
    (src / "a.txt").write_text("first document\nwith two lines")
    (src / "b.txt").write_text("second document")
    df = read_text_corpus(spark, str(src))
    rows = {r["source"].rsplit("/", 1)[-1]: r for r in df.collect()}
    assert set(rows) == {"a.txt", "b.txt"}
    assert rows["a.txt"]["text"] == "first document\nwith two lines"
    # ids deterministic across re-reads (hash of path, not row order)
    again = {r["source"].rsplit("/", 1)[-1]: r["doc_id"]
             for r in read_text_corpus(spark, str(src)).collect()}
    assert {k: v["doc_id"] for k, v in rows.items()} == again


def test_text_lines_write_read_round_trip_lossless(spark, tmp_path):
    from victor_spark.sources.formats import read_text_lines, write_text_lines

    docs = [
        "doc one line",
        "doc\nwith newline",
        "carriage\rreturn inside",
        "literal backslash-n: \\n stays two chars",
        "trailing backslash \\",
        "\\\\ double backslash and \r\n both",
    ]
    df = spark.createDataFrame([(d,) for d in docs], "text string")
    out = tmp_path / "out"
    write_text_lines(df, str(out))
    # shards are line-splittable: one physical line per document
    assert spark.read.text(str(out)).count() == len(docs)
    got = sorted(r["text"] for r in read_text_lines(spark, str(out)).collect())
    assert got == sorted(docs)


def test_load_media_dir_sniffs_kinds_and_metadata(spark, tmp_path):
    """File-per-asset ingestion (binaryFile source): each file becomes a
    MEDIA_SCHEMA row with kind + metadata read from its own container
    header; unknown and corrupt payloads are kept as kind='binary'."""
    import numpy as np

    from victor_spark.operators import multimodal as M
    from victor_spark.sources.media import load_media_dir

    d = tmp_path / "lake"
    (d / "sub").mkdir(parents=True)
    arr = np.arange(6 * 4 * 3, dtype=np.uint8).reshape(4, 6, 3)
    (d / "7.ppm").write_bytes(M._encode_ppm(arr))
    (d / "8.wav").write_bytes(M._encode_wav([1, -2, 3], 22050))
    (d / "sub" / "9.y4m").write_bytes(
        M._encode_y4m([bytes(24)], 4, 4, "420")
    )
    (d / "weird.bin").write_bytes(b"\x89PNG not decodable here")
    (d / "corrupt.ppm").write_bytes(b"P6\n6 4\n255\nshort")

    media = load_media_dir(spark, str(d), numeric_stem_ids=True)
    rows = {r["media_id"]: r for r in media.collect()}
    assert rows[7]["kind"] == "image"
    assert (rows[7]["meta_width"], rows[7]["meta_height"]) == (6, 4)
    assert rows[8]["kind"] == "audio" and rows[8]["meta_sample_rate"] == 22050
    assert rows[9]["kind"] == "video"  # recursive lookup found sub/
    assert (rows[9]["meta_width"], rows[9]["meta_height"]) == (4, 4)
    binaries = [r for r in rows.values() if r["kind"] == "binary"]
    assert len(binaries) == 2  # unknown magic + corrupt container, kept
    assert all(r["meta_width"] is None for r in binaries)
    # non-numeric stems get stable hashed ids, distinct from numeric ones
    assert len(rows) == 5

    # the ingested rows feed the decode operators directly
    stats = M.decode_image_stats(media.filter("kind = 'image'")).first()
    assert (stats["width"], stats["height"]) == (6, 4)

    # listing-time pruning via pathGlobFilter
    only_wav = load_media_dir(spark, str(d), glob="*.wav")
    assert [r["kind"] for r in only_wav.collect()] == ["audio"]


def test_load_media_dir_default_ids_and_corrupt_riff(spark, tmp_path):
    """Round-5 advice closures: (1) default media_ids derive from the
    FULL path, so same-named files in different directories don't
    collide (numeric_stem_ids is the documented opt-in); (2) a RIFF
    payload with a truncated fmt chunk, and RIFF containers that are not
    WAVE (AVI/WebP), are quarantined as kind='binary' instead of
    crashing the ingest job."""
    import struct

    from victor_spark.operators import multimodal as M
    from victor_spark.sources.media import _media_id_for, load_media_dir

    d = tmp_path / "lake"
    (d / "a").mkdir(parents=True)
    (d / "b").mkdir()
    wav = M._encode_wav([5, -5], 8000)
    (d / "a" / "1.wav").write_bytes(wav)
    (d / "b" / "1.wav").write_bytes(wav)
    # RIFF/WAVE with a fmt chunk that declares only 10 body bytes
    short_fmt = (
        b"RIFF" + struct.pack("<I", 26) + b"WAVE"
        + b"fmt " + struct.pack("<I", 10) + b"\x01\x00\x01\x00ABCDEF"
    )
    (d / "short_fmt.wav").write_bytes(short_fmt)
    # RIFF but not WAVE: an AVI-style container must stay binary
    (d / "clip.avi").write_bytes(b"RIFF" + struct.pack("<I", 4) + b"AVI ")

    media = load_media_dir(spark, str(d))
    rows = media.collect()
    assert len({r["media_id"] for r in rows}) == 4  # no collisions
    kinds = sorted(r["kind"] for r in rows)
    assert kinds == ["audio", "audio", "binary", "binary"]
    # quarantined kind='binary' rows flow through the feature farm too
    # (byte-histogram stub features), not just past the sniffer
    feats = M.extract_features(media)
    assert feats.count() == 4
    assert feats.filter("kind = 'binary'").count() == 2
    # the parser itself reports the short chunk as ValueError, not
    # struct.error, so any caller's quarantine contract holds
    import pytest as _pytest

    with _pytest.raises(ValueError, match="fmt chunk short"):
        M._parse_wav(short_fmt)
    # opt-in numeric stems keep the documented round-trip behavior
    assert _media_id_for("x/17.ppm", numeric_stem_ids=True) == 17
    assert _media_id_for("x/17.ppm") != _media_id_for("y/17.ppm")


def test_audio_operators_tolerate_unsupported_wav_encodings(spark):
    """_decode_audio falls back to the deterministic stub (and
    resample_audio passes through) for WAVE encodings outside the codec
    (e.g. IEEE float, format 3) — a single such asset must not fail the
    farm. Stereo, by contrast, is now REALLY decoded (downmixed)."""
    import struct

    from victor_spark.operators import multimodal as M

    # a valid RIFF/WAVE container declaring IEEE float samples (fmt 3)
    data = struct.pack("<2f", 0.5, -0.5)
    floaty = (
        b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 3, 1, 8000, 32000, 4, 32)
        + b"data" + struct.pack("<I", len(data)) + data
    )
    feats = M._decode_audio(floaty)
    # stub signature: 4th feature is the BYTE length (the real path
    # would put the rms amplitude there)
    assert len(feats) == 4 and feats[3] == float(len(floaty))

    media = spark.createDataFrame(
        [(1, "audio", bytearray(floaty), None, None, 8000)],
        M.MEDIA_SCHEMA,
    )
    out = M.resample_audio(media, factor=2).collect()[0]
    assert bytes(out["payload"]) == floaty  # untouched pass-through
    assert out["meta_sample_rate"] == 8000
    # extract_features over the same mixed row also survives
    assert M.extract_features(media).count() == 1


def test_wav_decodes_stereo_pcm8_and_mulaw():
    """The WAV codec really decodes the other common encodings: stereo
    PCM16 downmixes (l+r)//2 with floor semantics, 8-bit PCM recenters
    and rescales, and G.711 mu-law expands to the standard linear table
    values — all to mono int16."""
    import numpy as np

    from victor_spark.operators import multimodal as M

    # stereo: interleaved l,r — floor((l+r)/2), negatives included
    rate, got = M._parse_wav(
        M._encode_wav([100, 201, -3, -4, -5, 4], 8000, channels=2)
    )
    assert rate == 8000 and list(got) == [150, -4, -1]  # floor(-7/2) = -4

    # PCM8: unsigned bytes, 128 is silence
    rate, got = M._parse_wav(
        M._encode_wav([128, 0, 255], 8000, bits=8)
    )
    assert list(got) == [0, -32768, 32512]

    # mu-law: spec landmark values after complementing — 0xFF and 0x7F
    # are the two zero codes, 0x80 the positive peak (+32124), 0x00 the
    # negative peak (-32124)
    rate, got = M._parse_wav(
        M._encode_wav([0xFF, 0x7F, 0x80, 0x00], 8000, bits=8, audio_format=7)
    )
    assert list(got) == [0, 0, 32124, -32124]
    # mu-law stereo downmix composes with the expansion
    rate, got = M._parse_wav(
        M._encode_wav([0xFF, 0x80], 8000, channels=2, bits=8, audio_format=7)
    )
    assert list(got) == [(0 + 32124) // 2]


def test_webdataset_roundtrip_and_media_composition(spark, tmp_path):
    """WebDataset tar shards (the LAION-style multimodal interchange
    layout) roundtrip: write one shard per partition executor-side,
    read back one row per sample with a binary column per extension —
    and the ingested image members feed the real decode farm directly."""
    import numpy as np
    import tarfile

    from victor_spark.operators import multimodal as M
    from victor_spark.sources.webdataset import (
        load_webdataset,
        write_webdataset,
    )

    rng = np.random.default_rng(11)
    rows = []
    pixels = {}
    for i in range(10):
        arr = rng.integers(0, 256, (4, 4, 3), dtype=np.uint8)
        pixels[str(i)] = arr
        rows.append((str(i), bytearray(M._encode_png(arr, "cycle")),
                     f"caption number {i}"))
    df = spark.createDataFrame(rows, "key string, png binary, txt string")

    out = str(tmp_path / "wds")
    manifest = write_webdataset(
        df.repartition(3), out, "key", {"png": "png", "txt": "txt"}
    ).collect()
    assert sum(m["n_samples"] for m in manifest) == 10
    assert 1 <= len(manifest) <= 3
    # shards are genuine POSIX tars with the key.ext member convention
    with tarfile.open(manifest[0]["shard"]) as tf:
        names = tf.getnames()
        assert all("." in n for n in names)

    back = load_webdataset(spark, out, ["png", "txt"])
    got = {r["key"]: r for r in back.collect()}
    assert set(got) == {str(i) for i in range(10)}
    for k, r in got.items():
        assert bytes(r["txt"]).decode() == f"caption number {int(k)}"
        _, _, arr = M._parse_png(bytes(r["png"]))
        assert np.array_equal(arr, pixels[k])

    # composition: the binary png column is a media payload — decode
    # stats over the ingested samples match the source pixels
    media = back.selectExpr(
        "CAST(key AS LONG) AS media_id", "'image' AS kind",
        "png AS payload", "CAST(4 AS INT) AS meta_width",
        "CAST(4 AS INT) AS meta_height",
        "CAST(NULL AS INT) AS meta_sample_rate",
    )
    stats = {r["media_id"]: r for r in M.decode_image_stats(media).collect()}
    for i in range(10):
        assert stats[i]["mean_r"] == float(
            pixels[str(i)][..., 0].astype(np.float64).mean()
        )

    # a sample missing a requested member reads as NULL, kept not dropped
    extra = str(tmp_path / "extra")
    write_webdataset(
        spark.createDataFrame([("99", b"onlypng")], "key string, png binary"),
        extra, "key", {"png": "png"},
    ).collect()
    partial = load_webdataset(spark, extra, ["png", "txt"]).collect()[0]
    assert bytes(partial["png"]) == b"onlypng" and partial["txt"] is None


def test_webdataset_subdir_keys_and_nonidentifier_columns(spark, tmp_path):
    """Round-6 advisor items: (1) the WebDataset sample key is the FULL
    member path up to the first dot of the basename (upstream
    base_plus_ext) — shards with subdirectories must NOT cross-pair
    a/0001.jpg with b/0001.txt into one sample; (2) write_webdataset
    must pack columns whose names aren't valid Python identifiers
    (pandas itertuples would rename them to positional _N)."""
    import io
    import tarfile

    from victor_spark.sources.webdataset import (
        _split_member,
        load_webdataset,
        write_webdataset,
    )

    # the key rule itself
    assert _split_member("0042.jpg") == ("0042", "jpg")
    assert _split_member("a/0042.seg.png") == ("a/0042", "seg.png")
    assert _split_member("a/b/0042.txt") == ("a/b/0042", "txt")

    # a hand-built shard with subdirectories: two DISTINCT samples that
    # share a basename
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tf:
        for name, data in [
            ("a/0001.jpg", b"image-a"), ("a/0001.txt", b"caption-a"),
            ("b/0001.jpg", b"image-b"), ("b/0001.txt", b"caption-b"),
        ]:
            info = tarfile.TarInfo(name=name)
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))
    shard_dir = tmp_path / "subdir_wds"
    shard_dir.mkdir()
    (shard_dir / "shard-0.tar").write_bytes(buf.getvalue())

    rows = {
        r["key"]: r
        for r in load_webdataset(spark, str(shard_dir), ["jpg", "txt"]).collect()
    }
    assert set(rows) == {"a/0001", "b/0001"}
    assert bytes(rows["a/0001"]["jpg"]) == b"image-a"
    assert bytes(rows["a/0001"]["txt"]) == b"caption-a"
    assert bytes(rows["b/0001"]["txt"]) == b"caption-b"

    # non-identifier / underscore-leading column names pack fine
    df = spark.createDataFrame(
        [("k0", b"payload", "cap")],
        "`sample-key` string, `_bin` binary, `txt.col` string",
    )
    out = str(tmp_path / "odd_cols")
    manifest = write_webdataset(
        df, out, "sample-key", {"_bin": "bin", "txt.col": "txt"}
    ).collect()
    assert sum(m["n_samples"] for m in manifest) == 1
    back = load_webdataset(spark, out, ["bin", "txt"]).collect()[0]
    assert back["key"] == "k0"
    assert bytes(back["bin"]) == b"payload"
    assert bytes(back["txt"]).decode() == "cap"


def test_webdataset_ships_to_uri_scheme_targets(spark, tmp_path):
    """Round-8: a URI-scheme target (file: — the full Hadoop code path,
    exactly how test_fs.py exercises the shim) makes write_webdataset
    EAGER: shards pack to local staging and ship driver-side through
    fs.py, so tar export works on hdfs://s3a:// roots like every other
    maintenance path. Read-back goes through binaryFile on the same URI."""
    import tarfile

    from victor_spark.fs import HadoopFS
    from victor_spark.sources.webdataset import (
        load_webdataset,
        write_webdataset,
    )

    df = spark.createDataFrame(
        [(str(i), f"sample {i}") for i in range(6)], "key string, txt string"
    )
    dest = f"file:{tmp_path}/wds_remote"
    manifest = write_webdataset(
        df.repartition(2), dest, "key", {"txt": "txt"}
    ).collect()
    assert manifest and all(m["shard"].startswith("file:") for m in manifest)
    assert sum(m["n_samples"] for m in manifest) == 6
    # the shards really live at the Hadoop-served root (and nothing else
    # does — no staging debris shipped along)
    hfs = HadoopFS(spark, dest)
    names = sorted(hfs.listdir(dest))
    assert names == sorted(m["shard"].rsplit("/", 1)[1] for m in manifest)
    assert all(n.endswith(".tar") for n in names)
    # bytes shipped intact: still a genuine POSIX tar
    local_path = manifest[0]["shard"][len("file:"):]
    with tarfile.open(local_path) as tf:
        assert all("." in n for n in tf.getnames())

    back = load_webdataset(spark, dest, ["txt"])
    got = {r["key"]: bytes(r["txt"]).decode() for r in back.collect()}
    assert got == {str(i): f"sample {i}" for i in range(6)}
