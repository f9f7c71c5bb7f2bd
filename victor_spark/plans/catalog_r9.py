"""Round-9 staged catalog queries — built and oracle-tested in round 8,
NOT yet registered.

Why staged: the driver's correctness gate checks the FIRST 50 of
``QUERIES`` and never-green queries auto-front, so registering new
queries mid-round evicts stale-tier queries from the gate window. The
round-7 verdict dedicated round 8's window to draining the entire
49-query r4/r5 tail (exactly warc_extract + 49 = 50 slots), so these
four wait here with full builders, oracles, and pytest parity coverage
(``tests/test_r9_pending.py`` runs the same compare the driver gate
does).

TO REGISTER AT ROUND-9 START: in ``catalog.py``, after the last ``@_q``
definition add ``QUERIES.update(catalog_r9.PENDING)`` — or simply move
these definitions inline — then delete this module and its test's
pending marker. They will auto-front as never-green.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from victor_spark.functions.html import sql_normalize_ws
from victor_spark.plans.catalog import (
    QuerySpec,
    _ingest_build_dir,
    _ingest_cache_dir,
    _publish_ingest_dir,
)
from victor_spark.sources import load_table

PENDING: dict[str, QuerySpec] = {}


def _q9(name: str, oracle, doc: str = ""):
    def wrap(fn):
        PENDING[name] = QuerySpec(name, fn, oracle, doc)
        return fn

    return wrap


# ---------------------------------------------------------------------------
# WET roundtrip: the pre-extracted-text half of the first mile
# ---------------------------------------------------------------------------

_WET_ORACLE = f"""
WITH norm AS (
  SELECT doc_id, {sql_normalize_ws("text")} AS t FROM documents
)
SELECT 'http://corpus.example/doc/' || CAST(doc_id AS VARCHAR) AS url,
       CAST(length(t) AS BIGINT) AS n_chars,
       md5(t) AS text_md5
FROM norm
"""


@_q9(
    "ingest_wet_roundtrip",
    _WET_ORACLE,
    "Common Crawl's OTHER distribution: WET shards (the same WARC "
    "container carrying pre-extracted plain text as 'conversion' "
    "records). The documents table is packed into .warc.wet.gz shards "
    "(gzip member per record) and read back through wet_documents — "
    "whitespace-normalized with the SAME contract the HTML extractor "
    "ends with, so WARC- and WET-derived corpora agree. The oracle "
    "recomputes the normalization over documents.text; a match proves "
    "conversion-record framing + member transport + normalization end "
    "to end. Shuffle-free scan -> record walk -> projection",
)
def q_ingest_wet_roundtrip(spark, sf_dir):
    from victor_spark.sources.warc import wet_documents, write_warc

    docs = load_table(spark, sf_dir, "documents").select(
        F.concat(
            F.lit("http://corpus.example/doc/"),
            F.col("doc_id").cast("string"),
        ).alias("uri"),
        "text",
    )
    # cache key covers EVERY function that shapes the shard bytes —
    # the record/envelope builders included (round-6 lesson; same rule
    # as q_warc_extract)
    from victor_spark.sources import warc as _warc_mod

    out, built = _ingest_cache_dir(
        "wet", sf_dir,
        code_of=(q_ingest_wet_roundtrip, write_warc,
                 _warc_mod._record_bytes, _warc_mod._conversion_record,
                 _warc_mod._warcinfo_record),
    )
    if not built:
        build = _ingest_build_dir(out)
        write_warc(
            docs.repartition(8), build, "uri", "text",
            record_type="conversion",
        ).collect()
        _publish_ingest_dir(build, out)
    return wet_documents(spark, out).select(
        "url",
        F.col("n_chars").cast("long").alias("n_chars"),
        F.md5("text").alias("text_md5"),
    )


# ---------------------------------------------------------------------------
# MP3 metadata probe over SYNTHESIZED streams (the external fixture pins
# reality in ingest_external_fixtures; this pins cross-engine determinism
# of the whole probe surface at corpus scale)
# ---------------------------------------------------------------------------

# the same public tables the probe carries, stated literally in SQL
_V1L3 = "list_value(32,40,48,56,64,80,96,112,128,160,192,224,256,320)"
_V2L3 = "list_value(8,16,24,32,40,48,56,64,80,96,112,128,144,160)"
_RATES_SQL = (
    "list_value(list_value(44100,48000,32000),"
    "list_value(22050,24000,16000),"
    "list_value(11025,12000,8000))"
)

_MP3_ORACLE = f"""
WITH p AS (
  SELECT doc_id AS media_id, md5(text) AS h FROM documents
),
d AS (
  SELECT media_id,
         (ord(substr(h, 1, 1)) % 3) + 1 AS vsel,      -- 1=MPEG1 2=MPEG2 3=MPEG2.5
         (ord(substr(h, 2, 1)) % 14) + 1 AS bridx,
         (ord(substr(h, 3, 1)) % 3) + 1 AS sridx,
         (ord(substr(h, 4, 1)) % 6) + 1 AS nf
  FROM p
),
e AS (
  SELECT media_id, nf,
         CASE WHEN vsel = 1 THEN {_V1L3}[bridx] ELSE {_V2L3}[bridx] END AS kbps,
         {_RATES_SQL}[vsel][sridx] AS rate,
         CASE WHEN vsel = 1 THEN 1152 ELSE 576 END AS spf
  FROM d
)
SELECT media_id,
       CAST(rate AS BIGINT) AS sample_rate,
       CAST(nf AS BIGINT) AS n_frames,
       CAST(nf * spf AS BIGINT) AS n_samples,
       CAST(kbps AS BIGINT) AS mean_kbps,
       CAST(nf * (spf // 8 * kbps * 1000 // rate) AS BIGINT) AS n_bytes
FROM e
"""


@_q9(
    "multimodal_mp3_probe",
    _MP3_ORACLE,
    "MP3 metadata at corpus scale: per-document Layer-III streams are "
    "synthesized with md5-derived version/bitrate/rate/frame-count "
    "(headers + zero-fill payload — the probe reads headers only), and "
    "operators/mp3_probe.py walks every frame to report sample rate, "
    "frame/sample counts, mean bitrate and total bytes. The oracle "
    "restates the public ISO 11172-3/13818-3 tables and the "
    "samples/8*bitrate/rate frame-length formula in SQL, so a match "
    "proves the walk's integer math on BOTH engines; the committed "
    "real-encoder fixture (ingest_external_fixtures) pins the tables "
    "against reality. Arrow-batched synth + probe, shuffle-free",
)
def q_multimodal_mp3_probe(spark, sf_dir):
    from collections.abc import Iterator as _It

    import pandas as pd

    from victor_spark.operators.mp3_probe import _BITRATES, _RATES, mp3_probe

    d = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("media_id"), F.md5("text").alias("h")
    )

    def _synth_and_probe(batches: _It[pd.DataFrame]) -> _It[pd.DataFrame]:
        vbits_for = {1: 3, 2: 2, 3: 0}  # vsel -> header version bits
        for pdf in batches:
            rows = {k: [] for k in (
                "media_id", "sample_rate", "n_frames", "n_samples",
                "mean_kbps", "n_bytes",
            )}
            for mid, h in zip(pdf["media_id"], pdf["h"]):
                vsel = (ord(h[0]) % 3) + 1
                bridx = (ord(h[1]) % 14) + 1
                sridx = ord(h[2]) % 3
                nf = (ord(h[3]) % 6) + 1
                vbits = vbits_for[vsel]
                hdr = (
                    (0x7FF << 21) | (vbits << 19) | (1 << 17)  # Layer III
                    | (bridx << 12) | (sridx << 10) | (0 << 9) | (3 << 6)
                ).to_bytes(4, "big")
                kbps = _BITRATES[(1 if vsel == 1 else 2, 3)][bridx - 1]
                rate = _RATES[vbits][sridx]
                spf = 1152 if vsel == 1 else 576
                flen = spf // 8 * kbps * 1000 // rate
                stream = (hdr + b"\x00" * (flen - 4)) * nf
                info = mp3_probe(stream)  # the REAL probe on real bytes
                rows["media_id"].append(mid)
                rows["sample_rate"].append(info["sample_rate"])
                rows["n_frames"].append(info["n_frames"])
                rows["n_samples"].append(info["n_samples"])
                rows["mean_kbps"].append(int(info["mean_kbps"]))
                rows["n_bytes"].append(len(stream))
            yield pd.DataFrame(rows)

    return d.mapInPandas(
        _synth_and_probe,
        schema=(
            "media_id long, sample_rate long, n_frames long, "
            "n_samples long, mean_kbps long, n_bytes long"
        ),
    )


# ---------------------------------------------------------------------------
# WebP header probe over SYNTHESIZED containers (VP8X canvas + VP8
# keyframe header, cross-check enforced by the probe itself)
# ---------------------------------------------------------------------------

_WEBP_ORACLE = """
WITH p AS (SELECT doc_id AS media_id, md5(text) AS h FROM documents)
SELECT media_id,
       CAST((ord(substr(h, 1, 1)) % 300) + 1 AS BIGINT) AS width,
       CAST((ord(substr(h, 2, 1)) % 300) + 1 AS BIGINT) AS height,
       CAST(52 AS BIGINT) AS n_bytes
FROM p
"""


@_q9(
    "multimodal_webp_probe",
    _WEBP_ORACLE,
    "WebP metadata at corpus scale: per-document VP8X containers are "
    "synthesized with md5-derived dimensions (extended header + a VP8 "
    "keyframe header whose dims must AGREE — the probe enforces the "
    "cross-check — with zero-fill entropy bytes the header-only probe "
    "never reads), and multimodal.webp_dimensions reports the dims. "
    "The oracle restates the md5 derivation; the committed real VP8X "
    "fixture pins the field layout against a real encoder. "
    "Arrow-batched synth + probe, shuffle-free",
)
def q_multimodal_webp_probe(spark, sf_dir):
    import struct
    from collections.abc import Iterator as _It

    import pandas as pd

    from victor_spark.operators.multimodal import webp_dimensions

    d = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("media_id"), F.md5("text").alias("h")
    )

    def _synth_and_probe(batches: _It[pd.DataFrame]) -> _It[pd.DataFrame]:
        for pdf in batches:
            rows = {"media_id": [], "width": [], "height": [], "n_bytes": []}
            for mid, h in zip(pdf["media_id"], pdf["h"]):
                w = (ord(h[0]) % 300) + 1
                hh = (ord(h[1]) % 300) + 1
                vp8x = (
                    b"VP8X" + struct.pack("<I", 10)
                    + b"\x00\x00\x00\x00"
                    + (w - 1).to_bytes(3, "little")
                    + (hh - 1).to_bytes(3, "little")
                )
                frame = (
                    b"\x00\x00\x00"  # keyframe tag (bit0 = 0)
                    + b"\x9d\x01\x2a"
                    + struct.pack("<H", w) + struct.pack("<H", hh)
                    + b"\x00" * 4  # entropy bytes the probe never reads
                )
                vp8 = b"VP8 " + struct.pack("<I", len(frame)) + frame
                body = b"WEBP" + vp8x + vp8
                payload = b"RIFF" + struct.pack("<I", len(body)) + body
                pw, ph = webp_dimensions(payload)  # the REAL probe
                rows["media_id"].append(mid)
                rows["width"].append(pw)
                rows["height"].append(ph)
                rows["n_bytes"].append(len(payload))
            yield pd.DataFrame(rows)

    return d.mapInPandas(
        _synth_and_probe,
        schema="media_id long, width long, height long, n_bytes long",
    )


# ---------------------------------------------------------------------------
# URL-canonicalization dedup: the crawl pipeline's first dedup key
# ---------------------------------------------------------------------------

_URL_ORACLE = """
SELECT 'http://site' || CAST(doc_id % 7 AS VARCHAR) || '.example/p/'
         || CAST(doc_id AS VARCHAR) AS url_key,
       CAST(3 AS BIGINT) AS n_aliases
FROM documents
"""


@_q9(
    "dedup_url_canonical",
    _URL_ORACLE,
    "URL-alias dedup — the FIRST dedup every crawl pipeline runs: three "
    "alias spellings per document (uppercase scheme/host + explicit :80 "
    "+ fragment; the plain form; a userinfo-with-numeric-password form "
    "that a naive port regex would misparse) collapse to ONE canonical "
    "key via functions/url.canonical_url (pure codegen try_parse_url "
    "expressions), then an exact groupBy counts the aliases. The oracle "
    "states the expected canonical key and count per document. One "
    "hash exchange — URL dedup costs what exact dedup costs",
)
def q_dedup_url_canonical(spark, sf_dir):
    from victor_spark.functions.url import canonical_url

    d = load_table(spark, sf_dir, "documents").select("doc_id")
    site = F.col("doc_id") % 7
    path = F.col("doc_id").cast("string")
    aliases = d.select(
        F.explode(
            F.array(
                F.concat(F.lit("HTTP://SITE"), site.cast("string"),
                         F.lit(".EXAMPLE:80/p/"), path, F.lit("#frag")),
                F.concat(F.lit("http://site"), site.cast("string"),
                         F.lit(".example/p/"), path),
                F.concat(F.lit("http://u:9"), path,
                         F.lit("@site"), site.cast("string"),
                         F.lit(".example/p/"), path),
            )
        ).alias("url")
    )
    return (
        aliases.groupBy(canonical_url("url").alias("url_key"))
        .agg(F.count("*").alias("n_aliases"))
    )
