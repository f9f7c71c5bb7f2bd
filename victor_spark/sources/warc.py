"""WARC (Web ARChive, ISO 28500) ingestion — the crawl interchange format
and the FIRST MILE of every large-scale text pipeline: Common Crawl ships
~100 TB/month as ``.warc.gz`` shards, and C4/CCNet-style corpora begin by
turning those records into a ``documents`` table. This module feeds the
repo's existing downstream (``html_to_text`` → ``c4_line_filter`` →
``line_dedup_global`` → quality/LM scoring) from crawl bytes.

Spark-first shape, both directions partition-local (the same contract as
``webdataset.py``):

- read: ``binaryFile`` lists and reads whole shards executor-side, then an
  Arrow-batched pass parses the record stream in memory — WARC headers are
  ``Content-Length``-framed (one header block per record, CRLF-delimited,
  then exactly N payload bytes), the same walk-by-declared-length family as
  the tar/RIFF/AVI container parsers in this repo. Gzip shards decompress
  member-by-member: the Common Crawl convention gzips EACH RECORD as its
  own gzip member and concatenates them, which ``zlib``'s ``unused_data``
  loop walks directly (a whole-file-gzipped shard is the one-member
  degenerate case of the same loop). Shards are whole-file tasks by design
  — gzip is not splittable, which is exactly why the ecosystem standardizes
  ~1 GB shard sizes; read parallelism = shard count.
- write: one ``.warc.gz`` shard per partition (records individually
  gzipped, CC-style), packed executor-side and returned as a manifest row
  per shard. Used by tests and the oracle-checked ``warc_extract`` catalog
  query to synthesize realistic crawl shards from the documents table;
  also the export path for re-sharding a corpus back to WARC.

Reference parity note: the reference engine has no crawl ingestion; this
is the training-data-pipeline extension surface (SURVEY §2 "text
pipeline first mile"). Format facts are the public ISO 28500 / WARC 1.0
spec and the Common Crawl layout convention.

Record framing (WARC 1.0):

    WARC/1.0<CRLF>
    <Name>: <value><CRLF>      (one per header field)
    <CRLF>
    <Content-Length bytes of payload>
    <CRLF><CRLF>               (record boundary)

``response`` records carry an HTTP/1.1 message as payload (status line +
headers + CRLFCRLF + body); the reader splits that envelope off and
surfaces status / Content-Type / body as columns so downstream text
extraction starts from the HTML bytes.
"""

from __future__ import annotations

import gzip
import hashlib
import io
import re
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

WARC_SCHEMA = StructType(
    [
        StructField("record_id", StringType()),
        StructField("warc_type", StringType()),
        StructField("target_uri", StringType()),
        StructField("warc_date", StringType()),
        StructField("content_type", StringType()),
        StructField("http_status", IntegerType()),
        StructField("http_content_type", StringType()),
        StructField("payload", BinaryType()),
        # per-record quarantine (see parse_warc_records): NULL for clean
        # records; the ValueError message when the record's HTTP payload
        # could not be unwrapped (payload then carries the RAW bytes)
        StructField("error", StringType()),
    ]
)

MANIFEST_SCHEMA = StructType(
    [
        StructField("shard", StringType()),
        StructField("n_records", LongType()),
        StructField("n_bytes", LongType()),
    ]
)

# Fixed, deterministic timestamp for synthesized records (writers must be
# reproducible so the ingest-roundtrip oracle can cache shards by content).
_WARC_DATE = "2026-01-01T00:00:00Z"

# Decompression expansion cap (gzip-bomb guard, same family as the JPEG
# 100-megapixel allocation guard): a crafted shard or response body must
# not OOM an executor before the parse can reject it. 4 GiB comfortably
# clears a real ~1 GB Common Crawl shard's ~3-5x expansion; corpora that
# legitimately pack denser pass ``max_decompressed`` to
# load_warc/parse_warc_records (a module-global override would not reach
# executor-side re-imports).
MAX_DECOMPRESSED = 4 << 30


def _gunzip_members(data: bytes, max_out: int = MAX_DECOMPRESSED) -> bytes:
    """Decompress a gzip stream of one OR many concatenated members (the
    Common Crawl record-per-member layout and plain whole-file gzip are
    both just member sequences). Raises ValueError on corrupt streams —
    the contract every container parser in this repo shares (sniffer /
    quarantine paths depend on ValueError-only) — and on expansion past
    ``max_out`` (gzip-bomb guard: reject BEFORE allocating, not after
    the executor is already swapping)."""
    out, total = [], 0
    while data:
        d = zlib.decompressobj(16 + zlib.MAX_WBITS)
        try:
            chunk = d.decompress(data, max_out - total + 1)
            if d.unconsumed_tail:
                raise ValueError(
                    f"warc: decompressed size exceeds {max_out} bytes"
                )
            out.append(chunk)
            out.append(d.flush())
        except zlib.error as e:
            raise ValueError(f"warc: corrupt gzip member: {e}") from None
        if not d.eof:
            raise ValueError("warc: truncated gzip member")
        total += len(out[-2]) + len(out[-1])
        if total > max_out:
            raise ValueError(
                f"warc: decompressed size exceeds {max_out} bytes"
            )
        data = d.unused_data
    return b"".join(out)


def _iter_records(data: bytes) -> Iterator[tuple[dict, bytes]]:
    """Walk a (decompressed) WARC byte stream: yield (header-fields,
    payload) per record. Header names are lower-cased; framing is
    Content-Length-declared, never payload-sniffed."""
    pos, n = 0, len(data)
    while pos < n:
        # tolerate extra CRLFs between records (some writers pad)
        while pos < n and data[pos] in (0x0D, 0x0A):
            pos += 1
        if pos >= n:
            return
        if not data.startswith(b"WARC/", pos):
            raise ValueError(f"warc: expected version line at offset {pos}")
        hdr_end = data.find(b"\r\n\r\n", pos)
        if hdr_end < 0:
            raise ValueError("warc: unterminated record header")
        try:
            header = data[pos:hdr_end].decode("utf-8")
        except UnicodeDecodeError:
            raise ValueError("warc: non-utf8 record header") from None
        fields: dict[str, str] = {}
        last_key = None
        for line in header.split("\r\n")[1:]:
            if line[:1] in (" ", "\t"):
                # spec-legal folded header: a continuation line extends
                # the PREVIOUS field's value (unfold as a single space —
                # without this, a folded WARC-Target-URI either aborts
                # the shard or masquerades as a new header field)
                if last_key is None:
                    raise ValueError(
                        f"warc: continuation line before any header {line!r}"
                    )
                fields[last_key] += " " + line.strip()
                continue
            k, sep, v = line.partition(":")
            if not sep:
                raise ValueError(f"warc: malformed header line {line!r}")
            last_key = k.strip().lower()
            fields[last_key] = v.strip()
        try:
            clen = int(fields["content-length"])
        except (KeyError, ValueError):
            raise ValueError("warc: missing/invalid Content-Length") from None
        if clen < 0:
            raise ValueError("warc: negative Content-Length")
        body_start = hdr_end + 4
        if body_start + clen > n:
            raise ValueError("warc: payload truncated")
        yield fields, data[body_start : body_start + clen]
        pos = body_start + clen


def _dechunk(body: bytes) -> bytes:
    """Decode an HTTP/1.1 ``Transfer-Encoding: chunked`` body (hex size
    line + CRLF + chunk + CRLF, zero-size terminator; chunk extensions
    and trailers ignored). Crawlers store the response bytes AS SENT, so
    real WARC response payloads are very often chunked."""
    out, pos = [], 0
    while True:
        nl = body.find(b"\r\n", pos)
        if nl < 0:
            raise ValueError("warc: chunked body missing size line")
        size_token = body[pos:nl].split(b";")[0].strip()
        try:
            size = int(size_token, 16)
        except ValueError:
            raise ValueError(
                f"warc: bad chunk size {size_token!r}"
            ) from None
        pos = nl + 2
        if size == 0:
            return b"".join(out)  # trailers (if any) are ignored
        if pos + size + 2 > len(body):
            raise ValueError("warc: truncated chunk")
        out.append(body[pos : pos + size])
        if body[pos + size : pos + size + 2] != b"\r\n":
            raise ValueError("warc: chunk missing CRLF terminator")
        pos += size + 2


def _decode_content(
    body: bytes, encoding: str, max_out: int = MAX_DECOMPRESSED
) -> bytes:
    """Undo an HTTP ``Content-Encoding``: gzip/x-gzip (member loop),
    deflate (zlib-wrapped per RFC 9110, raw fallback for the many
    servers that send it bare), identity. Unknown codings raise —
    surfacing them beats silently treating compressed bytes as HTML."""
    enc = encoding.strip().lower()
    if enc in ("", "identity"):
        return body
    if enc in ("gzip", "x-gzip"):
        return _gunzip_members(body, max_out)
    if enc == "deflate":
        for wbits in (zlib.MAX_WBITS, -zlib.MAX_WBITS):
            d = zlib.decompressobj(wbits)
            try:
                chunk = d.decompress(body, max_out + 1)
            except zlib.error:
                continue
            if len(chunk) > max_out:
                raise ValueError(
                    f"warc: decompressed size exceeds {max_out} bytes"
                )
            if d.eof:
                return chunk
        raise ValueError("warc: bad deflate body")
    raise ValueError(f"warc: unsupported content-encoding {encoding!r}")


def _parse_http_response(
    body: bytes, max_out: int = MAX_DECOMPRESSED
) -> tuple[int, str | None, bytes]:
    """Split an HTTP/1.1 response envelope into (status, Content-Type,
    body bytes), undoing ``Transfer-Encoding: chunked`` and
    ``Content-Encoding: gzip/deflate`` — crawl records store the wire
    bytes, so both are routine in real WARC payloads. Header bytes are
    ISO-8859-1 per RFC 9112; the returned body is the entity bytes
    (charset decode is the caller's concern)."""
    sep = body.find(b"\r\n\r\n")
    if sep < 0:
        raise ValueError("warc: http payload missing header terminator")
    head = body[:sep].decode("iso-8859-1")
    lines = head.split("\r\n")
    parts = lines[0].split(None, 2)
    if len(parts) < 2 or not parts[0].startswith("HTTP/"):
        raise ValueError(f"warc: malformed http status line {lines[0]!r}")
    try:
        status = int(parts[1])
    except ValueError:
        raise ValueError(f"warc: non-numeric http status {parts[1]!r}") from None
    headers: dict[str, str] = {}
    for line in lines[1:]:
        k, _, v = line.partition(":")
        headers[k.strip().lower()] = v.strip()
    payload = body[sep + 4 :]
    # transfer coding first (how the bytes moved), then content coding
    # (how the entity is stored) — the wire applies them in that order
    if "chunked" in headers.get("transfer-encoding", "").lower():
        payload = _dechunk(payload)
    payload = _decode_content(
        payload, headers.get("content-encoding", ""), max_out
    )
    return status, headers.get("content-type"), payload


def parse_warc_records(
    raw: DataFrame, max_decompressed: int = MAX_DECOMPRESSED
) -> DataFrame:
    """The shard-bytes -> record-rows transform: ``raw`` carries one
    whole WARC shard per row in a ``content`` binary column (what
    ``binaryFile`` produces, batch OR streaming — the streaming first
    mile in ``streaming/warc_stream.py`` applies this exact function, so
    stream == batch holds by construction). ``response`` records get
    their HTTP envelope split off (``http_status``,
    ``http_content_type``, ``payload`` = entity bytes after
    chunked/content-coding removal); other record types (warcinfo,
    request, metadata, conversion) surface their raw payload with NULL
    http columns — filter on ``warc_type`` downstream.

    Error scoping, the dirty-crawl contract: real Common Crawl shards
    routinely contain records whose HTTP payload cannot be unwrapped —
    bodies truncated at the fetcher's cap (WARC-Truncated), exotic
    content codings (br/zstd), junk header bytes. Those quarantine PER
    RECORD: the row survives with its WARC fields, the RAW payload
    bytes, NULL http columns and the ValueError message in ``error``
    (same per-asset policy as the media sniffer). FRAMING damage —
    a corrupt gzip member, a record whose Content-Length walks off the
    end — still fails the shard task loudly, because past a framing
    error every later byte boundary is a guess.

    The parse runs inside ``mapInPandas`` on whole-shard payloads, so
    task memory is bounded by one shard (the format's ~1 GB sizing
    convention); nothing is collected to the driver, and the plan is
    scan → narrow map — shuffle-free by construction."""

    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # yield PER SHARD, not per Arrow batch — one shard bounds
            # task memory (same rationale as webdataset._untar)
            for content in pdf["content"]:
                data = bytes(content)
                if data[:2] == b"\x1f\x8b":
                    data = _gunzip_members(data, max_decompressed)
                rows = {f.name: [] for f in WARC_SCHEMA.fields}
                for fields, payload in _iter_records(data):
                    wtype = fields.get("warc-type", "")
                    status = ctype = body = err = None
                    if wtype == "response" and "msgtype=response" in fields.get(
                        "content-type", ""
                    ):
                        try:
                            status, ctype, body = _parse_http_response(
                                payload, max_decompressed
                            )
                        except ValueError as e:
                            status = ctype = body = None
                            err = str(e)
                    rows["record_id"].append(fields.get("warc-record-id"))
                    rows["warc_type"].append(wtype)
                    rows["target_uri"].append(fields.get("warc-target-uri"))
                    rows["warc_date"].append(fields.get("warc-date"))
                    rows["content_type"].append(fields.get("content-type"))
                    rows["http_status"].append(status)
                    rows["http_content_type"].append(ctype)
                    rows["payload"].append(body if body is not None else payload)
                    rows["error"].append(err)
                pdf_out = pd.DataFrame(rows)
                pdf_out["http_status"] = pdf_out["http_status"].astype("Int32")
                yield pdf_out

    return raw.mapInPandas(_parse, schema=WARC_SCHEMA)


def load_warc(
    spark: SparkSession,
    path: str,
    glob: str = "*.warc*",
    max_decompressed: int = MAX_DECOMPRESSED,
) -> DataFrame:
    """Read a directory of WARC shards (plain ``.warc`` or gzipped
    ``.warc.gz``, member-per-record or whole-file) into one row per
    record — ``binaryFile`` whole-shard scan + :func:`parse_warc_records`
    (see its docstring for the per-record columns and memory contract).
    ``max_decompressed`` raises the gzip-bomb expansion cap for corpora
    that legitimately pack denser than the 4 GiB default."""
    raw = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .option("recursiveFileLookup", "true")
        .load(path)
        .select("content")
    )
    return parse_warc_records(raw, max_decompressed)


_CHARSET_IN_CT = re.compile(
    r"""charset\s*=\s*["']?\s*([A-Za-z0-9_.:-]+)""", re.I
)


def _detect_charset(b: bytes, content_type: str | None) -> str:
    """Charset of an HTML payload, by precedence: BOM, the Content-Type
    header's charset parameter, an early ``<meta charset>`` /
    http-equiv declaration (scanned ASCII-compatibly in the first 2 KiB,
    per the HTML5 prescan), else UTF-8 — the modern-web default."""
    if b[:3] == b"\xef\xbb\xbf":
        return "utf-8-sig"
    if b[:2] in (b"\xff\xfe", b"\xfe\xff"):
        return "utf-16"
    if content_type:
        m = _CHARSET_IN_CT.search(content_type)
        if m:
            return m.group(1)
    head = b[:2048].decode("latin-1", "replace")
    m = re.search(
        r"""(?i)<meta[^>]+charset\s*=\s*["']?\s*([A-Za-z0-9_.:-]+)""", head
    )
    if m:
        return m.group(1)
    return "utf-8"


def _decode_html_bytes(b: bytes, content_type: str | None = None) -> str:
    """Decode HTML payload bytes by their declared charset, never
    raising: unknown codec names fall back to UTF-8, malformed byte
    sequences become U+FFFD. Deterministic — the same payload always
    yields the same text."""
    cs = _detect_charset(b, content_type)
    try:
        return b.decode(cs, "replace")
    except (LookupError, UnicodeError):
        # LookupError: codec name unknown. UnicodeError: codecs like
        # 'undefined'/'punycode' REFUSE input even with errors='replace'
        # — either way fall back rather than killing the job on one page
        return b.decode("utf-8", "replace")


def _documents_shape(pages: DataFrame, text, source: str) -> DataFrame:
    """Project filtered records into the ``documents`` layout the whole
    downstream pipeline consumes (+ the originating ``url``). doc_id is
    the low 63 bits of xxhash64(target_uri): deterministic across
    runs/executors, collision-resistant across shards."""
    from victor_spark.functions.text import lang_id

    return pages.select(
        F.xxhash64("target_uri")
        .bitwiseAND(F.lit((1 << 63) - 1))
        .alias("doc_id"),
        text.alias("text"),
        F.col("target_uri").alias("url"),
    ).select(
        "doc_id",
        "text",
        lang_id("text").alias("lang"),
        F.lit(source).alias("source"),
        F.length("text").cast("long").alias("n_chars"),
        "url",
    )


def documents_from_warc(
    recs: DataFrame, source: str = "warc", charset_aware: bool = False
) -> DataFrame:
    """WARC record rows (:func:`parse_warc_records`) -> a ``documents``-
    shaped table: keeps 200-status ``response`` records with an HTML
    content type, extracts text with the deterministic JVM-side
    extractor (``functions/html.py``), tags a heuristic language id.
    Works identically on batch and streaming inputs (pure narrow
    transformation — the streaming first mile composes it verbatim).

    Charset: the default decodes payloads as UTF-8 entirely JVM-side
    (the modern-web overwhelming default; other charsets come through
    with U+FFFD replacement). ``charset_aware=True`` adds ONE
    Arrow-batched pass that honors each page's declared encoding — BOM,
    the Content-Type charset parameter, or an early ``<meta charset>``
    (HTML5-prescan style) — for corpora with a meaningful
    latin-1/windows-1252/shift-jis tail; everything downstream of the
    decode stays JVM-side either way."""
    from victor_spark.functions.html import html_to_text

    pages = recs.filter(
        (F.col("warc_type") == "response")
        & (F.col("http_status") == 200)
        & F.lower(F.coalesce("http_content_type", F.lit(""))).contains(
            "text/html"
        )
    )
    if charset_aware:
        def _dec(payloads: pd.Series, ctypes: pd.Series) -> pd.Series:
            return pd.Series(
                [
                    _decode_html_bytes(bytes(b), ct)
                    for b, ct in zip(payloads, ctypes)
                ],
                dtype="object",
            )

        dec = F.pandas_udf(_dec, "string")
        html = dec(F.col("payload"), F.col("http_content_type"))
    else:
        # NOT F.decode(..., 'UTF-8'): since Spark 4 that RAISES on the
        # first malformed byte (MALFORMED_CHARACTER_CODING) — one
        # latin-1 page would fail the whole job. binary->string cast
        # wraps the raw bytes; make_valid_utf8 then replaces invalid
        # sequences with U+FFFD, which is the documented contract.
        html = F.make_valid_utf8(F.col("payload").cast("string"))
    return _documents_shape(pages, html_to_text(html), source)


def documents_from_wet(recs: DataFrame, source: str = "wet") -> DataFrame:
    """WET record rows -> a ``documents``-shaped table. WET is Common
    Crawl's pre-extracted-text distribution: the SAME WARC container,
    but ``conversion`` records whose payload is already plain text — so
    this path skips HTML extraction and only whitespace-normalizes
    (``functions/html.normalize_ws``, the same contract the extractor
    ends with, so WARC- and WET-derived corpora normalize identically)."""
    from victor_spark.functions.html import normalize_ws

    conv = recs.filter(F.col("warc_type") == "conversion")
    # same malformed-byte hazard as documents_from_warc: WET payloads
    # from the wild are utf-8 by convention, not by guarantee
    text = normalize_ws(F.make_valid_utf8(F.col("payload").cast("string")))
    return _documents_shape(conv, text, source)


def warc_documents(
    spark: SparkSession,
    path: str,
    glob: str = "*.{warc,warc.gz}",
    source: str = "warc",
    charset_aware: bool = False,
) -> DataFrame:
    """Crawl shards -> a ``documents``-shaped table in one call: the
    complete first mile (``binaryFile`` scan -> record walk ->
    HTML-typed 200s -> JVM-side extraction + lang id). Plan shape:
    scan -> narrow map -> filter -> projection; shuffle-free,
    parallelism = shard count. See :func:`documents_from_warc`.

    The default glob uses Hadoop brace alternation to match ``.warc`` /
    ``.warc.gz`` but NOT ``.warc.wet.gz`` — a Common-Crawl-layout root
    holds both, and a ``*.warc*`` glob would gunzip and record-walk
    every WET shard only to filter out all its conversion records."""
    return documents_from_warc(
        load_warc(spark, path, glob), source, charset_aware
    )


def wet_documents(
    spark: SparkSession,
    path: str,
    glob: str = "*.wet*",
    source: str = "wet",
) -> DataFrame:
    """Common Crawl WET shards (pre-extracted text as ``conversion``
    records) -> a ``documents``-shaped table. See
    :func:`documents_from_wet`."""
    return documents_from_wet(load_warc(spark, path, glob), source)


def _record_bytes(fields: list[tuple[str, str]], payload: bytes) -> bytes:
    for k, v in fields:
        if "\r" in v or "\n" in v or "\r" in k or "\n" in k:
            # a CR/LF inside a header value (an unvalidated crawl URL,
            # say) would inject header lines and reframe the record —
            # the writer refuses rather than emitting a corrupt shard
            raise ValueError(f"warc: CR/LF in header field {k!r}: {v!r}")
    head = "".join(f"{k}: {v}\r\n" for k, v in fields)
    return (
        b"WARC/1.0\r\n"
        + head.encode("utf-8")
        + f"Content-Length: {len(payload)}\r\n\r\n".encode()
        + payload
        + b"\r\n\r\n"
    )


def _response_record(uri: str, html: bytes) -> bytes:
    http = (
        b"HTTP/1.1 200 OK\r\n"
        b"Content-Type: text/html; charset=utf-8\r\n"
        + f"Content-Length: {len(html)}\r\n\r\n".encode()
        + html
    )
    rid = hashlib.md5(uri.encode("utf-8")).hexdigest()
    urn = f"<urn:uuid:{rid[:8]}-{rid[8:12]}-{rid[12:16]}-{rid[16:20]}-{rid[20:32]}>"
    return _record_bytes(
        [
            ("WARC-Type", "response"),
            ("WARC-Record-ID", urn),
            ("WARC-Date", _WARC_DATE),
            ("WARC-Target-URI", uri),
            ("Content-Type", "application/http;msgtype=response"),
        ],
        http,
    )


def _conversion_record(uri: str, text: bytes) -> bytes:
    """A WET-style ``conversion`` record: plain-text payload, no HTTP
    envelope (how Common Crawl distributes pre-extracted text)."""
    rid = hashlib.md5(("conv:" + uri).encode("utf-8")).hexdigest()
    urn = f"<urn:uuid:{rid[:8]}-{rid[8:12]}-{rid[12:16]}-{rid[16:20]}-{rid[20:32]}>"
    return _record_bytes(
        [
            ("WARC-Type", "conversion"),
            ("WARC-Record-ID", urn),
            ("WARC-Date", _WARC_DATE),
            ("WARC-Target-URI", uri),
            ("Content-Type", "text/plain"),
        ],
        text,
    )


def _warcinfo_record(shard: str) -> bytes:
    body = (
        "software: victor_spark\r\nformat: WARC File Format 1.0\r\n"
        f"description: synthesized shard {shard}\r\n"
    ).encode("utf-8")
    rid = hashlib.md5(shard.encode("utf-8")).hexdigest()
    urn = f"<urn:uuid:{rid[:8]}-{rid[8:12]}-{rid[12:16]}-{rid[16:20]}-{rid[20:32]}>"
    return _record_bytes(
        [
            ("WARC-Type", "warcinfo"),
            ("WARC-Record-ID", urn),
            ("WARC-Date", _WARC_DATE),
            ("Content-Type", "application/warc-fields"),
        ],
        body,
    )


def write_warc(
    df: DataFrame,
    path: str,
    uri_col: str,
    html_col: str,
    prefix: str = "crawl",
    gzip_records: bool = True,
    record_type: str = "response",
    staging_dir: str | None = None,
) -> DataFrame:
    """Pack (uri, html) rows into WARC shards, ONE SHARD PER PARTITION,
    written executor-side: each shard opens with a ``warcinfo`` record
    and carries one record per row — ``record_type='response'`` (the
    default: HTTP/1.1 envelope, ``text/html`` body) or ``'conversion'``
    (WET-style plain-text payload, how Common Crawl ships pre-extracted
    text). ``gzip_records=True`` (default) writes the Common Crawl
    ``.warc.gz`` layout — every record its own gzip member, ``mtime=0``
    for deterministic bytes. ``html_col`` may be string (utf-8 encoded)
    or binary.

    For a plain local ``path`` the returned manifest (shard, n_records,
    n_bytes) is LAZY — an action on it performs the write, exactly like
    ``write_webdataset``. For a URI-scheme ``path`` the call is EAGER:
    shards pack to ``staging_dir`` and a post-pack DRIVER-SIDE pass
    ships them through the fs shim
    (:func:`victor_spark.sources.shipping.ship_shards` — see its
    docstring for the visibility contract: the staging dir must be
    readable from the driver, which is automatic in local mode; on a
    multi-node cluster pass a shared mount)."""
    from urllib.parse import urlparse

    from victor_spark.fs import fs_for
    from victor_spark.fs import join as fsjoin

    if urlparse(path).scheme:
        import tempfile

        from victor_spark.sources.shipping import ship_shards

        staging = staging_dir or tempfile.mkdtemp(prefix="warc_ship_")
        local = write_warc(
            df, staging, uri_col, html_col, prefix, gzip_records, record_type
        )
        return ship_shards(df.sparkSession, local, path, cleanup_dir=staging)

    try:
        rec_fn = {"response": _response_record,
                  "conversion": _conversion_record}[record_type]
    except KeyError:
        raise ValueError(
            f"unknown record_type {record_type!r}; 'response' or 'conversion'"
        ) from None
    sel = [uri_col, html_col]
    src = df.select(*(f"`{c.replace('`', '``')}`" for c in sel)).toDF("_c0", "_c1")
    fs_for(df.sparkSession, path).mkdirs(path)  # driver-side, pre-write
    ext = (".warc.wet.gz" if gzip_records else ".warc.wet") \
        if record_type == "conversion" \
        else (".warc.gz" if gzip_records else ".warc")

    def _pack(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        from victor_spark.fs import LocalFS

        pid = TaskContext.get().partitionId()
        name = f"{prefix}-{pid:05d}{ext}"

        def _z(rec: bytes) -> bytes:
            return gzip.compress(rec, 6, mtime=0) if gzip_records else rec

        buf = io.BytesIO()
        buf.write(_z(_warcinfo_record(name)))
        n = 0
        for pdf in batches:
            for uri, html in zip(pdf["_c0"], pdf["_c1"]):
                data = (
                    html.encode("utf-8") if isinstance(html, str) else bytes(html)
                )
                buf.write(_z(rec_fn(str(uri), data)))
                n += 1
        if n == 0:
            yield pd.DataFrame({"shard": [], "n_records": [], "n_bytes": []})
            return
        data = buf.getvalue()
        shard = fsjoin(path, name)
        LocalFS().write_bytes_atomic(shard, data)
        yield pd.DataFrame(
            {"shard": [shard], "n_records": [n + 1], "n_bytes": [len(data)]}
        )

    return src.mapInPandas(_pack, schema=MANIFEST_SCHEMA)
