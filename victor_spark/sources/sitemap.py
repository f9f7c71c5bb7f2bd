"""Sitemap ingestion — the crawl's OTHER discovery source (sitemaps.org
protocol: ``urlset`` pages carry fetchable URLs, ``sitemapindex`` pages
carry child sitemap locations; Common Crawl and every production crawler
seed frontiers from both).

Extraction is the same pure-``regexp`` chain discipline as
functions/html.py — whole-stage codegen, zero Python, every pattern
valid with identical semantics in Java regex and RE2. XML attributes on
the container/entry elements are tolerated (``<url >``, namespace
attrs); element content is entity-decoded in html.py's order (``&amp;``
strictly last) because the protocol REQUIRES XML-escaping URLs, and
query strings make ``&amp;`` the common case.

Malformed entries (no ``<loc>``) surface as NULL ``loc`` rows rather
than vanishing — the usual quarantine contract: callers filter or
alert, silence hides crawl-seed loss. At 100 TB of sitemap shards the
extraction parallelizes with the scan (per-row, shuffle-free)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# entry-fragment patterns: '<url' must be followed by '>' or whitespace,
# so '<urlset ...>' (same prefix) can never match an entry
_RE_URL = r"(?s)<url(?:\s[^>]*)?>(.*?)</url>"
_RE_SITEMAP = r"(?s)<sitemap(?:\s[^>]*)?>(.*?)</sitemap>"
_RE_LOC = r"(?s)<loc(?:\s[^>]*)?>\s*(.*?)\s*</loc>"
_RE_LASTMOD = r"(?s)<lastmod(?:\s[^>]*)?>\s*(.*?)\s*</lastmod>"

# XML's five predefined entities (review-caught: this is XML, not HTML —
# &apos; is spec-valid in a sitemap loc while &nbsp; is UNDEFINED in XML
# and must stay literal), plus the numeric apostrophe some escapers
# emit. &amp; strictly last, html.py's double-escape ordering rule.
_XML_ENTITIES = [
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&apos;", "'"),
    ("&#39;", "'"),
    ("&amp;", "&"),
]


def _xml_unescape(c: Column) -> Column:
    for ent, ch in _XML_ENTITIES:
        c = F.replace(c, F.lit(ent), F.lit(ch))
    return c


def _field(fragment: Column, pattern: str) -> Column:
    """Entity-decoded element content, NULL when the element is absent
    (regexp_extract yields '' on no-match; a sitemap loc/lastmod is
    never legitimately empty)."""
    return _xml_unescape(
        F.nullif(F.regexp_extract(fragment, pattern, 1), F.lit(""))
    )


def _entries(xml: Column, frag_pattern: str, kind: str) -> Column:
    frags = F.regexp_extract_all(xml, F.lit(frag_pattern), F.lit(1))
    return F.transform(
        frags,
        lambda f: F.struct(
            F.lit(kind).alias("kind"),
            _field(f, _RE_LOC).alias("loc"),
            _field(f, _RE_LASTMOD).alias("lastmod"),
        ),
    )


def sitemap_entries(pages: DataFrame, xml_col: str = "xml") -> DataFrame:
    """Explode sitemap XML pages into one row per entry.

    Output: every input column except ``xml_col``, plus ``kind``
    ('url' for urlset entries, 'sitemap' for sitemapindex children),
    ``loc`` (entity-decoded; NULL = malformed entry), and ``lastmod``
    (NULL when the optional element is absent). A page can in principle
    carry both kinds; both are extracted. A page whose XML yields ZERO
    extractable entries (truncated, garbled, not XML at all) emits ONE
    row with NULL kind/loc/lastmod instead of vanishing — silence hides
    crawl-seed loss; callers that only want real entries already filter
    ``loc IS NOT NULL`` (ADVICE r8: explode would drop such pages).

    Input pages may not already carry the output columns — duplicate
    names would surface later as a confusing AMBIGUOUS_REFERENCE deep
    in a downstream plan; raise loudly here instead (the same contract
    as crawl_gate.gate_urls)."""
    clash = {"kind", "loc", "lastmod", "_e"} & set(pages.columns)
    clash -= {xml_col}
    if clash:
        raise ValueError(
            f"sitemap_entries input columns {sorted(clash)} collide with "
            "the extractor's output columns — rename them upstream"
        )
    xml = F.col(xml_col)
    entries = F.concat(
        _entries(xml, _RE_URL, "url"),
        _entries(xml, _RE_SITEMAP, "sitemap"),
    )
    keep = [c for c in pages.columns if c != xml_col]
    return (
        pages.select(*keep, F.explode_outer(entries).alias("_e"))
        .select(*keep, "_e.kind", "_e.loc", "_e.lastmod")
    )
