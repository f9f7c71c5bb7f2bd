"""sources/sitemap.py: pure-regexp sitemap extraction contracts."""

from __future__ import annotations

from victor_spark.sources.sitemap import sitemap_entries


def _rows(spark, xml, extra=None):
    cols = "page_id int, xml string" if extra is None else extra
    data = [(1, xml)] if extra is None else xml
    return sitemap_entries(
        spark.createDataFrame(data, cols), "xml"
    ).collect()


def test_urlset_entries_with_attributes_and_optional_lastmod(spark):
    xml = (
        '<?xml version="1.0"?>'
        '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
        "<url ><loc> http://a.example/p/1?a=1&amp;b=2 </loc>"
        "<lastmod>2026-01-02</lastmod></url>"
        '<url changefreq="daily"><loc>http://a.example/p/2</loc></url>'
        "</urlset>"
    )
    rows = _rows(spark, xml)
    assert [(r["kind"], r["loc"], r["lastmod"]) for r in rows] == [
        ("url", "http://a.example/p/1?a=1&b=2", "2026-01-02"),
        ("url", "http://a.example/p/2", None),
    ]
    assert all(r["page_id"] == 1 for r in rows)  # pass-through columns


def test_sitemapindex_children_and_url_prefix_discrimination(spark):
    # '<url' must not swallow '<urlset'; index children come out as
    # kind='sitemap'
    xml = (
        "<sitemapindex>"
        "<sitemap><loc>http://a.example/sitemap1.xml</loc>"
        "<lastmod>2026-02-01</lastmod></sitemap>"
        "<sitemap><loc>http://a.example/sitemap2.xml</loc></sitemap>"
        "</sitemapindex>"
    )
    rows = _rows(spark, xml)
    assert [(r["kind"], r["loc"], r["lastmod"]) for r in rows] == [
        ("sitemap", "http://a.example/sitemap1.xml", "2026-02-01"),
        ("sitemap", "http://a.example/sitemap2.xml", None),
    ]


def test_malformed_entry_surfaces_null_loc_not_silence(spark):
    xml = "<urlset><url><lastmod>2026-01-01</lastmod></url></urlset>"
    rows = _rows(spark, xml)
    assert len(rows) == 1
    assert rows[0]["loc"] is None and rows[0]["lastmod"] == "2026-01-01"


def test_empty_and_entry_free_pages_yield_no_rows(spark):
    assert _rows(spark, "<urlset></urlset>") == []
    assert _rows(spark, "not xml at all") == []
