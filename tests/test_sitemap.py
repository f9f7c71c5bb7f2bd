"""sources/sitemap.py: pure-regexp sitemap extraction contracts."""

from __future__ import annotations

from victor_spark.sources.sitemap import sitemap_entries


def _rows(spark, xml):
    return sitemap_entries(
        spark.createDataFrame([(1, xml)], "page_id int, xml string"), "xml"
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


def test_entry_free_pages_surface_one_null_row_not_silence(spark):
    # the quarantine contract extends to whole pages: a page with zero
    # extractable entries (empty urlset, garbage bytes) must emit one
    # all-NULL row so crawl-seed loss is visible downstream (ADVICE r8)
    for xml in ("<urlset></urlset>", "not xml at all"):
        rows = _rows(spark, xml)
        assert len(rows) == 1
        r = rows[0]
        assert (r["kind"], r["loc"], r["lastmod"]) == (None, None, None)
        assert r["page_id"] == 1  # pass-through columns survive


def test_xml_predefined_entities_decode_html_only_ones_stay_literal(spark):
    # this is XML, not HTML: &apos; is one of the five predefined XML
    # entities and MUST decode; &nbsp; is undefined in XML and must
    # stay literal (review-caught)
    xml = (
        "<urlset><url><loc>http://a.example/it&apos;s?q=a&amp;b</loc>"
        "</url><url><loc>http://a.example/x&nbsp;y</loc></url></urlset>"
    )
    rows = _rows(spark, xml)
    assert rows[0]["loc"] == "http://a.example/it's?q=a&b"
    assert rows[1]["loc"] == "http://a.example/x&nbsp;y"


def test_reserved_input_columns_raise(spark):
    import pytest

    pages = spark.createDataFrame(
        [("<urlset/>", "clobber")], "xml string, lastmod string"
    )
    with pytest.raises(ValueError, match="lastmod"):
        sitemap_entries(pages, "xml")


def test_sitemap_frontier_stream_rejects_url_column(spark):
    import pytest

    from victor_spark.streaming import rules_by_host, sitemap_frontier_stream

    rules = rules_by_host(
        spark.createDataFrame(
            [("a.example", "/x", False)],
            "host string, prefix string, allow boolean",
        )
    )
    pages = spark.createDataFrame(
        [("<urlset/>", "http://page.example/sitemap.xml")],
        "xml string, url string",
    )
    with pytest.raises(ValueError, match="url"):
        sitemap_frontier_stream(pages, rules)
