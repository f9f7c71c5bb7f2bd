"""Streaming crawl gate (streaming/crawl_gate.py): canonicalize →
robots-evaluate → watermark-bounded frontier dedup, stream == batch."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from victor_spark.sources import load_table
from victor_spark.streaming import (
    crawl_frontier_stream,
    gate_urls,
    rules_by_host,
)


def _rules(spark):
    rows = []
    for s in range(7):
        host = f"site{s}.example"
        rows.append((host, "/private", False))
        rows.append((host, "/tmp", False))
        if s % 2 == 0:
            rows.append((host, "/private/p", True))
    return rules_by_host(
        spark.createDataFrame(rows, "host string, prefix string, allow boolean")
    )


def _urls(spark):
    """Two alias spellings per document URL (case/:80/fragment vs plain),
    plus one malformed row per 50 docs — covers collapse, the robots
    paths, and the quarantine branch."""
    d = load_table(spark, SF_SMOKE, "documents").select("doc_id")
    s = (F.col("doc_id") % 7).cast("string")
    path = (
        F.when(F.col("doc_id") % 5 == 0,
               F.concat(F.lit("/private/p/"), F.col("doc_id").cast("string")))
        .when(F.col("doc_id") % 5 == 1,
              F.concat(F.lit("/tmp/"), F.col("doc_id").cast("string")))
        .otherwise(F.concat(F.lit("/p/"), F.col("doc_id").cast("string")))
    )
    aliases = F.array(
        F.concat(F.lit("HTTP://SITE"), s, F.lit(".EXAMPLE:80"), path,
                 F.lit("#frag")),
        F.concat(F.lit("http://site"), s, F.lit(".example"), path),
    )
    urls = d.select(
        F.explode(aliases).alias("url"),
        F.timestamp_seconds(F.lit(1_700_000_000) + F.col("doc_id")).alias("ts"),
    )
    malformed = d.filter(F.col("doc_id") % 50 == 0).select(
        F.lit("not a url").alias("url"),
        F.timestamp_seconds(F.lit(1_700_000_000)).alias("ts"),
    )
    return urls.unionAll(malformed)


def test_gate_urls_batch_semantics(spark):
    gated = gate_urls(_urls(spark), _rules(spark))
    rows = gated.collect()
    for r in rows:
        if r["url_key"] is None:
            assert not r["allowed"]  # malformed never admitted
            continue
        host_parity = int(r["host"][4]) % 2
        if "/private/p/" in r["url_key"]:
            assert r["allowed"] == (host_parity == 0)
            assert r["matched_prefix"] == (
                "/private/p" if host_parity == 0 else "/private"
            )
        elif "/tmp/" in r["url_key"]:
            assert not r["allowed"]
            assert r["matched_prefix"] == "/tmp"
        else:
            assert r["allowed"]  # no rule matches /p/... → default allow
            assert r["matched_prefix"] == ""
    # alias spellings collapsed: every non-null canonical key has exactly
    # 2 alias rows
    counts = (
        gated.filter(F.col("url_key").isNotNull())
        .groupBy("url_key").count().select("count").distinct().collect()
    )
    assert [r["count"] for r in counts] == [2]


def test_gate_urls_unknown_host_defaults_to_allow(spark):
    urls = spark.createDataFrame(
        [("http://unlisted.example/private/p/1",)], "url string"
    )
    row = gate_urls(urls, _rules(spark)).collect()[0]
    assert row["allowed"] and row["matched_prefix"] == ""


def test_gate_urls_rejects_reserved_input_columns(spark):
    import pytest

    urls = spark.createDataFrame(
        [("http://a.example/x", "clobber-me")], "url string, host string"
    )
    with pytest.raises(ValueError, match="host"):
        gate_urls(urls, _rules(spark))


def test_rules_by_host_normalizes_host_case(spark):
    # a mixed-case host in the rule source must still gate its URLs
    rules = rules_by_host(
        spark.createDataFrame(
            [("A.Example", "/private", False)],
            "host string, prefix string, allow boolean",
        )
    )
    urls = spark.createDataFrame(
        [("http://a.example/private/x",)], "url string"
    )
    row = gate_urls(urls, rules).collect()[0]
    assert not row["allowed"] and row["matched_prefix"] == "/private"


def test_robots_match_target_includes_query_string(spark):
    # RFC 9309 matches path + query: a rule extending into the query
    # must match, and the same path without the query must not
    rules = rules_by_host(
        spark.createDataFrame(
            [("a.example", "/search?sess=", False)],
            "host string, prefix string, allow boolean",
        )
    )
    urls = spark.createDataFrame(
        [("http://a.example/search?sess=abc",),
         ("http://a.example/search",)],
        "url string",
    )
    rows = {r["url"]: r for r in gate_urls(urls, rules).collect()}
    assert not rows["http://a.example/search?sess=abc"]["allowed"]
    assert rows["http://a.example/search"]["allowed"]


def test_robots_wildcard_and_anchor_rules(spark):
    # RFC 9309 §2.2.3 specials: '*' spans octets, trailing '$' anchors;
    # regex metachars inside patterns stay literal; longest RAW pattern
    # still wins precedence
    rules = rules_by_host(
        spark.createDataFrame(
            [
                ("a.example", "/private/*/tmp", False),
                ("a.example", "/exact$", False),
                ("a.example", "/a.b", False),       # '.' is literal
                ("a.example", "/private/*/tmp/pub", True),
            ],
            "host string, prefix string, allow boolean",
        )
    )
    urls = spark.createDataFrame(
        [
            ("http://a.example/private/x/tmp",),      # wildcard disallow
            ("http://a.example/private/x/y/tmp",),    # '*' spans slashes
            ("http://a.example/exact",),              # anchored disallow
            ("http://a.example/exact/sub",),          # past anchor → allow
            ("http://a.example/aXb",),                # '.' literal → allow
            ("http://a.example/a.b",),                # literal match
            ("http://a.example/private/x/tmp/pub",),  # longer allow wins
        ],
        "url string",
    )
    got = {r["url"]: r["allowed"] for r in gate_urls(urls, rules).collect()}
    assert got == {
        "http://a.example/private/x/tmp": False,
        "http://a.example/private/x/y/tmp": False,
        "http://a.example/exact": False,
        "http://a.example/exact/sub": True,
        "http://a.example/aXb": True,
        "http://a.example/a.b": False,
        "http://a.example/private/x/tmp/pub": True,
    }


def test_sitemap_frontier_stream_closes_the_discovery_loop(spark, tmp_path):
    # sitemap pages stream in; urlset entries (XML-escaped query URLs)
    # are extracted, gated, and admitted exactly once; the index child
    # and the disallowed URL never reach the frontier
    from pyspark.sql import functions as F

    from victor_spark.streaming import sitemap_frontier_stream

    xml1 = (
        "<urlset>"
        "<url><loc>http://site1.example/p/1?a=1&amp;b=2</loc></url>"
        "<url><loc>http://site1.example/tmp/9</loc></url>"  # disallowed
        "<url><loc>HTTP://SITE1.EXAMPLE:80/p/1?a=1&amp;b=2#x</loc></url>"
        "</urlset>"
    )
    xml2 = (
        "<sitemapindex>"
        "<sitemap><loc>http://site1.example/sitemap2.xml</loc></sitemap>"
        "</sitemapindex>"
    )
    pages = spark.createDataFrame(
        [(xml1,), (xml2,)], "xml string"
    ).withColumn("ts", F.timestamp_seconds(F.lit(1_700_000_000)))
    src = str(tmp_path / "sm_src")
    pages.coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(pages.schema).format("parquet").load(src)
    frontier = sitemap_frontier_stream(stream, _rules(spark))
    sink = str(tmp_path / "sm_sink")
    (
        frontier.writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", str(tmp_path / "sm_ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    got = [r["url_key"] for r in spark.read.parquet(sink).collect()]
    assert got == ["http://site1.example/p/1?a=1&b=2"]


def test_crawl_frontier_stream_matches_batch_gate(spark, tmp_path):
    # stage the url relation TWICE (at-least-once discovery); the frontier
    # must admit each allowed canonical key exactly once and nothing else
    src = str(tmp_path / "url_src")
    urls = _urls(spark)
    urls.coalesce(1).write.parquet(src)
    urls.coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(urls.schema).format("parquet").load(src)
    )
    frontier = crawl_frontier_stream(stream, _rules(spark))
    sink = str(tmp_path / "frontier_sink")
    ckpt = str(tmp_path / "frontier_ckpt")
    (
        frontier.writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    out = spark.read.parquet(sink)
    got = [r["url_key"] for r in out.select("url_key").collect()]
    expected = {
        r["url_key"]
        for r in gate_urls(urls, _rules(spark))
        .filter("allowed")
        .select("url_key")
        .distinct()
        .collect()
    }
    assert len(got) == len(set(got)), "a canonical key was admitted twice"
    assert set(got) == expected
    # and the frontier carries the gate columns
    assert {"url", "ts", "url_key", "host", "allowed", "matched_prefix"} <= set(
        out.columns
    )
