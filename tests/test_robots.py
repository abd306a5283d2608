"""Pins for robots.txt parsing + RFC 9309 matching
(operators/robots.py)."""

from htmlparser_spark.operators.robots import (
    is_allowed,
    parse_robots_txt,
    robots_rules,
)

SAMPLE = """\
# politeness file
User-agent: googlebot
User-agent: bingbot
Disallow: /private/
Allow: /private/ok

User-agent: *
Disallow: /tmp/*
Crawl-delay: 2
Sitemap: https://ex.com/sitemap.xml
"""


def test_parse_groups_and_fanout():
    rows = parse_robots_txt(SAMPLE)
    # shared group: each rule emitted once per agent
    assert (0, "googlebot", "disallow", "/private/") in rows
    assert (1, "bingbot", "disallow", "/private/") in rows
    assert (2, "googlebot", "allow", "/private/ok") in rows
    assert ("*", "disallow", "/tmp/*") in [r[1:] for r in rows]
    assert ("*", "crawl-delay", "2") in [r[1:] for r in rows]
    assert ("", "sitemap", "https://ex.com/sitemap.xml") in \
        [r[1:] for r in rows]


def test_is_allowed_rfc_rules():
    rules = parse_robots_txt(SAMPLE)
    # specific group wins over * for googlebot
    assert not is_allowed(rules, "/private/x", "Googlebot/2.1")
    # longest-match: /private/ok (allow, len 11) beats /private/ (9)
    assert is_allowed(rules, "/private/ok/page", "googlebot")
    # the * group applies to unknown agents; wildcard pattern
    assert not is_allowed(rules, "/tmp/a/b", "mybot")
    assert is_allowed(rules, "/public", "mybot")
    # no rules at all -> allowed
    assert is_allowed([], "/anything")


def test_is_allowed_anchors_and_ties():
    rules = parse_robots_txt(
        "User-agent: *\nDisallow: /*.pdf$\nAllow: /docs/\n"
        "Disallow: /docs/\n")
    assert not is_allowed(rules, "/x/file.pdf")
    assert is_allowed(rules, "/x/file.pdfx")      # $ anchors
    # equal-length allow vs disallow -> allow wins
    assert is_allowed(rules, "/docs/a")
    # 'Disallow:' with empty value is ignored
    assert is_allowed(parse_robots_txt("User-agent: *\nDisallow:\n"),
                      "/anything")


def test_robots_rules_spark_surface(spark):
    from htmlparser_spark.plans import (
        assert_no_python_row_udf,
        explain_string,
    )
    df = spark.createDataFrame(
        [("a.com", SAMPLE), ("b.com", None)],
        "host string, robots_txt string")
    out = robots_rules(df)
    assert_no_python_row_udf(out)
    assert "Exchange" not in explain_string(out)
    got = [(r["host"], r["agent"], r["directive"], r["value"])
           for r in out.collect()]
    assert ("a.com", "googlebot", "disallow", "/private/") in got
    assert all(h == "a.com" for h, *_ in got)


def test_parse_sitemap():
    from htmlparser_spark.operators.robots import parse_sitemap
    xml = ('<?xml version="1.0"?><urlset>'
           "<url><loc>https://a/1</loc><lastmod>2024-01-01</lastmod>"
           "<priority>0.8</priority></url>"
           "<url><loc>https://a/2</loc></url>"
           "<url><lastmod>no-loc-skipped</lastmod></url></urlset>")
    assert parse_sitemap(xml) == [
        (0, "https://a/1", "2024-01-01", None, "0.8", False),
        (1, "https://a/2", None, None, None, False),
    ]
    idx = parse_sitemap("<sitemapindex><sitemap>"
                        "<loc>https://a/s1.xml</loc>"
                        "</sitemap></sitemapindex>")
    assert idx == [(0, "https://a/s1.xml", None, None, None, True)]
    assert parse_sitemap("") == []


def test_sitemap_urls_spark_surface(spark):
    from htmlparser_spark.operators.robots import sitemap_urls
    from htmlparser_spark.plans import assert_no_python_row_udf

    df = spark.createDataFrame(
        [("a.com", "<urlset><url><loc>https://a/1</loc></url></urlset>"),
         ("b.com", None)],
        "host string, sitemap_xml string")
    out = sitemap_urls(df)
    assert_no_python_row_udf(out)
    assert [(r["host"], r["loc"], r["is_index"])
            for r in out.collect()] == [("a.com", "https://a/1", False)]
