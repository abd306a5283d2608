"""Pins for RSS/Atom feed parsing (operators/feeds.py), including
the two HTML-kernel-on-XML quirks the module docstring promises:
void-``<link>`` sibling text and tag lowercasing."""

from htmlparser_spark.operators.feeds import feed_entries, parse_feed

RSS = """<?xml version="1.0"?>
<rss version="2.0"><channel>
  <title>Chan T</title>
  <link>https://ex.com/</link>
  <item>
    <title>First</title>
    <link>https://ex.com/1</link>
    <guid>id-1</guid>
    <pubDate>Mon, 01 Jan 2024 00:00:00 GMT</pubDate>
    <description>d one</description>
  </item>
  <item>
    <title>Second</title>
    <link>https://ex.com/2</link>
  </item>
</channel></rss>"""

ATOM = """<feed xmlns="http://www.w3.org/2005/Atom">
  <title>Atom T</title>
  <link rel="self" href="https://ex.com/feed.xml"/>
  <entry>
    <title>E1</title>
    <link rel="alternate" href="https://ex.com/e1"/>
    <id>tag:1</id>
    <published>2024-01-01T00:00:00Z</published>
    <updated>2024-06-01T00:00:00Z</updated>
    <summary>s1</summary>
  </entry>
  <entry>
    <title>E2</title>
    <link href="https://ex.com/e2"/>
    <updated>2024-02-02T00:00:00Z</updated>
    <content>c2</content>
  </entry>
</feed>"""


def test_rss_void_link_sibling_and_lowercased_pubdate():
    rows = parse_feed(RSS)
    assert rows[0] == (0, "rss", "Chan T", "First", "https://ex.com/1",
                       "id-1", "Mon, 01 Jan 2024 00:00:00 GMT", "d one")
    # sparse item: only title + the void-link sibling URL
    assert rows[1] == (1, "rss", "Chan T", "Second",
                       "https://ex.com/2", None, None, None)


def test_rss_channel_link_does_not_leak_into_items():
    # the channel-level <link> is outside any <item>; entry rows must
    # carry only their own sibling URLs
    urls = [r[4] for r in parse_feed(RSS)]
    assert "https://ex.com/" not in urls


def test_atom_rel_filter_and_fallbacks():
    rows = parse_feed(ATOM)
    # rel="self" on the feed-level link is ignored; entry link wins
    assert rows[0] == (0, "atom", "Atom T", "E1", "https://ex.com/e1",
                       "tag:1", "2024-01-01T00:00:00Z", "s1")
    # published missing -> updated; summary missing -> content;
    # rel absent defaults to alternate
    assert rows[1] == (1, "atom", "Atom T", "E2", "https://ex.com/e2",
                       None, "2024-02-02T00:00:00Z", "c2")


def test_first_wins_within_entry():
    rows = parse_feed(
        "<feed><entry><title>a</title><title>b</title>"
        '<link href="https://x/1"/><link href="https://x/2"/>'
        "</entry></feed>")
    assert rows == [(0, "atom", None, "a", "https://x/1", None, None,
                     None)]


def test_non_feed_and_empty_entries_skipped():
    assert parse_feed("<html><body><p>page</p></body></html>") == []
    # an entry with neither title nor url contributes no row
    rows = parse_feed(
        "<rss><channel><item><guid>g</guid></item>"
        "<item><title>ok</title></item></channel></rss>")
    assert [r[3] for r in rows] == ["ok"]


def test_rss_without_channel_wrapper():
    rows = parse_feed(
        "<rss><item><title>bare</title>"
        "<link>https://x/b</link></item></rss>")
    assert rows == [(0, "rss", None, "bare", "https://x/b", None,
                     None, None)]


def test_spark_surface(spark):
    df = spark.createDataFrame(
        [("h1", RSS), ("h2", ATOM), ("h3", None),
         ("h4", "<html><p>not a feed</p></html>")],
        "host string, feed_xml string")
    out = feed_entries(df).orderBy("host", "entry_idx").collect()
    assert [(r.host, r.entry_idx, r.fmt, r.url) for r in out] == [
        ("h1", 0, "rss", "https://ex.com/1"),
        ("h1", 1, "rss", "https://ex.com/2"),
        ("h2", 0, "atom", "https://ex.com/e1"),
        ("h2", 1, "atom", "https://ex.com/e2"),
    ]
    assert out[0].feed_title == "Chan T"
