"""Pins for the lib-free WARC source (sources/warc.py): framing,
gzip members, HTTP splitting, quarantine, and the Spark surface."""

from htmlparser_spark.sources.warc import (
    parse_warc_bytes,
    synth_warc_bytes,
    warc_records,
)

PAGES = [
    ("https://a.com/1", "2024-01-01T00:00:00Z", "<p>one</p>"),
    ("https://a.com/2", "2024-01-02T00:00:00Z", "<p>two &amp; x</p>"),
]


def test_roundtrip_plain_and_gzip():
    for gz in (False, True):
        recs = parse_warc_bytes(synth_warc_bytes(PAGES, gzip_members=gz))
        assert [(r[0], r[1], r[2], r[4], r[6]) for r in recs] == [
            (0, "response", "https://a.com/1", 200, "<p>one</p>"),
            (1, "response", "https://a.com/2", 200,
             "<p>two &amp; x</p>"),
        ]
        assert recs[0][5] == "text/html; charset=utf-8"
        assert all(r[7] is None for r in recs)


def test_non_response_record_and_header_case():
    blob = (b"WARC/1.0\r\n"
            b"warc-type: request\r\n"          # names case-insensitive
            b"WARC-TARGET-URI: https://q.com\r\n"
            b"Content-Length: 7\r\n\r\n"
            b"payload\r\n\r\n")
    recs = parse_warc_bytes(blob)
    assert recs == [(0, "request", "https://q.com", None, None, None,
                     "payload", None)]


def test_quarantine_stops_not_desyncs():
    # truncated payload: first record parses, second quarantines
    blob = synth_warc_bytes(PAGES)[:-30]
    recs = parse_warc_bytes(blob)
    assert recs[0][2] == "https://a.com/1" and recs[0][7] is None
    assert recs[-1][7] == "payload truncated"
    assert len(recs) == 2                     # no invented rows
    # garbage start
    assert parse_warc_bytes(b"NOT A WARC")[0][7].startswith(
        "bad record magic")
    # missing Content-Length
    bad = b"WARC/1.0\r\nWARC-Type: response\r\n\r\nxx"
    assert parse_warc_bytes(bad)[0][7] == "missing/invalid Content-Length"


def test_warc_records_spark_surface(spark):
    from htmlparser_spark.plans import (
        assert_no_python_row_udf,
        explain_string,
    )

    rows = [("f1", bytearray(synth_warc_bytes(PAGES))),
            ("f2", bytearray(synth_warc_bytes(PAGES[:1],
                                              gzip_members=True))),
            ("f3", None)]
    df = spark.createDataFrame(rows, "path string, content binary")
    out = warc_records(df)
    assert_no_python_row_udf(out)
    assert "Exchange" not in explain_string(out)
    got = sorted((r["path"], r["record_idx"], r["target_uri"],
                  r["http_status"], r["body"]) for r in out.collect())
    assert got == [
        ("f1", 0, "https://a.com/1", 200, "<p>one</p>"),
        ("f1", 1, "https://a.com/2", 200, "<p>two &amp; x</p>"),
        ("f2", 0, "https://a.com/1", 200, "<p>one</p>"),
    ]
