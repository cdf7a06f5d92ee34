"""WARC record parsing (functions/warc.py): header extraction, payload
split, non-response NULLs, malformed-record drop, composition into the
HTML extractor."""

from __future__ import annotations


def _resp(url, date, body, extra_hdr=""):
    return (
        "WARC/1.0\r\n"
        "WARC-Type: response\r\n"
        f"WARC-Target-URI: {url}\r\n"
        f"WARC-Date: {date}\r\n"
        f"{extra_hdr}"
        "Content-Length: 123\r\n"
        "\r\n"
        "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
        "\r\n"
        + body
    )


def test_warc_parse_response_and_other_types(spark):
    from datetime import datetime

    from pagerank_spark.functions.warc import parse_warc_records

    body = "<html><a href=\"http://t.test/x\">go</a>\r\n\r\nsecond part</html>"
    recs = [
        (_resp("http://a.test/p", "2026-02-03T04:05:06Z", body),),
        ("WARC/1.0\r\nWARC-Type: request\r\n"
         "WARC-Target-URI: http://a.test/p\r\n\r\nGET / HTTP/1.1\r\n\r\n",),
        ("garbage not a record",),
        ("WARC/1.0\r\nwarc-type: RESPONSE\r\n"
         "warc-target-uri:  http://b.test/q \r\n"
         "WARC-Date: not-a-date\r\n\r\nHTTP/1.1 200 OK\r\n\r\n<p>b</p>",),
    ]
    df = spark.createDataFrame(recs, ["record"])
    rows = {(r["url"], r["warc_type"]): r
            for r in parse_warc_records(df).collect()}
    # garbage row dropped
    assert len(rows) == 3
    a = rows[("http://a.test/p", "response")]
    assert a["warc_type"] == "response"
    assert a["warc_ts"] == datetime(2026, 2, 3, 4, 5, 6)
    # payload = bytes after the HTTP header block, inner \r\n\r\n KEPT
    assert bytes(a["html"]).decode() == body
    # request record: NULL payload
    assert rows[("http://a.test/p", "request")]["html"] is None
    # case-insensitive names, trimmed values, malformed date -> NULL ts
    b = rows[("http://b.test/q", "response")]
    assert b["warc_ts"] is None and bytes(b["html"]).decode() == "<p>b</p>"


def test_warc_feeds_extractor_end_to_end(spark):
    from pagerank_spark.functions.extract import extract_edges_df
    from pagerank_spark.functions.warc import parse_warc_records

    rec = _resp(
        "www.a.test/p", "2026-01-01T00:00:00Z",
        '<a href="http://www.b.test/q">link</a>',
    )
    pages = parse_warc_records(
        spark.createDataFrame([(rec,)], ["record"])
    ).where("warc_type = 'response'").select("url", "html")
    edges = {(r["src"], r["dst"]) for r in extract_edges_df(pages).collect()}
    assert edges == {("www.a.test/p", "www.b.test/q")}


def test_warc_http_status_and_content_type(spark):
    from pagerank_spark.functions.warc import parse_warc_records

    recs = [
        (_resp("http://a.test/ok", "2026-01-01T00:00:00Z", "<p>x</p>"),),
        # charset parameter stripped, mixed-case header name, 404 status
        ("WARC/1.0\r\nWARC-Type: response\r\n"
         "WARC-Target-URI: http://a.test/gone\r\n\r\n"
         "HTTP/1.1 404 Not Found\r\n"
         "content-type: TEXT/HTML; charset=UTF-8\r\n\r\nmissing",),
        # no http status line at all
        ("WARC/1.0\r\nWARC-Type: response\r\n"
         "WARC-Target-URI: http://a.test/raw\r\n\r\nnot-http\r\n\r\nbody",),
    ]
    df = spark.createDataFrame(recs, ["record"])
    rows = {r["url"]: r for r in parse_warc_records(df).collect()}
    assert rows["http://a.test/ok"]["http_status"] == 200
    assert rows["http://a.test/ok"]["content_type"] == "text/html"
    g = rows["http://a.test/gone"]
    assert (g["http_status"], g["content_type"]) == (404, "text/html")
    r = rows["http://a.test/raw"]
    assert r["http_status"] is None and r["content_type"] is None
