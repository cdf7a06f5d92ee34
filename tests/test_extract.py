"""Extraction invariant (north rule): the Arrow-vectorized path must be
byte-identical per url to the pure-Python reference extractor."""

import pytest

from pagerank_spark.fixtures import synth_pages
from pagerank_spark.functions.extract import (
    extract_edges_df,
    extract_hrefs_py,
    extract_text_df,
    extract_text_py,
)
from pagerank_spark.sources.table_io import PAGES_SCHEMA


@pytest.fixture(scope="module")
def pages_df(spark):
    rows = synth_pages(n_pages=64, seed=7)
    data = [(r["url"], r["warc_ts"], r["html"], None, r["lang"]) for r in rows]
    return spark.createDataFrame(data, PAGES_SCHEMA).persist(), rows


def test_text_byte_identity(spark, pages_df):
    df, rows = pages_df
    got = {r["url"]: r["text"] for r in extract_text_df(df).collect()}
    for r in rows:
        expected = extract_text_py(r["html"])
        assert got[r["url"]].encode() == expected.encode(), r["url"]


def test_edges_match_reference_extractor(spark, pages_df):
    df, rows = pages_df
    got = [(r["src"], r["dst"]) for r in extract_edges_df(df).collect()]
    expected = []
    for r in rows:
        for dst in extract_hrefs_py(r["html"], r["url"]):
            expected.append((r["url"], dst))
    assert sorted(got) == sorted(expected)
    # duplicates must be kept (reference sums duplicate edges)
    assert len(got) == len(expected)


def test_extractor_spec_cases():
    url = "www.example0.test/page"
    html = (
        b"<html><head><title>T</title></head><body>"
        b"<p>hello &amp; world</p>"
        b"<script>skip me</script><style>p{}</style>"
        b'<a href="http://www.a.test/x">A</a>'
        b'<a href="/rel">rel</a>'
        b'<a href="#frag">frag</a>'
        b'<a href="https://www.b.test/y">B</a>'
        b'<a href="http://www.a.test/x">A again</a>'
        b"</body></html>"
    )
    assert extract_text_py(html) == "T hello & world A rel frag B A again"
    assert extract_hrefs_py(html, url) == [
        "www.a.test/x",
        "www.example0.test/rel",
        "www.b.test/y",
        "www.a.test/x",
    ]
    assert extract_text_py(None) == ""
    assert extract_hrefs_py(b"", url) == []


def test_pages_to_pagerank_e2e(spark, pages_df):
    """from_pages -> regex filter -> pagerank matches the NumPy oracle fed the
    same extracted edge list."""
    from pagerank_spark.oracle.pagerank_np import pagerank_np
    from pagerank_spark.operators.graph_build import LinkGraph

    df, rows = pages_df
    edges = []
    for r in rows:
        for dst in extract_hrefs_py(r["html"], r["url"]):
            edges.append((r["url"], dst))
    edges.sort(key=lambda e: e[0])

    g = LinkGraph.from_pages(df, num_partitions=4)
    try:
        got = {r["url"]: r["rank"] for r in g.pagerank(epsilon=1e-8).collect()}
        oracle, _, _ = pagerank_np(edges, epsilon=1e-8, apply_regex_filter=True)
        assert set(got) == set(oracle)
        for u, e in oracle.items():
            assert got[u] == pytest.approx(e, abs=1e-6), u
    finally:
        g.unpersist()
