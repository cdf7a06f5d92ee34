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


def test_anchor_extractor_spec_cases():
    """Anchor-text spec: script anchors skipped, fragment hrefs dropped with
    their text, nested markup contributes visible text, a new <a> closes the
    previous one, an EOF-open anchor finalizes on close()."""
    from pagerank_spark.functions.extract import extract_anchors_py

    html = (
        b'<script><a href="http://skip.test/x">never</a></script>'
        b"intro "
        b'<a href="http://t.test/a">link <b>one</b> here</a>'
        b'<a href="#frag">dropped text</a>'
        b'<a href="/rel">first<a href="http://t.test/b">second</a>'
        b'<a href="http://t.test/c">tail'
    )
    got = extract_anchors_py(html, "page.test/p1")
    assert got == [
        {"dst": "t.test/a", "anchor": "link one here"},
        # '/rel' anchor closed implicitly by the next <a>; text 'first'
        {"dst": "page.test/rel", "anchor": "first"},
        {"dst": "t.test/b", "anchor": "second"},
        # EOF-open anchor finalized by close()
        {"dst": "t.test/c", "anchor": "tail"},
    ]


def test_anchor_rides_along_without_changing_text_or_hrefs():
    """The anchor capture must not perturb the frozen text/href contract."""
    from pagerank_spark.functions.extract import (
        extract_hrefs_py,
        extract_text_py,
    )

    html = (
        b'pre <a href="http://x.test/1">one</a> mid '
        b'<script>var a="<a href=q>no</a>";</script>'
        b'<a href="/two">two</a> post'
    )
    assert extract_text_py(html) == 'pre one mid two post'
    assert extract_hrefs_py(html, "h.test/p") == ["x.test/1", "h.test/two"]


def test_anchor_df_shapes(spark):
    from pagerank_spark.functions.extract import extract_anchors_df
    from pagerank_spark.operators.textsearch import anchor_term_index

    df = spark.createDataFrame(
        [
            ("s.test/p1", b'<a href="http://t.test/x">big cats</a>'),
            ("s.test/p2", b'<a href="http://t.test/x">big dogs</a>'),
        ],
        ["url", "html"],
    )
    anchors = extract_anchors_df(df)
    assert anchors.columns == ["src", "dst", "anchor"]
    idx = {(r["dst"], r["term"]): (r["tf"], r["n_anchors"])
           for r in anchor_term_index(anchors).collect()}
    assert idx[("t.test/x", "big")] == (2, 2)
    assert idx[("t.test/x", "cats")] == (1, 2)
    assert idx[("t.test/x", "dogs")] == (1, 2)


def test_nofollow_extractor_spec_cases():
    """rel=nofollow spec: token match within a multi-token rel (case
    insensitive), non-nofollow rels pass, rel without href contributes
    nothing, normalization/drops identical to the href stream."""
    from pagerank_spark.functions.extract import extract_links_py

    html = (
        b'<a href="http://t.test/a" rel="nofollow">a</a>'
        b'<a href="http://t.test/b" rel="ugc NOFOLLOW">b</a>'
        b'<a href="http://t.test/c" rel="noopener">c</a>'
        b'<a href="/rel">plain</a>'
        b'<a href="#frag" rel="nofollow">dropped</a>'
        b'<a rel="nofollow">no href</a>'
        b'<script><a href="http://skip.test/x" rel="nofollow">s</a></script>'
    )
    got = extract_links_py(html, "page.test/p1")
    assert got == [
        {"dst": "t.test/a", "nofollow": True},
        {"dst": "t.test/b", "nofollow": True},
        {"dst": "t.test/c", "nofollow": False},
        {"dst": "page.test/rel", "nofollow": False},
    ]


def test_nofollow_rides_along_without_changing_hrefs():
    """The rel capture must not perturb the frozen href/text contract —
    the dst stream of extract_links_py IS the extract_hrefs_py stream."""
    from pagerank_spark.functions.extract import (
        extract_hrefs_py,
        extract_links_py,
        extract_text_py,
    )

    html = (
        b'pre <a href="http://x.test/1" rel="nofollow">one</a> mid '
        b'<a href="/two">two</a> post'
    )
    assert extract_text_py(html) == "pre one mid two post"
    assert extract_hrefs_py(html, "h.test/p") == ["x.test/1", "h.test/two"]
    assert [l["dst"] for l in extract_links_py(html, "h.test/p")] == [
        "x.test/1",
        "h.test/two",
    ]


def test_links_df_feeds_follow_only_pagerank(spark):
    """extract_links_df -> filter nofollow -> LinkGraph -> pagerank: the
    nofollow-heavy target must LOSE rank vs the same graph built from the
    raw edge stream (the flag actually changes authority flow)."""
    from pagerank_spark.functions.extract import extract_links_df
    from pagerank_spark.operators.graph_build import LinkGraph

    pages = spark.createDataFrame(
        [
            ("h.test/p1", b'<a href="http://h.test/spam" rel="nofollow">x</a>'
                          b'<a href="http://h.test/good">y</a>'),
            ("h.test/p2", b'<a href="http://h.test/spam" rel="nofollow">x</a>'
                          b'<a href="http://h.test/good">y</a>'),
        ],
        ["url", "html"],
    )
    links = extract_links_df(pages)
    assert links.columns == ["src", "dst", "nofollow"]
    g = LinkGraph.from_edges(
        links.filter(~links.nofollow).select("src", "dst"),
        apply_regex_filter=False, num_partitions=4,
    )
    try:
        ranks = {r["url"]: r["rank"] for r in
                 g.pagerank(alpha=0.85, epsilon=1e-8).collect()}
    finally:
        g.unpersist()
    assert "h.test/spam" not in ranks  # never linked by a followed edge
    assert ranks["h.test/good"] > 0


def test_robots_meta_spec_cases():
    """Robots-meta spec: token match across comma/space separators (case
    insensitive), 'none' implies both, multiple metas OR together,
    non-robots metas and script-embedded metas contribute nothing."""
    from pagerank_spark.functions.extract import extract_robots_py

    assert extract_robots_py(b"<p>no meta</p>") == (False, False)
    assert extract_robots_py(b'<meta name="robots" content="noindex">') == (True, False)
    assert extract_robots_py(
        b'<meta name="ROBOTS" content="noindex, NOFOLLOW">'
    ) == (True, True)
    assert extract_robots_py(b'<meta name="robots" content="none">') == (True, True)
    assert extract_robots_py(
        b'<meta name="viewport" content="noindex">'
    ) == (False, False)
    # two metas: the restrictive union
    assert extract_robots_py(
        b'<meta name="robots" content="noindex">'
        b'<meta name="robots" content="nofollow">'
    ) == (True, True)
    # script interior is CDATA: no tag events fire
    assert extract_robots_py(
        b'<script>var m = \'<meta name="robots" content="noindex">\';</script>'
    ) == (False, False)
    # self-closing form routes through handle_startendtag -> handle_starttag
    assert extract_robots_py(b'<meta name="robots" content="noindex" />') == (
        True,
        False,
    )
    assert extract_robots_py(None) == (False, False)


def test_robots_df_shape(spark):
    from pagerank_spark.functions.extract import extract_robots_df

    df = spark.createDataFrame(
        [
            ("h.test/a", b'<meta name="robots" content="noindex">'),
            ("h.test/b", b"<p>plain</p>"),
        ],
        ["url", "html"],
    )
    got = {r["url"]: (r["noindex"], r["nofollow"])
           for r in extract_robots_df(df).collect()}
    assert got == {"h.test/a": (True, False), "h.test/b": (False, False)}


def test_html_tag_stats_counts_and_ratio(spark):
    from pagerank_spark.functions.extract import html_tag_stats_df

    html = (
        b'<script>var x = "<a href=1>fake</a>";</script>'
        b"<p>hello world</p><img src=\"a.png\"><img src=\"b.png\"/>"
        b"<li>one</li><li>two</li><a href=\"/x\">go</a> end"
    )
    df = spark.createDataFrame([("u1", html), ("u2", b""), ("u3", None)], ["url", "html"])
    got = {r["url"]: r for r in html_tag_stats_df(df).collect()}
    r = got["u1"]
    # script interior is CDATA: its fake <a> neither counts nor leaks text
    assert (r["n_tags"], r["n_anchors"], r["n_scripts"]) == (7, 1, 1)
    assert (r["n_images"], r["n_paragraphs"], r["n_list_items"]) == (2, 1, 2)
    # stripped chunks: 'hello world'(11) 'one'(3) 'two'(3) 'go'(2) 'end'(3)
    assert r["text_chars"] == 22
    assert r["html_chars"] == len(html)
    assert r["text_ratio"] == round(22 / len(html), 6)
    # empty and NULL html: all-zero counts, NULL ratio
    for u in ("u2", "u3"):
        assert got[u]["n_tags"] == 0 and got[u]["text_chars"] == 0
        assert got[u]["text_ratio"] is None


def test_canonical_extractor_spec_cases():
    """rel=canonical spec: first canonical in document order wins, token
    match within a multi-token rel (case insensitive), relative hrefs
    resolve against the page domain, fragment/empty hrefs are no
    canonical, non-canonical <link>s contribute nothing, script
    interiors are CDATA."""
    from pagerank_spark.functions.extract import extract_canonical_py

    # first wins over a later decoy
    html = (
        b'<link rel="canonical" href="http://t.test/clean">'
        b'<link rel="canonical" href="http://t.test/decoy">'
    )
    assert extract_canonical_py(html, "page.test/p?q=1") == "t.test/clean"
    # multi-token mixed-case rel; href before rel in the attr list
    html = b'<link href="/clean" ReL="Alternate CANONICAL">'
    assert extract_canonical_py(html, "page.test/p") == "page.test/clean"
    # stylesheet link and script-embedded canonical never count
    html = (
        b'<link rel="stylesheet" href="/s.css">'
        b'<script>var l = \'<link rel="canonical" href="http://x.test/y">\';'
        b"</script>"
    )
    assert extract_canonical_py(html, "page.test/p") is None
    # fragment canonical is dropped by normalization -> the NEXT one wins
    html = (
        b'<link rel="canonical" href="#frag">'
        b'<link rel="canonical" href="http://t.test/real">'
    )
    assert extract_canonical_py(html, "page.test/p") == "t.test/real"
    # rel without href / href without rel / None html
    assert extract_canonical_py(b'<link rel="canonical">', "p.test/x") is None
    assert extract_canonical_py(b'<link href="/y">', "p.test/x") is None
    assert extract_canonical_py(None, "p.test/x") is None


def test_canonical_rides_along_without_changing_frozen_contract():
    """The <link> capture must not perturb the frozen text/href/anchor/
    robots outputs."""
    from pagerank_spark.functions.extract import (
        extract_anchors_py,
        extract_canonical_py,
        extract_hrefs_py,
        extract_robots_py,
        extract_text_py,
    )

    html = (
        b'<link rel="canonical" href="http://c.test/clean">'
        b'pre <a href="http://x.test/1">one</a> mid '
        b'<meta name="robots" content="noindex">'
        b'<a href="/two">two</a> post'
    )
    assert extract_text_py(html) == "pre one mid two post"
    assert extract_hrefs_py(html, "h.test/p") == ["x.test/1", "h.test/two"]
    assert [a["anchor"] for a in extract_anchors_py(html, "h.test/p")] == [
        "one", "two",
    ]
    assert extract_robots_py(html) == (True, False)
    assert extract_canonical_py(html, "h.test/p") == "c.test/clean"


def test_canonicals_df_drops_self_and_null(spark):
    from pagerank_spark.functions.extract import extract_canonicals_df

    df = spark.createDataFrame(
        [
            ("h.test/a", b'<link rel="canonical" href="http://h.test/clean">'),
            ("h.test/b", b'<link rel="canonical" href="http://h.test/b">'),
            ("h.test/c", b"<p>no canonical</p>"),
        ],
        ["url", "html"],
    )
    got = {(r["url"], r["canonical"]) for r in extract_canonicals_df(df).collect()}
    assert got == {("h.test/a", "h.test/clean")}


def test_canonicals_feed_redirect_resolution(spark):
    """Canonical chains collapse through resolve_redirects/rewrite_edges:
    A -> B -> C (B declares its own canonical) and the body edge into A
    lands on C."""
    from pyspark.sql import functions as F

    from pagerank_spark.functions.extract import (
        extract_canonicals_df,
        extract_edges_df,
    )
    from pagerank_spark.operators.redirects import (
        resolve_redirects,
        rewrite_edges,
    )

    pages = spark.createDataFrame(
        [
            ("h.test/a", b'<link rel="canonical" href="http://h.test/b">'),
            ("h.test/b", b'<link rel="canonical" href="http://h.test/c">'),
            ("h.test/d", b'<a href="http://h.test/a">in</a>'),
        ],
        ["url", "html"],
    )
    aliases = extract_canonicals_df(pages).select(
        F.col("url").alias("src"), F.col("canonical").alias("dst")
    )
    resolved = resolve_redirects(aliases)
    fin = {r["url"]: (r["final"], r["hops"]) for r in resolved.collect()}
    assert fin == {"h.test/a": ("h.test/c", 2), "h.test/b": ("h.test/c", 1)}
    edges = {(r["src"], r["dst"])
             for r in rewrite_edges(extract_edges_df(pages), resolved).collect()}
    assert edges == {("h.test/d", "h.test/c")}


def test_title_extractor_spec_cases():
    from pagerank_spark.functions.extract import extract_title_py

    # first title wins; markup inside the title contributes its text
    html = (
        b"<title> My <b>Great</b> Page </title>"
        b"<title>decoy</title><p>body</p>"
    )
    assert extract_title_py(html) == "My Great Page"
    # script-embedded title never fires; empty title is '' not None
    assert extract_title_py(
        b"<script>var t='<title>fake</title>';</script><title></title>"
    ) == ""
    assert extract_title_py(b"<p>no title</p>") is None
    assert extract_title_py(None) is None


def test_title_rides_along_without_changing_frozen_contract():
    from pagerank_spark.functions.extract import (
        extract_hrefs_py,
        extract_text_py,
        extract_title_py,
    )

    html = (
        b"<title>The Title</title>"
        b'pre <a href="http://x.test/1">one</a> post'
    )
    # title text stays IN the frozen text stream (parallel capture)
    assert extract_text_py(html) == "The Title pre one post"
    assert extract_hrefs_py(html, "h.test/p") == ["x.test/1"]
    assert extract_title_py(html) == "The Title"


def test_titles_df_shape(spark):
    from pagerank_spark.functions.extract import extract_titles_df

    df = spark.createDataFrame(
        [("h.test/a", b"<title>A</title>"), ("h.test/b", b"<p>x</p>")],
        ["url", "html"],
    )
    got = {r["url"]: r["title"] for r in extract_titles_df(df).collect()}
    assert got == {"h.test/a": "A", "h.test/b": None}
