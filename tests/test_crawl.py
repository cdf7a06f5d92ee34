"""Unit tests for crawl-frontier prioritization (operators/crawl.py)
against hand-computed inflow; cross-engine equivalence at sf0.01 is covered
by the DuckDB twins in __spark_entry__.py via tools/check_oracles.py.
"""

from __future__ import annotations

import pytest

from pagerank_spark.operators.crawl import frontier_priority, frontier_schedule

# crawled pages a.test/1 and b.test/1 with 1/outdeg weights; x/y/z never
# appear as src -> they are the frontier (b also appears as dst but is
# crawled, so it must NOT be scheduled)
EDGES = [
    ("a.test/1", "b.test/1", 0.5),
    ("a.test/1", "x.test/1", 0.5),
    ("b.test/1", "x.test/1", 0.25),
    ("b.test/1", "y.test/1", 0.25),
    ("b.test/1", "y.test/2", 0.25),
    ("b.test/1", "z.test/1", 0.25),
]
RANKS = [
    ("a.test/1", 0.4),
    ("b.test/1", 0.6),
    # dangling pages carry rank too (uniform teleport) — the operator must
    # ignore them because they contribute no outlinks
    ("x.test/1", 0.1),
]


@pytest.fixture(scope="module")
def graph(spark):
    edges = spark.createDataFrame(EDGES, ["src", "dst", "weight"])
    ranks = spark.createDataFrame(RANKS, ["url", "rank"])
    return edges, ranks


def test_frontier_priority_values(graph):
    edges, ranks = graph
    got = {
        r["url"]: (r["priority"], r["n_inlinks"])
        for r in frontier_priority(edges, ranks, alpha=0.85).collect()
    }
    # x: 0.85*(0.5*0.4 + 0.25*0.6) = 0.2975 ; y/1, y/2: 0.85*0.25*0.6 = 0.1275
    assert got == {
        "x.test/1": (0.2975, 2),
        "y.test/1": (0.1275, 1),
        "y.test/2": (0.1275, 1),
        "z.test/1": (0.1275, 1),
    }


def test_crawled_pages_never_scheduled(graph):
    edges, ranks = graph
    urls = {r["url"] for r in frontier_priority(edges, ranks).collect()}
    assert "b.test/1" not in urls and "a.test/1" not in urls


def test_frontier_schedule_per_host_cut(graph):
    edges, ranks = graph
    rows = frontier_schedule(edges, ranks, per_host=1).collect()
    by_host = {r["host"]: (r["url"], r["host_pos"]) for r in rows}
    # y.test keeps only its best page; ties broken by url ascending
    assert by_host["y.test"] == ("y.test/1", 1)
    assert by_host["x.test"] == ("x.test/1", 1)
    assert by_host["z.test"] == ("z.test/1", 1)
    assert all(r["host_pos"] == 1 for r in rows)


def test_frontier_schedule_positions(graph):
    edges, ranks = graph
    rows = frontier_schedule(edges, ranks, per_host=2).collect()
    y = sorted(
        [(r["host_pos"], r["url"]) for r in rows if r["host"] == "y.test"]
    )
    assert y == [(1, "y.test/1"), (2, "y.test/2")]


def test_robots_rules_groups_comments_and_empty_paths(spark):
    from pagerank_spark.operators.crawl import robots_rules

    robots = spark.createDataFrame(
        [
            ("a.com",
             "User-agent: *\nDisallow: /private\nAllow: /private/ok\n\n"
             "User-Agent: GruftBot\nUser-agent: otherbot\nDisallow: /\n"
             "# comment\nDisallow:\n"),
            ("b.com", "user-agent: *\ndisallow: /x # inline comment\n"),
        ],
        ["host", "robots_txt"],
    )
    got = {(r["host"], r["agent"], r["prefix"]): (r["allow"], r["rule_len"])
           for r in robots_rules(robots).collect()}
    assert got == {
        # group 1: '*' with one Disallow + one Allow
        ("a.com", "*", "/private"): (False, 8),
        ("a.com", "*", "/private/ok"): (True, 11),
        # group 2: two consecutive User-agent lines SHARE the Disallow;
        # agent names lowercased; the empty-path Disallow is dropped
        ("a.com", "gruftbot", "/"): (False, 1),
        ("a.com", "otherbot", "/"): (False, 1),
        # inline comment stripped before the value is read
        ("b.com", "*", "/x"): (False, 2),
    }


def test_robots_allowed_precedence_and_fallback(spark):
    from pagerank_spark.operators.crawl import robots_allowed, robots_rules

    robots = spark.createDataFrame(
        [
            ("a.com",
             "User-agent: *\nDisallow: /private\nAllow: /private/ok\n\n"
             "User-agent: gruftbot\nDisallow: /\n"),
            ("b.com", "user-agent: *\ndisallow: /x\n"),
        ],
        ["host", "robots_txt"],
    )
    rules = robots_rules(robots)
    frontier = spark.createDataFrame(
        [("http://a.com/private/ok/page",), ("http://a.com/private/no",),
         ("http://a.com/pub",), ("http://b.com/x/y",),
         ("http://c.com/anything",), ("http://a.com",)],
        ["url"],
    )
    star = {r["url"]: (r["allowed"], r["matched_prefix"])
            for r in robots_allowed(frontier, rules, agent="*").collect()}
    # longest prefix wins; allow beats the shorter disallow
    assert star["http://a.com/private/ok/page"] == (True, "/private/ok")
    assert star["http://a.com/private/no"] == (False, "/private")
    # no matching rule → allowed with NULL prefix; no robots host too
    assert star["http://a.com/pub"] == (True, None)
    assert star["http://c.com/anything"] == (True, None)
    assert star["http://b.com/x/y"] == (False, "/x")
    # empty path normalizes to '/' and matches nothing in the '*' group
    assert star["http://a.com"] == (True, None)

    bot = {r["url"]: (r["allowed"], r["matched_prefix"])
           for r in robots_allowed(frontier, rules, agent="GruftBot").collect()}
    # exact-agent group REPLACES '*' on a.com (blanket block), b.com
    # falls back to its '*' group
    assert bot["http://a.com/private/ok/page"] == (False, "/")
    assert bot["http://a.com"] == (False, "/")
    assert bot["http://b.com/x/y"] == (False, "/x")
    assert bot["http://c.com/anything"] == (True, None)


def test_change_rate_hand(spark):
    import datetime as dt
    import math

    from pagerank_spark.operators.crawl import change_rate

    d0 = dt.datetime(2024, 1, 1)

    def day(k):
        return d0 + dt.timedelta(days=k)

    obs = (
        # a: 5 daily fetches, fp 1,1,2,2,3 -> X=2 of n=4 intervals
        [("a", day(k), fp) for k, fp in enumerate([1, 1, 2, 2, 3])]
        # b: 3 fetches, never changes -> lambda 0
        + [("b", day(k), 7) for k in range(3)]
        # c: 2 fetches 2 days apart, changed -> X=1, n=1
        + [("c", day(0), 1), ("c", day(2), 2)]
        # d: single observation -> excluded
        + [("d", day(0), 1)]
    )
    df = spark.createDataFrame(obs, ["url", "ts", "fingerprint"])
    got = {r["url"]: r for r in change_rate(df).collect()}
    assert set(got) == {"a", "b", "c"}
    a = got["a"]
    assert (a["n_obs"], a["n_changes"], a["span_us"]) == (5, 2, 4 * 86_400_000_000)
    # -ln((4-2+.5)/(4+.5)) / 1 day
    assert a["lambda_per_day"] == pytest.approx(math.log(4.5 / 2.5), abs=1e-6)
    assert got["b"]["lambda_per_day"] == 0.0
    # c: -ln(0.5/1.5) per 2-day interval
    assert got["c"]["lambda_per_day"] == pytest.approx(math.log(3.0) / 2, abs=1e-6)


def test_recrawl_schedule_budget_and_clamps(spark):
    import math

    from pagerank_spark.operators.crawl import recrawl_schedule

    rates = spark.createDataFrame(
        [("hot", 40.0), ("warm", 0.5), ("cold", 0.0), ("tie", 0.5)],
        ["url", "lambda_per_day"],
    )
    rows = recrawl_schedule(rates, budget=3, min_interval_days=0.05).collect()
    # top-3 by rate, rate ties broken by url ascending
    assert [r["url"] for r in rows] == ["hot", "tie", "warm"]
    by = {r["url"]: r["revisit_days"] for r in rows}
    # 1/40 = 0.025 clamps up to the politeness floor
    assert by["hot"] == pytest.approx(0.05)
    assert by["warm"] == pytest.approx(2.0)
    # never-changing pages clamp to the max when they make the budget
    rows2 = recrawl_schedule(rates, budget=4).collect()
    assert {r["url"]: r["revisit_days"] for r in rows2}["cold"] == pytest.approx(365.0)


def test_sitemap_entries_urlset_and_index(spark):
    """urlset entries (loc trim + entity decode, optional lastmod and
    priority, malformed priority -> NULL, loc-less entry dropped) and
    sitemapindex entries (is_index=true)."""
    from pagerank_spark.operators.crawl import sitemap_entries

    urlset = (
        "<?xml version='1.0'?><urlset>"
        "<url><loc> http://a.test/p?x=1&amp;y=2 </loc>"
        "<lastmod>2026-01-02</lastmod><priority>0.8</priority></url>"
        "<url><loc>http://a.test/q</loc><priority>high</priority></url>"
        "<url><lastmod>2026-01-01</lastmod></url>"
        "</urlset>"
    )
    index = (
        "<sitemapindex>"
        "<sitemap><loc>http://b.test/sitemap1.xml</loc>"
        "<lastmod>2026-02-03</lastmod></sitemap>"
        "<sitemap><loc>http://b.test/sitemap2.xml</loc></sitemap>"
        "</sitemapindex>"
    )
    df = spark.createDataFrame(
        [("a.test/sitemap.xml", urlset), ("b.test/sitemap.xml", index)],
        ["sitemap_url", "body"],
    )
    rows = {(r["sitemap_url"], r["loc"]): r
            for r in sitemap_entries(df).collect()}
    assert len(rows) == 4
    r1 = rows[("a.test/sitemap.xml", "http://a.test/p?x=1&y=2")]
    assert (r1["lastmod"], r1["priority"], r1["is_index"]) == (
        "2026-01-02", 0.8, False)
    r2 = rows[("a.test/sitemap.xml", "http://a.test/q")]
    assert r2["priority"] is None and r2["lastmod"] is None
    r3 = rows[("b.test/sitemap.xml", "http://b.test/sitemap1.xml")]
    assert r3["is_index"] and r3["lastmod"] == "2026-02-03"
    assert ("b.test/sitemap.xml", "http://b.test/sitemap2.xml") in rows


def test_sitemap_entity_decode_order(spark):
    """&amp;lt; decodes to &lt; (one level), never cascades to <."""
    from pagerank_spark.operators.crawl import sitemap_entries

    body = "<urlset><url><loc>http://a.test/p?v=&amp;lt;x</loc></url></urlset>"
    df = spark.createDataFrame([("s", body)], ["sitemap_url", "body"])
    assert sitemap_entries(df).collect()[0]["loc"] == "http://a.test/p?v=&lt;x"


def test_allocate_budget_sums_exactly_and_ranks_remainders(spark):
    from pyspark.sql import functions as F

    from pagerank_spark.operators.crawl import allocate_budget

    scores = spark.createDataFrame(
        [("a", 5.0), ("b", 3.0), ("c", 2.0), ("d", 1.0)], ["host", "score"]
    )
    # budget 10 over total 11: quotas 4.545..,2.727..,1.818..,0.909..;
    # bases 4,2,1,0 (sum 7), 3 seats by remainder: d(.909), b(.727), c(.818)
    got = {r["host"]: r["alloc"] for r in allocate_budget(scores, 10).collect()}
    assert got == {"a": 4, "b": 3, "c": 2, "d": 1}
    assert sum(got.values()) == 10
    # remainder tie broken by host ascending: equal scores, budget 3 over 2
    tie = spark.createDataFrame([("x", 1.0), ("y", 1.0)], ["host", "score"])
    got2 = {r["host"]: r["alloc"] for r in allocate_budget(tie, 3).collect()}
    assert got2 == {"x": 2, "y": 1}
    import pytest as _pytest

    with _pytest.raises(ValueError):
        allocate_budget(scores, -1)


def test_robots_sitemaps_directives(spark):
    from pagerank_spark.operators.crawl import robots_sitemaps

    df = spark.createDataFrame(
        [("h1", "User-agent: *\nDisallow: /x\n"
                "Sitemap: https://h1.test/s.xml\n"
                "sitemap:   https://h1.test/s2.xml  \n"
                "# Sitemap: https://no.test/x.xml"),
         ("h2", "User-agent: *\nDisallow: /")],
        ["host", "robots_txt"],
    )
    got = sorted((r["host"], r["sitemap_url"])
                 for r in robots_sitemaps(df).collect())
    assert got == [("h1", "https://h1.test/s.xml"),
                   ("h1", "https://h1.test/s2.xml")]


def test_robots_crawl_delay_groups_and_precedence(spark):
    from pagerank_spark.operators.crawl import robots_crawl_delay

    df = spark.createDataFrame(
        [
            # '*' group delay 2; gruftbot group delay 0.5 (wins for bot)
            ("h1", "User-agent: *\nCrawl-delay: 2\nDisallow: /x\n"
                   "User-agent: gruftbot\ncrawl-delay: 0.5"),
            # only '*' delay
            ("h2", "User-agent: *\nCrawl-delay: 10"),
            # invalid + negative ignored; no applicable delay -> absent
            ("h3", "User-agent: *\nCrawl-delay: fast\nCrawl-delay: -1"),
            # two applicable values -> min
            ("h4", "User-agent: *\nCrawl-delay: 7\nCrawl-delay: 3"),
        ],
        ["host", "robots_txt"],
    )
    star = {r["host"]: r["crawl_delay"]
            for r in robots_crawl_delay(df, agent="*").collect()}
    assert star == {"h1": 2.0, "h2": 10.0, "h4": 3.0}
    bot = {r["host"]: r["crawl_delay"]
           for r in robots_crawl_delay(df, agent="GruftBot").collect()}
    assert bot["h1"] == 0.5 and bot["h2"] == 10.0


# --- crawler-trap URL templates --------------------------------------------


def test_url_trap_templates_hand(spark):
    from pagerank_spark.operators.crawl import url_trap_templates

    urls = (
        [(f"www.cal.test/day/{y}/{m}",) for y in range(2000, 2010)
         for m in range(1, 13)]
        + [("www.a.test/about",), ("www.a.test/about",)]  # duplicate url
        + [("www.a.test/p1",), ("www.a.test/p2",)]
    )
    df = spark.createDataFrame(urls, ["url"])
    got = {r["template"]: r for r in
           url_trap_templates(df, trap_threshold=50).collect()}
    trap = got["www.cal.test/day/D/D"]
    assert trap["n_urls"] == 120 and trap["is_trap"] is True
    assert trap["sample_url"] == "www.cal.test/day/2000/1"
    assert got["www.a.test/about"]["n_urls"] == 1  # distinct urls counted
    assert got["www.a.test/pD"]["n_urls"] == 2
    assert not got["www.a.test/pD"]["is_trap"]


def test_url_trap_templates_rejects_bad_threshold(spark):
    import pytest as _pytest

    from pagerank_spark.operators.crawl import url_trap_templates

    df = spark.createDataFrame([("a",)], ["url"])
    with _pytest.raises(ValueError):
        url_trap_templates(df, trap_threshold=0)
