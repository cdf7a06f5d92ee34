"""Capstone composition test: the full web-pipeline path a user of the
reference would run, end to end on one synthetic crawl —

    pages (url, html) → anchor/edge extraction (Arrow parser)
    → URL canonicalization (variant collapse BEFORE graph build)
    → LinkGraph → converged PageRank
    → anchor term index → anchor-match × PageRank blended retrieval

Every stage is an operator under its own contract/pytest elsewhere; this
test pins that they COMPOSE: canonicalization changes the graph (variants
collapse into one vertex), the rank vector reflects the collapsed topology,
and the blended retrieval surfaces the page that anchor text — not body
text — says is relevant (the Brin-Page off-page signal, reference
pagerank.py's substring×rank scoring generalized).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pagerank_spark.functions.extract import extract_anchors_df, extract_edges_df
from pagerank_spark.functions.urls import canonical_url_col
from pagerank_spark.operators.graph_build import LinkGraph
from pagerank_spark.operators.textsearch import anchor_term_index


def _page(url: str, links: list[tuple[str, str]]) -> tuple[str, bytes]:
    html = "".join(f'<a href="{h}">{t}</a> filler ' for h, t in links)
    return url, html.encode()


@pytest.fixture(scope="module")
def pages(spark):
    # hub.test/a is linked by everyone, under THREE url spellings that
    # canonicalize to one vertex; probe.test is linked once with the
    # distinctive anchor phrase "quantum widgets"
    rows = [
        _page("s1.test/p", [("http://hub.test/a", "the hub"),
                            ("probe.test/x", "quantum widgets here")]),
        _page("s2.test/p", [("https://www.hub.test/a", "hub again")]),
        _page("s3.test/p", [("hub.test/a/", "hub trailing")]),
        _page("hub.test/a", [("s1.test/p", "back link")]),
        _page("probe.test/x", []),
    ]
    return spark.createDataFrame(rows, ["url", "html"])


def test_canonicalization_collapses_graph_and_rank_reflects_it(spark, pages):
    edges = extract_edges_df(pages)
    # WITHOUT canonicalization: three distinct hub spellings
    assert (
        edges.where(F.col("dst").contains("hub")).select("dst").distinct().count() == 3
    )
    canon = edges.select(
        canonical_url_col(F.col("src")).alias("src"),
        canonical_url_col(F.col("dst")).alias("dst"),
    )
    g = LinkGraph.from_edges(canon, apply_regex_filter=False)
    ranks = g.pagerank(alpha=0.85, epsilon=1e-8)
    try:
        by_url = {r["url"]: r["rank"] for r in ranks.collect()}
        # the three spellings collapsed into ONE vertex...
        assert "hub.test/a" in by_url
        assert not any("www.hub" in u or u.endswith("/") for u in by_url)
        # ...which aggregates all three in-links: top-ranked page overall
        assert by_url["hub.test/a"] == max(by_url.values())
        assert by_url["hub.test/a"] > by_url["probe.test/x"]
    finally:
        g.unpersist()


def test_anchor_blended_retrieval_surfaces_off_page_relevance(spark, pages):
    anchors = extract_anchors_df(pages).select(
        "src",
        canonical_url_col(F.col("dst")).alias("dst"),
        "anchor",
    )
    idx = anchor_term_index(anchors)
    # the probe page is described by its anchor, not by any body text
    hits = {r["dst"]: r["tf"] for r in idx.where(F.col("term") == "quantum").collect()}
    assert hits == {"probe.test/x": 1}

    canon = extract_edges_df(pages).select(
        canonical_url_col(F.col("src")).alias("src"),
        canonical_url_col(F.col("dst")).alias("dst"),
    )
    g = LinkGraph.from_edges(canon, apply_regex_filter=False)
    try:
        ranks = g.pagerank(alpha=0.85, epsilon=1e-8)
        # blend: anchor term match gates the candidate set, PageRank orders
        # it — the reference's url_satisfies_query × rank scoring with the
        # query matched against what the WEB calls the page
        blended = (
            idx.where(F.col("term").isin("quantum", "hub"))
            .select(F.col("dst").alias("url"), "term")
            .join(ranks, "url")
            .orderBy(F.desc("rank"), "url")
        )
        rows = blended.collect()
        assert rows, "blend returned nothing"
        # the hub outranks the probe page within the matched set
        assert rows[0]["url"] == "hub.test/a"
        assert {r["url"] for r in rows} == {"hub.test/a", "probe.test/x"}
    finally:
        g.unpersist()
