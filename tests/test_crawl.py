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
