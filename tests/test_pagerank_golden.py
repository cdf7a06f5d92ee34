"""Golden end-to-end: Spark PageRank must match README.md:142-147 and the
NumPy float64 oracle at 1e-6 (SURVEY.md §5.2-5.3)."""

import numpy as np
import pytest

from pagerank_spark.fixtures import GOLDEN_SMALL_EDGES, GOLDEN_SMALL_RANKS, synth_edges
from pagerank_spark.oracle.pagerank_np import pagerank_np
from pagerank_spark.operators.graph_build import LinkGraph


def test_oracle_matches_readme_golden():
    scores, iters, _ = pagerank_np(GOLDEN_SMALL_EDGES, apply_regex_filter=False)
    assert iters == 24  # README logs i=0..23 (README.md:115-141)
    for url, expected in GOLDEN_SMALL_RANKS.items():
        assert scores[url] == pytest.approx(expected, abs=5e-5)


def test_spark_matches_oracle_golden(spark, golden_graph):
    metrics = []
    ranks = golden_graph.pagerank(alpha=0.85, epsilon=1e-6, metrics=metrics)
    got = {r["url"]: r["rank"] for r in ranks.collect()}
    oracle, iters, _ = pagerank_np(GOLDEN_SMALL_EDGES, apply_regex_filter=False)
    assert len(got) == 6
    assert len(metrics) == iters == 24
    for url, expected in oracle.items():
        assert got[url] == pytest.approx(expected, abs=1e-6)
    # L2 norm == 1
    assert np.linalg.norm(list(got.values())) == pytest.approx(1.0, abs=1e-9)


def test_spark_matches_oracle_synth(spark):
    edges = synth_edges(n_vertices=60, n_edges=240, seed=3)
    raw = spark.createDataFrame(edges, ["src", "dst"])
    g = LinkGraph.from_edges(raw, apply_regex_filter=False, num_partitions=4)
    try:
        got = {r["url"]: r["rank"] for r in g.pagerank(epsilon=1e-8).collect()}
        oracle, _, _ = pagerank_np(edges, epsilon=1e-8, apply_regex_filter=False)
        assert set(got) == set(oracle)
        for url, expected in oracle.items():
            assert got[url] == pytest.approx(expected, abs=1e-6)
    finally:
        g.unpersist()


def test_duplicate_edges_sum(spark):
    """A duplicated edge contributes 2/outdeg (torch COO sum, pagerank.py:74-77)."""
    edges = [("a", "b"), ("a", "b"), ("a", "c"), ("b", "a"), ("c", "a")]
    raw = spark.createDataFrame(edges, ["src", "dst"])
    g = LinkGraph.from_edges(raw, apply_regex_filter=False, num_partitions=2)
    try:
        w = {(r["src"], r["dst"]): r["weight"] for r in g.edges.collect()}
        assert w[("a", "b")] == pytest.approx(2 / 3)
        assert w[("a", "c")] == pytest.approx(1 / 3)
        got = {r["url"]: r["rank"] for r in g.pagerank(epsilon=1e-9).collect()}
        oracle, _, _ = pagerank_np(edges, epsilon=1e-9, apply_regex_filter=False)
        for url, expected in oracle.items():
            assert got[url] == pytest.approx(expected, abs=1e-6)
    finally:
        g.unpersist()
