"""Katz centrality: hand-computed chain values, multigraph semantics,
iteration-1 degeneracy, and cache hygiene."""

from __future__ import annotations

import pytest

from pagerank_spark.operators.katz import katz_centrality


def _scores(df):
    return {r["url"]: r["katz"] for r in df.collect()}


def test_chain_hand_computed(spark):
    # a -> b -> c, alpha=0.5, beta=1, K=3:
    # x1 = (1, 1, 1); x2 = (1, 1.5, 1.5); x3 = (1, 1.5, 1.75)
    e = spark.createDataFrame([("a", "b"), ("b", "c")], ["src", "dst"])
    got = _scores(katz_centrality(e, alpha=0.5, beta=1.0, iterations=3))
    assert got == {"a": 1.0, "b": 1.5, "c": 1.75}


def test_parallel_edges_count_multiply(spark):
    # path-counting semantics: two a->b edges double a's contribution
    e = spark.createDataFrame([("a", "b"), ("a", "b")], ["src", "dst"])
    got = _scores(katz_centrality(e, alpha=0.5, beta=1.0, iterations=2))
    assert got == {"a": 1.0, "b": 2.0}


def test_one_iteration_is_constant_beta(spark):
    e = spark.createDataFrame([("a", "b"), ("b", "a")], ["src", "dst"])
    got = _scores(katz_centrality(e, alpha=0.9, beta=2.5, iterations=1))
    assert got == {"a": 2.5, "b": 2.5}


def test_rejects_zero_iterations(spark):
    e = spark.createDataFrame([("a", "b")], ["src", "dst"])
    with pytest.raises(ValueError):
        katz_centrality(e, iterations=0)


def test_no_cache_left_behind(spark):
    e = spark.createDataFrame([("a", "b"), ("b", "c"), ("c", "a")], ["src", "dst"])
    katz_centrality(e, iterations=4).collect()
    jspark = spark._jsparkSession
    assert jspark.sharedState().cacheManager().isEmpty()
