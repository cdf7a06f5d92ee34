"""Eigenvector centrality (operators/eigencentrality.py) vs a pure-Python
power-iteration replay and closed-form fixtures."""

from __future__ import annotations

import math

import pytest

from pagerank_spark.operators.eigencentrality import eigenvector_centrality


def _py_power(edges, iterations):
    verts = sorted({v for e in edges for v in e})
    e = sorted({(s, d) for s, d in edges})
    x = {v: round(1.0 / math.sqrt(len(verts)), 9) for v in verts}
    for _ in range(iterations):
        y = {v: 0.0 for v in verts}
        for s, d in e:
            y[d] += x[s]
        nrm = math.sqrt(sum(round(val * val, 15) for val in y.values()))
        if nrm > 0:
            x = {v: round(val / nrm, 9) for v, val in y.items()}
        else:
            x = {v: 0.0 for v in verts}
    return x


def test_cycle_is_stationary_uniform(spark):
    e = spark.createDataFrame([("a", "b"), ("b", "c"), ("c", "a")], ["src", "dst"])
    got = {r["url"]: r["eig"] for r in eigenvector_centrality(e, 4).collect()}
    want = round(1.0 / math.sqrt(3.0), 9)
    assert got == {"a": pytest.approx(want), "b": pytest.approx(want),
                   "c": pytest.approx(want)}


def test_acyclic_graph_decays_to_zero(spark):
    e = spark.createDataFrame([("a", "b"), ("b", "c")], ["src", "dst"])
    got = {r["url"]: r["eig"] for r in eigenvector_centrality(e, 5).collect()}
    assert got == {"a": 0.0, "b": 0.0, "c": 0.0}


def test_matches_python_replay_on_random_graph(spark):
    import hashlib

    edges = []
    for i in range(80):
        h = hashlib.md5(f"eig{i}".encode()).hexdigest()
        edges.append((f"v{int(h[:6], 16) % 25}", f"v{int(h[6:12], 16) % 25}"))
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {r["url"]: r["eig"] for r in eigenvector_centrality(df, 6).collect()}
    want = _py_power(edges, 6)
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-8), v


def test_multi_edges_collapse(spark):
    e1 = spark.createDataFrame(
        [("a", "b"), ("a", "b"), ("b", "a"), ("b", "c"), ("c", "a")], ["src", "dst"]
    )
    e2 = spark.createDataFrame(
        [("a", "b"), ("b", "a"), ("b", "c"), ("c", "a")], ["src", "dst"]
    )
    g1 = {r["url"]: r["eig"] for r in eigenvector_centrality(e1, 5).collect()}
    g2 = {r["url"]: r["eig"] for r in eigenvector_centrality(e2, 5).collect()}
    assert g1 == g2


def test_rejects_bad_iterations(spark):
    e = spark.createDataFrame([("a", "b")], ["src", "dst"])
    with pytest.raises(ValueError):
        eigenvector_centrality(e, 0)
