"""SALSA (operators/salsa.py) — Lempel-Moran closed form.

Pins: the per-component closed form on a hand graph, duplicate-edge
invariance (SALSA is defined on link existence), the hub+authority merge
for pages on both sides, that the scores are probability distributions,
and — the semantic anchor — that the closed form equals the stationary
distribution of the actual SALSA authority random walk (power iteration
in numpy on the bipartite chain).
"""

import numpy as np
import pytest

from pagerank_spark.operators.salsa import salsa


def _scores(spark, edges):
    df = spark.createDataFrame(edges, ["src", "dst"])
    return {r["url"]: (r["hub"], r["authority"]) for r in salsa(df).collect()}


def test_closed_form_two_components(spark):
    # component 1: h1 -> {a1, a2}, h2 -> a1; component 2: h3 -> a3
    # |H| = 3, |A| = 3.
    # hubs c1 (|H_c|=2, sum outdeg 3): h1 = (2/3)*(2/3), h2 = (2/3)*(1/3)
    # hub c2: h3 = (1/3)*(1/1); authorities symmetric.
    got = _scores(
        spark, [("h1", "a1"), ("h1", "a2"), ("h2", "a1"), ("h3", "a3")]
    )
    exp = {
        "h1": (4 / 9, 0.0),
        "h2": (2 / 9, 0.0),
        "h3": (1 / 3, 0.0),
        "a1": (0.0, 4 / 9),
        "a2": (0.0, 2 / 9),
        "a3": (0.0, 1 / 3),
    }
    assert set(got) == set(exp)
    for url, (h, a) in exp.items():
        assert got[url][0] == pytest.approx(h, abs=1e-12)
        assert got[url][1] == pytest.approx(a, abs=1e-12)


def test_duplicate_edges_ignored(spark):
    base = [("h1", "a1"), ("h1", "a2"), ("h2", "a1"), ("h3", "a3")]
    dup = base + [("h1", "a1")] * 3 + [("h3", "a3")]
    assert _scores(spark, base) == _scores(spark, dup)


def test_page_on_both_sides_merges(spark):
    # a -> b -> c: b is a hub AND an authority; the bipartite support graph
    # has TWO components ({h:a, a:b} and {h:b, a:c}).
    got = _scores(spark, [("a", "b"), ("b", "c")])
    assert got == {
        "a": (0.5, 0.0),
        "b": (0.5, 0.5),
        "c": (0.0, 0.5),
    }


def test_scores_are_distributions(spark):
    rng = np.random.default_rng(7)
    edges = list(
        {
            (f"h{int(i)}", f"a{int(j)}")
            for i, j in zip(rng.integers(0, 12, 60), rng.integers(0, 9, 60))
        }
    )
    got = _scores(spark, edges)
    assert sum(h for h, _ in got.values()) == pytest.approx(1.0, abs=1e-9)
    assert sum(a for _, a in got.values()) == pytest.approx(1.0, abs=1e-9)


def test_closed_form_matches_random_walk_stationary(spark):
    """Authority-chain power iteration: from authority j, step back along a
    uniform in-link to hub i, then forward along a uniform out-link of i.
    Lempel-Moran TOIS 19(2) SS3.2: within a connected support component the
    stationary distribution is indeg-proportional — which is exactly what
    salsa() emits. Verified on an irreducible single-component graph."""
    rng = np.random.default_rng(42)
    n_h, n_a = 8, 6
    adj = (rng.random((n_h, n_a)) < 0.45).astype(float)
    adj[:, 0] = 1.0  # a0 linked by every hub -> single support component
    edges = [
        (f"h{i}", f"a{j}") for i in range(n_h) for j in range(n_a) if adj[i, j]
    ]
    outdeg = adj.sum(axis=1)
    indeg = adj.sum(axis=0)
    # P[j, k] = sum_i (A[i,j]/indeg[j]) * (A[i,k]/outdeg[i])
    P = (adj / indeg).T @ (adj / outdeg[:, None])
    pi = np.full(n_a, 1.0 / n_a)
    for _ in range(500):
        pi = pi @ P
    got = _scores(spark, edges)
    for j in range(n_a):
        assert got[f"a{j}"][1] == pytest.approx(pi[j], abs=1e-9)
