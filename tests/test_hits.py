"""HITS hubs/authorities (operators/hits.py) vs a NumPy re-derivation.

The reference implements only PageRank (reference pagerank.py:122-172);
HITS extends the engine's link-analysis coverage with the same join-agg
machinery. Cross-engine equivalence (DuckDB unrolled twin) is covered by
the `hits` contract query; here: spec correctness vs NumPy and structure.
"""

from __future__ import annotations

import math

import numpy as np
import pytest

from pagerank_spark.operators.hits import hits

# a classic hub/authority shape: 0,1,2 are hubs all pointing at 3,4;
# 5 points only at 3; 6 is isolated-ish (one edge from 4)
EDGES = [(0, 3), (0, 4), (1, 3), (1, 4), (2, 3), (2, 4), (5, 3), (4, 6)]


def _numpy_hits(edges, iterations):
    verts = sorted({u for e in edges for u in e})
    idx = {u: i for i, u in enumerate(verts)}
    n = len(verts)
    A = np.zeros((n, n))
    for s, d in set(edges):
        A[idx[s], idx[d]] = 1.0
    h = np.full(n, 1.0 / math.sqrt(n))
    a = np.zeros(n)
    for _ in range(iterations):
        a = A.T @ h
        a /= np.linalg.norm(a)
        h = A @ a
        h /= np.linalg.norm(h)
    return verts, np.round(h, 6), np.round(a, 6)


@pytest.fixture(scope="module")
def edges_df(spark):
    return spark.createDataFrame(
        [(str(s), str(d)) for s, d in EDGES], ["src", "dst"]
    )


@pytest.mark.parametrize("iterations", [1, 2, 4])
def test_hits_matches_numpy(edges_df, iterations):
    verts, h, a = _numpy_hits(EDGES, iterations)
    got = {r["url"]: r for r in hits(edges_df, iterations=iterations).collect()}
    assert set(got) == {str(v) for v in verts}
    for v, hv, av in zip(verts, h, a):
        assert got[str(v)]["hub"] == pytest.approx(hv, abs=1e-6)
        assert got[str(v)]["authority"] == pytest.approx(av, abs=1e-6)


def test_hits_structure(edges_df):
    got = {r["url"]: r for r in hits(edges_df, iterations=3).collect()}
    # 3 and 4 are the authorities; 0,1,2 the strongest hubs
    assert got["3"]["authority"] > got["6"]["authority"]
    assert got["4"]["authority"] > got["6"]["authority"]
    for hub in ("0", "1", "2"):
        assert got[hub]["hub"] > got["5"]["hub"]  # 5 hits only one authority
    # a pure authority has hub 0; a pure hub has authority 0
    assert got["3"]["hub"] == 0.0
    assert got["0"]["authority"] == 0.0
    # both score vectors are unit L2 (up to 6dp rounding)
    for col in ("hub", "authority"):
        ss = sum(r[col] ** 2 for r in got.values())
        assert ss == pytest.approx(1.0, abs=1e-4)


def test_hits_duplicate_edges_do_not_multiply(spark):
    once = spark.createDataFrame([("a", "b"), ("c", "b")], ["src", "dst"])
    dup = spark.createDataFrame(
        [("a", "b"), ("a", "b"), ("a", "b"), ("c", "b")], ["src", "dst"]
    )
    r1 = sorted(map(tuple, hits(once, iterations=2).collect()))
    r2 = sorted(map(tuple, hits(dup, iterations=2).collect()))
    assert r1 == r2


def test_hits_one_action_per_half_round(edges_df, monkeypatch):
    # The job-cadence contract (round-3 verdict "What's wrong #1"): each
    # half-round costs exactly ONE driver action — the fused L2-norm
    # aggregate that materializes the lazy checkpoint — never a separate
    # eager checkpoint + norm read-back. At cluster scale every extra
    # action pays the per-job driver latency floor (~1.3 s measured), so
    # the old 4-action round was 2x pure overhead. Counted at the Python
    # layer because AQE splits one action into many Spark jobs.
    DataFrame = type(edges_df)  # the concrete class (pyspark.sql.classic)

    calls = {"first": 0, "eager_ck": 0}
    orig_first = DataFrame.first
    orig_ck = DataFrame.localCheckpoint

    def counting_first(self):
        calls["first"] += 1
        return orig_first(self)

    def counting_ck(self, eager=True):
        if eager:
            calls["eager_ck"] += 1
        return orig_ck(self, eager=eager)

    monkeypatch.setattr(DataFrame, "first", counting_first)
    monkeypatch.setattr(DataFrame, "localCheckpoint", counting_ck)
    metrics = []
    hits(edges_df, iterations=3, metrics=metrics)
    # 2 half-rounds x 3 iterations, one .first() each; the ONLY eager
    # checkpoint is the final assembly
    assert calls["first"] == 6
    assert calls["eager_ck"] == 1
    assert len(metrics) == 6
    assert all(m["norm"] > 0 for m in metrics)


@pytest.mark.parametrize("iterations", [1, 3])
def test_hits_shuffle_path_matches_broadcast_path(edges_df, iterations):
    # broadcast auto-policy: forcing the cluster-scale shuffle path
    # (broadcast_threshold=0 -> no vertex-sized build side) must give the
    # same scores as the broadcast path at any size
    bc = sorted(map(tuple, hits(edges_df, iterations=iterations,
                                broadcast_scores=True).collect()))
    sh = sorted(map(tuple, hits(edges_df, iterations=iterations,
                                broadcast_threshold=0).collect()))
    assert bc == sh


def test_resolve_broadcast_policy():
    from pagerank_spark.operators.hits import (
        BROADCAST_VERTEX_THRESHOLD,
        resolve_broadcast,
    )

    # auto: flips with input size at the shared threshold
    assert resolve_broadcast(None, 1_000)
    assert resolve_broadcast(None, BROADCAST_VERTEX_THRESHOLD - 1)
    assert not resolve_broadcast(None, BROADCAST_VERTEX_THRESHOLD)
    assert not resolve_broadcast(None, 10**12)
    # explicit flags always win
    assert resolve_broadcast(True, 10**12)
    assert not resolve_broadcast(False, 10)
