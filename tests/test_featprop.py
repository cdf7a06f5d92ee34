"""Feature propagation (operators/featprop.py) vs a pure-Python replay
and hand-computed fixtures."""

from __future__ import annotations

import pytest

from pagerank_spark.operators.featprop import feature_propagation


def _py_prop(edges, feats, rounds, lam):
    e = sorted({(s, d) for s, d in edges})
    x = {k: round(v, 9) for k, v in feats.items()}  # (url, dim) -> val
    for _ in range(rounds):
        agg = {}
        for s, d in e:
            for (u, dim), val in x.items():
                if u == s:
                    agg.setdefault((d, dim), []).append(val)
        nxt = {}
        for (u, dim), val in x.items():
            vals = agg.get((u, dim))
            m = sum(vals) / len(vals) if vals else 0.0
            nxt[(u, dim)] = round((1 - lam) * val + lam * m, 9)
        x = nxt
    return x


def _feats_df(spark, feats):
    return spark.createDataFrame(
        [(u, d, v) for (u, d), v in feats.items()], ["url", "dim", "x"]
    )


def test_one_round_hand_fixture(spark):
    # b's in-neighbors: a, c -> mean((1, 3)) = 2; x'(b) = .5*2 + .5*2 = 2
    # a has no in-neighbors -> x'(a) = .5*1 = 0.5
    edges = [("a", "b"), ("c", "b")]
    feats = {("a", 0): 1.0, ("b", 0): 2.0, ("c", 0): 3.0}
    e = spark.createDataFrame(edges, ["src", "dst"])
    out = {
        (r["url"], r["dim"]): r["x"]
        for r in feature_propagation(e, _feats_df(spark, feats), 1).collect()
    }
    assert out[("a", 0)] == 0.5
    assert out[("b", 0)] == 2.0
    assert out[("c", 0)] == 1.5


def test_matches_python_replay_multi_dim(spark):
    import hashlib

    edges, feats = [], {}
    for i in range(40):
        h = hashlib.md5(f"fp{i}".encode()).hexdigest()
        edges.append((f"v{int(h[:4], 16) % 12}", f"v{int(h[4:8], 16) % 12}"))
    for v in range(12):
        for d in range(3):
            h = hashlib.md5(f"feat{v},{d}".encode()).hexdigest()
            feats[(f"v{v}", d)] = (int(h[:8], 16) % 1000) / 250.0 - 2.0
    e = spark.createDataFrame(edges, ["src", "dst"])
    got = {
        (r["url"], r["dim"]): r["x"]
        for r in feature_propagation(e, _feats_df(spark, feats), 2).collect()
    }
    want = _py_prop(edges, feats, 2, 0.5)
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-8), k


def test_lam_zero_is_identity(spark):
    edges = [("a", "b"), ("b", "a")]
    feats = {("a", 0): 1.25, ("b", 0): -0.75}
    e = spark.createDataFrame(edges, ["src", "dst"])
    out = {
        (r["url"], r["dim"]): r["x"]
        for r in feature_propagation(e, _feats_df(spark, feats), 3, lam=0.0).collect()
    }
    assert out == {("a", 0): 1.25, ("b", 0): -0.75}


def test_multi_edges_collapse_to_adjacency(spark):
    feats = {("a", 0): 4.0, ("b", 0): 0.0}
    e1 = spark.createDataFrame([("a", "b"), ("a", "b")], ["src", "dst"])
    e2 = spark.createDataFrame([("a", "b")], ["src", "dst"])
    o1 = {r["url"]: r["x"] for r in
          feature_propagation(e1, _feats_df(spark, feats), 1).collect()}
    o2 = {r["url"]: r["x"] for r in
          feature_propagation(e2, _feats_df(spark, feats), 1).collect()}
    assert o1 == o2 and o1["b"] == 2.0


def test_rejects_bad_params(spark):
    e = spark.createDataFrame([("a", "b")], ["src", "dst"])
    f = _feats_df(spark, {("a", 0): 1.0})
    with pytest.raises(ValueError):
        feature_propagation(e, f, 0)
    with pytest.raises(ValueError):
        feature_propagation(e, f, 1, lam=1.5)
