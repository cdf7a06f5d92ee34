"""Weisfeiler-Leman refinement (operators/wl.py): structural-role
fingerprints with the hub-safe commutative multiset hash."""

import hashlib

import pytest

from pagerank_spark.operators.wl import wl_histogram, wl_refinement


def _h15(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _replay(edges, rounds):
    verts = sorted({v for e in edges for v in e})
    lab = {v: 0 for v in verts}
    for _ in range(rounds):
        nxt = {}
        for v in verts:
            so = sum(_h15(str(lab[d])) for s, d in edges if s == v)
            co = sum(1 for s, d in edges if s == v)
            si = sum(_h15(str(lab[s])) for s, d in edges if d == v)
            ci = sum(1 for s, d in edges if d == v)
            nxt[v] = _h15(f"{lab[v]}|{so}|{co}|{si}|{ci}")
        lab = nxt
    return lab


PATH2 = [("a", "b"), ("b", "c"), ("c", "d"),
         ("x", "y"), ("y", "z"), ("z", "w")]


def test_wl_matches_python_replay(spark):
    e = spark.createDataFrame(PATH2, ["src", "dst"])
    for rounds in (0, 1, 2, 3):
        got = {r["url"]: r["wl_label"]
               for r in wl_refinement(e, rounds=rounds).collect()}
        assert got == _replay(PATH2, rounds), rounds


def test_wl_isomorphic_components_share_labels(spark):
    """Two disjoint isomorphic paths: corresponding vertices get the SAME
    label (structural identity, not vertex identity)."""
    e = spark.createDataFrame(PATH2, ["src", "dst"])
    got = {r["url"]: r["wl_label"] for r in wl_refinement(e, rounds=3).collect()}
    for a, b in [("a", "x"), ("b", "y"), ("c", "z"), ("d", "w")]:
        assert got[a] == got[b]


def test_wl_refines_over_rounds(spark):
    """Path a→b→c→d: b and c share the (1,1) degree pair (round 1 equal)
    but differ at round 2 (b's in-neighbor is a source, c's is not)."""
    path = [("a", "b"), ("b", "c"), ("c", "d")]
    e = spark.createDataFrame(path, ["src", "dst"])
    l1 = {r["url"]: r["wl_label"] for r in wl_refinement(e, rounds=1).collect()}
    assert l1["b"] == l1["c"] and l1["a"] != l1["b"] and l1["d"] != l1["b"]
    l2 = {r["url"]: r["wl_label"] for r in wl_refinement(e, rounds=2).collect()}
    assert l2["b"] != l2["c"]


def test_wl_regular_graph_stays_uniform(spark):
    """Directed cycle: every vertex is (1,1)-regular with identical
    neighborhoods at every radius — one color forever (the classic 1-WL
    blind spot), and the histogram says so."""
    cyc = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a")]
    e = spark.createDataFrame(cyc, ["src", "dst"])
    labels = wl_refinement(e, rounds=3)
    hist = wl_histogram(labels).collect()
    assert len(hist) == 1 and hist[0]["n_vertices"] == 4
    with pytest.raises(ValueError):
        wl_refinement(e, rounds=-1)


def test_wl_graph_similarity_identical_graphs(spark):
    from pagerank_spark.operators.wl import wl_graph_similarity

    e = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d")], ["src", "dst"]
    )
    row = wl_graph_similarity(e, e, rounds=2).collect()[0]
    assert row["n_labels_a"] == row["n_labels_b"] == row["common_labels"]
    assert row["cosine"] == 1.0


def test_wl_graph_similarity_disjoint_structures(spark):
    from pagerank_spark.operators.wl import wl_graph_similarity

    # a directed 3-cycle vs a star: degree-pair histograms share nothing
    cyc = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a")], ["src", "dst"]
    )
    star = spark.createDataFrame(
        [("h", "x"), ("h", "y"), ("h", "z")], ["src", "dst"]
    )
    row = wl_graph_similarity(cyc, star, rounds=1).collect()[0]
    assert row["common_labels"] == 0 and row["cosine"] == 0.0


def test_wl_graph_similarity_partial_overlap_hand(spark):
    import math

    from pagerank_spark.operators.wl import wl_graph_similarity

    # same 3-cycle + one graph adds a pendant: cycle vertices keep the
    # (1,1)-degree label in A; in B, 'c' gains out-degree 2 and 'd' is a
    # sink — hand histogram cosine over round-1 labels
    a = spark.createDataFrame([("a", "b"), ("b", "c"), ("c", "a")], ["src", "dst"])
    b = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d")], ["src", "dst"]
    )
    row = wl_graph_similarity(a, b, rounds=1).collect()[0]
    # A: {(out1,in1): 3}; B: {(1,1): 2, (2,1): 1, (0,1): 1}
    want = (3 * 2) / (math.sqrt(9) * math.sqrt(4 + 1 + 1))
    assert row["cosine"] == round(want, 6)
    assert row["common_labels"] == 1
