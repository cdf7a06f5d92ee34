"""k-core decomposition (operators/kcore.py) vs a pure-Python peeler."""

from __future__ import annotations

import pytest

from pagerank_spark.operators.kcore import k_core


def _py_k_core(edges, k):
    und = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    while True:
        deg = {}
        for a, b in und:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        bad = {v for v, d in deg.items() if d < k}
        if not bad:
            return {v for e in und for v in e}
        nxt = {e for e in und if e[0] not in bad and e[1] not in bad}
        if nxt == und:
            return {v for e in und for v in e}
        und = nxt
        if not und:
            return set()


# triangle (1,2,3) + pendant chain 3-4-5 + a 4-clique (6,7,8,9)
EDGES = [
    ("1", "2"), ("2", "3"), ("1", "3"),
    ("3", "4"), ("4", "5"),
    ("6", "7"), ("6", "8"), ("6", "9"), ("7", "8"), ("7", "9"), ("8", "9"),
    ("5", "6"),
]


@pytest.fixture(scope="module")
def edges_df(spark):
    return spark.createDataFrame(EDGES, ["src", "dst"])


@pytest.mark.parametrize("k", [1, 2, 3, 4])
def test_k_core_matches_python_peeler(edges_df, k):
    got = {r["url"] for r in k_core(edges_df, k=k).collect()}
    assert got == _py_k_core(EDGES, k)


def test_k_core_cascade_peels_chain(edges_df):
    # k=2: the pendant chain 4-5 peels in a cascade (5 loses its only edge
    # to 6? no — 5-6 exists; degree(5)=2 ... verify against the oracle and
    # spot-check the triangle and clique survive)
    got = {r["url"] for r in k_core(edges_df, k=2).collect()}
    assert {"1", "2", "3"} <= got and {"6", "7", "8", "9"} <= got
    assert got == _py_k_core(EDGES, 2)


def test_k_core_empty_when_k_exceeds_max(spark, edges_df):
    assert k_core(edges_df, k=5).count() == 0


def test_k_core_duplicate_and_self_edges_ignored(spark):
    df = spark.createDataFrame(
        [("a", "b"), ("a", "b"), ("b", "a"), ("a", "a"), ("b", "c"), ("a", "c")],
        ["src", "dst"],
    )
    got = {r["url"] for r in k_core(df, k=2).collect()}
    assert got == {"a", "b", "c"}  # multi-edges collapse: a-b counts once


def test_k_core_rejects_bad_k(edges_df):
    with pytest.raises(ValueError):
        k_core(edges_df, k=0)


# --- core_numbers (exact coreness via the h-index fixpoint) ---------------

from pagerank_spark.operators.kcore import core_numbers  # noqa: E402


def _py_coreness(edges):
    """Coreness by definition: max k such that v is in the k-core."""
    und = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    verts = {v for e in und for v in e}
    core = {v: 0 for v in verts}
    k = 1
    while True:
        kept = _py_k_core(edges, k)
        if not kept:
            return core
        for v in kept:
            core[v] = k
        k += 1


def test_core_numbers_matches_definition(edges_df):
    got = {r["url"]: r["core"] for r in core_numbers(edges_df).collect()}
    assert got == _py_coreness(EDGES)
    # spot values: 4-clique members are 3-core; the triangle AND the
    # 3-4-5 chain are 2-core (the chain is anchored at both ends — the
    # triangle and the clique — so no vertex ever drops below degree 2)
    assert got["6"] == 3 and got["9"] == 3
    assert got["1"] == 2 and got["3"] == 2
    assert got["4"] == 2 and got["5"] == 2


def test_core_numbers_pendant_chain_is_one_core(spark):
    # triangle with a dangling chain: the chain (open-ended) is 1-core
    df = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d"), ("d", "e")],
        ["src", "dst"],
    )
    got = {r["url"]: r["core"] for r in core_numbers(df).collect()}
    assert got == {"a": 2, "b": 2, "c": 2, "d": 1, "e": 1}


def test_core_numbers_random_graph_matches_definition(spark):
    import hashlib

    # deterministic pseudo-random graph, 60 vertices / 150 edges
    edges = []
    for i in range(150):
        h = hashlib.md5(f"core{i}".encode()).hexdigest()
        a, b = int(h[:8], 16) % 60, int(h[8:16], 16) % 60
        edges.append((f"v{a}", f"v{b}"))
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {r["url"]: r["core"] for r in core_numbers(df).collect()}
    assert got == _py_coreness(edges)


def test_core_numbers_max_rounds_raises(edges_df):
    with pytest.raises(RuntimeError):
        core_numbers(edges_df, max_rounds=0)


def test_core_numbers_leaves_no_cache(spark, edges_df):
    core_numbers(edges_df).collect()
    jcm = spark._jsparkSession.sharedState().cacheManager()
    assert jcm.isEmpty()
