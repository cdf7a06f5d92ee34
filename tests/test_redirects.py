"""Redirect-chain resolution (operators/redirects.py): exact chains,
loop detection by progress stall, logarithmic round counts, and the
alias-collapsing edge rewrite."""

from __future__ import annotations

from pyspark.sql import functions as F

from pagerank_spark.operators.redirects import resolve_redirects, rewrite_edges


def _resolve(spark, rows, **kw):
    df = spark.createDataFrame(rows, ["src", "dst"])
    out = resolve_redirects(df, **kw)
    return {r["url"]: (r["final"], r["hops"], r["is_loop"]) for r in out.collect()}


def test_chain_resolves_with_exact_hops(spark):
    rows = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"), ("e", "final")]
    got = _resolve(spark, rows)
    assert got == {
        "a": ("final", 5, False),
        "b": ("final", 4, False),
        "c": ("final", 3, False),
        "d": ("final", 2, False),
        "e": ("final", 1, False),
    }


def test_loops_and_tails_into_loops_flagged(spark):
    rows = [
        ("c0", "c1"), ("c1", "c2"), ("c2", "c0"),  # 3-cycle
        ("t0", "t1"), ("t1", "c0"),                # tail leading INTO it
        ("s", "s"),                                # self-redirect
        ("ok", "done"),                            # plain 1-hop, resolvable
    ]
    got = _resolve(spark, rows)
    for u in ("c0", "c1", "c2", "t0", "t1", "s"):
        assert got[u] == ("", -1, True)
    assert got["ok"] == ("done", 1, False)


def test_conflicting_targets_take_min(spark):
    got = _resolve(spark, [("a", "z"), ("a", "b"), ("b", "y")])
    # min(dst) for a is 'b', so a chains through b to y
    assert got["a"] == ("y", 2, False)
    assert got["b"] == ("y", 1, False)


def test_round_count_is_logarithmic(spark):
    # chain of 33 -> pointer doubling reaches distance 33 by round 6
    # (2^6 = 64 >= 33); the stall rule costs at most one extra round
    rows = [(f"n{i}", f"n{i + 1}") for i in range(33)]
    metrics: dict = {}
    got = {
        r["url"]: r["hops"]
        for r in resolve_redirects(
            spark.createDataFrame(rows, ["src", "dst"]), metrics=metrics
        ).collect()
    }
    assert got["n0"] == 33
    assert metrics["rounds"] <= 7
    # movers strictly decrease until resolution (the stall-certificate
    # property the loop detection rides on)
    movers = metrics["movers"]
    assert all(a > b for a, b in zip(movers, movers[1:]) if b != 0)


def test_pure_cycle_exits_after_two_rounds(spark):
    rows = [("c0", "c1"), ("c1", "c2"), ("c2", "c0")]
    metrics: dict = {}
    resolve_redirects(
        spark.createDataFrame(rows, ["src", "dst"]), metrics=metrics
    ).collect()
    assert metrics["rounds"] == 2  # equal mover counts certify the stall


def test_rewrite_edges_collapses_aliases_and_drops_loops(spark):
    redirects = spark.createDataFrame(
        [("old", "mid"), ("mid", "new"), ("l0", "l1"), ("l1", "l0")],
        ["src", "dst"],
    )
    resolved = resolve_redirects(redirects)
    edges = spark.createDataFrame(
        [("old", "x"), ("x", "mid"), ("x", "l0"), ("l1", "x"), ("x", "y")],
        ["src", "dst"],
    )
    got = {(r["src"], r["dst"]) for r in rewrite_edges(edges, resolved).collect()}
    assert got == {("new", "x"), ("x", "new"), ("x", "y")}


def test_non_redirect_urls_pass_through(spark):
    redirects = spark.createDataFrame([("a", "b")], ["src", "dst"])
    resolved = resolve_redirects(redirects)
    edges = spark.createDataFrame([("p", "q")], ["src", "dst"])
    got = rewrite_edges(edges, resolved).collect()
    assert [(r["src"], r["dst"]) for r in got] == [("p", "q")]
