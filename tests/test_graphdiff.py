"""Unit tests for re-crawl snapshot diffing (operators/graphdiff.py);
cross-engine equivalence at sf0.01 is covered by the DuckDB twins in
__spark_entry__.py via tools/check_oracles.py.
"""

from __future__ import annotations

import pytest

from pagerank_spark.operators.graphdiff import degree_delta, edge_diff, rank_delta

OLD = [("a", "b"), ("a", "c"), ("b", "c"), ("b", "c"), ("c", "a")]
NEW = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a")]


@pytest.fixture(scope="module")
def snaps(spark):
    return (
        spark.createDataFrame(OLD, ["src", "dst"]),
        spark.createDataFrame(NEW, ["src", "dst"]),
    )


def test_edge_diff(snaps):
    old, new = snaps
    got = {(r["src"], r["dst"]): r["status"] for r in edge_diff(old, new).collect()}
    # (b,c) is duplicated in old but retained -> never emitted
    assert got == {
        ("c", "d"): "added",
        ("d", "a"): "added",
        ("a", "c"): "removed",
        ("c", "a"): "removed",
    }


def test_degree_delta_only_changed(snaps):
    old, new = snaps
    rows = {r["url"]: r for r in degree_delta(old, new).collect()}
    # b: out 1->1, in 1->1 (distinct semantics) => unchanged, filtered out
    assert "b" not in rows
    assert (rows["a"]["out_old"], rows["a"]["out_new"]) == (2, 1)
    assert (rows["a"]["in_old"], rows["a"]["in_new"]) == (1, 1)
    assert (rows["c"]["out_old"], rows["c"]["out_new"]) == (1, 1)
    assert (rows["c"]["in_old"], rows["c"]["in_new"]) == (2, 1)
    assert (rows["d"]["out_old"], rows["d"]["out_new"]) == (0, 1)
    assert (rows["d"]["in_old"], rows["d"]["in_new"]) == (0, 1)


def test_rank_delta_top_movers(spark):
    old = spark.createDataFrame(
        [("a", 0.5), ("b", 0.3), ("c", 0.2)], ["url", "rank"]
    )
    new = spark.createDataFrame(
        [("a", 0.1), ("b", 0.35), ("d", 0.3)], ["url", "rank"]
    )
    rows = rank_delta(old, new, top_k=3).collect()
    got = [(r["mover_rank"], r["url"], r["delta"]) for r in rows]
    # |Δ|: a 0.4, d 0.3, c 0.2, b 0.05 -> top 3 = a, d, c
    assert got == [(0, "a", -0.4), (1, "d", 0.3), (2, "c", -0.2)]
    byu = {r["url"]: (r["rank_old"], r["rank_new"]) for r in rows}
    assert byu["d"] == (0.0, 0.3)  # absent in old counts 0


def test_rank_delta_tie_broken_by_url(spark):
    old = spark.createDataFrame([("x", 0.0), ("y", 0.0)], ["url", "rank"])
    new = spark.createDataFrame([("x", 0.1), ("y", 0.1)], ["url", "rank"])
    rows = rank_delta(old, new, top_k=1).collect()
    assert [(r["mover_rank"], r["url"]) for r in rows] == [(0, "x")]
