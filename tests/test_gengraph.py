"""Deterministic R-MAT generation (operators/gengraph.py): Python replay,
skew sanity, determinism, composition into PageRank."""

import hashlib

import pytest
from pyspark.sql import functions as F

from pagerank_spark.operators.gengraph import rmat_edges


def _u01(key: str, seed: str) -> float:
    h = hashlib.md5(f"{seed},{key}".encode()).hexdigest()[:15]
    return int(h, 16) / float(1 << 60)


def _replay(i, scale, a, b, c, seed):
    src = dst = 0
    for lvl in range(scale):
        u = _u01(f"{i}|{lvl}", seed)
        q = 0 if u < a else 1 if u < a + b else 2 if u < a + b + c else 3
        bit = 1 << (scale - 1 - lvl)
        if q >= 2:
            src += bit
        if q in (1, 3):
            dst += bit
    return f"v{src}", f"v{dst}"


def test_rmat_matches_python_replay(spark):
    idx = spark.range(0, 200).select(F.col("id").alias("edge_id"))
    got = [(r["src"], r["dst"])
           for r in rmat_edges(idx, scale=6).orderBy("edge_id" if False else F.lit(1)).collect()]
    # order-insensitive compare (one edge per index)
    exp = sorted(_replay(i, 6, 0.57, 0.19, 0.19, "rmat") for i in range(200))
    assert sorted(got) == exp


def test_rmat_skew_and_determinism(spark):
    idx = spark.range(0, 3000).select(F.col("id").alias("edge_id"))
    e = rmat_edges(idx, scale=8)
    # a=0.57 concentrates mass in the low-id quadrant: vertex v0-side
    # in-degrees must be heavy-tailed — top vertex far above the mean
    deg = (e.groupBy("src").count().orderBy(F.desc("count")).limit(1)
           .collect()[0]["count"])
    assert deg > 3000 / 256 * 5
    # re-run identical
    again = rmat_edges(idx, scale=8)
    assert e.exceptAll(again).count() == 0 and again.exceptAll(e).count() == 0
    with pytest.raises(ValueError):
        rmat_edges(idx, scale=0)
    with pytest.raises(ValueError):
        rmat_edges(idx, scale=4, a=0.8, b=0.2, c=0.1)


def test_rmat_feeds_linkgraph(spark):
    from pagerank_spark.operators.graph_build import LinkGraph

    idx = spark.range(0, 500).select(F.col("id").alias("edge_id"))
    g = LinkGraph.from_edges(rmat_edges(idx, scale=6), apply_regex_filter=False)
    try:
        top = g.pagerank(alpha=0.85, max_iterations=3).orderBy(
            F.desc("rank")).limit(1).collect()
        assert top and top[0]["rank"] > 0
    finally:
        g.unpersist()
