"""Degree-structure analytics (graphstats: assortativity, rich club,
power-law MLE) against hand/NumPy-computed references."""

import math

from pagerank_spark.operators.graphstats import (
    degree_assortativity,
    powerlaw_alpha,
    rich_club,
)

EDGES = [
    ("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("c", "d"),
    ("d", "a"), ("e", "a"), ("e", "b"), ("b", "a"), ("c", "a"),
]


def _pearson(pairs):
    n = len(pairs)
    sx = sum(x for x, _ in pairs)
    sy = sum(y for _, y in pairs)
    sxy = sum(x * y for x, y in pairs)
    sxx = sum(x * x for x, _ in pairs)
    syy = sum(y * y for _, y in pairs)
    return (n * sxy - sx * sy) / math.sqrt(
        (n * sxx - sx * sx) * (n * syy - sy * sy)
    )


def test_assortativity_matches_pearson_replay(spark):
    edges = spark.createDataFrame(EDGES, ["src", "dst"])
    de = sorted(set(EDGES))
    outd = {}
    ind = {}
    for s, d in de:
        outd[s] = outd.get(s, 0) + 1
        ind[d] = ind.get(d, 0) + 1
    pairs = [(outd[s], ind[d]) for s, d in de]
    want = round(_pearson(pairs), 6)

    row = degree_assortativity(edges).collect()[0]
    assert row["m"] == len(de)
    assert abs(row["r"] - want) < 1e-9


def test_rich_club_counts(spark):
    # undirected simple graph degrees: a:4 (b,c,d,e), b:3, c:3, d:2, e:2
    edges = spark.createDataFrame(EDGES, ["src", "dst"])
    got = {r["k"]: r for r in rich_club(edges, ks=[2, 3]).collect()}
    # k=2: {a,b,c} (deg>2), edges among them: ab,ac,bc -> phi = 2*3/(3*2)=1.0
    assert (got[2]["n_k"], got[2]["e_k"], got[2]["phi"]) == (3, 3, 1.0)
    # k=3: {a} alone -> phi 0 by convention
    assert (got[3]["n_k"], got[3]["e_k"], got[3]["phi"]) == (1, 0, 0.0)


def test_powerlaw_alpha_matches_mle_replay(spark):
    edges = spark.createDataFrame(EDGES, ["src", "dst"])
    de = sorted(set(EDGES))
    ind = {}
    for _, d in de:
        ind[d] = ind.get(d, 0) + 1
    tail = [d for d in ind.values() if d >= 2]
    want = round(1.0 + len(tail) / sum(round(math.log(d / 1.5), 9) for d in tail), 6)

    row = powerlaw_alpha(edges, d_min=2).collect()[0]
    assert row["n_tail"] == len(tail)
    assert abs(row["alpha"] - want) < 1e-9
