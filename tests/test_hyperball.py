"""HyperBall neighborhood function / harmonic centrality.

The load-bearing test is the bit-level simulation: a pure-Python HLL
replay (hashlib md5, identical bucket/rank derivation, identical
left-to-right float folds) over the exact BFS balls must reproduce the
operator's per-vertex estimates to ~1 ulp — proving the distributed
join+max rounds compute precisely the register unions the algorithm
specifies, not merely something statistically similar.
"""

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from pagerank_spark.operators.hyperball import (
    ball_estimate,
    effective_diameter,
    harmonic_centrality,
    hyperball,
    init_counters,
    neighborhood_function,
)

# branching digraph with asymmetric reach: hub h fans out, chain c1->c4,
# isolated pair; dangling vertices exercise the "no out-edges" path
EDGES = [
    ("h", "a"), ("h", "b"), ("h", "c1"), ("a", "b"),
    ("c1", "c2"), ("c2", "c3"), ("c3", "c4"),
    ("p", "q"), ("q", "p"),
]
ROUNDS = 4
M, LOG2M = 16, 4


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _init_regs(url: str) -> list[int]:
    h = _h60(url)
    rest = h >> LOG2M
    if rest == 0:
        rho = 61 - LOG2M
    else:
        rho = (rest & -rest).bit_length()  # trailing zeros + 1
    regs = [0] * M
    regs[h % M] = rho
    return regs


def _estimate(regs: list[int]) -> float:
    s = 0.0
    for r in regs:
        s += 2.0 ** -r
    v = sum(1 for r in regs if r == 0)
    raw = 0.673 * M * M / s
    if raw <= 2.5 * M and v > 0:
        return M * math.log(M / v)
    return raw


def _exact_balls():
    verts = sorted({u for e in EDGES for u in e})
    out = {u: set() for u in verts}
    for s, d in EDGES:
        out[s].add(d)
    balls = {u: {0: {u}} for u in verts}
    for t in range(1, ROUNDS + 1):
        for u in verts:
            b = set(balls[u][t - 1])
            for w in out[u]:
                b |= balls[w][t - 1]
            balls[u][t] = b
    return balls


@pytest.fixture(scope="module")
def balls_df(spark):
    e = spark.createDataFrame(EDGES, ["src", "dst"])
    df = hyperball(e, rounds=ROUNDS).localCheckpoint(eager=True)
    yield df


def test_init_counters_match_python(spark):
    verts = spark.createDataFrame([(u,) for u in "h a b c1 p".split()], ["url"])
    got = {r["url"]: [r[f"_hb{j}"] for j in range(M)]
           for r in init_counters(verts).collect()}
    for u, regs in got.items():
        assert regs == _init_regs(u), u


def test_estimates_match_bitlevel_simulation(balls_df):
    # replay: registers of the exact ball = elementwise max of member inits
    exact = _exact_balls()
    got = {(r["url"], r["round"]): r["ball"] for r in balls_df.collect()}
    assert len(got) == len(exact) * (ROUNDS + 1)
    for u, per_round in exact.items():
        for t, members in per_round.items():
            regs = [0] * M
            for w in members:
                for j, x in enumerate(_init_regs(w)):
                    regs[j] = max(regs[j], x)
            want = _estimate(regs)
            assert got[(u, t)] == pytest.approx(want, rel=1e-9), (u, t)


def test_monotone_and_stable_after_reach(balls_df):
    rows = sorted(balls_df.collect(), key=lambda r: (r["url"], r["round"]))
    by_url = {}
    for r in rows:
        by_url.setdefault(r["url"], []).append(r["ball"])
    for u, seq in by_url.items():
        assert all(b >= a - 1e-12 for a, b in zip(seq, seq[1:])), u
    # chain tail c4 is dangling: its ball never grows past itself
    assert by_url["c4"][0] == pytest.approx(by_url["c4"][-1])


def test_broadcast_and_shuffle_paths_agree(spark):
    e = spark.createDataFrame(EDGES, ["src", "dst"])
    a = hyperball(e, rounds=2, broadcast_counters=True)
    b = hyperball(e.repartition(7), rounds=2, broadcast_counters=False)
    rows_a = sorted(map(tuple, a.collect()))
    rows_b = sorted(map(tuple, b.collect()))
    assert rows_a == rows_b


def test_neighborhood_function_and_diameter(balls_df):
    nf = {r["round"]: r["nf"] for r in neighborhood_function(balls_df).collect()}
    assert sorted(nf) == list(range(ROUNDS + 1))
    assert all(nf[t] <= nf[t + 1] + 1e-9 for t in range(ROUNDS))
    # balls stop growing at round 3 (deepest true distance: h->c4 = 4 via
    # chain? h->c1->c2->c3->c4 is 4 hops, so growth continues to round 4)
    ed = effective_diameter(balls_df, quantile=1.0)
    assert 1 <= ed <= ROUNDS


def test_harmonic_matches_definition(balls_df):
    got = {r["url"]: r["harmonic"] for r in harmonic_centrality(balls_df).collect()}
    est = {(r["url"], r["round"]): r["ball"] for r in balls_df.collect()}
    for u in {x for x, _ in est}:
        want = sum(
            (est[(u, t)] - est[(u, t - 1)]) / t for t in range(1, ROUNDS + 1)
        )
        assert got[u] == pytest.approx(want, rel=1e-9), u


def test_mean_distance_rollup_consistent_and_in_range(spark):
    """mean_distance must equal the closed-form rollup of the SAME NF
    rows (self-consistency), and on the path a->b->c land near the true
    mean 4/3 (HLL register estimates carry a small constant bias)."""
    from pagerank_spark.operators.hyperball import (
        hyperball,
        mean_distance,
        neighborhood_function,
    )

    e = spark.createDataFrame([("a", "b"), ("b", "c")], ["src", "dst"])
    hb = hyperball(e, rounds=3)
    nf = {r["round"]: r["nf"]
          for r in neighborhood_function(hb).collect()}
    num = sum(r * round(nf[r] - nf[r - 1], 6) for r in range(1, 4))
    denom = nf[3] - nf[0]
    row = mean_distance(hb).collect()[0]
    assert abs(row["mean_distance"] - num / denom) < 1e-5
    assert abs(row["n_vertices"] - 3.0) < 0.5
    assert abs(row["reachable_pairs"] - 3.0) < 0.5
    assert abs(row["mean_distance"] - 4 / 3) < 0.2
