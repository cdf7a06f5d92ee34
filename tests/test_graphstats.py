"""Hand-computed fixtures for graph structural statistics
(operators/graphstats.py)."""

import pytest

from pagerank_spark.operators.graphstats import (
    clustering_coefficients,
    degree_distribution,
    graph_summary,
)


def _edges(spark, rows):
    return spark.createDataFrame(rows, ["src", "dst"])


def test_clustering_coefficients_hand(spark):
    # triangle a-b-c plus pendant edge c-d (directed arbitrarily; duplicates
    # and orientation must not matter)
    e = _edges(
        spark,
        [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d"), ("b", "a"), ("a", "b")],
    )
    got = {r["url"]: r for r in clustering_coefficients(e).collect()}
    assert got["a"]["degree"] == 2 and got["a"]["triangles"] == 1
    assert got["a"]["lcc"] == 1.0
    assert got["b"]["lcc"] == 1.0
    assert got["c"]["degree"] == 3 and got["c"]["triangles"] == 1
    assert got["c"]["lcc"] == pytest.approx(round(2 * 1 / (3 * 2), 6))
    assert got["d"]["degree"] == 1 and got["d"]["triangles"] == 0
    assert got["d"]["lcc"] == 0.0


def test_graph_summary_hand(spark):
    # distinct directed: (a,b) (b,a) (a,c) (c,c); one reciprocal pair,
    # one self-loop; duplicate (a,b) collapses
    e = _edges(spark, [("a", "b"), ("b", "a"), ("a", "c"), ("c", "c"), ("a", "b")])
    row = graph_summary(e).collect()[0]
    assert row["n_vertices"] == 3
    assert row["n_edges"] == 3
    assert row["n_self_loops"] == 1
    assert row["n_reciprocal"] == 2  # both directions of the (a,b) pair
    assert row["reciprocity"] == pytest.approx(round(2 / 3, 6))
    assert row["max_out_degree"] == 2  # a -> {b, c}
    assert row["max_in_degree"] == 1


def test_degree_distribution_hand(spark):
    # out-degrees: a=1 (bucket 0), b=2 (bucket 1), c=4 (bucket 2)
    # in-degrees:  x=3 (bucket 1), y=2 (bucket 1), z=w=1 (bucket 0)
    e = _edges(
        spark,
        [
            ("a", "x"),
            ("b", "x"),
            ("b", "y"),
            ("c", "x"),
            ("c", "y"),
            ("c", "z"),
            ("c", "w"),
        ],
    )
    got = {(r["direction"], r["bucket"]): r["n_vertices"] for r in degree_distribution(e).collect()}
    assert got == {
        ("out", 0): 1,
        ("out", 1): 1,
        ("out", 2): 1,
        ("in", 0): 2,
        ("in", 1): 2,
    }


def test_degree_distribution_exact_power_of_two_bucket(spark):
    # floor(log2(8)) must be 3, not the ln(8)/ln(2)=2.999... float trap —
    # the binary-length formula is exact
    e = _edges(spark, [("h", f"t{i}") for i in range(8)])
    got = {
        (r["direction"], r["bucket"]): r["n_vertices"]
        for r in degree_distribution(e).collect()
        if r["direction"] == "out"
    }
    assert got == {("out", 3): 1}


def test_modularity_two_communities_hand(spark):
    """Directed Newman Q on a hand graph: communities x={a,b}, y={c,d};
    edges a→b, b→a, c→d, d→c, a→c. m=5, within=4,
    out_x=3·in_x=2 + out_y=2·in_y=3 ⇒ Σ=12; Q = 4/5 − 12/25 = 0.32."""
    from pagerank_spark.operators.graphstats import modularity

    e = _edges(spark, [("a", "b"), ("b", "a"), ("c", "d"), ("d", "c"), ("a", "c")])
    labels = spark.createDataFrame(
        [("a", "x"), ("b", "x"), ("c", "y"), ("d", "y")], ["url", "label"]
    )
    row = modularity(e, labels).collect()[0]
    assert row["m"] == 5 and row["within_edges"] == 4
    assert row["degree_product_sum"] == 12.0
    assert row["modularity"] == pytest.approx(0.32)


def test_modularity_single_community_is_zero(spark):
    """Everything in one community ⇒ within=m and Σ outdeg·indeg = m², so
    Q = 1 − 1 = 0 exactly — the classic normalization check."""
    from pagerank_spark.operators.graphstats import modularity

    e = _edges(spark, [("a", "b"), ("b", "c"), ("c", "a"), ("a", "c")])
    labels = spark.createDataFrame(
        [("a", "z"), ("b", "z"), ("c", "z")], ["url", "label"]
    )
    row = modularity(e, labels).collect()[0]
    assert row["modularity"] == 0.0


def test_report_operators_release_caches(spark):
    """Round-5 cache hygiene: none of the report operators may leave a
    CacheManager entry behind (round-4 verdict: composed corpus reports
    accumulated persisted intermediates for the session's lifetime).

    ``persist()`` registers with the session CacheManager, which holds the
    entry until an explicit unpersist — plans/caching.py materializes each
    report (collect for tiny outputs, eager localCheckpoint for data-sized
    ones) and releases the intermediates before returning."""
    from pagerank_spark.operators.graphstats import (
        avg_neighbor_degree,
        degree_assortativity,
        powerlaw_alpha,
        rich_club,
    )
    from pagerank_spark.operators.graphstats import modularity
    from pagerank_spark.operators.linkpred import (
        adamic_adar,
        bibliographic_coupling,
        cocitation,
        neighbor_jaccard,
    )
    from pagerank_spark.operators.triangles import triangle_count

    spark.catalog.clearCache()
    cm = spark._jsparkSession.sharedState().cacheManager()
    assert cm.isEmpty()

    e = _edges(
        spark,
        [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d"), ("d", "a"), ("a", "c")],
    )
    results = [
        graph_summary(e),
        degree_distribution(e),
        degree_assortativity(e),
        rich_club(e, ks=(1, 2)),
        powerlaw_alpha(e, d_min=1),
        clustering_coefficients(e),
        avg_neighbor_degree(e),
        triangle_count(e),
        triangle_count(e, per_vertex=True),
        cocitation(e, min_count=1),
        adamic_adar(e, min_common=1),
        bibliographic_coupling(e, min_count=1),
        neighbor_jaccard(e, min_common=1),
        modularity(e, spark.createDataFrame(
            [("a", "x"), ("b", "x"), ("c", "y"), ("d", "y")], ["url", "label"]
        )),
    ]
    # every operator must come back with the CacheManager already clean —
    # no reliance on the caller materializing anything first
    assert cm.isEmpty()
    for df in results:
        df.collect()  # results stay usable after their caches are released
    assert cm.isEmpty()


def test_spearman_correlation_hand(spark):
    from pagerank_spark.operators.graphstats import spearman_correlation

    # permutation, no ties: rho = 1 - 6*4/(4*15) = 0.6
    df = spark.createDataFrame([(1, 2), (2, 1), (3, 4), (4, 3)], ["x", "y"])
    row = spearman_correlation(df, "x", "y").collect()[0]
    assert row["n"] == 4 and row["spearman_rho"] == pytest.approx(0.6)

    # monotone -> 1.0; reversed -> -1.0
    up = spark.createDataFrame([(1, 10), (2, 20), (3, 40)], ["x", "y"])
    assert spearman_correlation(up, "x", "y").collect()[0]["spearman_rho"] == 1.0
    dn = spark.createDataFrame([(1, 40), (2, 20), (3, 10)], ["x", "y"])
    assert spearman_correlation(dn, "x", "y").collect()[0]["spearman_rho"] == -1.0


def test_spearman_correlation_average_rank_ties(spark):
    from pagerank_spark.operators.graphstats import spearman_correlation

    # x = [1,1,2] -> avg ranks [1.5,1.5,3]; y = [1,2,3] -> [1,2,3]
    # Pearson(ranks) = 1.5 / sqrt(1.5*2) = 0.866025
    df = spark.createDataFrame([(1, 1), (1, 2), (2, 3)], ["x", "y"])
    row = spearman_correlation(df, "x", "y").collect()[0]
    assert row["spearman_rho"] == pytest.approx(round(1.5 / (1.5 * 2) ** 0.5, 6))


def test_community_conductance_hand(spark):
    """Hand graph (the modularity fixture): communities x={a,b}, y={c,d};
    edges a→b, b→a, c→d, d→c, a→c. Endpoint volumes vol_x = vol_y = 5
    (vol_total 10); the one crossing edge a→c adds 1 to BOTH cuts, so
    phi = 1 / min(5, 5) = 0.2 for each community."""
    from pagerank_spark.operators.graphstats import community_conductance

    e = _edges(spark, [("a", "b"), ("b", "a"), ("c", "d"), ("d", "c"), ("a", "c")])
    labels = spark.createDataFrame(
        [("a", "x"), ("b", "x"), ("c", "y"), ("d", "y")], ["url", "label"]
    )
    rows = {r["label"]: r for r in community_conductance(e, labels).collect()}
    assert set(rows) == {"x", "y"}
    for lab in ("x", "y"):
        assert rows[lab]["n_vertices"] == 2
        assert rows[lab]["volume"] == 5
        assert rows[lab]["cut_edges"] == 1
        assert rows[lab]["conductance"] == pytest.approx(0.2)


def test_community_conductance_degenerate_sides_are_null(spark):
    """A single community holding every endpoint has min-side volume 0
    (vol_total − vol = 0) and an edgeless community has vol = 0 — both must
    report NULL conductance, never a division blow-up."""
    from pagerank_spark.operators.graphstats import community_conductance

    e = _edges(spark, [("a", "b"), ("b", "a")])
    labels = spark.createDataFrame(
        [("a", "z"), ("b", "z"), ("e", "lonely")], ["url", "label"]
    )
    rows = {r["label"]: r for r in community_conductance(e, labels).collect()}
    assert rows["z"]["volume"] == 4 and rows["z"]["cut_edges"] == 0
    assert rows["z"]["conductance"] is None
    assert rows["lonely"]["n_vertices"] == 1
    assert rows["lonely"]["volume"] == 0 and rows["lonely"]["cut_edges"] == 0
    assert rows["lonely"]["conductance"] is None


def test_community_conductance_releases_caches(spark):
    from pagerank_spark.operators.graphstats import community_conductance

    spark.catalog.clearCache()
    cm = spark._jsparkSession.sharedState().cacheManager()
    assert cm.isEmpty()
    e = _edges(spark, [("a", "b"), ("b", "c"), ("c", "a")])
    labels = spark.createDataFrame(
        [("a", "x"), ("b", "x"), ("c", "y")], ["url", "label"]
    )
    out = community_conductance(e, labels)
    assert cm.isEmpty()
    out.collect()
    assert cm.isEmpty()


def test_link_locality_hand(spark):
    """Host a: 2 outgoing page links, 1 stays on a ⇒ 0.5; host b: 1 link,
    intra ⇒ 1.0; hosts only ever seen as dst don't get a row (locality is
    an OUT-link property)."""
    from pagerank_spark.operators.hostgraph import link_locality

    e = _edges(
        spark,
        [
            ("http://a.com/1", "http://a.com/2"),
            ("http://a.com/1", "http://b.com/x"),
            ("http://b.com/y", "http://b.com/z"),
        ],
    )
    rows = {r["host"]: r for r in link_locality(e).collect()}
    assert set(rows) == {"a.com", "b.com"}
    assert rows["a.com"]["out_links"] == 2 and rows["a.com"]["intra_links"] == 1
    assert rows["a.com"]["locality"] == pytest.approx(0.5)
    assert rows["b.com"]["out_links"] == 1 and rows["b.com"]["intra_links"] == 1
    assert rows["b.com"]["locality"] == pytest.approx(1.0)


def test_avg_neighbor_degree_hand(spark):
    from pagerank_spark.operators.graphstats import avg_neighbor_degree

    # star out of h (outdeg 3) into a,b,c; a->b (outdeg 1); in-degrees:
    # a=1, b=2, c=1. knn(3) = (1+2+1)/3; knn(1) = indeg(b) = 2.
    # duplicate + self-loop edges must not count.
    e = spark.createDataFrame(
        [("h", "a"), ("h", "b"), ("h", "c"), ("h", "b"), ("a", "b"),
         ("c", "c")],
        ["src", "dst"],
    )
    got = {r["k"]: r for r in avg_neighbor_degree(e).collect()}
    # c's only out-edge is the excluded self-loop → c has no k bucket
    assert set(got) == {1, 3}
    assert got[3]["n_vertices"] == 1
    assert got[3]["knn"] == pytest.approx(4 / 3, abs=1e-6)
    assert got[1]["n_vertices"] == 1  # just a (a->b)
    assert got[1]["knn"] == pytest.approx(2.0, abs=1e-6)


def test_attack_robustness_star_collapse(spark):
    """A hub star plus a 3-cycle: removing the single top-degree hub
    collapses the giant component to the cycle."""
    from pagerank_spark.operators.graphstats import attack_robustness

    star = [("h", f"leaf{i}") for i in range(6)]
    cyc = [("x", "y"), ("y", "z"), ("z", "x")]
    e = spark.createDataFrame(star + cyc, ["src", "dst"])
    got = {r["k"]: (r["n_vertices"], r["largest_cc"], r["frac"])
           for r in attack_robustness(e, ks=(0, 1)).collect()}
    # baseline: 10 vertices, giant star component of 7
    assert got[0] == (10, 7, 0.7)
    # hub removed: leaves become isolated — they vanish with their only
    # edges; remaining graph is the 3-cycle
    assert got[1] == (3, 3, 1.0)
    import pytest as _pytest

    with _pytest.raises(ValueError):
        attack_robustness(e, ks=(-1,))


def test_random_failure_baseline_and_monotone(spark):
    from pagerank_spark.operators.graphstats import random_failure

    e = spark.createDataFrame(
        [(f"v{i}", f"v{i+1}") for i in range(40)], ["src", "dst"]
    )
    got = {r["frac"]: (r["n_vertices"], r["largest_cc"])
           for r in random_failure(e, fracs=(0.0, 0.5)).collect()}
    # frac 0: untouched 41-vertex chain, one component
    assert got[0.0] == (41, 41)
    # frac 0.5 on a chain: surviving vertex count drops and the chain
    # fragments (largest piece strictly smaller)
    n, big = got[0.5]
    assert n < 41 and big < 41
    # determinism: same seed -> identical result
    again = {r["frac"]: (r["n_vertices"], r["largest_cc"])
             for r in random_failure(e, fracs=(0.5,)).collect()}
    assert again[0.5] == got[0.5]
    import pytest as _pytest

    with _pytest.raises(ValueError):
        random_failure(e, fracs=(1.0,))


def test_reciprocity_hand(spark):
    from pagerank_spark.operators.graphstats import reciprocity

    e = spark.createDataFrame(
        [("a", "b"), ("b", "a"), ("a", "c"), ("c", "d"), ("d", "c"),
         ("x", "x"),            # self-loop dropped
         ("a", "b")],           # duplicate collapsed
        ["src", "dst"],
    )
    row = reciprocity(e).collect()[0]
    # distinct non-loop edges: ab, ba, ac, cd, dc -> 4 reciprocated
    assert (row["n_edges"], row["n_reciprocated"]) == (5, 4)
    assert row["reciprocity"] == 0.8


def test_rank_biased_overlap_identity_disjoint_and_head_weight(spark):
    import math

    from pagerank_spark.operators.graphstats import rank_biased_overlap

    a = spark.createDataFrame(
        [(f"u{i}", float(100 - i)) for i in range(10)], ["url", "score"]
    )
    # identical lists: RBO@d = (1-p) * sum_{k<=d} p^(k-1) (full overlap)
    row = rank_biased_overlap(a, a, d=10, p=0.9).collect()[0]
    exp = 0.1 * sum(0.9 ** (k - 1) for k in range(1, 11))
    assert row["n_common"] == 10 and abs(row["rbo"] - exp) < 1e-6
    # disjoint lists: zero
    b = spark.createDataFrame(
        [(f"v{i}", float(100 - i)) for i in range(10)], ["url", "score"]
    )
    row0 = rank_biased_overlap(a, b, d=10, p=0.9).collect()[0]
    assert row0["n_common"] == 0 and row0["rbo"] == 0.0
    # TOP-heaviness: disturbing the head (rank-1/2 swap breaks the k=1
    # prefix, the heaviest term) costs MORE than losing the rank-10 item
    # (only the k=10 prefix shrinks)
    a_swap = spark.createDataFrame(
        [("u1", 100.0), ("u0", 99.0)] + [(f"u{i}", float(100 - i))
                                         for i in range(2, 10)],
        ["url", "score"],
    )
    a_tail = spark.createDataFrame(
        [(f"u{i}", float(100 - i)) for i in range(9)] + [("zz", 1.0)],
        ["url", "score"],
    )
    r_swap = rank_biased_overlap(a, a_swap, d=10, p=0.9).collect()[0]["rbo"]
    r_tail = rank_biased_overlap(a, a_tail, d=10, p=0.9).collect()[0]["rbo"]
    assert r_swap < exp + 1e-9 and r_tail < exp
    assert r_swap < r_tail

    import pytest as _pytest

    with _pytest.raises(ValueError):
        rank_biased_overlap(a, b, d=0)
    with _pytest.raises(ValueError):
        rank_biased_overlap(a, b, p=1.0)


def test_degree_percentiles_hand(spark):
    from pagerank_spark.operators.graphstats import degree_percentiles

    # hub h -> 9 leaves; leaves have out-deg 0, in-deg 1; h out 9, in 0
    e = spark.createDataFrame(
        [("h", f"l{i}") for i in range(9)], ["src", "dst"]
    )
    got = {(r["direction"], r["p"]): r["value"]
           for r in degree_percentiles(e, ps=(0.5, 0.9, 1.0)).collect()}
    # out degrees: nine 0s and one 9 -> p50=0, p90=0 (ceil(.9*10)=9th), p100=9
    assert got[("out", 0.5)] == 0
    assert got[("out", 0.9)] == 0
    assert got[("out", 1.0)] == 9
    # in degrees: one 0 (h) and nine 1s -> p50=1, p100=1
    assert got[("in", 0.5)] == 1 and got[("in", 1.0)] == 1
    import pytest as _pytest

    with _pytest.raises(ValueError):
        degree_percentiles(e, ps=(0.0,))
