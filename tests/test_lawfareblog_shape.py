"""Reference README Part-3/4 phenomena on a lawfareblog-SHAPED synthetic.

The reference's lawfareblog.csv.gz is not shipped (reference repo holds only
small.csv.gz), so this reproduces the documented STRUCTURE instead
(README.md:240-284): a domain where a handful of menu/hub pages are linked
from every page, so

  * --filter_ratio=0.2 removes exactly the hub in-links (the "accidentally
    removed the most popular article" effect), and
  * the filtered residual graph has a small eigengap, so alpha=0.99999 needs
    hundreds of iterations where the default alpha converges in tens
    (the reference reports ~685 vs ~10, README.md:280-284).

Assertions are against the NumPy oracle (pagerank_np replicates the
reference's build_matrix/power_method bit-for-bit): per-vertex parity at
1e-6 AND identical iteration counts at the default alpha, plus identical
per-iteration residual TRAJECTORY for the first iterations at alpha=0.99999
(running the full ~700-iteration fixpoint on Spark would cost ~15 min of
pure per-job latency for no extra signal — trajectory equality already
proves both engines walk the same slow path).
"""

from __future__ import annotations

import pytest


def _lawfare_shaped_edges(
    na: int = 2000, nb: int = 500, hubs: int = 5, cross_every: int = 25
):
    """Deterministic source-sorted edge list reproducing the README's
    spectral structure: every page links to all ``hubs`` menu pages
    (in-degree ~n => killed by filter_ratio=0.2); the filtered residual is
    TWO internally-mixing article communities (quadratic/affine link maps
    give heterogeneous in-degrees, so power iteration actually has to move
    mass) coupled only by one cross-community link per ``cross_every``
    pages. The weak coupling sets the residual eigengap: at cross_every=25
    the oracle needs ~650 iterations at alpha=0.99999 vs ~27 at the default
    alpha — the README's 685-vs-10 Part-4 regime (README.md:280-284)."""
    edges = []

    def block(pref, n, other_pref, other_n):
        for i in range(n):
            src = f"www.lfb-shape.test/{pref}-{i}"
            for h in range(hubs):
                edges.append((src, f"www.lfb-shape.test/hub-{h}"))
            edges.append((src, f"www.lfb-shape.test/{pref}-{(i * i + 1) % n}"))
            edges.append((src, f"www.lfb-shape.test/{pref}-{(i * 3 + 7) % n}"))
            if i % cross_every == 0:
                edges.append((src, f"www.lfb-shape.test/{other_pref}-{i % other_n}"))

    block("article", na, "podcast", nb)
    block("podcast", nb, "article", na)
    return edges


@pytest.mark.slow
def test_filter_ratio_removes_hubs_and_shrinks_eigengap(spark):
    from pagerank_spark.operators.graph_build import LinkGraph
    from pagerank_spark.oracle.pagerank_np import pagerank_np

    edges = _lawfare_shaped_edges()

    # oracle, default alpha vs alpha=0.99999 on the filtered graph:
    # the Part-4 phenomenon — iterations blow up by an order of magnitude
    r_def, it_def, res_def = pagerank_np(
        edges, alpha=0.85, filter_ratio=0.2, apply_regex_filter=False
    )
    _, it_hi, res_hi = pagerank_np(
        edges, alpha=0.99999, filter_ratio=0.2, apply_regex_filter=False,
        max_iterations=3000,
    )
    assert it_hi >= 10 * it_def, (it_hi, it_def)
    assert 300 <= it_hi < 1500, it_hi  # converged, in the README's ~685 regime

    # hubs are gone from the filtered ranking (the "removed the most popular
    # article" effect): every hub ends at the teleport floor, below every
    # in-linked article
    hub_ranks = [v for u, v in r_def.items() if "/hub-" in u]
    top10 = sorted(r_def, key=r_def.get, reverse=True)[:10]
    assert not any("/hub-" in u for u in top10)
    assert max(hub_ranks) < min(r_def[u] for u in top10)

    # Spark engine at default alpha: exact iteration-count parity and
    # per-vertex 1e-6 parity with the oracle
    g = LinkGraph.from_edges(
        spark.createDataFrame(edges, ["src", "dst"]),
        filter_ratio=0.2, apply_regex_filter=False,
    )
    m: list = []
    got = {r["url"]: r["rank"] for r in
           g.pagerank(alpha=0.85, epsilon=1e-6, metrics=m).collect()}
    assert len(m) == it_def, (len(m), it_def)
    assert set(got) == set(r_def)
    for u, x in r_def.items():
        assert abs(got[u] - x) < 1e-6, u

    # alpha=0.99999: the engine walks the SAME slow residual trajectory
    k = 25
    m2: list = []
    g.pagerank(alpha=0.99999, epsilon=1e-6, max_iterations=k, metrics=m2).count()
    assert len(m2) == k  # nowhere near converged yet, as in the README
    for step, want in zip(m2, res_hi[:k]):
        assert abs(step["residual"] - want) < 1e-6, step
    g.unpersist()
