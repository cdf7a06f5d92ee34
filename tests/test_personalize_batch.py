"""personalized_batch (operators/personalize.py): Q personalization runs
over ONE prepared graph — the CSR path's amortization API (round-4 verdict
stretch item #9). Batch results must equal single runs bit-for-bit, and the
edge spill must happen exactly once for the whole batch.
"""

from __future__ import annotations

import pytest

from pagerank_spark.fixtures import synth_edges
from pagerank_spark.operators.graph_build import LinkGraph
from pagerank_spark.operators.personalize import personalized_batch


@pytest.fixture(scope="module")
def pgraph(spark):
    edges = synth_edges(n_vertices=40, n_edges=150, seed=21)
    raw = spark.createDataFrame(edges, ["src", "dst"])
    g = LinkGraph.from_edges(raw, apply_regex_filter=False, num_partitions=4)
    yield g
    g.unpersist()


def _vset(g, frac_mod, rem):
    """Deterministic personalization: indicator over url hash buckets."""
    from pyspark.sql import functions as F

    v = g.vertices.withColumn(
        "v", F.when(F.abs(F.xxhash64("url")) % frac_mod == rem, 1.0).otherwise(0.0)
    )
    total = v.agg(F.sum("v")).first()[0]
    return v.withColumn("v", F.col("v") / F.lit(float(total)))


def test_batch_matches_single_runs_and_spills_once(pgraph, monkeypatch):
    from pagerank_spark.operators import pagerank_csr as mod

    spills = {"n": 0}
    orig = mod._spill_blocks

    def counting(*a, **kw):
        spills["n"] += 1
        return orig(*a, **kw)

    monkeypatch.setattr(mod, "_spill_blocks", counting)

    queries = {f"q{r}": _vset(pgraph, 3, r) for r in range(3)}
    metrics: list = []
    batch = personalized_batch(
        pgraph, queries, impl="csr", epsilon=1e-8, num_blocks=3, metrics=metrics
    )
    assert spills["n"] == 1  # ONE spill amortized across the whole batch
    assert set(batch) == set(queries)
    assert [m["query"] for m in metrics] == list(queries)
    assert "setup_wall_s" in metrics[0] and "setup_wall_s" not in metrics[1]

    for name, v_df in queries.items():
        single = {r["url"]: r["rank"]
                  for r in pgraph.pagerank_csr(v_df=v_df, epsilon=1e-8,
                                               num_blocks=3).collect()}
        got = {r["url"]: r["rank"] for r in batch[name].collect()}
        assert got == single, name  # bit-for-bit (deterministic hash ids)
    assert spills["n"] == 1  # the single runs reused the warm spill too


def test_batch_joinagg_baseline_matches_v1_and_csr(pgraph):
    # impl='joinagg' is the comparison baseline: same loop, v1 kernels —
    # and the two implementations agree on every query to 1e-7
    queries = {f"q{r}": _vset(pgraph, 2, r) for r in range(2)}
    v1 = personalized_batch(pgraph, queries, impl="joinagg", epsilon=1e-8)
    v2 = personalized_batch(pgraph, queries, impl="csr", epsilon=1e-8,
                            num_blocks=3)
    for name in queries:
        a = {r["url"]: r["rank"] for r in v1[name].collect()}
        b = {r["url"]: r["rank"] for r in v2[name].collect()}
        assert set(a) == set(b)
        for u in a:
            assert a[u] == pytest.approx(b[u], abs=1e-7), (name, u)

    with pytest.raises(ValueError):
        personalized_batch(pgraph, queries, impl="bogus")
