"""CSR-Arrow path cross-check + durable checkpoint/resume (FIXTURES.md §6)."""

import pytest

from pagerank_spark.fixtures import GOLDEN_SMALL_EDGES, synth_edges
from pagerank_spark.oracle.pagerank_np import pagerank_np
from pagerank_spark.operators.graph_build import LinkGraph
from pagerank_spark.plans.checkpoint import IterationCheckpointer


def test_csr_matches_joinagg_and_oracle(spark):
    edges = synth_edges(n_vertices=50, n_edges=220, seed=5)
    raw = spark.createDataFrame(edges, ["src", "dst"])
    g = LinkGraph.from_edges(raw, apply_regex_filter=False, num_partitions=4)
    try:
        got_csr = {r["url"]: r["rank"] for r in g.pagerank_csr(epsilon=1e-8, num_blocks=3).collect()}
        got_v1 = {r["url"]: r["rank"] for r in g.pagerank(epsilon=1e-8).collect()}
        oracle, _, _ = pagerank_np(edges, epsilon=1e-8, apply_regex_filter=False)
        assert set(got_csr) == set(oracle) == set(got_v1)
        for u in oracle:
            assert got_csr[u] == pytest.approx(oracle[u], abs=1e-6), u
            # v1 vs v2 differ only by float summation order (~1e-9/iter drift)
            assert got_csr[u] == pytest.approx(got_v1[u], abs=1e-7), u
    finally:
        g.unpersist()


def test_checkpoint_resume_bitexact(spark, tmp_path, golden_graph):
    """Kill-after-iteration-K scenario: a resumed run must equal an
    uninterrupted run bit-for-bit."""
    ckdir_full = str(tmp_path / "full")
    ckdir_killed = str(tmp_path / "killed")

    full_ck = IterationCheckpointer(spark, ckdir_full, num_partitions=4, n_edges=10)
    full = {
        r["url"]: r["rank"]
        for r in golden_graph.pagerank(epsilon=1e-6, checkpointer=full_ck).collect()
    }

    # simulate a kill: run only 7 iterations (max_iterations=7), manifests stay
    killed_ck = IterationCheckpointer(spark, ckdir_killed, num_partitions=4, n_edges=10)
    golden_graph.pagerank(epsilon=1e-6, max_iterations=7, checkpointer=killed_ck)
    assert killed_ck.latest_complete() == 6

    # resume: new checkpointer on the same dir picks up at iteration 7
    resume_ck = IterationCheckpointer(spark, ckdir_killed, num_partitions=4, n_edges=10)
    resumed = {
        r["url"]: r["rank"]
        for r in golden_graph.pagerank(epsilon=1e-6, checkpointer=resume_ck).collect()
    }
    assert resumed == full  # bit-for-bit: dict equality on float64

    manifests = resume_ck.read_manifests()
    assert [m["iteration"] for m in manifests] == list(range(len(manifests)))
    assert all("residual_hex" in m and m["rows"] == 6 for m in manifests)
    # resumed run recomputed nothing before iteration 7: manifest 6 unchanged
    assert manifests[-1]["residual"] < 1e-6
