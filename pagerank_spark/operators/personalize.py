"""Batched personalized PageRank — the CSR path's economic case.

The reference computes one personalized run per CLI invocation (reference
pagerank2.py: personalization vector from the query, then power iteration).
A search/recommendation service runs MANY personalizations over the SAME
graph — and for the CSR implementation (operators/pagerank_csr.py) the
expensive part is the one-time graph preparation: hash-id encode + per-block
parquet spill + per-node factorize/mmap cache. Everything per-QUERY is
vertex-sized (the personalization vector and the rank iterates); the edge
structure never moves again.

``personalized_batch`` makes that amortization explicit: the FIRST query
pays the spill (pagerank_csr records it on the LinkGraph as ``_csr_state``),
queries 2..Q reuse the warm blocks — the per-node mmap cache means their
iterations read exactly the pages the first query already faulted in. The
same call shape also runs against the v1 join-agg implementation
(``impl='joinagg'``), which is the honest baseline: v1 has no spill to
amortize, so its Q-query cost is ~Q * (single-run cost).

Measured protocol (bench.py --personalized-batch, committed in
BENCH/BASELINE.md): Q=8 personalization vectors at 16M edges, batch-CSR
wall vs 8 independent v1 runs on the same warm LinkGraph.

Determinism: identical to pagerank_csr / pagerank run singly — the batch
API is a loop plus the shared spill, no math changes (pytest pins
batch[q] == single-run(q) bit-for-bit).
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame


def personalized_batch(
    graph,
    v_dfs: dict[str, DataFrame],
    impl: str = "csr",
    alpha: float = 0.85,
    epsilon: float = 1e-6,
    max_iterations: int = 1000,
    num_blocks: int | None = None,
    scratch_dir: str | None = None,
    metrics: list | None = None,
) -> dict[str, DataFrame]:
    """Run personalized PageRank for every query in ``v_dfs`` over one
    prepared graph; returns {query_name: (url, rank) DataFrame}.

    ``v_dfs``: {name: personalization DataFrame (url, v)} — the same ``v_df``
    contract as ``pagerank``/``pagerank_csr`` (operators/graph_build.py
    ``personalization_from_query`` builds one from a search query).
    ``impl``: 'csr' (one spill amortized across the batch — the point of
    this API) or 'joinagg' (v1; no spill, the comparison baseline).
    ``metrics``: optional list collecting one dict per query
    (query, iterations, wall_s, plus setup_wall_s on the first CSR query,
    which includes the one-time spill).
    """
    if impl not in ("csr", "joinagg"):
        raise ValueError(f"unknown impl {impl!r}")
    out: dict[str, DataFrame] = {}
    for i, (name, v_df) in enumerate(v_dfs.items()):
        q_metrics: list = []
        t0 = time.monotonic()
        if impl == "csr":
            ranks = graph.pagerank_csr(
                alpha=alpha, v_df=v_df, epsilon=epsilon,
                max_iterations=max_iterations, num_blocks=num_blocks,
                scratch_dir=scratch_dir, metrics=q_metrics,
            )
        else:
            ranks = graph.pagerank(
                alpha=alpha, v_df=v_df, epsilon=epsilon,
                max_iterations=max_iterations, metrics=q_metrics,
            )
        wall = time.monotonic() - t0
        out[name] = ranks
        if metrics is not None:
            m = {"query": name, "impl": impl,
                 "iterations": len(q_metrics), "wall_s": wall}
            if impl == "csr" and i == 0:
                # first query's wall includes the one-time encode+spill;
                # per-iteration walls let callers decompose it
                m["setup_wall_s"] = wall - sum(x["wall_s"] for x in q_metrics)
            metrics.append(m)
    return out
