"""k-core decomposition (fixed k): the maximal subgraph where every vertex
has undirected degree >= k, by iterative peeling (Seidman 1983; the
MapReduce formulation is the standard repeated degree-filter).

The reference has no graph algorithms beyond PageRank (reference
pagerank.py); k-core joins components / label propagation / triangles /
HITS in the engine's north-rule graph layer. Curation use: the k-core of a
link graph is the densely-cross-linked "site cluster" backbone — a common
spam/boilerplate signal at web scale.

Scale shape per round: ONE partial-aggregated degree count over the
(deduplicated, undirected) edge list + two semi-joins against the surviving
vertex set — the vertex side is degree-filtered and broadcasts while it
fits, the edge side stays partitioned in place. Rounds are O(peeling
depth), typically tens; each round's edge set is localCheckpoint-ed so
lineage stays flat. The DuckDB twin replicates the peeling fixpoint as a
recursive CTE with the same stop rule.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pagerank_spark.operators.hits import (
    BROADCAST_VERTEX_THRESHOLD,
    resolve_broadcast,
)


def _undirect(edges: DataFrame, src_col: str, dst_col: str) -> DataFrame:
    s, d = F.col(src_col), F.col(dst_col)
    return (
        edges.where(s != d)
        .select(F.least(s, d).alias("a"), F.greatest(s, d).alias("b"))
        .distinct()
    )


def k_core(
    edges: DataFrame,
    k: int,
    src_col: str = "src",
    dst_col: str = "dst",
    max_rounds: int | None = None,
    broadcast_vertices: bool | None = None,
    broadcast_threshold: int = BROADCAST_VERTEX_THRESHOLD,
) -> DataFrame:
    """(url,) — the vertices of the k-core of the undirected simple graph
    underlying ``edges`` (self-loops dropped, multi-edges collapsed).
    Possibly empty. Deterministic.

    ``max_rounds=None`` (default) peels to the fixpoint — termination is
    guaranteed because every non-final round strictly shrinks the edge set,
    and peeling depth is O(V) worst-case (a 2N-vertex path at k=2 peels one
    vertex per end per round). Pass a cap to fail fast instead on graphs
    where that depth is operationally unacceptable. ``broadcast_vertices``:
    hint the degree-filtered vertex set as the semi-join build side. None
    (default) auto-selects per round from the surviving graph size — the
    vertex count is bounded by 2x the undirected edge count, which each
    round already computes for the stop rule, so the policy costs nothing
    and a peel that starts on the shuffle path flips to broadcast as the
    core shrinks. Cluster-scale callers can no longer OOM an executor on a
    vertex-sized build side by forgetting to pass False
    (pagerank.py:120-124's count-threshold rule, via resolve_broadcast)."""
    if k < 1:
        raise ValueError("k_core needs k >= 1")
    cur = _undirect(edges, src_col, dst_col).localCheckpoint(eager=True)
    n_cur = cur.count()
    rounds = 0
    while n_cur > 0:
        rounds += 1
        if max_rounds is not None and rounds > max_rounds:
            raise RuntimeError(f"k_core did not stabilize in {max_rounds} rounds")
        maybe_bc = (
            F.broadcast
            if resolve_broadcast(broadcast_vertices, 2 * n_cur, broadcast_threshold)
            else (lambda df: df)
        )
        deg = (
            cur.select(F.col("a").alias("v"))
            .unionAll(cur.select(F.col("b").alias("v")))
            .groupBy("v")
            .agg(F.count("*").alias("_d"))
        )
        good = maybe_bc(deg.where(F.col("_d") >= k).select("v"))
        nxt = (
            cur.join(good.withColumnRenamed("v", "a"), "a", "left_semi")
            .join(good.withColumnRenamed("v", "b"), "b", "left_semi")
            .localCheckpoint(eager=True)
        )
        n_nxt = nxt.count()
        cur.unpersist()
        cur = nxt
        if n_nxt == n_cur:  # stable: every remaining endpoint has deg >= k
            break
        n_cur = n_nxt
    return (
        cur.select(F.col("a").alias("url"))
        .union(cur.select(F.col("b").alias("url")))
        .distinct()
    )


def core_numbers(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    max_rounds: int | None = None,
) -> DataFrame:
    """(url, core) — the EXACT core number (coreness) of every vertex of
    the undirected simple graph underlying ``edges``: the largest k such
    that the vertex survives in the k-core. Deterministic.

    Computed by the h-index fixpoint of Lü-Zhou-Zhang-Stanley (PNAS 2016):
    start from c(v) = degree(v) and repeatedly set c(v) to the H-index of
    its neighbors' current values; the (monotonically non-increasing)
    iteration converges exactly to coreness. Unlike ``k_core`` (one fixed
    k) this yields the whole decomposition in one run, with NO nested
    peel-per-k loop.

    Scale shape per round: ONE vertex-keyed equi-join of the adjacency
    list against the vertex-sized value vector, then a partial-aggregated
    (v, value) HISTOGRAM — the per-vertex group the window sort touches is
    #distinct neighbor values, not degree, so a 10^7-degree hub
    contributes a handful of histogram rows instead of a 10^7-element
    sorted buffer. H-index from the histogram: with cum(x) = #neighbors
    whose value >= x (a running sum over the descending distinct values),
    H = max_x min(x, cum(x)) — exact integers end to end. The stop rule
    (no vertex changed) is one 1-row aggregate per round; rounds are
    bounded by the graph's "h-index convergence depth" (tens on web
    graphs). ``max_rounds`` raises instead of returning partial values
    (the scc convention).

    The reference has no graph layer beyond PageRank (reference
    pagerank.py); coreness joins k_core / k_truss as the density
    backbone's per-vertex strength signal.
    """
    und = _undirect(edges, src_col, dst_col)
    adj = (
        und.select(F.col("a").alias("v"), F.col("b").alias("u"))
        .unionAll(und.select(F.col("b").alias("v"), F.col("a").alias("u")))
        .localCheckpoint(eager=True)
    )
    cur = (
        adj.groupBy("v")
        .agg(F.count("*").cast("long").alias("c"))
        .localCheckpoint(eager=True)
    )
    w = (
        Window.partitionBy("v")
        .orderBy(F.desc("x"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # FRONTIER iteration: v's h-index depends only on its NEIGHBORS'
    # values, so after the first sweep only vertices adjacent to a
    # just-changed vertex can move — late rounds (the long convergence
    # tail, ~60 of 72 rounds on the 1M-edge sf0.1 bench graph) touch
    # frontier-sized slices instead of the whole graph. Per-round state
    # is materialized through a parquet SCRATCH ROUNDTRIP, not
    # localCheckpoint: this loop runs to ~70+ rounds and a
    # localCheckpoint chain was measured degrading geometrically past
    # ~18 rounds (1.3 s -> 110 s/round, flat plans, constant
    # partitions — session-state accumulation); the write/read reset
    # stays at ~1.2 s/round indefinitely (measured total: 248 s
    # non-frontier lcp -> 102 s frontier+scratch).
    import shutil
    import tempfile

    spark = edges.sparkSession
    scratch = tempfile.mkdtemp(prefix="core_numbers_")

    def _mat(df: DataFrame, name: str) -> DataFrame:
        p = f"{scratch}/{name}"
        df.write.mode("overwrite").parquet(p)
        return spark.read.parquet(p)

    changed = None  # None = first round, recompute everyone
    rounds = 0
    try:
        while True:
            rounds += 1
            if max_rounds is not None and rounds > max_rounds:
                raise RuntimeError(
                    f"core_numbers did not converge in {max_rounds} rounds"
                )
            if changed is None:
                cand_adj = adj
            else:
                cand = (
                    adj.join(
                        changed.withColumnRenamed("v", "u"), "u", "left_semi"
                    )
                    .select("v")
                    .distinct()
                )
                cand_adj = adj.join(cand, "v", "left_semi")
            hist = (
                cand_adj.join(
                    cur.select(F.col("v").alias("u"), F.col("c").alias("x")), "u"
                )
                .groupBy("v", "x")
                .agg(F.count("*").alias("_cnt"))
            )
            newh = (
                hist.withColumn("_cum", F.sum("_cnt").over(w))
                .groupBy("v")
                .agg(
                    F.max(F.least(F.col("x"), F.col("_cum")))
                    .cast("long")
                    .alias("_h")
                )
            )
            new_changed = _mat(
                newh.join(cur, "v")
                .where(F.col("_h") != F.col("c"))
                .select("v", F.col("_h")),
                f"chg{rounds % 2}",
            )
            if new_changed.count() == 0:
                break
            cur = _mat(
                cur.join(new_changed, "v", "left").select(
                    "v", F.coalesce(F.col("_h"), F.col("c")).alias("c")
                ),
                f"cur{rounds % 2}",
            )
            changed = new_changed.select("v")
        # the returned frame must outlive the scratch dir
        out = cur.select(F.col("v").alias("url"), F.col("c").alias("core"))
        out = out.localCheckpoint(eager=True)
    finally:
        adj.unpersist()
        shutil.rmtree(scratch, ignore_errors=True)
    return out
