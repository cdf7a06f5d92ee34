"""Maximal independent set by deterministic Luby rounds (Luby 1986, the
hash-priority variant): repeatedly admit every remaining vertex whose
priority beats all its remaining neighbors', then drop winners and their
neighborhoods.

The reference has no graph algorithms beyond PageRank (reference
pagerank.py); MIS joins components / k-core / k-truss in the engine's
graph layer as the classic symmetry-breaking primitive — distributed
greedy coloring, landmark/seed selection (e.g. picking non-adjacent BFS
roots for link_distance), and conflict-free scheduling all reduce to it.

Determinism: priority = the 60-bit md5 of the url (textops.hexint15 — a
pure function of the vertex name, so NO priority table is ever joined or
shuffled; both engines recompute it inline). A priority tie between
neighbors (~2^-60 per pair, the same collision budget the minhash/simhash
operators accept) could stall a round; the ``max_rounds`` cap raises
instead of looping.

Scale shape per round: two semi-joins restrict the static adjacency to the
surviving vertex set, ONE partial-aggregated min per vertex (edge→vertex
shuffle carrying an 8-byte priority), and vertex-sized anti-joins. Rounds
are O(log n) w.h.p. — each round removes the closed neighborhood of every
local-minimum vertex, and any remaining component's global minimum always
wins, so progress is guaranteed. Surviving state is localCheckpoint-ed per
round (flat lineage, ContextCleaner-owned blocks).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pagerank_spark.operators.textops import hexint15


def maximal_independent_set(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    extra_vertices: DataFrame | None = None,
    max_rounds: int = 100,
) -> DataFrame:
    """(url,) — a maximal independent set of the undirected simple graph
    underlying ``edges`` (self-loops dropped, multi-edges collapsed),
    deterministic across partitionings and engines.

    ``extra_vertices`` (a one-column ``url`` DataFrame) adds isolated
    vertices not present in the edge list — isolated vertices are always
    in the MIS (they win their first round unopposed).
    """
    s, d = F.col(src_col), F.col(dst_col)
    und = (
        edges.where(s != d)
        .select(F.least(s, d).alias("a"), F.greatest(s, d).alias("b"))
        .distinct()
    )
    adj = und.select(F.col("a").alias("u"), F.col("b").alias("v")).unionAll(
        und.select(F.col("b").alias("u"), F.col("a").alias("v"))
    )
    verts = und.select(F.col("a").alias("url")).union(
        und.select(F.col("b").alias("url"))
    )
    if extra_vertices is not None:
        verts = verts.union(extra_vertices.select("url"))
    remaining = verts.distinct().localCheckpoint(eager=True)
    adj = adj.localCheckpoint(eager=True)
    n_rem = remaining.count()
    spark = edges.sparkSession
    mis = spark.createDataFrame([], "url string")
    rounds = 0
    while n_rem > 0:
        rounds += 1
        if rounds > max_rounds:
            raise RuntimeError(
                f"maximal_independent_set did not finish in {max_rounds} rounds "
                "(a 60-bit priority tie between neighbors can stall a round)"
            )
        cur_adj = adj.join(
            remaining.withColumnRenamed("url", "u"), "u", "left_semi"
        ).join(remaining.withColumnRenamed("url", "v"), "v", "left_semi")
        # min neighbor priority per surviving vertex — priority is a pure
        # function of the name, computed inline (no priority table)
        mn = cur_adj.groupBy("u").agg(F.min(hexint15(F.col("v"))).alias("mn"))
        winners = (
            remaining.join(mn.withColumnRenamed("u", "url"), "url", "left")
            .where(F.col("mn").isNull() | (hexint15(F.col("url")) < F.col("mn")))
            .select("url")
            .localCheckpoint(eager=True)
        )
        # closed neighborhood of the winners leaves the game
        touched = cur_adj.join(
            winners.withColumnRenamed("url", "v"), "v", "left_semi"
        ).select(F.col("u").alias("url"))
        nxt = (
            remaining.join(winners, "url", "left_anti")
            .join(touched, "url", "left_anti")
            .localCheckpoint(eager=True)
        )
        n_nxt = nxt.count()
        if n_nxt >= n_rem:  # no progress: neighbor priority tie
            raise RuntimeError(
                "maximal_independent_set stalled (60-bit priority tie)"
            )
        remaining.unpersist()
        remaining = nxt
        n_rem = n_nxt
        mis = mis.union(winners)
    remaining.unpersist()
    adj.unpersist()
    return mis
