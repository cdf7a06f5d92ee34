"""Distributed greedy graph coloring (Jones-Plassmann 1993, the
hash-priority variant): per round, every uncolored vertex whose priority
beats all its UNCOLORED neighbors' takes the smallest color (mex) absent
from its already-COLORED neighborhood. Produces a proper coloring with
at most Delta+1 colors in O(log n) rounds w.h.p.

The reference has no graph layer beyond PageRank (reference pagerank.py);
coloring joins MIS (operators/mis.py — JP is exactly iterated MIS with
color recycling) as the other classic symmetry-breaking primitive: a
color class is a conflict-free batch, so coloring the URL-frontier
conflict graph (shared host / shared shard) yields politeness-safe fetch
waves, and coloring an update-dependency graph yields parallel-safe
transaction rounds.

Determinism: priority = the 60-bit md5 of the url (textops.hexint15), a
pure function — no priority table is shuffled, both engines recompute it
inline. A 60-bit tie between neighbors (~2^-60/pair) can stall a round;
``max_rounds`` + the no-progress check raise instead of looping.

Scale shape per round (the MIS shape plus one mex join): two semi-joins
restrict the static adjacency to the uncolored set, ONE
partial-aggregated min-priority per vertex, and the winners' mex is a
collect_set over their COLORED neighbors' colors — per-vertex state
bounded by chi <= Delta+1 distinct colors (a 10^7-degree hub holds a
handful of colors, not 10^7 rows). Winners and the color table are
localCheckpoint-ed per round (flat lineage).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pagerank_spark.operators.textops import hexint15


def greedy_coloring(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    extra_vertices: DataFrame | None = None,
    max_rounds: int = 200,
) -> DataFrame:
    """(url, color) — a proper coloring of the undirected simple graph
    underlying ``edges`` (self-loops dropped — a self-loop is uncolorable
    — and multi-edges collapsed); colors are dense ints from 0,
    deterministic across partitionings and engines. ``extra_vertices``
    adds isolated vertices (they win round 1 unopposed and take 0)."""
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
    colored = spark.createDataFrame([], "url string, color int")
    mex = F.expr("filter(sequence(0, size(_cs)), x -> NOT array_contains(_cs, x))[0]")
    rounds = 0
    while n_rem > 0:
        rounds += 1
        if rounds > max_rounds:
            raise RuntimeError(
                f"greedy_coloring did not finish in {max_rounds} rounds "
                "(a 60-bit priority tie between neighbors can stall a round)"
            )
        cur_adj = adj.join(
            remaining.withColumnRenamed("url", "u"), "u", "left_semi"
        ).join(remaining.withColumnRenamed("url", "v"), "v", "left_semi")
        mn = cur_adj.groupBy("u").agg(F.min(hexint15(F.col("v"))).alias("_mn"))
        winners = (
            remaining.join(mn.withColumnRenamed("u", "url"), "url", "left")
            .where(F.col("_mn").isNull() | (hexint15(F.col("url")) < F.col("_mn")))
            .select("url")
            .localCheckpoint(eager=True)
        )
        # smallest color unused by the winners' already-colored neighbors
        wc = (
            adj.join(winners.withColumnRenamed("url", "u"), "u", "left_semi")
            .join(colored.withColumnRenamed("url", "v"), "v")
            .groupBy("u")
            .agg(F.collect_set("color").alias("_cs"))
        )
        new_colored = (
            winners.join(wc.withColumnRenamed("u", "url"), "url", "left")
            .select(
                "url",
                F.when(F.col("_cs").isNull(), F.lit(0))
                .otherwise(mex)
                .cast("int")
                .alias("color"),
            )
        )
        colored = colored.union(new_colored).localCheckpoint(eager=True)
        nxt = remaining.join(winners, "url", "left_anti").localCheckpoint(eager=True)
        n_nxt = nxt.count()
        if n_nxt >= n_rem:
            raise RuntimeError("greedy_coloring stalled (60-bit priority tie)")
        remaining.unpersist()
        winners.unpersist()
        remaining = nxt
        n_rem = n_nxt
    remaining.unpersist()
    adj.unpersist()
    return colored
