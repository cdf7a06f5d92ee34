"""Minimum link distance from a seed set (level-synchronous BFS).

Web-corpus curation uses hop distance from a trusted frontier constantly —
crawl-depth caps, "within k clicks of a seed list" selection, and the
seed-distance feature TrustRank-style systems threshold on. The reference
has no multi-hop operator (its ratio filter is single-hop); this is the
standard Spark formulation: level-synchronous frontier expansion, the same
shape Pregel/GraphX BFS lowers to.

Per level: one src-keyed join of the (small) frontier against the
pre-partitioned edge cache, a distinct on the discovered endpoints, and a
LEFT ANTI join against the settled set — shuffles are bounded by frontier
and settled sizes (vertex-sized), never edge-sized beyond the join itself.
The per-level driver action (frontier-empty check) is inherent to BFS —
level k+1 cannot be scheduled until level k's frontier is known — and each
level's result is an eager ``localCheckpoint``, so lineage stays flat no
matter the depth (the anti-join side would otherwise re-derive every prior
level each round).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def link_distance(
    edges: DataFrame,
    seeds: DataFrame,
    max_depth: int = 10,
) -> DataFrame:
    """(url, dist) — minimum number of directed hops from any seed url,
    settled per level (dist 0 = the seeds themselves, capped at
    ``max_depth``; unreachable urls are absent)."""
    if max_depth < 0:
        raise ValueError("max_depth must be >= 0")
    e = edges.select(F.col("src").cast("string"), F.col("dst").cast("string"))
    frontier = (
        seeds.select(F.col("url").cast("string"))
        .distinct()
        .withColumn("dist", F.lit(0).cast("int"))
        .localCheckpoint(eager=True)
    )
    levels = [frontier]
    settled = frontier.select("url")
    for d in range(1, max_depth + 1):
        nxt = (
            frontier.join(e, frontier["url"] == e["src"])
            .select(F.col("dst").alias("url"))
            .distinct()
            .join(settled, "url", "left_anti")
            .withColumn("dist", F.lit(d).cast("int"))
            .localCheckpoint(eager=True)
        )
        if nxt.isEmpty():
            break
        levels.append(nxt)
        settled = settled.union(nxt.select("url"))
        frontier = nxt
    out = levels[0]
    for lv in levels[1:]:
        out = out.unionByName(lv)
    return out.select("url", "dist")


def nearest_seed(
    edges: DataFrame,
    seeds: DataFrame,
    max_depth: int = 10,
) -> DataFrame:
    """Graph Voronoi partition: (url, seed, dist) assigning every reachable
    vertex to its CLOSEST seed — the label a seed-propagation curation pass
    wants ("which trusted hub does this page belong to?"), and the
    assignment step of graph k-center/landmark clustering. Ties (two seeds
    at equal distance) break to the lexicographically smallest seed, so the
    partition is deterministic.

    Unlike :func:`multi_source_distance` (whose state is (source, url)-keyed
    — k sources cost a k×-wide frontier), the Voronoi frontier keeps ONE row
    per vertex: after each expansion a ``min(seed)`` aggregate settles every
    newly-reached vertex exactly once, so state and shuffles stay
    vertex-sized no matter how many seeds there are. Per level: one
    src-keyed join against the edge table, one map-side-combined min
    aggregate, one anti-join against the settled set; every level
    localCheckpoint-ed (flat lineage at any depth).
    """
    if max_depth < 0:
        raise ValueError("max_depth must be >= 0")
    e = edges.select(F.col("src").cast("string"), F.col("dst").cast("string"))
    frontier = (
        seeds.select(F.col("url").cast("string"))
        .distinct()
        .select("url", F.col("url").alias("seed"))
        .withColumn("dist", F.lit(0).cast("int"))
        .localCheckpoint(eager=True)
    )
    levels = [frontier]
    settled = frontier.select("url")
    for d in range(1, max_depth + 1):
        nxt = (
            frontier.join(e, frontier["url"] == e["src"])
            .select(F.col("dst").alias("url"), "seed")
            .join(settled, "url", "left_anti")
            .groupBy("url")
            .agg(F.min("seed").alias("seed"))
            .withColumn("dist", F.lit(d).cast("int"))
            .localCheckpoint(eager=True)
        )
        if nxt.isEmpty():
            break
        levels.append(nxt)
        settled = settled.union(nxt.select("url"))
        frontier = nxt
    out = levels[0]
    for lv in levels[1:]:
        out = out.unionByName(lv)
    return out.select("url", "seed", "dist")


def multi_source_distance(
    edges: DataFrame,
    sources: DataFrame,
    max_depth: int = 10,
) -> DataFrame:
    """(source, url, dist) — minimum directed hop distance from EACH source
    separately (dist 0 = the source itself; unreachable pairs absent) —
    the per-seed variant of :func:`link_distance` (which settles the MIN
    over a seed set). State is (source, url)-keyed, so k sources cost one
    BFS whose frontier is at most k× wider — the standard landmark/sample
    sweep (Eppstein-Wang style centrality estimation runs on exactly this).

    Same scale shape as link_distance: per level one src-keyed join of the
    frontier against the edge table, a distinct, and an anti-join against
    the settled (source, url) set; every level localCheckpoint-ed.
    """
    if max_depth < 0:
        raise ValueError("max_depth must be >= 0")
    e = edges.select(F.col("src").cast("string"), F.col("dst").cast("string"))
    frontier = (
        sources.select(F.col("url").cast("string").alias("source"))
        .distinct()
        .select("source", F.col("source").alias("url"))
        .withColumn("dist", F.lit(0).cast("int"))
        .localCheckpoint(eager=True)
    )
    levels = [frontier]
    settled = frontier.select("source", "url")
    for d in range(1, max_depth + 1):
        nxt = (
            frontier.join(e, frontier["url"] == e["src"])
            .select("source", F.col("dst").alias("url"))
            .distinct()
            .join(settled, ["source", "url"], "left_anti")
            .withColumn("dist", F.lit(d).cast("int"))
            .localCheckpoint(eager=True)
        )
        if nxt.isEmpty():
            break
        levels.append(nxt)
        settled = settled.union(nxt.select("source", "url"))
        frontier = nxt
    out = levels[0]
    for lv in levels[1:]:
        out = out.unionByName(lv)
    return out.select("source", "url", "dist")


def closeness_sample(
    edges: DataFrame,
    sources: DataFrame,
    max_depth: int = 10,
) -> DataFrame:
    """Exact (depth-capped) out-closeness for a SAMPLE of source vertices:
    (source, n_reached, total_dist, closeness) with
    ``closeness = n_reached / total_dist`` over the vertices reached in
    1..max_depth hops (Bavelas 1950 form, reachable-only — the convention
    for disconnected graphs; Wasserman-Faust rescaling is a caller-side
    multiply). NULL when the source reaches nothing.

    This is the exact-landmark complement to the HyperBall estimate
    (hyperball.harmonic_centrality): run it on a deterministic vertex
    sample to calibrate/validate the sketch, or on a handful of hub pages
    where exact values matter. Cost = one multi-source BFS + one
    source-keyed rollup.
    """
    d = multi_source_distance(edges, sources, max_depth=max_depth)
    reached = d.where(F.col("dist") > 0)
    return (
        d.select("source")
        .distinct()
        .join(
            reached.groupBy("source").agg(
                F.count(F.lit(1)).cast("long").alias("n_reached"),
                F.sum("dist").cast("long").alias("total_dist"),
            ),
            "source",
            "left",
        )
        .select(
            "source",
            F.coalesce(F.col("n_reached"), F.lit(0)).cast("long").alias("n_reached"),
            F.coalesce(F.col("total_dist"), F.lit(0)).cast("long").alias("total_dist"),
            F.when(
                F.col("total_dist") > 0,
                F.round(
                    F.col("n_reached").cast("double")
                    / F.col("total_dist").cast("double"),
                    9,
                ),
            ).alias("closeness"),
        )
    )
