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
