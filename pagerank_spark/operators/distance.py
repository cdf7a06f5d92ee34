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


def betweenness_sample(
    edges: DataFrame,
    sources: DataFrame,
    max_depth: int = 10,
) -> DataFrame:
    """Sampled betweenness centrality: (url, betweenness) — Brandes (2001)
    dependency accumulation over the exact shortest-path DAGs of a SOURCE
    SAMPLE, depth-capped — the pivot/landmark estimator of Brandes-Pich
    2007 (k pivots cost k BFS sweeps instead of |V|; scores are the raw
    dependency sums over the sample, unnormalized). The one classic
    centrality the engine lacked next to PageRank/Katz/HITS/closeness:
    "which pages sit ON the shortest click-paths" rather than "which pages
    get linked".

    Forward pass: level-synchronous BFS with (source, url)-keyed state
    (the multi_source_distance skeleton) carrying sigma = #shortest paths —
    exact BIGINTs, aggregated with one partial-agg SUM per level instead of
    a distinct. Backward pass: levels processed deepest-first;
    delta(u) = sum over DAG successors v of sigma_u/sigma_v * (1+delta_v),
    one hash equi-join against the edge table and one against the
    (level d+1, delta) table per level, every level localCheckpoint-ed
    (flat lineage both directions). betweenness(v) = sum of delta(s, v)
    over the sample, v != s (level-0 rows excluded).

    Determinism contract for the DuckDB twin: sigma is exact integer
    arithmetic; each delta contribution is a fixed IEEE expression of
    exact sigmas and the previous level's quantized delta, ROUND(…,9) then
    DECIMAL-summed (order-independent), so every level — and the final
    per-url sum — is bit-identical across engines; output rounded 6 dp.

    Parallel edges are deduplicated (sigma counts paths in the simple
    digraph); self-loops never lie on a shortest path and are dropped by
    the settled-set anti-join.
    """
    if max_depth < 0:
        raise ValueError("max_depth must be >= 0")
    e = (
        edges.select(F.col("src").cast("string"), F.col("dst").cast("string"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    frontier = (
        sources.select(F.col("url").cast("string").alias("source"))
        .distinct()
        .select("source", F.col("source").alias("url"))
        .withColumn("sigma", F.lit(1).cast("bigint"))
        .localCheckpoint(eager=True)
    )
    levels = [frontier]
    settled = frontier.select("source", "url")
    for _d in range(1, max_depth + 1):
        nxt = (
            frontier.join(e, frontier["url"] == e["src"])
            .select("source", F.col("dst").alias("url"), "sigma")
            .join(settled, ["source", "url"], "left_anti")
            .groupBy("source", "url")
            .agg(F.sum("sigma").cast("bigint").alias("sigma"))
            .localCheckpoint(eager=True)
        )
        if nxt.isEmpty():
            break
        levels.append(nxt)
        settled = settled.union(nxt.select("source", "url"))
        frontier = nxt
    depth = len(levels) - 1
    zero = F.lit(0).cast("decimal(28,9)")
    if depth == 0:
        return levels[0].select(
            "url", F.lit(0.0).alias("betweenness")
        ).where(F.lit(False))
    deltas = {
        depth: levels[depth].select("source", "url", "sigma", zero.alias("delta"))
    }
    for d in range(depth - 1, 0, -1):
        up = levels[d]
        vn = deltas[d + 1]
        contrib = (
            up.alias("u")
            .join(e.alias("ed"), F.col("u.url") == F.col("ed.src"))
            .join(
                vn.alias("v"),
                (F.col("v.source") == F.col("u.source"))
                & (F.col("v.url") == F.col("ed.dst")),
            )
            .select(
                F.col("u.source").alias("source"),
                F.col("u.url").alias("url"),
                F.round(
                    (F.col("u.sigma").cast("double") / F.col("v.sigma").cast("double"))
                    * (F.lit(1.0) + F.col("v.delta").cast("double")),
                    9,
                )
                .cast("decimal(28,9)")
                .alias("c"),
            )
            .groupBy("source", "url")
            .agg(F.sum("c").alias("sd"))
        )
        deltas[d] = (
            up.join(contrib, ["source", "url"], "left")
            .select(
                "source",
                "url",
                "sigma",
                F.coalesce(F.col("sd").cast("decimal(28,9)"), zero).alias("delta"),
            )
            .localCheckpoint(eager=True)
        )
    out = deltas[1].select("url", "delta")
    for d in range(2, depth + 1):
        out = out.unionByName(deltas[d].select("url", "delta"))
    return out.groupBy("url").agg(
        F.round(F.sum("delta").cast("double"), 6).alias("betweenness")
    )


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


def distance_histogram(
    edges, sources, max_depth: int = 8
):
    """(dist, n_pairs) — the exact distance distribution from the
    ``sources`` landmark set (one row per BFS depth 0..``max_depth``
    that has any pair): the small-multiple view behind mean/median
    distance and the exact calibrator for HyperBall's estimated
    neighborhood function. One tiny rollup over
    :func:`multi_source_distance`'s (source, url, dist) rows — the BFS
    cost structure (frontier-sized shuffles, per-level checkpoint) is
    inherited unchanged."""
    from pyspark.sql import functions as F

    d = multi_source_distance(edges, sources, max_depth=max_depth)
    return (
        d.groupBy(F.col("dist").cast("long").alias("dist"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_pairs"))
    )
