"""HITS (Kleinberg 1999): hub and authority scores over a directed link graph.

The reference implements only PageRank (reference pagerank.py:122-172); HITS
is the other classic link-analysis fixpoint a web-scale engine is expected to
answer, so it rides the same join-agg machinery as operators/pagerank.py:

    a_k(v) = sum over edges (u, v) of h_{k-1}(u);   a_k /= ||a_k||_2
    h_k(u) = sum over edges (u, v) of a_k(v);       h_k /= ||h_k||_2

(the classic immediate-update order: authorities from the PREVIOUS hubs,
hubs from the CURRENT authorities). Edges are DISTINCT (0/1 adjacency, the
textbook formulation — multi-edges do not multiply influence).

Scale shape, mirroring pagerank.py's policy: the score vector is
vertex-sized, so it broadcasts while small and the distinct edge set — the
big side — never moves; each half-iteration is one broadcast join + one
partial-aggregated groupBy. At cluster scale (vertices too big to
broadcast), drop the hint and both joins shuffle on their keys against an
edge table persisted hash-partitioned by src — the same layout
graph_build.LinkGraph already maintains for PageRank.

Deterministic for a fixed ``iterations``, so the DuckDB oracle is the same
recurrence unrolled (no convergence-epsilon cross-engine coupling).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _l2_normalized(scores: DataFrame, col: str) -> DataFrame:
    l2 = scores.agg(F.sqrt(F.sum(F.col(col) * F.col(col)))).first()[0]
    if not l2 or l2 <= 0:
        return scores
    return scores.withColumn(col, F.col(col) / F.lit(float(l2)))


def hits(
    edges: DataFrame,
    iterations: int = 2,
    src_col: str = "src",
    dst_col: str = "dst",
    broadcast_scores: bool = True,
) -> DataFrame:
    """(url, hub, authority) after ``iterations`` full HITS rounds, both
    scores L2-normalized, 6dp-rounded. Vertices never receiving mass score 0.

    ``broadcast_scores``: hint the vertex-sized score vector as the build
    side of each join (right while it fits an executor; pass False at
    cluster scale to let both sides shuffle on the persisted edge layout)."""
    if iterations < 1:
        raise ValueError("hits() needs iterations >= 1")
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).distinct()
    e.persist()
    verts = e.select(F.col("src").alias("url")).union(
        e.select(F.col("dst").alias("url"))
    ).distinct()
    n = verts.count()
    if n == 0:  # empty edge set: empty result, not a ZeroDivisionError
        e.unpersist()
        return verts.select(
            "url", F.lit(0.0).alias("hub"), F.lit(0.0).alias("authority")
        )
    h = verts.withColumn("h", F.lit(1.0 / float(n) ** 0.5))

    maybe_bc = F.broadcast if broadcast_scores else (lambda df: df)
    a = None
    for _ in range(iterations):
        # authorities from previous hubs. Eager checkpoint BEFORE the norm
        # agg so the join computes once: the norm's .first() then reads the
        # materialized blocks and the normalization is a projection on them.
        a = (
            e.join(maybe_bc(h.withColumnRenamed("url", "src")), "src")
            .groupBy("dst")
            .agg(F.sum("h").alias("a"))
            .withColumnRenamed("dst", "url")
        )
        a = verts.join(a, "url", "left").fillna(0.0, ["a"])
        a = _l2_normalized(a.localCheckpoint(eager=True), "a")
        # hubs from current authorities
        h = (
            e.join(maybe_bc(a.withColumnRenamed("url", "dst")), "dst")
            .groupBy("src")
            .agg(F.sum("a").alias("h"))
            .withColumnRenamed("src", "url")
        )
        h = verts.join(h, "url", "left").fillna(0.0, ["h"])
        h = _l2_normalized(h.localCheckpoint(eager=True), "h")
    out = (
        verts.join(h, "url", "left")
        .join(a, "url", "left")
        .select(
            "url",
            F.round(F.coalesce("h", F.lit(0.0)), 6).alias("hub"),
            F.round(F.coalesce("a", F.lit(0.0)), 6).alias("authority"),
        )
        .localCheckpoint(eager=True)  # materialize while e is still cached
    )
    e.unpersist()
    return out
