"""Degree-ordered triangle counting (Suri & Vassilvitskii, WWW 2011 /
Schank's compact-forward).

Orient each undirected edge from the lower-(degree, id) endpoint to the
higher; every triangle is then counted exactly once as a wedge at its
lowest-rank vertex closed by an oriented edge. Degree-ordering caps the
out-degree of hub vertices at O(sqrt(m)), which is what bounds the wedge
explosion (and hence shuffle skew) on power-law web graphs; AQE skew-join
splitting covers the residual tail.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _undirected(edges: DataFrame) -> DataFrame:
    """Distinct undirected simple edges as (a, b) with a < b."""
    return (
        edges.select(
            F.least(F.col("src"), F.col("dst")).alias("a"),
            F.greatest(F.col("src"), F.col("dst")).alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
    )


def _oriented(edges: DataFrame, broadcast_deg: bool | None = None):
    """(oriented, und, deg): edges oriented low-(degree,id) ->
    high-(degree,id) as (u, v, dv), the persisted undirected simple edge
    set, and the vertex degree table (x, d) over it."""
    und = _undirected(edges).persist()
    deg_plain = (
        und.select(F.col("a").alias("x"))
        .union(und.select(F.col("b").alias("x")))
        .groupBy("x")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    # the degree table is vertex-sized; broadcast keeps the edge table in place
    if broadcast_deg is None:
        broadcast_deg = deg_plain.count() < 10_000_000
    deg = F.broadcast(deg_plain) if broadcast_deg else deg_plain
    e = (
        und.join(deg.withColumnRenamed("x", "a").withColumnRenamed("d", "da"), "a")
        .join(deg.withColumnRenamed("x", "b").withColumnRenamed("d", "db"), "b")
    )
    a_first = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    out = e.select(
        F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("v"),
        F.when(a_first, F.col("db")).otherwise(F.col("da")).alias("dv"),
    )
    return out, und, deg_plain


def triangle_count(
    edges: DataFrame, per_vertex: bool = False, with_degree: bool = False
) -> DataFrame:
    """Global count as a 1-row DataFrame (n_triangles), or per-vertex
    (url, triangles) when ``per_vertex`` — vertices in no triangle get 0.
    ``with_degree`` (per-vertex only) adds the undirected simple degree as
    (url, degree, triangles), letting clustering_coefficients reuse the
    degree aggregate this function already computes.

    Cache hygiene: intermediates are persisted only for the duration of the
    call — the result is materialized here (tiny global row via collect;
    per-vertex table via eager localCheckpoint) and the persisted edge sets
    released before returning, so a session composing many reports never
    accumulates CacheManager entries (see plans/caching.py)."""
    from pagerank_spark.plans.caching import checkpoint_release, collect_release

    oriented, und, deg = _oriented(edges)
    o = oriented.persist()
    e1 = o.select(F.col("u"), F.col("v").alias("v1"), F.col("dv").alias("d1"))
    e2 = o.select(F.col("u"), F.col("v").alias("v2"), F.col("dv").alias("d2"))
    wedges = e1.join(e2, "u").where(
        (F.col("d1") < F.col("d2"))
        | ((F.col("d1") == F.col("d2")) & (F.col("v1") < F.col("v2")))
    )
    closing = o.select(F.col("u").alias("v1"), F.col("v").alias("v2"))
    tris = wedges.join(closing, ["v1", "v2"]).select("u", "v1", "v2")

    if not per_vertex:
        out = tris.agg(F.count(F.lit(1)).alias("n_triangles"))
        return collect_release(out, (und, o))
    per = (
        tris.select(F.col("u").alias("url"))
        .union(tris.select(F.col("v1").alias("url")))
        .union(tris.select(F.col("v2").alias("url")))
        .groupBy("url")
        .agg(F.count(F.lit(1)).alias("triangles"))
    )
    # deg already enumerates every vertex of the undirected simple graph
    verts = deg.select(F.col("x").alias("url"), F.col("d").alias("degree"))
    cols = ["url", "degree"] if with_degree else ["url"]
    out = (
        verts.join(per, "url", "left")
        .select(*cols, F.coalesce(F.col("triangles"), F.lit(0)).alias("triangles"))
    )
    return checkpoint_release(out, (und, o))
