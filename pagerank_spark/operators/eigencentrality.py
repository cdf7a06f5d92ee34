"""Eigenvector centrality (Bonacich 1972) over the directed link graph —
the undamped principal-eigenvector score PageRank regularizes: x' =
A^T x / ||A^T x||_2, iterated from the uniform vector.

The reference ranks by the damped/normalized surfer eigenvector
(reference pagerank.py:140-168); raw eigenvector centrality completes
the spectral family next to katz (truncated path counting) and cheirank
(the transposed surfer): it weights a page by the centrality mass of its
in-linkers with NO out-degree normalization and NO teleport, so it
concentrates on the dominant link core — the classic "authority by
association" score, and the reason PageRank needs damping at all
(sources outside the core decay to exactly 0 here, which is itself a
useful "core membership" signal).

A FIXED iteration count keeps the score exactly reproducible in the
DuckDB oracle (the label_propagation3/katz convention). Cross-engine
bit-stability through the normalization: the iterate is 9dp-quantized
every round, so the SpMV sums 9dp DECIMALs exactly; the squared norm
sums 15dp-quantized squares in DECIMAL(38,15) (the cluster_quality
recipe); sqrt and the division are single IEEE-754 ops on identical
inputs. Scale shape: identical to the katz/PageRank-v1 loop — the
distinct edge table is hash-partitioned by ``src`` once and persisted,
each round shuffles only the vertex-sized score vector plus one
map-side-combined sum by ``dst`` and a 1-row norm aggregate broadcast
back; lineage is cut per round with an eager localCheckpoint.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def eigenvector_centrality(
    edges: DataFrame,
    iterations: int = 6,
    num_partitions: int | None = None,
) -> DataFrame:
    """(url, eig) after exactly ``iterations`` synchronous power steps
    from the uniform unit vector over the DISTINCT directed edge set
    (multi-edges collapse — adjacency, not multiplicity). Vertices with
    no inbound path from the dominant core decay to 0.0; if the whole
    vector reaches 0 (acyclic graph iterated past its depth) the zero
    vector is returned rather than a 0/0 artifact."""
    if iterations < 1:
        raise ValueError("iterations must be >= 1")
    e = (
        edges.select(
            F.col("src").cast("string").alias("src"),
            F.col("dst").cast("string").alias("dst"),
        )
        .distinct()
    )
    e = e.repartition(num_partitions, "src") if num_partitions else e.repartition("src")
    e = e.persist()
    verts = (
        e.select(F.col("src").alias("url"))
        .union(e.select(F.col("dst").alias("url")))
        .distinct()
        .persist()
    )
    n = verts.count()
    try:
        x = verts.withColumn(
            "x", F.round(F.lit(1.0) / F.sqrt(F.lit(float(n))), 9)
        ).localCheckpoint(eager=True)
        for _ in range(iterations):
            contrib = (
                e.join(x.withColumnRenamed("url", "src"), "src")
                .groupBy(F.col("dst").alias("url"))
                .agg(
                    F.sum(F.col("x").cast("decimal(38,9)"))
                    .cast("double")
                    .alias("_y")
                )
            )
            y = verts.join(contrib, "url", "left").select(
                "url", F.coalesce(F.col("_y"), F.lit(0.0)).alias("_y")
            )
            nrm = y.agg(
                F.sqrt(
                    F.sum(
                        F.round(F.col("_y") * F.col("_y"), 15).cast("decimal(38,15)")
                    ).cast("double")
                ).alias("_n")
            )
            x = (
                y.crossJoin(F.broadcast(nrm))
                .select(
                    "url",
                    F.when(
                        F.col("_n") > 0, F.round(F.col("_y") / F.col("_n"), 9)
                    )
                    .otherwise(F.lit(0.0))
                    .alias("x"),
                )
                .localCheckpoint(eager=True)
            )
        return x.select("url", F.col("x").alias("eig"))
    finally:
        e.unpersist()
        verts.unpersist()
