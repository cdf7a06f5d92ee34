"""PageRank v2: CSR-blocked Arrow SpMV (input_hint mandate).

Identical math to operators/pagerank.py (reference pagerank.py:122-172); the
SpMV changes from a JVM join+agg into block-local NumPy/pandas kernels:

  * vertices get dense ids once (zipWithIndex — no driver-side collect)
  * edges are bucketed by src-block = sid % B and pre-sorted by (sid, did);
    within a block the (sid-sorted runs == CSR row pointers) let the kernel
    run as vectorized merges/segment-sums, never a Python row loop
  * per iteration, a COGROUP of (edges block, rank block) feeds
    applyInPandas: contribs = weight * x[sid], segment-summed by did inside
    the block (Arrow in, Arrow out), then one JVM groupBy(did) combines
    partial sums across blocks
  * per-iteration scalars come from the same fused aggregate as v1

At cluster scale each block holds ~|E|/B edges; x enters a block as the
(block-sized) slice of the rank vector, so nothing driver-sized or
vertex-count-sized ever materializes on one node.

Cross-check test: must equal v1 (and the NumPy oracle) to 1e-6 per vertex.
"""

from __future__ import annotations

import math
import time

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _with_ids(graph):
    """(url, vid) via zipWithIndex (scale-safe dense ids; the reference's
    first-encounter interning order only affects tie-break, not values)."""
    rdd = graph.vertices.select("url").rdd.map(lambda r: r[0]).zipWithIndex()
    return graph.vertices.sparkSession.createDataFrame(rdd, ["url", "vid"])


def pagerank_csr(
    graph,
    alpha: float = 0.85,
    v_df: DataFrame | None = None,
    max_iterations: int = 1000,
    epsilon: float = 1e-6,
    num_blocks: int | None = None,
    metrics: list | None = None,
) -> DataFrame:
    """Return (url, rank) — same contract as operators.pagerank.pagerank."""
    spark = graph.edges.sparkSession
    B = num_blocks or graph.num_partitions
    n = graph.num_vertices()

    ids = _with_ids(graph).persist()

    edges_i = (
        graph.edges
        .join(ids.select(F.col("url").alias("src"), F.col("vid").alias("sid")), "src")
        .join(ids.select(F.col("url").alias("dst"), F.col("vid").alias("did")), "dst")
        .select("sid", "did", "weight", F.pmod(F.col("sid"), F.lit(B)).alias("block"))
        .sortWithinPartitions("block", "sid", "did")
        .repartition(B, "block")
        .persist()
    )
    edges_i.count()

    # dangling flags + personalization on vid keys
    srcs = edges_i.select(F.col("sid").alias("vid")).distinct()
    base = ids.join(srcs.withColumn("_nd", F.lit(1)), "vid", "left").select(
        "url",
        "vid",
        F.when(F.col("_nd").isNull(), 1.0).otherwise(0.0).alias("dangling"),
    )
    if v_df is None:
        base = base.withColumn("v", F.lit(1.0 / math.sqrt(n)))
    else:
        l2 = v_df.agg(F.sqrt(F.sum(F.col("v") * F.col("v")))).first()[0]
        base = (
            base.join(v_df, "url", "left")
            .fillna(0.0, ["v"])
            .withColumn("v", F.col("v") / F.lit(float(l2)))
        )
    x = (
        base.withColumn("rank", F.lit(1.0 / math.sqrt(n)))
        .repartition(B, "vid")
        .localCheckpoint(eager=True)
    )
    dangling_mass = x.agg(F.sum(F.col("rank") * F.col("dangling"))).first()[0] or 0.0

    def spmv_block(key, edges_pd: pd.DataFrame, ranks_pd: pd.DataFrame) -> pd.DataFrame:
        # block-local kernel: vectorized pandas/NumPy only
        if edges_pd.empty or ranks_pd.empty:
            return pd.DataFrame({"did": pd.Series(dtype="int64"),
                                 "c": pd.Series(dtype="float64")})
        m = edges_pd.merge(
            ranks_pd[["vid", "rank"]], left_on="sid", right_on="vid", how="inner"
        )
        c = m["weight"].to_numpy() * m["rank"].to_numpy()
        out = pd.DataFrame({"did": m["did"].to_numpy(), "c": c})
        return out.groupby("did", as_index=False, sort=False)["c"].sum()

    prev_ck = x
    for it in range(max_iterations):
        t0 = time.monotonic()
        q = alpha * dangling_mass + (1.0 - alpha)

        xb = x.select("vid", "rank", F.pmod(F.col("vid"), F.lit(B)).alias("block"))
        contribs = (
            edges_i.groupby("block")
            .cogroup(xb.groupby("block"))
            .applyInPandas(spmv_block, schema="did long, c double")
            .groupBy("did")
            .agg(F.sum("c").alias("_c"))
        )
        new = (
            x.join(contribs, x.vid == contribs.did, "left")
            .select(
                x.url,
                x.vid,
                x.v,
                x.dangling,
                (F.lit(alpha) * F.coalesce(F.col("_c"), F.lit(0.0)) + F.lit(q) * x.v).alias("_xun"),
                x.rank.alias("_prev"),
            )
            .repartition(B, "vid")
            .localCheckpoint(eager=True)
        )
        s = new.agg(
            F.sum(F.col("_xun") * F.col("_xun")).alias("s2"),
            F.sum(F.col("_xun") * F.col("_prev")).alias("sp"),
            F.sum(F.col("_xun") * F.col("dangling")).alias("sd"),
        ).first()
        norm = math.sqrt(s["s2"])
        residual = math.sqrt(max(0.0, 2.0 - 2.0 * s["sp"] / norm))
        dangling_mass = (s["sd"] or 0.0) / norm

        x = new.select(
            "url", "vid", "v", "dangling", (F.col("_xun") / F.lit(norm)).alias("rank")
        )
        if metrics is not None:
            metrics.append(
                {"iteration": it, "residual": residual, "norm": norm,
                 "dangling_mass": dangling_mass, "wall_s": time.monotonic() - t0}
            )
        prev_ck.unpersist()
        prev_ck = new
        if residual < epsilon:
            break

    result = x.select("url", "rank")
    out = result.localCheckpoint(eager=True)
    prev_ck.unpersist()
    edges_i.unpersist()
    ids.unpersist()
    return out
