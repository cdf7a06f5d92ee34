"""PageRank v2: CSR-blocked Arrow SpMV (input_hint mandate).

Identical math to operators/pagerank.py (reference pagerank.py:122-172); the
SpMV changes from a JVM join+agg into block-local NumPy kernels.

Design — why this shape survives scale:

  * vertices get int64 ids JVM-side (monotonically_increasing_id, frozen by
    an eager localCheckpoint) — no RDD lambda, no Python on the id path.
  * the edge table is written ONCE at build time as per-block parquet
    (partitionBy(block), block = hash(sid) mod B). Each Python worker lazily
    reads the blocks it is assigned, preprocesses them into CSR-style arrays
    (np.unique-factorized src/dst codes + aligned weights) and CACHES them in
    worker memory — Spark reuses Python workers across tasks, so iterations
    after the first do ZERO edge deserialization. This is the piece a naive
    cogroup design gets wrong: shipping the edge table JVM→Python every
    iteration costs O(|E|) Arrow traffic per iteration and dominates wall
    time from ~4M edges up (measured 4.7x slower than v1 at 4M edges;
    with the worker cache the per-iteration transfer is vertex-sized).
  * per iteration, applyInPandas over the rank blocks only: gather
    x[sid] via one searchsorted per block, contribs = weight * x[sid],
    segment-sum by dst code with np.bincount (true vectorized segment-sum),
    then one JVM groupBy(did) combines partial sums across blocks and an
    exchange-free SortMergeJoin (both sides hash(vid/did, B)) folds them
    into the next vector.
  * one Spark job per iteration: the new vector is a LAZY localCheckpoint
    that materializes during the fused stats aggregate (same trick as v1).
  * AQE is off for the loop: the plan is static and AQE's post-shuffle
    coalescing would break the hash(vid, B) alignment of the contribs join.

``scratch_dir``: where the per-block parquet lives. Defaults to a local
tempdir (correct for local[*] and single-node). On a multi-executor cluster
pass a path on shared storage (HDFS/S3/NFS) visible to executors; each
executor still reads each of its blocks once and serves the rest of the run
from worker memory.

Cross-check test: must equal v1 (and the NumPy oracle) to 1e-6 per vertex.
"""

from __future__ import annotations

import glob
import math
import os
import shutil
import tempfile
import time

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# worker-side block cache: survives across tasks because Spark reuses Python
# workers (spark.python.worker.reuse=true, the default). Keyed by scratch dir
# so a new pagerank_csr call evicts the previous run's arrays.
_BLOCK_CACHE: dict = {"dir": None, "blocks": {}}


def _load_block(scratch: str, block: int):
    if _BLOCK_CACHE["dir"] != scratch:
        _BLOCK_CACHE["dir"] = scratch
        _BLOCK_CACHE["blocks"] = {}
    if block not in _BLOCK_CACHE["blocks"]:
        import pyarrow.parquet as pq

        files = sorted(glob.glob(os.path.join(scratch, f"block={block}", "*.parquet")))
        if not files:
            _BLOCK_CACHE["blocks"][block] = None
        else:
            t = pq.read_table(files, columns=["sid", "did", "weight"])
            sid = t["sid"].to_numpy()
            did = t["did"].to_numpy()
            w = t["weight"].to_numpy()
            # CSR-style factorization: sorted unique ids + int32 codes
            sid_u, sid_codes = np.unique(sid, return_inverse=True)
            did_u, did_codes = np.unique(did, return_inverse=True)
            _BLOCK_CACHE["blocks"][block] = (
                sid_u, sid_codes.astype(np.int32),
                did_u, did_codes.astype(np.int32),
                np.ascontiguousarray(w, dtype=np.float64),
            )
    return _BLOCK_CACHE["blocks"][block]


def _make_spmv_kernel(scratch: str):
    def spmv(pdf: pd.DataFrame) -> pd.DataFrame:
        if pdf.empty:
            return pd.DataFrame({"did": pd.Series(dtype="int64"),
                                 "c": pd.Series(dtype="float64")})
        blk = _load_block(scratch, int(pdf["block"].iloc[0]))
        if blk is None:
            return pd.DataFrame({"did": pd.Series(dtype="int64"),
                                 "c": pd.Series(dtype="float64")})
        sid_u, sid_codes, did_u, did_codes, w = blk
        vids = pdf["vid"].to_numpy()
        x = pdf["rank"].to_numpy()
        order = np.argsort(vids)
        # every sid in the block hashes to this block, as does its rank row
        x_u = x[order][np.searchsorted(vids[order], sid_u)]
        contrib = w * x_u[sid_codes]
        sums = np.bincount(did_codes, weights=contrib, minlength=len(did_u))
        return pd.DataFrame({"did": did_u, "c": sums})

    return spmv


def _with_ids(graph) -> DataFrame:
    """(url, vid) — JVM-side unique int64 ids, frozen by an eager checkpoint
    (monotonically_increasing_id is deterministic only for a materialized
    partition layout). Ids need not be dense: blocks key off hash(vid)."""
    return (
        graph.vertices.select("url")
        .withColumn("vid", F.monotonically_increasing_id())
        .localCheckpoint(eager=True)
    )


def _block_of(col, num_blocks: int):
    return F.pmod(F.xxhash64(col), F.lit(num_blocks))


def pagerank_csr(
    graph,
    alpha: float = 0.85,
    v_df: DataFrame | None = None,
    max_iterations: int = 1000,
    epsilon: float = 1e-6,
    num_blocks: int | None = None,
    metrics: list | None = None,
    scratch_dir: str | None = None,
) -> DataFrame:
    """Return (url, rank) — same contract as operators.pagerank.pagerank."""
    spark = graph.edges.sparkSession
    B = num_blocks or graph.num_partitions
    n = graph.num_vertices()

    aqe_was = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    scratch = scratch_dir or tempfile.mkdtemp(prefix="pagerank_csr_blocks_")
    own_scratch = scratch_dir is None
    try:
        return _iterate_csr(
            graph, alpha, v_df, max_iterations, epsilon, B, n, metrics, scratch
        )
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", aqe_was)
        if own_scratch:
            shutil.rmtree(scratch, ignore_errors=True)


def _iterate_csr(
    graph, alpha, v_df, max_iterations, epsilon, B, n, metrics, scratch
) -> DataFrame:
    ids = _with_ids(graph)

    # one-time spill of the id-encoded edge table, partitioned by block;
    # Python workers read each block once and cache the CSR arrays
    (
        graph.edges
        .join(ids.select(F.col("url").alias("src"), F.col("vid").alias("sid")), "src")
        .join(ids.select(F.col("url").alias("dst"), F.col("vid").alias("did")), "dst")
        .select("sid", "did", "weight", _block_of(F.col("sid"), B).alias("block"))
        .write.partitionBy("block").mode("overwrite").parquet(scratch)
    )
    spmv = _make_spmv_kernel(scratch)

    # dangling flags + personalization on vid keys
    srcs = (
        graph.edges.select(F.col("src").alias("url")).distinct()
        .join(ids, "url").select(F.col("vid"))
    )
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

    prev_ck = x
    for it in range(max_iterations):
        t0 = time.monotonic()
        q = alpha * dangling_mass + (1.0 - alpha)

        xb = x.select("vid", "rank", _block_of(F.col("vid"), B).alias("block"))
        contribs = (
            xb.groupby("block")
            .applyInPandas(spmv, schema="did long, c double")
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
            # no repartition: the left join preserves x's hash(vid, B) layout
            # (contribs arrives hash(did, B) from its groupBy), and
            # localCheckpoint carries the partitioning into the next iteration
            .localCheckpoint(eager=False)  # materializes in the stats job below
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
    return out
