"""PageRank v2: CSR-blocked Arrow SpMV (input_hint mandate).

Identical math to operators/pagerank.py (reference pagerank.py:122-172); the
SpMV changes from a JVM join+agg into block-local NumPy kernels.

Design — why this shape survives scale:

  * vertex ids are DETERMINISTIC 64-bit hashes of the url (xxhash64, salted
    on the astronomically-rare collision, checked with one vertex-sized
    aggregate). Pure projection — encoding the edge table needs NO join at
    all (the previous design's double edges-join-ids was the dominant setup
    cost at bench scale), and resumed runs are bit-exact because the ids are
    a function of the data, not of a run-specific partition layout.
  * the edge table is spilled ONCE per graph as per-block parquet
    (block = pmod(sid, B)), one file per block (repartition(B, 'block')
    before the write). Each Python worker lazily reads the blocks it is
    assigned, preprocesses them into CSR-style arrays (np.unique-factorized
    src/dst codes + aligned weights) and CACHES them in worker memory —
    Spark reuses Python workers across tasks, so iterations after the first
    do ZERO edge deserialization. This is the piece a naive cogroup design
    gets wrong: shipping the edge table JVM→Python every iteration costs
    O(|E|) Arrow traffic per iteration and dominates wall time from ~4M
    edges up (measured 4.7x slower than v1 at 4M edges; with the worker
    cache the per-iteration transfer is vertex-sized).
  * the spill lives in a fresh run-<uuid> directory every time it happens,
    so the worker cache key (the spill path) can never serve a previous
    graph's arrays, and it is recorded on the LinkGraph — repeated
    pagerank_csr calls on the same graph (e.g. per-query personalization)
    reuse both the parquet and the already-warm worker caches.
  * a _MANIFEST.json is written AFTER the parquet spill completes; workers
    REFUSE to treat a block as empty unless they can read the manifest, so
    an unreadable/unshared scratch path (the silent-teleport-vector failure
    mode) raises instead of converging to garbage. All worker-side I/O goes
    through pyarrow.fs, so an HDFS/S3 scratch_dir works wherever pyarrow has
    the filesystem bindings.
  * per iteration, applyInPandas over the rank blocks only: gather x[sid]
    via one searchsorted per block, contribs = weight * x[sid], segment-sum
    by dst code with np.bincount (true vectorized segment-sum), then one JVM
    aggregation combines partial sums across blocks and an exchange-free
    join (both sides hash-partitioned to B on the vertex id) folds them into
    the next vector.
  * one Spark job per iteration: the new vector is a LAZY localCheckpoint
    that materializes during the fused stats aggregate (same trick as v1).
  * the plan is pinned per-query, not via session conf: the contribs
    aggregation rides an explicit repartition(B, 'did') (AQE preserves
    user-specified partition counts) and the contribs fold is hinted
    'merge' so AQE cannot rewrite the exchange-free join into a
    per-iteration broadcast.

``scratch_dir``: where the per-block parquet lives. Defaults to a local
tempdir (correct for local[*] and single-node). On a multi-executor cluster
pass a path on shared storage (HDFS/S3/NFS) visible to executors; each
executor still reads each of its blocks once and serves the rest of the run
from worker memory.

``checkpointer`` / ``x0_df``: same durable-resume and warm-start contract as
v1 (reference power_method(v, x0, ...), pagerank.py:122,142-145). Resume
re-derives the hash ids from the saved urls, so a killed job resumes
bit-exactly.

Cross-check test: must equal v1 (and the NumPy oracle) to 1e-6 per vertex.
"""

from __future__ import annotations

import json
import math
import os
import time
import uuid

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pagerank_spark.operators.pagerank import _init_state

# worker-side block cache: survives across tasks because Spark reuses Python
# workers (spark.python.worker.reuse=true, the default). Keyed by the spill
# path, which embeds a per-spill uuid — a stale key can never alias a new
# graph's data.
_BLOCK_CACHE: dict = {"dir": None, "blocks": {}}

_MANIFEST = "_MANIFEST.json"


def _fs_and_root(scratch: str):
    """pyarrow filesystem + normalized root path for a local or URI scratch."""
    from pyarrow import fs as pafs

    if "://" in scratch:
        return pafs.FileSystem.from_uri(scratch)
    return pafs.LocalFileSystem(), os.path.abspath(scratch)


def _read_manifest(scratch: str) -> dict:
    filesystem, root = _fs_and_root(scratch)
    try:
        with filesystem.open_input_stream(f"{root}/{_MANIFEST}") as f:
            return json.loads(f.read().decode("utf-8"))
    except Exception as e:
        raise RuntimeError(
            f"pagerank_csr scratch {scratch!r} has no readable {_MANIFEST}: "
            "either the edge spill did not complete, or this worker cannot "
            "see the scratch path (on a multi-executor cluster scratch_dir "
            "must be on shared storage reachable from every executor). "
            "Refusing to treat the block as empty."
        ) from e


def _load_block(scratch: str, block: int):
    if _BLOCK_CACHE["dir"] != scratch:
        # manifest first: distinguishes 'spill missing/unreadable' (raise)
        # from 'block genuinely empty' (no file for this block)
        manifest = _read_manifest(scratch)
        _BLOCK_CACHE["dir"] = scratch
        _BLOCK_CACHE["manifest"] = manifest
        _BLOCK_CACHE["blocks"] = {}
    if block not in _BLOCK_CACHE["blocks"]:
        import pyarrow.parquet as pq
        from pyarrow import fs as pafs

        filesystem, root = _fs_and_root(scratch)
        sel = pafs.FileSelector(f"{root}/block={block}", allow_not_found=True)
        files = sorted(
            i.path
            for i in filesystem.get_file_info(sel)
            if i.is_file and not i.base_name.startswith(("_", "."))
        )
        if not files:
            _BLOCK_CACHE["blocks"][block] = None
        else:
            t = pq.read_table(files, columns=["sid", "did", "weight"], filesystem=filesystem)
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


def _vid_expr(url_col, salt: int):
    """Deterministic 64-bit vertex id: pure function of the url, so edge
    encoding is a projection (no id join) and resume is bit-exact."""
    if salt == 0:
        return F.xxhash64(url_col)
    return F.xxhash64(url_col, F.lit(salt))


def _pick_salt(graph) -> int:
    """Find a salt whose xxhash64 is collision-free on this vertex set.

    One vertex-sized aggregate per attempt; salt 0 collides with probability
    ~n^2/2^65 (≈3e-11 at 1M urls), so the loop effectively never iterates —
    but at 10^12 urls a collision becomes plausible (~3%) and MUST be caught:
    a silent collision merges two vertices' ranks."""
    for salt in range(8):
        row = graph.vertices.agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct(_vid_expr(F.col("url"), salt)).alias("d"),
        ).first()
        if row["n"] == row["d"]:
            return salt
    raise RuntimeError("xxhash64(url) collided for 8 salts — data anomaly?")


def _block_of(col, num_blocks: int):
    return F.pmod(col, F.lit(num_blocks))


def _spill_blocks(graph, salt: int, B: int, scratch: str) -> None:
    """One-time spill of the hash-id-encoded edge table, one parquet file per
    block. Pure projection of the cached edge table + one shuffle on block.
    The manifest is written AFTER the parquet completes: its presence is the
    workers' proof that the spill is whole."""
    (
        graph.edges
        .select(
            _vid_expr(F.col("src"), salt).alias("sid"),
            _vid_expr(F.col("dst"), salt).alias("did"),
            "weight",
        )
        .withColumn("block", _block_of(F.col("sid"), B))
        .repartition(B, "block")
        .write.partitionBy("block").mode("overwrite").parquet(scratch)
    )
    filesystem, root = _fs_and_root(scratch)
    with filesystem.open_output_stream(f"{root}/{_MANIFEST}") as f:
        f.write(json.dumps({"num_blocks": B, "salt": salt, "version": 2}).encode("utf-8"))


def _csr_state(graph, B: int, scratch_dir: str | None) -> dict:
    """(salt, scratch) for this graph — spilled once, reused by later calls
    on the same LinkGraph (each spill gets a fresh run-<uuid> dir so worker
    caches can never serve stale arrays)."""
    state = getattr(graph, "_csr_state", None)
    if state is not None and state["B"] == B:
        return state
    salt = _pick_salt(graph)
    if scratch_dir is not None:
        scratch = scratch_dir.rstrip("/") + f"/run-{uuid.uuid4().hex[:12]}"
    else:
        import tempfile

        scratch = tempfile.mkdtemp(prefix="pagerank_csr_blocks_") + "/spill"
    _spill_blocks(graph, salt, B, scratch)
    state = {"B": B, "salt": salt, "scratch": scratch}
    graph._csr_state = state
    if hasattr(graph, "_register_cleanup"):
        local_root = None if "://" in scratch else os.path.dirname(os.path.abspath(scratch))

        def _cleanup():
            graph._csr_state = None
            if local_root:
                import shutil

                shutil.rmtree(local_root, ignore_errors=True)

        graph._register_cleanup(_cleanup)
    return state


def pagerank_csr(
    graph,
    alpha: float = 0.85,
    v_df: DataFrame | None = None,
    max_iterations: int = 1000,
    epsilon: float = 1e-6,
    num_blocks: int | None = None,
    metrics: list | None = None,
    scratch_dir: str | None = None,
    checkpointer=None,
    x0_df: DataFrame | None = None,
) -> DataFrame:
    """Return (url, rank) — same contract as operators.pagerank.pagerank,
    including durable checkpoint/resume and x0 warm start."""
    B = num_blocks or graph.num_partitions
    state = _csr_state(graph, B, scratch_dir)
    return _iterate_csr(
        graph, alpha, v_df, max_iterations, epsilon, B, metrics,
        state["scratch"], state["salt"], checkpointer, x0_df,
    )


def _iterate_csr(
    graph, alpha, v_df, max_iterations, epsilon, B, metrics, scratch, salt,
    checkpointer=None, x0_df=None,
) -> DataFrame:
    spmv = _make_spmv_kernel(scratch)
    vid = _vid_expr(F.col("url"), salt)

    start_iter = 0
    resumed = checkpointer.try_resume() if checkpointer is not None else None
    if resumed is not None:
        start_iter, x_saved, dangling_mass = resumed
        # saved state is keyed by url; the hash ids re-derive deterministically
        x = (
            x_saved.select("url", "v", "dangling", "rank")
            .withColumn("vid", vid)
            .repartition(B, "vid")
            .localCheckpoint(eager=True)
        )
    else:
        # same state builder as v1 (url, v, dangling, rank) + the hash id
        x = (
            _init_state(graph, v_df, x0_df)
            .withColumn("vid", vid)
            .repartition(B, "vid")
            .localCheckpoint(eager=True)
        )
        dangling_mass = x.agg(F.sum(F.col("rank") * F.col("dangling"))).first()[0] or 0.0

    prev_ck = x
    for it in range(start_iter, max_iterations):
        t0 = time.monotonic()
        q = alpha * dangling_mass + (1.0 - alpha)

        xb = x.select("vid", "rank", _block_of(F.col("vid"), B).alias("block"))
        contribs = (
            xb.groupby("block")
            .applyInPandas(spmv, schema="did long, c double")
            # explicit repartition: AQE preserves user partition counts, so
            # the aggregate runs exchange-free on top of it and stays aligned
            # with x's hash(vid, B) layout for the fold join below
            .repartition(B, "did")
            .groupBy("did")
            .agg(F.sum("c").alias("_c"))
        )
        new = (
            x.join(contribs.hint("merge"), x.vid == contribs.did, "left")
            .select(
                x.url,
                x.vid,
                x.v,
                x.dangling,
                (F.lit(alpha) * F.coalesce(F.col("_c"), F.lit(0.0)) + F.lit(q) * x.v).alias("_xun"),
                x.rank.alias("_prev"),
            )
            # no repartition: the left join preserves x's hash(vid, B) layout
            # (contribs arrives hash(did, B) from its aggregate), and
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
        if checkpointer is not None:
            x_out = x.select("url", "v", "dangling", "rank")
            saved = checkpointer.save(it, x_out, dangling_mass, residual)
            if saved is not x_out:
                # continue from the durable copy (lineage + memory bounded),
                # re-deriving the hash id from the url
                x = saved.withColumn("vid", vid).repartition(B, "vid")
        prev_ck.unpersist()
        prev_ck = new
        if residual < epsilon:
            break

    result = x.select("url", "rank")
    out = result.localCheckpoint(eager=True)
    prev_ck.unpersist()
    return out
