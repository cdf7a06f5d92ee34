"""Structured Streaming ingest: incremental link extraction + windowed stats.

The reference is batch-only (a one-shot CSV load, pagerank.py:38-49); a
web-scale crawl is not — pages arrive continuously. This module keeps the
edge table incrementally maintained with exactly-once file-sink semantics:

  pages_stream (readStream over the Iceberg-shaped pages layout)
    -> Arrow pandas-UDF link extraction (same extractor as batch — one spec)
    -> append to the partitioned edge-log parquet sink (checkpointed)

Aggregations over the edge log (degree counts, etc.) run either as a
follow-up batch job or as a streaming windowed aggregation with a watermark
for late-arriving pages (warc_ts is the event time).

Rank/label vectors are NOT maintained incrementally — PageRank is a global
fixpoint; the engine's cadence is stream-ingest continuously, re-run the
iterative jobs from the latest edge snapshot (resumable via
plans/checkpoint.py). foreach_batch_rebuild wires that cadence up.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("html", T.BinaryType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
    ]
)


def stream_pages(spark: SparkSession, input_dir: str, fmt: str = "parquet") -> DataFrame:
    """readStream over a growing directory of page files (Iceberg-shaped
    layout; swap for .format('iceberg') + streaming read on a real catalog)."""
    return (
        spark.readStream.format(fmt)
        .schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", 16)
        .load(input_dir)
    )


def extract_edges_stream(pages: DataFrame) -> DataFrame:
    """(src, dst, warc_ts) — one row per <a href>, via the SAME Arrow
    extractor as the batch path (functions/extract.py), so batch and
    streaming ingest can never diverge."""
    from pagerank_spark.functions.extract import extract_hrefs_udf

    return pages.select(
        F.col("url").alias("src"),
        F.explode(extract_hrefs_udf(F.col("html"), F.col("url"))).alias("dst"),
        F.col("warc_ts"),
    )


def write_edge_log(
    edges: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    available_now: bool = False,
):
    """Append edges to a parquet edge log, exactly-once via the streaming
    file sink + checkpoint. Returns the StreamingQuery."""
    w = (
        edges.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        w = w.trigger(availableNow=True)
    return w.start()


def windowed_indegree(
    edges: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Streaming windowed in-degree per target url with late-data watermark
    on the crawl timestamp; emits (window, dst, in_degree)."""
    return (
        edges.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window), F.col("dst"))
        .agg(F.count(F.lit(1)).alias("in_degree"))
    )


def foreach_batch_rebuild(
    pages: DataFrame,
    checkpoint_dir: str,
    rebuild,
    available_now: bool = False,
):
    """Micro-batch cadence for global algorithms: per trigger, hand the new
    page batch to ``rebuild(batch_df, batch_id)`` (e.g. append edges then
    kick a PageRank refresh from plans/checkpoint.py). Returns the query."""
    w = (
        pages.writeStream.foreachBatch(rebuild)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        w = w.trigger(availableNow=True)
    return w.start()


def resolve_latest(ranks_dir: str) -> str | None:
    """Path of the currently published rank vector, or None if none yet.

    Manifest pointer (``LATEST.json``) is consulted first so mixed-mode dirs
    prefer the atomic pointer; falls back to the legacy ``latest/`` dir."""
    import json
    import os

    manifest = os.path.join(ranks_dir, "LATEST.json")
    if os.path.exists(manifest):
        with open(manifest) as f:
            p = os.path.join(ranks_dir, json.load(f)["version_dir"])
        if os.path.exists(p):
            return p
    latest = os.path.join(ranks_dir, "latest")
    return latest if os.path.exists(latest) else None


def publish_ranks(ranks: DataFrame, ranks_dir: str, publish_mode: str = "manifest") -> str:
    """Durably publish a rank vector under ``ranks_dir``; returns its path.

    ``publish_mode='manifest'`` (default — object-store-safe): write into a
    fresh versioned dir ``v<N>/``, then atomically repoint ``LATEST.json`` at
    it via a single-object replace (os.replace on POSIX; on S3/GCS this maps
    to one PUT, which is atomic per object, unlike directory rename which is
    a non-atomic copy there). A reader going through ``resolve_latest`` never
    observes a missing or half-written table. The previous version is kept
    (a concurrent reader may still hold its path); older ones are pruned.

    ``publish_mode='rename'`` (legacy, local-FS only): write to ``_staging``
    and swap it into ``latest/`` with two renames. Each rename is POSIX-
    atomic but the PAIR is not: a reader can catch the instant between them,
    and a crash there leaves ``_old`` as the only copy. Stale ``_old`` from
    such a crash is cleared before the next swap so the swap itself cannot
    fail. Do not use on object stores."""
    import json
    import os
    import shutil

    os.makedirs(ranks_dir, exist_ok=True)
    if publish_mode == "manifest":
        versions = sorted(
            int(d[1:]) for d in os.listdir(ranks_dir)
            if d.startswith("v") and d[1:].isdigit()
        )
        vname = f"v{(versions[-1] + 1) if versions else 0}"
        ranks.write.mode("overwrite").parquet(os.path.join(ranks_dir, vname))
        tmp = os.path.join(ranks_dir, "LATEST.json.tmp")
        with open(tmp, "w") as f:
            json.dump({"version_dir": vname}, f)
        os.replace(tmp, os.path.join(ranks_dir, "LATEST.json"))
        for old_v in versions[:-1]:  # keep current + immediate predecessor
            shutil.rmtree(os.path.join(ranks_dir, f"v{old_v}"), ignore_errors=True)
        return os.path.join(ranks_dir, vname)
    if publish_mode != "rename":
        raise ValueError(f"unknown publish_mode {publish_mode!r}; use 'manifest' or 'rename'")
    latest = os.path.join(ranks_dir, "latest")
    tmp = os.path.join(ranks_dir, "_staging")
    old = os.path.join(ranks_dir, "_old")
    ranks.write.mode("overwrite").parquet(tmp)
    shutil.rmtree(old, ignore_errors=True)  # stale from a crashed prior swap
    if os.path.exists(latest):
        os.rename(latest, old)
    os.rename(tmp, latest)
    shutil.rmtree(old, ignore_errors=True)
    return latest


def pagerank_refresh(
    spark: SparkSession,
    edge_log_dir: str,
    ranks_dir: str,
    metrics: list | None = None,
    publish_mode: str = "manifest",
    impl: str = "joinagg",
    **pagerank_kwargs,
):
    """One PageRank refresh over the accumulated edge log, WARM-STARTED from
    the previously published rank vector (reference power_method's x0,
    pagerank.py:122,142-145) — on a steady crawl the spectrum barely moves
    between refreshes, so the warm start cuts iterations roughly in half.

    Reads the currently published vector (``resolve_latest``) as x0 when
    present and publishes the new one via ``publish_ranks(publish_mode)``.
    ``impl='csr'`` runs the refresh on the CSR/Arrow SpMV path (same
    checkpoint/x0 contract; pays a one-time spill per refresh graph, so it
    wins when refreshes iterate long — e.g. alpha near 1). Returns the
    published ranks DataFrame."""
    from pagerank_spark.operators.graph_build import LinkGraph

    edges = spark.read.parquet(edge_log_dir).select("src", "dst")
    graph = LinkGraph.from_edges(edges, **{
        k: v for k, v in pagerank_kwargs.items()
        if k in ("max_nnz", "filter_ratio", "apply_regex_filter", "num_partitions")
    })
    pr_kwargs = {
        k: v for k, v in pagerank_kwargs.items()
        if k not in ("max_nnz", "filter_ratio", "apply_regex_filter", "num_partitions")
    }
    prev = resolve_latest(ranks_dir)
    x0 = spark.read.parquet(prev) if prev else None
    if impl not in ("joinagg", "csr"):
        raise ValueError(f"unknown impl {impl!r}; use 'joinagg' or 'csr'")
    pr = graph.pagerank_csr if impl == "csr" else graph.pagerank
    ranks = pr(x0_df=x0, metrics=metrics, **pr_kwargs)
    published = publish_ranks(ranks, ranks_dir, publish_mode)
    graph.unpersist()
    return spark.read.parquet(published)


def make_pagerank_refresh_rebuild(
    spark: SparkSession,
    edge_log_dir: str,
    ranks_dir: str,
    refresh_metrics: list | None = None,
    **pagerank_kwargs,
):
    """foreachBatch callback for ``foreach_batch_rebuild``: append the
    batch's extracted edges to the edge log, then run a warm-started
    PageRank refresh. ``refresh_metrics`` (optional) collects one
    per-refresh list of iteration metric dicts, so callers can observe the
    warm start shrinking iteration counts."""

    def rebuild(batch_df: DataFrame, batch_id: int) -> None:
        from pagerank_spark.functions.extract import extract_edges_df

        edges = extract_edges_df(batch_df).select("src", "dst")
        edges.write.mode("append").parquet(edge_log_dir)
        m: list = []
        pagerank_refresh(spark, edge_log_dir, ranks_dir, metrics=m, **pagerank_kwargs)
        if refresh_metrics is not None:
            refresh_metrics.append(m)

    return rebuild
