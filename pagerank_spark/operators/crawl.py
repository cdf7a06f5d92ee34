"""Crawl-frontier prioritization: which UNCRAWLED pages to fetch next.

A crawler's edge log only has outlinks of pages it has already fetched; the
dangling destinations (never seen as ``src``) are the frontier. The classic
scheduling signal (Cho, Garcia-Molina & Page, WWW'98 "Efficient crawling
through URL ordering"; OPIC, Abiteboul et al. WWW'03) is expected PageRank
inflow: a frontier page linked from many high-rank crawled pages is worth
fetching first, because that inflow IS the rank mass the page would receive
in the next power iteration.

  * ``frontier_priority`` — priority(d) = alpha * Σ_{(s,d)∈E} weight(s,d) ·
    rank(s) over frontier pages d (weight = 1/outdeg, the LinkGraph
    convention, so this is exactly the dangling part of the next SpMV).
  * ``frontier_schedule`` — politeness-aware cut: top ``per_host`` frontier
    pages per host by priority (a crawler fetches at most a few URLs per
    host per cycle), ordered output with per-host positions.

Physical shape / 100-TB notes: the rank join is src-keyed (the same
partitioning the cached edge layout already has), the inflow aggregate is a
dst-keyed partial-agg exchange, and the frontier cut is a LEFT ANTI join
against the vertex-sized distinct-src table — no all-pairs anything, no
driver actions. The per-host cut lowers to WindowGroupLimit (each host
keeps <= per_host rows in the shuffle; plan-pinned). Per-term products are
9dp-quantized and DECIMAL-summed so priorities are independent of partial
aggregation order (the adamic_adar recipe).

The reference (laurenleadbetter/Pagerank) ranks a fixed crawl; this closes
the loop back to the crawler that produces it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def frontier_priority(
    edges: DataFrame,
    ranks: DataFrame,
    alpha: float = 0.85,
    weight_col: str = "weight",
    rank_col: str = "rank",
) -> DataFrame:
    """(url, priority, n_inlinks) for every frontier page (a ``dst`` that
    never appears as ``src``), priority = alpha * Σ weight·rank over its
    crawled in-neighbors — the page's share of the next iteration's rank
    mass. ``n_inlinks`` is its crawled in-degree (a cheap tie-breaking /
    spam-triage signal)."""
    srcs = edges.select(F.col("src").alias("url")).distinct()
    term = F.round(F.col(weight_col) * F.col(rank_col), 9).cast("decimal(38,9)")
    inflow = (
        edges.join(ranks.select(F.col("url").alias("src"), rank_col), "src")
        .groupBy(F.col("dst").alias("url"))
        .agg(
            F.sum(term).alias("_mass"),
            F.count(F.lit(1)).alias("n_inlinks"),
        )
    )
    return inflow.join(srcs, "url", "left_anti").select(
        "url",
        F.round(F.lit(alpha) * F.col("_mass").cast("double"), 6).alias("priority"),
        "n_inlinks",
    )


def frontier_schedule(
    edges: DataFrame,
    ranks: DataFrame,
    per_host: int = 2,
    alpha: float = 0.85,
    weight_col: str = "weight",
    rank_col: str = "rank",
) -> DataFrame:
    """(host, url, priority, host_pos) — the next crawl cycle's fetch list:
    the top ``per_host`` frontier pages per host by priority (politeness
    budget), host_pos = 1-based position within the host. Ties broken by
    url ascending (the engine-wide determinism contract)."""
    from pagerank_spark.functions.urls import host_col

    pri = frontier_priority(edges, ranks, alpha, weight_col, rank_col)
    hosted = pri.select(
        host_col(F.col("url")).alias("host"), "url", "priority", "n_inlinks"
    )
    hw = Window.partitionBy("host").orderBy(F.desc("priority"), F.col("url"))
    return (
        hosted.select("*", F.row_number().over(hw).alias("host_pos"))
        .where(F.col("host_pos") <= per_host)
        .select("host", "url", "priority", "host_pos")
    )
