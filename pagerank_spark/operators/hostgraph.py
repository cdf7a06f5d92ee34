"""Host-level rollup of a page-level link graph.

The reference operates strictly on page urls (pagerank.py:22-94); at web
scale the standard first reduction is the HOST GRAPH — collapse every page
url to its authority and aggregate parallel links — which shrinks a
10^11-edge page graph by ~two orders of magnitude while preserving the
site-level link structure (the WebGraph framework's host-graph datasets and
Common Crawl's host-level webgraph releases are this exact shape).

Spark shape
-----------
One pure-Column ``regexp_extract`` per endpoint (whole-stage codegen, no
UDF — functions/urls.py host_col) followed by ONE partial-aggregated
``groupBy(src, dst)``: map-side combine collapses each upstream partition's
parallel links before the shuffle, so the exchange carries at most one row
per (partition, host-pair) — the host graph's size, not the page graph's.
Self-loops (intra-host navigation, typically the majority of a site's
links) are dropped by default BEFORE the aggregation so they never reach
the shuffle.

``host_linkgraph`` turns the rollup into a :class:`LinkGraph` whose edge
weights are ``n_links / total-outlinks(src_host)`` — exactly the
k/outdeg semantics ``LinkGraph.from_edges`` gives duplicate page edges
(graph_build.py _weight_and_dedup), so every downstream operator
(pagerank, HITS, components, …) runs unchanged on the host graph.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pagerank_spark.functions.urls import host_col
from pagerank_spark.operators.graph_build import LinkGraph


def host_graph(raw_edges: DataFrame, keep_self: bool = False) -> DataFrame:
    """Collapse page-level url edges to host-level edges.

    ``raw_edges``: (src, dst) page-url strings, duplicates allowed.
    Returns (src, dst, n_links) where src/dst are hosts and ``n_links``
    counts the page-level links collapsed into the host pair.
    """
    hg = raw_edges.select(
        host_col(F.col("src")).alias("src"),
        host_col(F.col("dst")).alias("dst"),
    )
    if not keep_self:
        hg = hg.filter(F.col("src") != F.col("dst"))
    return hg.groupBy("src", "dst").agg(F.count(F.lit(1)).alias("n_links"))


def link_locality(raw_edges: DataFrame) -> DataFrame:
    """Per-host link locality: what fraction of a host's outgoing page
    links stay on the host? The classic crawl/compression statistic
    (Broder et al. 2000 report ~75-80% of web links are intra-host; it is
    why host-grouped url orderings compress the web graph so well) and the
    sanity check run before trusting a host-graph rollup that DROPS the
    intra-host majority.

    ``raw_edges``: (src, dst) page-url strings, duplicates allowed.
    Returns (host, out_links, intra_links, locality) with
    ``locality = intra/out`` rounded 9 dp — host-sized output.

    Plan shape: one pure-Column host extraction per endpoint (codegen, no
    UDF) and ONE map-side-combined groupBy on the src host — a single
    host-keyed exchange carrying at most one row per (partition, host).
    Counts are exact BIGINTs; locality is one IEEE division of them.
    """
    hb = raw_edges.select(
        host_col(F.col("src")).alias("h_src"),
        host_col(F.col("dst")).alias("h_dst"),
    )
    per_host = hb.groupBy(F.col("h_src").alias("host")).agg(
        F.count(F.lit(1)).cast("long").alias("out_links"),
        F.sum((F.col("h_src") == F.col("h_dst")).cast("long"))
        .cast("long")
        .alias("intra_links"),
    )
    return per_host.select(
        "host",
        "out_links",
        "intra_links",
        F.round(
            F.col("intra_links").cast("double") / F.col("out_links").cast("double"), 9
        ).alias("locality"),
    )


def inlink_diversity(raw_edges: DataFrame) -> DataFrame:
    """Per-page in-link diversity: (url, n_inlinks, n_hosts, n_ext_hosts,
    diversity) — how many distinct pages link here, from how many distinct
    hosts, and from how many hosts OTHER than the page's own.

    The classic anti-spam / ranking prior (TrustRank-era "link diversity"):
    a page whose thousands of in-links all come from one or two hosts is a
    link farm; editorially-linked pages accumulate many independent linking
    hosts. ``diversity = n_ext_hosts / n_inlinks`` rounded 9 dp.

    Plan shape: one pure-Column host extraction per endpoint (codegen, no
    UDF), then the distinct-count lowered to TWO stacked partial aggregates
    — dedup on (dst, src_host, src) first (map-side combine collapses the
    parallel-link bulk before the shuffle), then one dst-keyed rollup
    counting rows and distinct hosts via the same two-phase shape. All
    counts exact BIGINTs; output is vertex-sized.
    """
    hb = raw_edges.select(
        F.col("dst").alias("url"),
        host_col(F.col("dst")).alias("h_dst"),
        F.col("src"),
        host_col(F.col("src")).alias("h_src"),
    )
    # one row per distinct (dst, src) — parallel links collapse map-side
    per_src = hb.select("url", "h_dst", "src", "h_src").distinct()
    return (
        per_src.groupBy("url")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_inlinks"),
            F.countDistinct("h_src").cast("long").alias("n_hosts"),
            F.countDistinct(
                F.when(F.col("h_src") != F.col("h_dst"), F.col("h_src"))
            )
            .cast("long")
            .alias("n_ext_hosts"),
        )
        .select(
            "url",
            "n_inlinks",
            "n_hosts",
            "n_ext_hosts",
            F.round(
                F.col("n_ext_hosts").cast("double")
                / F.col("n_inlinks").cast("double"),
                9,
            ).alias("diversity"),
        )
    )


def host_linkgraph(
    raw_edges: DataFrame,
    keep_self: bool = False,
    num_partitions: int | None = None,
) -> LinkGraph:
    """Host-graph as a :class:`LinkGraph` (weight = n_links / outlinks(src)).

    The host vertex set is derived from the rolled-up edges (a host whose
    every link was an intra-host self-loop disappears with them when
    ``keep_self=False`` — it has no inter-host presence).
    """
    hg = host_graph(raw_edges, keep_self=keep_self)
    out_deg = hg.groupBy("src").agg(F.sum("n_links").alias("_od"))
    edges = (
        hg.join(out_deg, "src")
        .withColumn(
            "weight", F.col("n_links").cast("double") / F.col("_od").cast("double")
        )
        .drop("n_links", "_od")
    )
    vertices = (
        hg.select(F.col("src").alias("url"))
        .union(hg.select(F.col("dst").alias("url")))
        .distinct()
    )
    return LinkGraph(edges, vertices, num_partitions)
