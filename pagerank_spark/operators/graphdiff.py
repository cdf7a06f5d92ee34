"""Snapshot diffing for re-crawled link graphs.

A production crawl is re-fetched continuously; the operational questions
between two snapshots are (a) which links appeared/disappeared, (b) whose
connectivity changed, and (c) whose rank moved. These close the re-crawl
loop the incremental-PageRank machinery (streaming/ingest.py warm starts)
already exploits.

  * ``edge_diff``    — (src, dst, status ∈ {added, removed}); retained
    edges (the overwhelming bulk at 100 TB) are deliberately NOT emitted.
  * ``degree_delta`` — per-vertex out/in-degree before vs after, only for
    vertices whose degree changed.
  * ``rank_delta``   — top-k movers between two rank vectors by |Δrank|.

Physical shape / 100-TB notes: ``edge_diff`` is two LEFT ANTI hash joins on
(src, dst) — each sides' output is change-sized, never snapshot-sized, and
no full outer join materializes the retained bulk. ``degree_delta`` is two
partial-aggregated degree counts per snapshot joined full-outer on the
vertex-sized degree tables (vertex-sized, not edge-sized). ``rank_delta``
is one vertex-keyed full outer join + TakeOrderedAndProject (k-sized
result, no global sort). No driver actions anywhere.

The reference (laurenleadbetter/Pagerank) ranks one frozen crawl; these
operators are what a user runs when the next crawl lands.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def edge_diff(old: DataFrame, new: DataFrame) -> DataFrame:
    """(src, dst, status) for every edge present in exactly one snapshot —
    'added' = in new only, 'removed' = in old only. Duplicate edges within
    a snapshot count once (set semantics on (src, dst))."""
    o = old.select("src", "dst").distinct()
    n = new.select("src", "dst").distinct()
    added = n.join(o, ["src", "dst"], "left_anti").select(
        "src", "dst", F.lit("added").alias("status")
    )
    removed = o.join(n, ["src", "dst"], "left_anti").select(
        "src", "dst", F.lit("removed").alias("status")
    )
    return added.unionByName(removed)


def degree_delta(old: DataFrame, new: DataFrame) -> DataFrame:
    """(url, out_old, out_new, in_old, in_new) for every vertex whose
    out- or in-degree changed between snapshots (distinct-edge degrees;
    absent vertices count 0). Vertices with unchanged degrees — the bulk —
    are filtered out before the result materializes."""

    def _deg(edges: DataFrame, suffix: str) -> DataFrame:
        de = edges.select("src", "dst").distinct()
        outd = de.groupBy(F.col("src").alias("url")).agg(
            F.count(F.lit(1)).alias(f"out_{suffix}")
        )
        ind = de.groupBy(F.col("dst").alias("url")).agg(
            F.count(F.lit(1)).alias(f"in_{suffix}")
        )
        return outd.join(ind, "url", "full_outer")

    j = _deg(old, "old").join(_deg(new, "new"), "url", "full_outer")
    z = lambda c: F.coalesce(F.col(c), F.lit(0)).cast("long")  # noqa: E731
    out = j.select(
        "url",
        z("out_old").alias("out_old"),
        z("out_new").alias("out_new"),
        z("in_old").alias("in_old"),
        z("in_new").alias("in_new"),
    )
    return out.where(
        (F.col("out_old") != F.col("out_new")) | (F.col("in_old") != F.col("in_new"))
    )


def rank_delta(
    ranks_old: DataFrame,
    ranks_new: DataFrame,
    top_k: int = 20,
    rank_col: str = "rank",
) -> DataFrame:
    """(mover_rank, url, rank_old, rank_new, delta) — the top_k vertices by
    |rank_new - rank_old| (vertices absent from one snapshot count 0 there).
    Ties broken by url ascending; mover_rank is the 0-based position. The
    cut is TakeOrderedAndProject — k-sized, no global sort."""
    o = ranks_old.select("url", F.col(rank_col).alias("rank_old"))
    n = ranks_new.select("url", F.col(rank_col).alias("rank_new"))
    j = o.join(n, "url", "full_outer").select(
        "url",
        F.coalesce("rank_old", F.lit(0.0)).alias("rank_old"),
        F.coalesce("rank_new", F.lit(0.0)).alias("rank_new"),
    )
    d = j.select(
        "url", "rank_old", "rank_new",
        F.round(F.col("rank_new") - F.col("rank_old"), 6).alias("delta"),
    )
    top = d.orderBy(F.abs(F.col("delta")).desc(), F.col("url")).limit(top_k)
    from pyspark.sql import Window

    w = Window.orderBy(F.abs(F.col("delta")).desc(), F.col("url"))
    return top.select(
        (F.row_number().over(w) - 1).alias("mover_rank"),
        "url", "rank_old", "rank_new", "delta",
    )


def host_churn(old: DataFrame, new: DataFrame) -> DataFrame:
    """(host, n_old, n_added, n_removed, churn) — per-source-host link
    churn between two crawl snapshots: distinct outgoing edges in the old
    snapshot, edges added/removed by the new one (edge_diff semantics),
    and churn = (added + removed) / n_old (NULL for hosts with no old
    edges — brand-new hosts). THE re-crawl scheduling signal at host
    granularity: high-churn hosts earn tighter revisit intervals
    (Cho-Garcia-Molina), dead hosts (churn 1.0, all removed) leave the
    frontier.

    Scale shape: the two change-sized LEFT ANTI joins are inherited from
    edge_diff (the retained bulk never materializes); the host rollups
    are partial-aggregated counts on the change tables plus ONE
    host-keyed count over the old snapshot; the final join is
    host-cardinality-sized. Exact BIGINTs, one rounded division."""
    from pagerank_spark.functions.urls import host_col

    o = old.select("src", "dst").distinct()
    old_h = o.select(host_col(F.col("src")).alias("host")).groupBy("host").agg(
        F.count(F.lit(1)).cast("long").alias("n_old")
    )
    diff = edge_diff(old, new).select(
        host_col(F.col("src")).alias("host"), "status"
    )
    ch = diff.groupBy("host").agg(
        F.count(F.when(F.col("status") == "added", 1))
        .cast("long")
        .alias("n_added"),
        F.count(F.when(F.col("status") == "removed", 1))
        .cast("long")
        .alias("n_removed"),
    )
    z = F.lit(0).cast("long")
    return (
        old_h.join(ch, "host", "full_outer")
        .select(
            "host",
            F.coalesce(F.col("n_old"), z).alias("n_old"),
            F.coalesce(F.col("n_added"), z).alias("n_added"),
            F.coalesce(F.col("n_removed"), z).alias("n_removed"),
        )
        .withColumn(
            "churn",
            F.when(
                F.col("n_old") > 0,
                F.round(
                    (F.col("n_added") + F.col("n_removed")).cast("double")
                    / F.col("n_old"),
                    6,
                ),
            ),
        )
    )
