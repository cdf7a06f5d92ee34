"""Ranked search over a PageRank vector (reference search, pagerank.py:175-192).

filter(query) -> orderBy(rank desc) -> limit(k) collapses to a single
TakeOrderedAndProject in the physical plan — no full sort materialization.
Rank numbers 0..k-1 are assigned after the top-k cut (reference numbers only
emitted matches, pagerank.py:184-192).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pagerank_spark.functions.url_query import url_satisfies_query_col


def search(
    ranks: DataFrame,
    query: str = "",
    max_results: int = 10,
    url_col: str = "url",
    rank_col: str = "rank",
) -> DataFrame:
    """Return (result_rank, url, pagerank) — top matches in rank order.

    Ties broken by url ascending for determinism (the reference's tie order is
    torch.topk's index order, which is unstable across backends; golden graphs
    have distinct scores so this never changes golden output).
    """
    top = (
        ranks.filter(url_satisfies_query_col(F.col(url_col), query))
        .orderBy(F.desc(rank_col), F.col(url_col))
        .limit(max_results)
    )
    w = Window.orderBy(F.desc(rank_col), F.col(url_col))
    return top.select(
        (F.row_number().over(w) - 1).alias("result_rank"),
        F.col(url_col).alias("url"),
        F.col(rank_col).alias("pagerank"),
    )


def rescore_with_boost(
    ranks: DataFrame,
    query: str,
    expansion: list[tuple[str, float]] | None = None,
    s_weight: float = 0.03,
    power: float = 30.0,
    url_col: str = "url",
    rank_col: str = "rank",
) -> DataFrame:
    """Embedding-boosted re-scoring (reference pagerank2.py:171-201, op 24).

    Per url (mirroring is_url_satisfies_query + the expansion loop,
    pagerank2.py:181-201 and 219-237):

      * the WHOLE query predicate (any positive term matches AND no negated
        term present; zero positive terms => match) contributes ONCE:
        new_n += 1 and w_weight += s_weight;
      * each of the expansion words w with similarity sim contributes
        per-word when it satisfies the single-word query w (i.e. substring):
        new_n += 1 and w_weight += sim ** power;
      * the added score is new_n * w_weight (the boost scales with the match
        count, not just the weights).

    Pure Column arithmetic, one `contains` per term.
    """
    whole = url_satisfies_query_col(F.col(url_col), query)
    new_n = F.when(whole, 1).otherwise(0)
    w_weight = F.when(whole, F.lit(s_weight)).otherwise(0.0)
    for word, sim in expansion or []:
        hit = F.col(url_col).contains(word)
        new_n = new_n + F.when(hit, 1).otherwise(0)
        w_weight = w_weight + F.when(hit, F.lit(float(sim) ** power)).otherwise(0.0)
    return ranks.withColumn(
        rank_col, F.col(rank_col) + new_n.cast("double") * w_weight
    )


def search_diversified(
    ranks: DataFrame,
    query: str = "",
    max_results: int = 10,
    per_host: int = 2,
    url_col: str = "url",
    rank_col: str = "rank",
) -> DataFrame:
    """Host-crowding-limited top-k: (result_rank, url, host, pagerank) —
    the classic SERP diversity rule (at most ``per_host`` results per
    host, Google's original "host crowding"). One well-ranked site
    otherwise fills the whole page with its subpages.

    Physical shape: the per-host cut is a host-PARTITIONED row_number —
    Spark lowers the <= per_host filter to WindowGroupLimit, so each
    host's group keeps at most per_host rows in the shuffle and no global
    sort of the corpus happens there; the final cut is the same
    TakeOrderedAndProject as ``search``. Scales as: one host-keyed
    exchange of the query's match set + a k-sized ordered take.

    Ties broken by url ascending everywhere (same determinism contract as
    ``search``).
    """
    from pagerank_spark.functions.urls import host_col

    matches = ranks.filter(url_satisfies_query_col(F.col(url_col), query)).select(
        F.col(url_col).alias("url"),
        host_col(F.col(url_col)).alias("host"),
        F.col(rank_col).alias("pagerank"),
    )
    hw = Window.partitionBy("host").orderBy(F.desc("pagerank"), F.col("url"))
    kept = (
        matches.withColumn("_hpos", F.row_number().over(hw))
        .filter(F.col("_hpos") <= per_host)
        .drop("_hpos")
    )
    top = kept.orderBy(F.desc("pagerank"), F.col("url")).limit(max_results)
    w = Window.orderBy(F.desc("pagerank"), F.col("url"))
    return top.select(
        (F.row_number().over(w) - 1).alias("result_rank"), "url", "host", "pagerank"
    )
