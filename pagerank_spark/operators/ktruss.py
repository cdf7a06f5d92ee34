"""k-truss decomposition (fixed k): the maximal subgraph where every edge
participates in at least k-2 triangles (Cohen 2008, "Trusses: cohesive
subgraphs for social network analysis"; the distributed formulation is the
standard iterated support-filter, e.g. Chen et al. / graph-challenge
implementations).

The truss is the edge-analogue of the k-core and a much stronger
community signal: a k-core can be a star-like hub mass with no cohesion,
while every k-truss edge is embedded in k-2 triangles. Curation use on a
link graph: the truss backbone separates genuinely cross-linked site
clusters from nav-template link meshes that the in-link-ratio filter
(reference pagerank.py:52-57) only heuristically removes.

Scale shape per round: one degree-ordered triangle enumeration over the
surviving edge set (Suri-Vassilvitskii orientation — the same wedge-join
bound as operators/triangles.py, hub out-degree capped at O(sqrt m)), one
edge-keyed partial-aggregated support count, one left join + filter.
Rounds are O(peeling depth); each round's edge set is localCheckpoint-ed
so lineage stays flat. The only driver action per round is the stop-rule
count (the k_core pattern). The DuckDB twin replicates the fixpoint as a
recursive CTE whose per-edge support is a correlated common-neighbor
count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pagerank_spark.operators.kcore import _undirect


def _edge_support(cur: DataFrame) -> DataFrame:
    """(a, b, support) for every edge of the undirected simple edge set
    ``cur`` that closes at least one triangle — degree-ordered wedge join,
    each triangle emits its three normalized edge keys once."""
    deg = (
        cur.select(F.col("a").alias("x"))
        .unionAll(cur.select(F.col("b").alias("x")))
        .groupBy("x")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    e = cur.join(
        deg.withColumnRenamed("x", "a").withColumnRenamed("d", "da"), "a"
    ).join(deg.withColumnRenamed("x", "b").withColumnRenamed("d", "db"), "b")
    a_first = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    o = e.select(
        F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("v"),
        F.when(a_first, F.col("db")).otherwise(F.col("da")).alias("dv"),
    )
    e1 = o.select("u", F.col("v").alias("v1"), F.col("dv").alias("d1"))
    e2 = o.select("u", F.col("v").alias("v2"), F.col("dv").alias("d2"))
    wedges = e1.join(e2, "u").where(
        (F.col("d1") < F.col("d2"))
        | ((F.col("d1") == F.col("d2")) & (F.col("v1") < F.col("v2")))
    )
    closing = o.select(F.col("u").alias("v1"), F.col("v").alias("v2"))
    tris = wedges.join(closing, ["v1", "v2"]).select("u", "v1", "v2")
    sides = (
        tris.select(F.col("u").alias("x"), F.col("v1").alias("y"))
        .unionAll(tris.select(F.col("u").alias("x"), F.col("v2").alias("y")))
        .unionAll(tris.select(F.col("v1").alias("x"), F.col("v2").alias("y")))
    )
    return (
        sides.select(
            F.least("x", "y").alias("a"), F.greatest("x", "y").alias("b")
        )
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("support"))
    )


def k_truss(
    edges: DataFrame,
    k: int,
    src_col: str = "src",
    dst_col: str = "dst",
    max_rounds: int | None = None,
) -> DataFrame:
    """(a, b) — the edges of the k-truss of the undirected simple graph
    underlying ``edges`` (self-loops dropped, multi-edges collapsed,
    a < b). Possibly empty. Deterministic.

    ``max_rounds=None`` peels to the fixpoint — every non-final round
    strictly shrinks the edge set so termination is guaranteed; pass a cap
    to fail fast on graphs whose peel depth is operationally unacceptable
    (the scc.py convention: raise, never return partial results)."""
    if k < 3:
        raise ValueError("k_truss needs k >= 3 (a 2-truss is every edge)")
    cur = _undirect(edges, src_col, dst_col).localCheckpoint(eager=True)
    n_cur = cur.count()
    rounds = 0
    while n_cur > 0:
        rounds += 1
        if max_rounds is not None and rounds > max_rounds:
            raise RuntimeError(f"k_truss did not stabilize in {max_rounds} rounds")
        sup = _edge_support(cur)
        nxt = (
            cur.join(sup, ["a", "b"], "left")
            .where(F.coalesce(F.col("support"), F.lit(0)) >= k - 2)
            .select("a", "b")
            .localCheckpoint(eager=True)
        )
        n_nxt = nxt.count()
        cur.unpersist()
        cur = nxt
        if n_nxt == n_cur:  # stable: every surviving edge has support >= k-2
            break
        n_cur = n_nxt
    return cur
