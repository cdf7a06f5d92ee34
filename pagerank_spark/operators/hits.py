"""HITS (Kleinberg 1999): hub and authority scores over a directed link graph.

The reference implements only PageRank (reference pagerank.py:122-172); HITS
is the other classic link-analysis fixpoint a web-scale engine is expected to
answer, so it rides the same join-agg machinery as operators/pagerank.py:

    a_k(v) = sum over edges (u, v) of h_{k-1}(u);   a_k /= ||a_k||_2
    h_k(u) = sum over edges (u, v) of a_k(v);       h_k /= ||h_k||_2

(the classic immediate-update order: authorities from the PREVIOUS hubs,
hubs from the CURRENT authorities). Edges are DISTINCT (0/1 adjacency, the
textbook formulation — multi-edges do not multiply influence).

Job cadence (the scale-critical part, same pattern as pagerank.py:19-24):
each half-round is ONE Spark job. The joined+aggregated score vector is a
LAZY localCheckpoint that materializes during the fused L2-norm aggregate,
and the normalization is a projection over the checkpointed blocks —
`x / lit(norm)` — consumed by the NEXT half-round's join, never a separate
action. A full HITS round therefore costs exactly 2 jobs; the previous
design paid 4 (eager checkpoint + separate `.first()` norm per half-round),
which at cluster scale quadruples the per-job driver latency floor for
nothing. `metrics` records per-half-round norms/wall so a test can pin the
job count (tests/test_hits.py::test_hits_one_job_per_half_round).

Broadcast policy, mirroring pagerank.py:120-124: the score vector is
vertex-sized, so it broadcasts while small and the distinct edge set — the
big side — never moves; each half-iteration is one broadcast join + one
partial-aggregated groupBy. The default is AUTO: broadcast only while the
vertex count is under ``broadcast_threshold`` (10M, the same bound
pagerank uses), so a cluster-scale caller cannot OOM an executor on a
10^9-vertex build side by forgetting a flag. Above the threshold both
joins shuffle on their keys against an edge table persisted
hash-partitioned by src — the same layout graph_build.LinkGraph already
maintains for PageRank.

Deterministic for a fixed ``iterations``, so the DuckDB oracle is the same
recurrence unrolled (no convergence-epsilon cross-engine coupling).
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BROADCAST_VERTEX_THRESHOLD = 10_000_000


def resolve_broadcast(flag: bool | None, n_vertices: int,
                      threshold: int = BROADCAST_VERTEX_THRESHOLD) -> bool:
    """The shared auto policy (pagerank.py:120-124's count-threshold rule):
    broadcast a vertex-sized build side only while it plausibly fits an
    executor; at cluster scale the count flips the join to the shuffle path
    without the caller having to know to pass False."""
    return (n_vertices < threshold) if flag is None else bool(flag)


def _half_round(e: DataFrame, scores: DataFrame, verts: DataFrame,
                join_key: str, group_key: str, in_col: str, out_col: str,
                broadcast: bool) -> DataFrame:
    """One HITS half-round pre-normalization: pull `in_col` across the edges
    (scores keyed to `join_key`), sum into `group_key`, resurrect zero-mass
    vertices. Pure plan construction — exposed so plan audits can assert the
    broadcast policy flips the physical join strategy with input size."""
    s = scores.select(F.col("url").alias(join_key), F.col(in_col))
    if broadcast:
        s = F.broadcast(s)
    agg = (
        e.join(s, join_key)
        .groupBy(group_key)
        .agg(F.sum(in_col).alias(out_col))
        .withColumnRenamed(group_key, "url")
    )
    return verts.join(agg, "url", "left").fillna(0.0, [out_col])


def hits(
    edges: DataFrame,
    iterations: int = 2,
    src_col: str = "src",
    dst_col: str = "dst",
    broadcast_scores: bool | None = None,
    broadcast_threshold: int = BROADCAST_VERTEX_THRESHOLD,
    metrics: list | None = None,
) -> DataFrame:
    """(url, hub, authority) after ``iterations`` full HITS rounds, both
    scores L2-normalized, 6dp-rounded. Vertices never receiving mass score 0.

    ``broadcast_scores``: None (default) auto-selects from the vertex count
    (`resolve_broadcast`); True/False pins the join strategy.
    ``metrics``: optional list collecting one dict per half-round
    (round, side, norm, wall_s)."""
    if iterations < 1:
        raise ValueError("hits() needs iterations >= 1")
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).distinct()
    e.persist()
    verts = e.select(F.col("src").alias("url")).union(
        e.select(F.col("dst").alias("url"))
    ).distinct()
    n = verts.count()
    if n == 0:  # empty edge set: empty result, not a ZeroDivisionError
        e.unpersist()
        return verts.select(
            "url", F.lit(0.0).alias("hub"), F.lit(0.0).alias("authority")
        )
    broadcast = resolve_broadcast(broadcast_scores, n, broadcast_threshold)
    h = verts.withColumn("h", F.lit(1.0 / float(n) ** 0.5))

    a = None
    prev_ck = {"a": None, "h": None}

    def _normalized(raw: DataFrame, col: str, rnd: int) -> DataFrame:
        # ONE job per half-round: the lazy checkpoint materializes inside
        # the norm aggregate, and the normalization is a projection over the
        # checkpointed blocks that the NEXT half-round's join consumes.
        t0 = time.monotonic()
        ck = raw.localCheckpoint(eager=False)
        l2 = ck.agg(F.sqrt(F.sum(F.col(col) * F.col(col)))).first()[0]
        if metrics is not None:
            metrics.append({"round": rnd, "side": col, "norm": l2,
                            "wall_s": time.monotonic() - t0})
        # the previous checkpoint of this side fed the join that just
        # materialized; nothing later reads it
        if prev_ck[col] is not None:
            try:
                prev_ck[col].unpersist()
            except Exception:
                pass
        prev_ck[col] = ck
        if not l2 or l2 <= 0:
            return ck
        return ck.withColumn(col, F.col(col) / F.lit(float(l2)))

    for rnd in range(iterations):
        # authorities from previous hubs
        a = _normalized(
            _half_round(e, h, verts, "src", "dst", "h", "a", broadcast)
            .select("url", "a"),
            "a", rnd,
        )
        # hubs from current authorities
        h = _normalized(
            _half_round(e, a, verts, "dst", "src", "a", "h", broadcast)
            .select("url", "h"),
            "h", rnd,
        )
    out = (
        verts.join(h, "url", "left")
        .join(a, "url", "left")
        .select(
            "url",
            F.round(F.coalesce("h", F.lit(0.0)), 6).alias("hub"),
            F.round(F.coalesce("a", F.lit(0.0)), 6).alias("authority"),
        )
        .localCheckpoint(eager=True)  # materialize while e is still cached
    )
    e.unpersist()
    for ck in prev_ck.values():
        if ck is not None:
            try:
                ck.unpersist()
            except Exception:
                pass
    return out
