"""Strongly connected components and the Broder bowtie decomposition.

The web graph's macro structure IS its SCC structure: Broder et al.
("Graph structure in the Web", WWW9 2000) showed a giant strongly
connected CORE with an IN region feeding it, an OUT region fed by it,
TENDRILS/TUBES hanging off, and DISCONNECTED islands — the "bowtie".
Link farms show up as dense non-core SCCs, so SCC labels are also a spam
feature alongside TrustRank (operators/trust.py). The reference engine
has no multi-hop structure operator at all; this is the standard
distributed formulation.

Algorithm: trimming + forward min-label coloring + in-color backward
sweep (Orzan's coloring method; the same trim/FW-BW family as
Hong-Rodia-Olukotun PPoPP'13 and Slota-Rajamanickam-Madduri IPDPS'14):

  repeat until no vertices remain:
    1. TRIM — a vertex with no in-edge or no out-edge in the remaining
       subgraph is its own SCC; peel until stable (kills the tendril mass
       that dominates web graphs). The peel is a DEGREE FIXPOINT on the
       vertex table against the FIXED edge checkpoint: each round drops
       zero-in/zero-out vertices and DECREMENTS their neighbors' cached
       degrees (edges incident to a dropped vertex are counted exactly
       once, in the round it drops) — the edge table itself is scanned
       per round but REBUILT (repartition + checkpoint) only ONCE, after
       the fixpoint converges. Round-4 trimming rebuilt the edge table
       every peel layer, so a depth-d tendril chain paid d rebuilds;
       now it pays d cheap vertex-sized rounds + 1 rebuild.
    2. COLOR — fixpoint of c(v) = min(c(v), min over in-edges (u,v) of
       c(u)): c(v) = the smallest vertex id that reaches v. One
       edges-join-labels + groupBy-min per round, change detected by the
       same fold-in probe as labelprop.py (ONE job per round, the max()
       aggregate materializes the lazy checkpoint).
    3. SETTLE — every color class has exactly one root r with c(r) = r
       (the minimum of the class; any smaller vertex reaching r would
       recolor the class). SCC(r) = vertices of color r that reach r
       through vertices of color r: a backward frontier sweep from the
       roots restricted to same-color edges — frontier-sized shuffles,
       eager per-level checkpoints exactly like distance.py.
    Settled SCCs leave the graph; the remainder (color classes that lost
    their root's SCC) re-runs. Rounds are bounded by the condensation
    depth, which trimming keeps tiny on web-shaped graphs.

Correctness of step 3 (why no second full fixpoint is needed): for v in
SCC(r), every vertex w on any v->r path satisfies r ->* w ->* r, so w is
itself in SCC(r) and has color r — the backward sweep never needs to
leave the color class; conversely any v of color r that reaches r is
mutually reachable with r by definition of the color.

Everything is vertex-sized state + one edge join per round; label joins
follow the shared broadcast auto-policy (hits.resolve_broadcast) so a
10^9-vertex run flips to co-partitioned shuffle joins by itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pagerank_spark.operators.hits import resolve_broadcast

PARTS = ("CORE", "IN", "OUT", "TUBE", "TENDRIL_IN", "TENDRIL_OUT", "DISCONNECTED")


def _directed(edges: DataFrame) -> DataFrame:
    """Distinct directed pairs, nulls and self-loops dropped (a self-loop
    never changes SCC membership)."""
    return (
        edges.select(
            F.col("src").cast("string").alias("u"),
            F.col("dst").cast("string").alias("v"),
        )
        .where(F.col("u").isNotNull() & F.col("v").isNotNull() & (F.col("u") != F.col("v")))
        .distinct()
    )


def _trim(e, remaining, b, num_partitions: int, settled: list, metrics=None):
    """Degree-fixpoint trim: peel every vertex with no in-edge or no
    out-edge in the remaining subgraph, against the FIXED edge checkpoint
    ``e`` — no edge-table rebuild inside the loop.

    State is one vertex-sized (url, od, id) degree table. Each round drops
    the zero-degree vertices and decrements the degrees of their surviving
    neighbors; an edge contributes a decrement exactly once (the round its
    endpoint drops), so the cached degrees always equal the true degrees of
    the remaining subgraph. Returns (remaining, e) with ``e`` rebuilt ONCE
    (semi-joins + repartition + checkpoint) if anything was trimmed."""
    outd = e.groupBy(F.col("u").alias("url")).agg(F.count(F.lit(1)).alias("od"))
    ind = e.groupBy(F.col("v").alias("url")).agg(F.count(F.lit(1)).alias("id"))
    deg = (
        remaining.join(outd, "url", "left")
        .join(ind, "url", "left")
        .select(
            "url",
            F.coalesce(F.col("od"), F.lit(0)).alias("od"),
            F.coalesce(F.col("id"), F.lit(0)).alias("id"),
        )
        .localCheckpoint(eager=True)
    )
    rounds = 0
    n_trimmed = 0
    while True:
        dropped = (
            deg.where((F.col("od") <= 0) | (F.col("id") <= 0))
            .select("url")
            .localCheckpoint(eager=True)
        )
        if dropped.isEmpty():
            break
        rounds += 1
        settled.append(dropped.select("url", F.col("url").alias("component")))
        # decrements: an edge x->d (d dropping) lowers od(x); d->y lowers
        # id(y). Dropped-side joins broadcast via the shared policy / AQE.
        dec_out = (
            e.join(b(dropped.select(F.col("url").alias("v"))), "v", "semi")
            .groupBy(F.col("u").alias("url"))
            .agg(F.count(F.lit(1)).alias("dec_od"))
        )
        dec_in = (
            e.join(b(dropped.select(F.col("url").alias("u"))), "u", "semi")
            .groupBy(F.col("v").alias("url"))
            .agg(F.count(F.lit(1)).alias("dec_id"))
        )
        deg = (
            deg.join(b(dropped), "url", "left_anti")
            .join(dec_out, "url", "left")
            .join(dec_in, "url", "left")
            .select(
                "url",
                (F.col("od") - F.coalesce(F.col("dec_od"), F.lit(0))).alias("od"),
                (F.col("id") - F.coalesce(F.col("dec_id"), F.lit(0))).alias("id"),
            )
            .localCheckpoint(eager=True)
        )
    remaining = deg.select("url")
    rebuilt = 0
    if rounds and not remaining.isEmpty():
        # ONE rebuild for the whole fixpoint (round 4 paid one per layer)
        e = (
            e.join(b(remaining.select(F.col("url").alias("u"))), "u", "semi")
            .join(b(remaining.select(F.col("url").alias("v"))), "v", "semi")
            .repartition(num_partitions, "u")
            .localCheckpoint(eager=True)
        )
        rebuilt = 1
    if metrics is not None:
        metrics.append(
            {"phase": "trim", "rounds": rounds, "edge_rebuilds": rebuilt}
        )
    return remaining, e


def strongly_connected_components(
    edges: DataFrame,
    max_rounds: int = 100,
    broadcast_labels: bool | None = None,
    num_partitions: int | None = None,
    metrics: list | None = None,
) -> DataFrame:
    """Return (url, component) — component id = min member id (string order,
    consistent with connected_components). Vertices = every edge endpoint.

    ``max_rounds`` bounds the outer settle rounds (= condensation depth
    after trimming); raises RuntimeError instead of returning a partial
    labeling if exceeded. ``broadcast_labels``: None = the shared 10M
    count-threshold auto-policy, False at cluster scale pins the shuffle
    path. ``metrics`` (optional list) receives one dict per phase with
    round counts and ``edge_rebuilds`` — the trim fixpoint rebuilds the
    edge table at most once regardless of peel depth (pinned in
    tests/test_scc_bowtie.py on a 1000-vertex chain).
    """
    spark = edges.sparkSession
    num_partitions = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions", "32")
    )
    e = (
        _directed(edges)
        .repartition(num_partitions, "u")
        .localCheckpoint(eager=True)
    )
    remaining = (
        e.select(F.col("u").alias("url"))
        .union(e.select(F.col("v").alias("url")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    if broadcast_labels is None:
        broadcast_labels = resolve_broadcast(None, remaining.count())

    def b(df: DataFrame) -> DataFrame:
        return F.broadcast(df) if broadcast_labels else df

    settled: list[DataFrame] = []
    for _ in range(max_rounds):
        # -- 1. trim: peel vertices missing an in- or out-edge -------------
        remaining, e = _trim(e, remaining, b, num_partitions, settled, metrics)
        if remaining.isEmpty():
            break

        # -- 2. color: c(v) = min vertex id reaching v ----------------------
        lbl = remaining.select(
            "url", F.col("url").alias("c")
        ).localCheckpoint(eager=True)
        while True:
            inc = (
                e.join(b(lbl.select(F.col("url").alias("u"), "c")), "u")
                .groupBy(F.col("v").alias("url"))
                .agg(F.min("c").alias("_in"))
            )
            new = (
                lbl.join(inc, "url", "left")
                .select(
                    "url",
                    F.least(F.col("c"), F.coalesce(F.col("_in"), F.col("c"))).alias("c"),
                    F.coalesce(F.col("_in") < F.col("c"), F.lit(False)).alias("_chg"),
                )
                .localCheckpoint(eager=False)
            )
            # ONE job per round: the probe aggregate materializes the lazy
            # checkpoint and returns the convergence flag in the same action
            changed = bool(
                new.agg(F.max(F.col("_chg").cast("int")).alias("m")).first()["m"]
            )
            lbl = new.select("url", "c")
            if not changed:
                break

        # -- 3. settle: backward in-color sweep from the color roots --------
        in_set = lbl.where(F.col("url") == F.col("c")).localCheckpoint(eager=True)
        frontier = in_set
        while True:
            cand = (
                e.join(frontier.select(F.col("url").alias("v"), "c"), "v")
                .select(F.col("u").alias("url"), "c")
                .distinct()
                .join(b(lbl), ["url", "c"], "semi")  # stay inside the color
                .join(b(in_set.select("url")), "url", "left_anti")
                .localCheckpoint(eager=True)
            )
            if cand.isEmpty():
                break
            in_set = in_set.union(cand).localCheckpoint(eager=True)
            frontier = cand
        settled.append(in_set.select("url", F.col("c").alias("component")))
        remaining = remaining.join(b(in_set.select("url")), "url", "left_anti").localCheckpoint(eager=True)
        if remaining.isEmpty():
            break
        e = (
            e.join(b(remaining.select(F.col("url").alias("u"))), "u", "semi")
            .join(b(remaining.select(F.col("url").alias("v"))), "v", "semi")
            .repartition(num_partitions, "u")
            .localCheckpoint(eager=True)
        )
        if metrics is not None:
            metrics.append({"phase": "settle", "edge_rebuilds": 1})
    else:
        raise RuntimeError(
            f"SCC did not settle within {max_rounds} rounds; "
            "raise max_rounds (condensation depth exceeds the bound)"
        )

    out = settled[0]
    for part in settled[1:]:
        out = out.unionByName(part)
    return out.select("url", "component")


def _reachable(e: DataFrame, seeds: DataFrame, bcast: bool) -> DataFrame:
    """(url) — every vertex reachable from ``seeds`` along directed edges
    (u, v), seeds included. Level-synchronous sweep (distance.py's shape)."""

    def b(df: DataFrame) -> DataFrame:
        return F.broadcast(df) if bcast else df

    settled = seeds.select("url").distinct().localCheckpoint(eager=True)
    frontier = settled
    while not frontier.isEmpty():
        frontier = (
            e.join(frontier.select(F.col("url").alias("u")), "u")
            .select(F.col("v").alias("url"))
            .distinct()
            .join(b(settled), "url", "left_anti")
            .localCheckpoint(eager=True)
        )
        if frontier.isEmpty():
            break
        settled = settled.union(frontier).localCheckpoint(eager=True)
    return settled


def bowtie(
    edges: DataFrame,
    scc: DataFrame | None = None,
    broadcast_labels: bool | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """(url, part) — Broder et al. bowtie decomposition of a directed graph.

    part in PARTS: CORE = the largest SCC (ties broken by min component
    id, deterministic); IN reaches the core; OUT is reached from it;
    TUBE = the leftovers on an IN->OUT path bypassing the core;
    TENDRIL_IN / TENDRIL_OUT hang forward off IN / backward off OUT;
    DISCONNECTED is the rest. Full-graph reachability and subgraph
    reachability coincide for every class here: a path from IN that
    enters the core can only continue into CORE/OUT, which the leftover
    set excludes by construction.

    ``scc`` lets a precomputed strongly_connected_components() result be
    reused. The core-pick is a single TakeOrdered(1) on the
    component-count table (component-count-sized, one tiny driver scalar).
    """
    spark = edges.sparkSession
    num_partitions = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions", "32")
    )
    e = _directed(edges).repartition(num_partitions, "u").localCheckpoint(eager=True)
    rev = e.select(F.col("v").alias("u"), F.col("u").alias("v")).repartition(
        num_partitions, "u"
    ).localCheckpoint(eager=True)
    verts = (
        e.select(F.col("u").alias("url"))
        .union(e.select(F.col("v").alias("url")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    if broadcast_labels is None:
        broadcast_labels = resolve_broadcast(None, verts.count())

    def b(df: DataFrame) -> DataFrame:
        return F.broadcast(df) if broadcast_labels else df

    if scc is None:
        scc = strongly_connected_components(
            edges, broadcast_labels=broadcast_labels, num_partitions=num_partitions
        )
    core_row = (
        scc.groupBy("component")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("component"))
        .first()
    )
    core = scc.where(F.col("component") == F.lit(core_row["component"])).select("url")

    fwd = _reachable(e, core, broadcast_labels)
    bwd = _reachable(rev, core, broadcast_labels)
    outs = fwd.join(b(core), "url", "left_anti").localCheckpoint(eager=True)
    ins = bwd.join(b(core), "url", "left_anti").localCheckpoint(eager=True)
    rest = (
        verts.join(b(core), "url", "left_anti")
        .join(b(ins), "url", "left_anti")
        .join(b(outs), "url", "left_anti")
        .localCheckpoint(eager=True)
    )
    from_in = _reachable(e, ins, broadcast_labels).join(b(rest), "url", "semi")
    to_out = _reachable(rev, outs, broadcast_labels).join(b(rest), "url", "semi")

    def tag(df: DataFrame, part: str) -> DataFrame:
        return df.select("url", F.lit(part).alias("part"))

    tube = from_in.join(b(to_out), "url", "semi")
    tendril_in = from_in.join(b(to_out), "url", "left_anti")
    tendril_out = to_out.join(b(from_in), "url", "left_anti")
    disc = rest.join(b(from_in), "url", "left_anti").join(
        b(to_out), "url", "left_anti"
    )
    out = tag(core, "CORE")
    for df, part in (
        (ins, "IN"),
        (outs, "OUT"),
        (tube, "TUBE"),
        (tendril_in, "TENDRIL_IN"),
        (tendril_out, "TENDRIL_OUT"),
        (disc, "DISCONNECTED"),
    ):
        out = out.unionByName(tag(df, part))
    return out.select("url", "part")
