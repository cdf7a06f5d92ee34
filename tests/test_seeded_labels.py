"""Seeded (hard-clamped) label propagation: hand fixtures pin the round
semantics — frozen seeds, min-label tie-break, re-voting non-seeds, unlabeled
vertices excluded from the output."""

from pagerank_spark.operators.labelprop import seeded_label_propagation


def _run(spark, edges, seeds, iterations):
    e = spark.createDataFrame(edges, ["src", "dst"])
    s = spark.createDataFrame(seeds, ["url", "label"])
    rows = seeded_label_propagation(e, s, iterations=iterations, num_partitions=4).collect()
    return {r["url"]: r["label"] for r in rows}


PATH = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"), ("e", "f")]


def test_path_spread_and_tie_flip(spark):
    # round 1: b<-A, e<-B; round 2: c<-A, d<-B; round 3: c ties(A,B)->A,
    # d ties(A,B)->A — the non-seed re-vote flips d from B to A
    got = _run(spark, PATH, [("a", "A"), ("f", "B")], iterations=3)
    assert got == {"a": "A", "b": "A", "c": "A", "d": "A", "e": "B", "f": "B"}


def test_partial_spread_leaves_unreached_unlabeled(spark):
    # disconnected unseeded pair never appears in the output
    edges = PATH + [("g", "h")]
    got = _run(edges=edges, spark=spark, seeds=[("a", "A"), ("f", "B")], iterations=1)
    assert got == {"a": "A", "b": "A", "e": "B", "f": "B"}


def test_seed_clamp_survives_majority(spark):
    # z is outvoted 2-to-0 every round but stays clamped to B
    tri = [("x", "y"), ("y", "z"), ("z", "x")]
    got = _run(spark, tri, [("x", "A"), ("y", "A"), ("z", "B")], iterations=4)
    assert got == {"x": "A", "y": "A", "z": "B"}


def test_labels_only_from_seed_alphabet(spark):
    from pagerank_spark.fixtures import synth_edges

    edges = synth_edges(60, 150, seed=41)
    verts = sorted({u for e in edges for u in e})
    seeds = [(verts[0], "S1"), (verts[-1], "S2"), (verts[len(verts) // 2], "S3")]
    got = _run(spark, edges, seeds, iterations=3)
    assert set(got.values()) <= {"S1", "S2", "S3"}
    for url, lab in seeds:
        assert got[url] == lab
