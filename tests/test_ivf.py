"""IVF-Flat ANN (operators/similarity.py ivf_* / ann_ivf_topk).

The reference's only similarity op is gensim most_similar (reference
pagerank.py:224-227); IVF is the data-adaptive ANN scale path the build
brief asks for ("an IVF or LSH-bucketed variant as the scale path").
"""

from __future__ import annotations

import pytest

from pagerank_spark.operators.similarity import (
    ann_ivf_topk,
    brute_force_topk,
    ivf_assign,
    ivf_centroids,
    write_ivf_index,
)


@pytest.fixture(scope="module")
def clustered(spark):
    # 8 well-separated clusters so Voronoi cells are meaningful
    import numpy as np

    rng = np.random.RandomState(11)
    base = 4.0 * rng.randn(8, 16)
    vecs = []
    for i in range(160):
        c = base[i % 8] + 0.25 * rng.randn(16)
        vecs.append((i, [float(x) for x in c]))
    df = spark.createDataFrame(vecs, ["vec_id", "embedding"])
    df.persist().count()
    yield df
    df.unpersist()


def test_centroids_deterministic(clustered):
    a = ivf_centroids(clustered, n_lists=4)
    b = ivf_centroids(clustered, n_lists=4)
    assert a == b
    assert [c[0] for c in a] == [0, 1, 2, 3]
    # a different seed draws a different sample
    c = ivf_centroids(clustered, n_lists=4, seed="other")
    assert [x[1] for x in a] != [x[1] for x in c]


def test_exhaustive_probe_equals_brute_force(clustered):
    # nprobe = n_lists scans every cell -> must equal exact top-k bit-for-bit
    qids = [0, 1, 2]
    bf = [tuple(r) for r in
          brute_force_topk(clustered, qids, k=5).orderBy("query_id", "rn").collect()]
    ivf = [tuple(r) for r in
           ann_ivf_topk(clustered, qids, k=5, n_lists=4, nprobe=4)
           .orderBy("query_id", "rn").collect()]
    assert ivf == bf


def test_arrow_assign_matches_exact(clustered):
    cents = ivf_centroids(clustered, n_lists=4)
    exact = {r["vec_id"]: r["list_id"] for r in
             ivf_assign(clustered, cents, method="exact").collect()}
    arrow = {r["vec_id"]: r["list_id"] for r in
             ivf_assign(clustered, cents, method="arrow").collect()}
    assert exact == arrow


def test_nprobe_recall_on_clustered_corpus(clustered):
    # with tight clusters, a query's true neighbors live in its own cell:
    # even nprobe=2 of 8 recovers most of the exact top-10
    qids = [0, 1, 2]
    truth = {}
    for r in brute_force_topk(clustered, qids, k=10).collect():
        truth.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    got = {}
    for r in ann_ivf_topk(clustered, qids, k=10, n_lists=8, nprobe=2).collect():
        got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    recalls = [len(truth[q] & got.get(q, set())) / 10 for q in qids]
    assert sum(recalls) / len(recalls) >= 0.7, recalls
    # and approximate results are always a subset of some exact cosine pair:
    # cosines of surviving pairs equal the exact ones (rerank is exact)
    exact_cos = {(r["query_id"], r["neighbor_id"]): r["cosine"]
                 for r in brute_force_topk(clustered, qids, k=160).collect()}
    for r in ann_ivf_topk(clustered, qids, k=10, n_lists=8, nprobe=2).collect():
        assert exact_cos[(r["query_id"], r["neighbor_id"])] == r["cosine"]


def test_prebuilt_index_partition_pruning(clustered, tmp_path):
    # write_ivf_index partitions by list_id; probing nprobe lists must show
    # PartitionFilters in the scan (the 100-TB story: a probe reads
    # nprobe/n_lists of the corpus, not all of it)
    cents = ivf_centroids(clustered, n_lists=4)
    path = str(tmp_path / "ivf_index")
    write_ivf_index(ivf_assign(clustered, cents), path)
    spark = clustered.sparkSession
    idx = spark.read.parquet(path)
    plan = (idx.filter(idx.list_id.isin([0, 2]))
            ._jdf.queryExecution().executedPlan().toString())
    assert "PartitionFilters" in plan and "list_id" in plan

    # the prebuilt index drives the same search result as inline assignment
    qids = [0, 1]
    inline = [tuple(r) for r in
              ann_ivf_topk(clustered, qids, k=5, n_lists=4, nprobe=4,
                           centroids=cents).orderBy("query_id", "rn").collect()]
    prebuilt = [tuple(r) for r in
                ann_ivf_topk(clustered, qids, k=5, n_lists=4, nprobe=4,
                             centroids=cents, assigned=idx)
                .orderBy("query_id", "rn").collect()]
    assert prebuilt == inline


def test_assign_rejects_unknown_method(clustered):
    cents = ivf_centroids(clustered, n_lists=4)
    with pytest.raises(ValueError):
        ivf_assign(clustered, cents, method="bogus")

def test_auto_lists_policy():
    # ~sqrt(n) clamped to [IVF_LISTS, IVF_MAX_LISTS]: the standard IVF
    # sizing rule balancing centroid-scan vs cell-scan cost per probe
    from pagerank_spark.operators.similarity import (
        IVF_LISTS,
        IVF_MAX_LISTS,
        auto_lists,
    )

    assert auto_lists(0) == IVF_LISTS
    assert auto_lists(10) == IVF_LISTS                 # clamp at min
    assert auto_lists(10_000) == 100
    assert auto_lists(10**12) == IVF_MAX_LISTS         # clamp at cap (2^16)
    assert auto_lists(10**12, max_lists=10**9) == 10**6  # cap is a parameter
    # monotone in n
    prev = 0
    for exp in range(2, 14):
        cur = auto_lists(10**exp)
        assert cur >= prev
        prev = cur


def test_auto_lists_wired_into_train_and_search(clustered):
    # n_lists=None flows through ivf_centroids / ann_ivf_topk as the
    # corpus-sized policy (160 rows -> sqrt -> clamped to IVF_LISTS=8)
    from pagerank_spark.operators.similarity import auto_lists

    n = clustered.count()
    cents = ivf_centroids(clustered, n_lists=None)
    assert len(cents) == auto_lists(n) == 13
    got = ann_ivf_topk(clustered, [0, 1], k=5, n_lists=None,
                       nprobe=13).orderBy("query_id", "rn").collect()
    bf = brute_force_topk(clustered, [0, 1], k=5).orderBy(
        "query_id", "rn").collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in bf]


def test_lloyd_refinement_beats_sampled_recall(spark):
    # ivf_refine: fixed-round distributed Lloyd on the md5-sampled init.
    # With a SINGLE probe per query, cell quality is everything: sampled
    # MEMBER vectors sit off-center, so their Voronoi boundaries in cosine
    # space cut through clusters and boundary points probe the wrong cell;
    # Lloyd means migrate to the true cluster centers and the boundaries
    # align. On the loose-cluster corpus below (same 8 centers as the module
    # fixture but spread 1.2, where the effect is pronounced) the measured
    # gap is ~0.78 -> ~0.98, and it holds for every init seed probed — the
    # tight margin asserted here keeps the test robust to fp aggregation
    # order in the means while still failing if refinement ever regresses.
    import numpy as np

    from pagerank_spark.operators.similarity import ivf_refine

    rng = np.random.RandomState(11)
    base = 4.0 * rng.randn(8, 16)
    vecs = [(i, [float(x) for x in base[i % 8] + 1.2 * rng.randn(16)])
            for i in range(160)]
    loose = spark.createDataFrame(vecs, ["vec_id", "embedding"])
    loose.persist().count()
    try:
        qids = list(range(8))
        truth = {}
        for r in brute_force_topk(loose, qids, k=10).collect():
            truth.setdefault(r["query_id"], set()).add(r["neighbor_id"])

        def recall(centroids):
            got = {}
            rows = ann_ivf_topk(loose, qids, k=10, nprobe=1,
                                centroids=centroids).collect()
            for r in rows:
                got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
            return sum(len(truth[q] & got.get(q, set())) for q in qids) / (10 * len(qids))

        sampled = ivf_centroids(loose, n_lists=8)
        refined = ivf_refine(loose, sampled, rounds=3)
        assert len(refined) == len(sampled)
        assert [c[0] for c in refined] == [c[0] for c in sampled]
        r_sampled, r_refined = recall(sampled), recall(refined)
        # measured: 0.775 -> 0.975; assert a real gap, not just >=
        assert r_refined >= r_sampled + 0.1, (r_sampled, r_refined)
        assert r_refined >= 0.9, (r_sampled, r_refined)
        # and the inline lloyd_rounds= path builds the same index
        via_param = [tuple(r) for r in
                     ann_ivf_topk(loose, qids, k=10, n_lists=8, nprobe=1,
                                  lloyd_rounds=3).orderBy("query_id", "rn").collect()]
        via_cents = [tuple(r) for r in
                     ann_ivf_topk(loose, qids, k=10, nprobe=1,
                                  centroids=refined).orderBy("query_id", "rn").collect()]
        assert via_param == via_cents
    finally:
        loose.unpersist()


def test_lloyd_empty_cell_keeps_previous_centroid(spark):
    # a centroid whose cell empties keeps its previous position (standard
    # Lloyd rule) instead of crashing or collapsing to NaN
    from pagerank_spark.operators.similarity import ivf_refine

    # two tight clusters, both seeds drawn from cluster A by construction:
    # after one round, one centroid owns ~all of A, the other migrates or
    # (if its cell empties) stays put — either way shapes stay valid
    rows = [(i, [10.0 + 0.01 * i, 0.0]) for i in range(10)] + [
        (i, [0.0, 10.0 + 0.01 * i]) for i in range(10, 20)
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    cents = ivf_centroids(df, n_lists=4)
    refined = ivf_refine(df, cents, rounds=2)
    assert len(refined) == 4
    for _list_id, vec, norm in refined:
        assert len(vec) == 2 and norm > 0
        assert all(x == x for x in vec)  # no NaN

    with __import__("pytest").raises(ValueError):
        ivf_refine(df, cents, rounds=0)


def test_quantize_embeddings_roundtrip_and_edges(spark):
    """Codes hit 0/255 at the corpus extremes, a constant dimension codes
    to 0, and dequantization reconstructs within half a step."""
    from pagerank_spark.operators.similarity import quantize_embeddings

    embs = spark.createDataFrame(
        [(1, [0.0, 5.0, -2.0]), (2, [10.0, 5.0, 2.0]), (3, [2.5, 5.0, 0.0])],
        ["vec_id", "embedding"],
    )
    rows = {(r["vec_id"], r["dim"]): (r["code"], r["dequantized"])
            for r in quantize_embeddings(embs, exploded=True).collect()}
    # dim 0 spans [0,10]: extremes 0 and 255; 2.5 -> floor(63.75+0.5)=64
    assert rows[(1, 0)][0] == 0 and rows[(2, 0)][0] == 255
    assert rows[(3, 0)][0] == 64
    # constant dim 1 -> code 0
    assert all(rows[(i, 1)][0] == 0 for i in (1, 2, 3))
    # reconstruction error <= half a quantization step per dim
    for (vid, dim), (code, deq) in rows.items():
        orig = {1: [0.0, 5.0, -2.0], 2: [10.0, 5.0, 2.0], 3: [2.5, 5.0, 0.0]}[vid][dim]
        span = {0: 10.0, 1: 0.0, 2: 4.0}[dim]
        if span:
            assert abs(deq - orig) <= span / 255 / 2 + 1e-9
    # packed form: one codes array per vector
    packed = quantize_embeddings(embs).collect()
    assert {r["vec_id"]: list(r["codes"]) for r in packed}[2] == [255, 0, 255]


def test_label_cluster_quality_separated_fixture(spark):
    """Two tight orthogonal-ish clusters + one stray label: cohesion near
    1 for tight clusters, nearest-centroid picks the geometrically
    closest other label."""
    from pagerank_spark.operators.similarity import label_cluster_quality

    rows = []
    # label 0 near e1, label 1 near e2, label 2 between 0 and 1's axes
    for i in range(4):
        rows.append((i, [10.0, float(i % 2), 0.0], 0))
    for i in range(4, 8):
        rows.append((i, [0.0, 10.0, float(i % 2)], 1))
    for i in range(8, 12):
        rows.append((i, [7.0, 7.0, float(i % 2)], 2))
    df = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
    got = {r["label"]: r for r in label_cluster_quality(df).collect()}
    assert set(got) == {0, 1, 2}
    for lab in (0, 1, 2):
        assert got[lab]["n_vecs"] == 4
        assert got[lab]["mean_intra_cos"] > 0.99
    # the diagonal cluster 2 is everyone's nearest; clusters 0/1 are
    # near-orthogonal to each other
    assert got[0]["nearest_label"] == 2 and got[1]["nearest_label"] == 2
    assert got[2]["nearest_cos"] > 0.6


def test_random_projection_matches_python_replay(spark):
    import hashlib

    from pagerank_spark.operators.similarity import random_projection

    vecs = {}
    for v in range(6):
        vecs[v] = [round((int(hashlib.md5(f"rp{v},{i}".encode())
                              .hexdigest()[:8], 16) % 1000) / 250.0 - 2.0, 9)
                   for i in range(8)]
    df = spark.createDataFrame(
        [(v, [float(x) for x in xs]) for v, xs in vecs.items()],
        "vec_id long, embedding array<double>",
    )
    K = 4
    got = {(r["vec_id"], r["dim"]): r["y"]
           for r in random_projection(df, out_dim=K).collect()}

    def sign(i, j):
        h = int(hashlib.md5(f"jl,{i},{j}".encode()).hexdigest()[:15], 16)
        return 1 if h % 2 == 0 else -1

    import math
    for v, xs in vecs.items():
        for j in range(K):
            want = round(sum(sign(i, j) * xs[i] for i in range(8))
                         / math.sqrt(K), 6)
            assert got[(v, j)] == pytest.approx(want, abs=1e-9), (v, j)


def test_random_projection_preserves_distances_roughly(spark):
    import hashlib
    import math

    import numpy as np

    from pagerank_spark.operators.similarity import random_projection

    rng_rows = []
    for v in range(40):
        xs = [((int(hashlib.md5(f"dp{v},{i}".encode()).hexdigest()[:8], 16)
                % 2000) / 500.0 - 2.0) for i in range(32)]
        rng_rows.append((v, xs))
    df = spark.createDataFrame(rng_rows, "vec_id long, embedding array<double>")
    out = random_projection(df, out_dim=16).collect()
    proj = {}
    for r in out:
        proj.setdefault(r["vec_id"], {})[r["dim"]] = r["y"]
    X = {v: np.array(xs) for v, xs in rng_rows}
    Y = {v: np.array([proj[v][j] for j in range(16)]) for v, _ in rng_rows}
    ratios = []
    for a in range(0, 20, 3):
        for b in range(1, 20, 3):
            if a == b:
                continue
            d0 = np.linalg.norm(X[a] - X[b])
            d1 = np.linalg.norm(Y[a] - Y[b])
            if d0 > 0:
                ratios.append(d1 / d0)
    # JL with k=16: distances preserved within a loose band
    assert 0.4 < min(ratios) and max(ratios) < 1.8, (min(ratios), max(ratios))
