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
