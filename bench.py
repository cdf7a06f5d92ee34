"""Benchmark harness: headline engine queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ...,
   "pagerank": {"edges": E, "iterations": K, "edges_per_sec": E*K/t, ...}}

The bench graph is derived deterministically from the events table with a
hub-skew term (10% of edges hit 97 hub vertices) so the shuffle/skew paths
are actually exercised; V scales with the table so bigger sf => bigger graph.

Usage: python bench.py [--scaling]   (--scaling: run PageRank at N and 4N
cores — default local[2]/local[8], SPARK_GRAFT_SCALING_CORES — and print
both throughputs + scaling efficiency; protocol for the north rule's
two-cluster-size criterion, results in BENCH/BASELINE.md.
SPARK_GRAFT_PR_IMPL=csr selects the CSR/Arrow implementation.)
"""

from __future__ import annotations

import json
import os
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
# edge multiplier for the synthetic bench graph (raw edges ~ mult * events)
BENCH_MULT = int(os.environ.get("SPARK_GRAFT_BENCH_MULT", "10"))
# shuffle partitions: default cores-sized for the small suite; the scaling
# protocol pins it to a DATA-sized value identical across arms (partitions
# must scale with bytes, not threads — a 2-thread arm with 2 partitions of
# 64M rows each GC-thrashes exactly like an undersized real cluster would)
SHUFFLE_PARTS = int(os.environ.get("SPARK_GRAFT_SHUFFLE_PARTS", CPUS))


def bench_graph_sql(n_events: int, multiplier: int = 10) -> str:
    """~multiplier * n_events raw edges over n_events/2 vertices, with 10% of
    edges aimed at 97 hub vertices (power-law-ish in-degree skew) so salted
    aggregation / AQE skew handling is actually exercised."""
    v = max(997, n_events // 2)
    # repartition BEFORE the explode: the events table is one file, and the
    # xmult explode would otherwise generate every edge inside a single scan
    # task (hinting the outer select repartitions only the exploded output)
    return (
        f"SELECT 'n' || CAST(event_id % {v} AS STRING) AS src, "
        f"CASE WHEN (event_id + r) % 10 = 0 THEN 'n' || CAST((event_id * 13 + r) % 97 AS STRING) "
        f"ELSE 'n' || CAST((event_id * 31 + user_id * 7919 + r * 104729 + 7) % {v} AS STRING) END AS dst "
        f"FROM (SELECT /*+ REPARTITION({SHUFFLE_PARTS}) */ event_id, user_id FROM events) ev "
        f"LATERAL VIEW explode(sequence(0, {multiplier - 1})) t AS r"
    )


def run_suite(spark, sf_dir: str) -> dict:
    from pyspark.sql import functions as F

    from pagerank_spark.operators.graph_build import LinkGraph

    timings: dict[str, float] = {}
    extra: dict = {}

    spark.read.parquet(f"{sf_dir}/events.parquet").createOrReplaceTempView("events")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n_events = spark.table("events").count()

    t0 = time.monotonic()
    raw = spark.sql(bench_graph_sql(n_events, BENCH_MULT))
    graph = LinkGraph.from_edges(raw, apply_regex_filter=False)
    n_edges = graph.num_edges()
    n_vertices = graph.num_vertices()
    timings["build_graph"] = time.monotonic() - t0

    t0 = time.monotonic()
    metrics: list = []
    ranks = graph.pagerank(alpha=0.85, epsilon=1e-6, metrics=metrics)
    ranks.count()
    dt = time.monotonic() - t0
    timings["pagerank"] = dt
    iters = len(metrics)
    extra["pagerank"] = {
        "edges": n_edges,
        "vertices": n_vertices,
        "iterations": iters,
        "seconds": round(dt, 3),
        "edges_per_sec": round(n_edges * iters / dt, 1),
    }

    t0 = time.monotonic()
    metrics2: list = []
    graph.pagerank_csr(alpha=0.85, epsilon=1e-6, metrics=metrics2).count()
    timings["pagerank_csr"] = time.monotonic() - t0

    t0 = time.monotonic()
    base_labels = graph.connected_components()
    base_labels.count()
    timings["components"] = time.monotonic() - t0

    # incremental CC: time ONLY the delta path (labels given) — append 1%
    # synthetic edges bridging existing vertices
    from pagerank_spark.operators.components import incremental_components

    delta = graph.edges.select("src", "dst").limit(
        max(1, graph.edges.count() // 100)
    ).select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    t0 = time.monotonic()
    incremental_components(base_labels, delta).count()
    timings["incremental_components"] = time.monotonic() - t0

    t0 = time.monotonic()
    graph.label_propagation(max_iterations=3, stop_when_stable=False).count()
    timings["label_propagation3"] = time.monotonic() - t0

    t0 = time.monotonic()
    graph.triangle_count().collect()
    timings["triangles"] = time.monotonic() - t0

    from pagerank_spark.operators.hits import hits as hits_op

    t0 = time.monotonic()
    hits_op(
        spark.sql(
            "SELECT 's' || CAST(event_id % 997 AS STRING) AS src, "
            "'a' || CAST(event_id % (1 + (user_id % 97)) AS STRING) AS dst FROM events"
        ),
        iterations=2,
    ).count()
    timings["hits2"] = time.monotonic() - t0

    from pagerank_spark.operators.kcore import k_core

    t0 = time.monotonic()
    k_core(
        spark.sql(
            "SELECT 's' || CAST(event_id % 997 AS STRING) AS src, "
            "'a' || CAST(event_id % (1 + (user_id % 97)) AS STRING) AS dst FROM events"
        ),
        k=3,
    ).count()
    timings["k_core3"] = time.monotonic() - t0

    from pagerank_spark.operators.walks import random_walks

    t0 = time.monotonic()
    random_walks(graph.edges, walk_length=4, walks_per_vertex=1).count()
    timings["random_walks4"] = time.monotonic() - t0

    from pagerank_spark.operators.distance import link_distance

    t0 = time.monotonic()
    link_distance(
        graph.edges,
        graph.vertices.filter(F.col("url").endswith("0")),
        max_depth=3,
    ).count()
    timings["link_distance3"] = time.monotonic() - t0

    from pagerank_spark.operators.hostgraph import host_graph, host_linkgraph

    hg_sql = (
        "SELECT 'http://www.h' || CAST(user_id % 499 AS STRING) || '.example/p' "
        "|| CAST(event_id AS STRING) AS src, "
        "'http://www.h' || CAST((user_id * 5 + 2) % 499 AS STRING) || '.example/p' "
        "|| CAST((event_id * 17 + 3) % 9973 AS STRING) AS dst FROM events"
    )
    t0 = time.monotonic()
    host_graph(spark.sql(hg_sql)).count()
    timings["host_graph"] = time.monotonic() - t0

    t0 = time.monotonic()
    hgraph = host_linkgraph(spark.sql(hg_sql))
    hgraph.pagerank(alpha=0.85, epsilon=1e-6).count()
    timings["host_pagerank"] = time.monotonic() - t0
    hgraph.unpersist()

    from pagerank_spark.operators.hyperball import harmonic_centrality, hyperball

    t0 = time.monotonic()
    hb = hyperball(graph.edges, rounds=3)
    harmonic_centrality(hb).count()
    timings["hyperball3"] = time.monotonic() - t0

    from pagerank_spark.operators.salsa import salsa as salsa_op

    t0 = time.monotonic()
    salsa_op(
        spark.sql(
            "SELECT 'p' || CAST(event_id % 5 AS STRING) || '_' "
            "|| CAST(event_id % 97 AS STRING) AS src, "
            "'p' || CAST(event_id % 5 AS STRING) || '_' "
            "|| CAST((event_id * 13 + 1) % 101 AS STRING) AS dst FROM events"
        )
    ).count()
    timings["salsa"] = time.monotonic() - t0

    from pagerank_spark.operators.scc import strongly_connected_components

    t0 = time.monotonic()
    strongly_connected_components(
        spark.sql(
            "SELECT 'v' || CAST(event_id % 140 AS STRING) AS src, "
            "'v' || CAST((event_id % 140) - ((event_id % 140) % 5) "
            "+ (((event_id % 140) % 5) + 1) % 5 AS STRING) AS dst "
            "FROM events WHERE event_id % 3 = 0 "
            "UNION ALL "
            "SELECT 'v' || CAST(event_id % 70 AS STRING) AS src, "
            "'v' || CAST((event_id % 70) + 70 AS STRING) AS dst "
            "FROM events WHERE event_id % 3 = 1 "
            "UNION ALL "
            "SELECT 't' || CAST(event_id % 4 AS STRING) AS src, "
            "'t' || CAST((event_id % 4) + 1 AS STRING) AS dst "
            "FROM events WHERE event_id % 3 = 2"
        )
    ).count()
    timings["scc"] = time.monotonic() - t0

    from pagerank_spark.operators.dedup import (
        embedding_near_duplicates,
        minhash_near_duplicates,
        simhash,
        simhash_near_duplicates,
    )
    from pagerank_spark.operators.similarity import (
        ann_ivf_topk,
        ann_lsh_topk,
        brute_force_topk,
    )

    t0 = time.monotonic()
    minhash_near_duplicates(docs, threshold=0.25).count()
    timings["minhash_lsh"] = time.monotonic() - t0

    t0 = time.monotonic()
    simhash(docs).count()
    timings["simhash"] = time.monotonic() - t0

    t0 = time.monotonic()
    simhash_near_duplicates(docs, max_hamming=3).count()
    timings["simhash_pairs"] = time.monotonic() - t0

    t0 = time.monotonic()
    embedding_near_duplicates(emb, threshold=0.35, method="lsh").count()
    timings["embedding_near_dup_lsh"] = time.monotonic() - t0

    t0 = time.monotonic()
    brute_force_topk(emb, [0, 1, 2, 3, 4], k=10).count()
    timings["ann_topk"] = time.monotonic() - t0

    t0 = time.monotonic()
    ann_lsh_topk(emb, [0, 1, 2, 3, 4], k=10).count()
    timings["ann_lsh"] = time.monotonic() - t0

    t0 = time.monotonic()
    ann_ivf_topk(emb, [0, 1, 2, 3, 4], k=10, n_lists=8, nprobe=2).count()
    timings["ann_ivf"] = time.monotonic() - t0

    from pagerank_spark.operators.similarity import quantize_embeddings

    t0 = time.monotonic()
    quantize_embeddings(emb).count()
    timings["quantize_embeddings"] = time.monotonic() - t0

    from pagerank_spark.operators.textops import repetition_stats

    t0 = time.monotonic()
    repetition_stats(docs, n=3).count()
    timings["repetition_stats"] = time.monotonic() - t0

    from pagerank_spark.operators.dedup import decontaminate

    t0 = time.monotonic()
    ev = docs.orderBy(
        F.md5(F.concat(F.lit("eval,"), F.col("doc_id").cast("string"))), F.col("doc_id")
    ).limit(25)
    decontaminate(docs, ev, n=5).count()
    timings["decontaminate"] = time.monotonic() - t0

    from pagerank_spark.operators.sampling import curate, stratified_sample

    t0 = time.monotonic()
    stratified_sample(docs, {"en": 0.5, "de": 0.25, "fr": 0.1}, default_rate=0.05).count()
    timings["stratified_sample"] = time.monotonic() - t0

    t0 = time.monotonic()
    curate(docs).count()
    timings["curate"] = time.monotonic() - t0

    # sampling / packing / corpus-report layer (round-4: previously
    # unbenched contract queries, so regressions there are visible)
    from pagerank_spark.operators.sampling import (
        interleave_shards,
        near_dup_clusters,
        pack_sequences,
        top_k_per_group,
    )
    from pagerank_spark.operators.textops import length_quantiles, with_quality_score

    t0 = time.monotonic()
    pack_sequences(docs, ctx_len=2048, n_shards=64).count()
    timings["pack_sequences"] = time.monotonic() - t0

    t0 = time.monotonic()
    interleave_shards(docs, 64).count()
    timings["interleave_shards"] = time.monotonic() - t0

    t0 = time.monotonic()
    length_quantiles(docs).count()
    timings["length_quantiles"] = time.monotonic() - t0

    t0 = time.monotonic()
    top_k_per_group(with_quality_score(docs), "lang", "quality_score", 5).count()
    timings["topk_per_lang"] = time.monotonic() - t0

    from pagerank_spark.operators.dedup import ngram_jaccard_pairs

    t0 = time.monotonic()
    near_dup_clusters(
        docs, ngram_jaccard_pairs(docs, n=3, threshold=0.4, max_shingle_df=500)
    ).count()
    timings["dedup_clusters"] = time.monotonic() - t0

    from pagerank_spark.functions.urls import domain_page_counts, with_url_parts

    t0 = time.monotonic()
    with_url_parts(graph.vertices).count()
    timings["url_parts"] = time.monotonic() - t0

    t0 = time.monotonic()
    domain_page_counts(graph.vertices).count()
    timings["domain_counts"] = time.monotonic() - t0

    # graph structural statistics + link prediction (round-4 additions)
    from pagerank_spark.operators.graphstats import (
        clustering_coefficients,
        degree_distribution,
        graph_summary,
    )
    from pagerank_spark.operators.linkpred import adamic_adar, cocitation

    t0 = time.monotonic()
    clustering_coefficients(graph.edges).count()
    timings["clustering_coeff"] = time.monotonic() - t0

    t0 = time.monotonic()
    graph_summary(graph.edges).count()
    timings["graph_summary"] = time.monotonic() - t0

    t0 = time.monotonic()
    degree_distribution(graph.edges).count()
    timings["degree_dist"] = time.monotonic() - t0

    lp_like = spark.sql(
        "SELECT 's' || CAST(event_id % 997 AS STRING) AS src, "
        "'a' || CAST(event_id % (1 + (user_id % 97)) AS STRING) AS dst FROM events"
    )
    t0 = time.monotonic()
    cocitation(lp_like, max_citing_outdeg=64, min_count=2).count()
    timings["cocitation"] = time.monotonic() - t0

    # 2099 vertices keeps sf0.1 degrees in 25-42, so cap=32 is ACTIVE (about
    # half the centers survive) and the wedge join still does ~2M-wedge work —
    # a cap that drops every center would bench an empty pipeline.
    t0 = time.monotonic()
    adamic_adar(
        spark.sql(
            "SELECT 'v' || CAST(event_id % 2099 AS STRING) AS src, "
            "'v' || CAST((event_id * 17 + user_id % (1 + event_id % 25)) % 2099 AS STRING) AS dst "
            "FROM events"
        ),
        max_center_degree=32,
        min_common=2,
    ).count()
    timings["adamic_adar"] = time.monotonic() - t0

    from pagerank_spark.operators.dedup import duplicate_span_stats
    from pagerank_spark.operators.textops import pii_scrub

    t0 = time.monotonic()
    pii_scrub(docs).count()
    timings["pii_scrub"] = time.monotonic() - t0

    t0 = time.monotonic()
    duplicate_span_stats(docs, n=3).count()
    timings["dup_spans"] = time.monotonic() - t0

    from pagerank_spark.operators.textsearch import bm25_topk, inverted_index

    t0 = time.monotonic()
    inverted_index(docs, min_df=2).count()
    timings["inverted_index"] = time.monotonic() - t0

    t0 = time.monotonic()
    bm25_topk(docs, ["query", "spark", "window"], k=25).count()
    timings["bm25_topk"] = time.monotonic() - t0

    from pagerank_spark.operators.textsearch import ql_topk

    t0 = time.monotonic()
    ql_topk(docs, ["query", "spark", "window"], k=25, mu=150.0).count()
    timings["ql_topk"] = time.monotonic() - t0

    from pagerank_spark.operators.textsearch import phrase_topk

    t0 = time.monotonic()
    phrase_topk(docs, ["a", "a"], k=25).count()
    timings["phrase_topk"] = time.monotonic() - t0

    from pagerank_spark.operators.dedup import paragraph_dedup

    para_docs = docs.selectExpr(
        "doc_id",
        "'shared header ' || CAST(doc_id % 5 AS STRING) || chr(10) || chr(10) "
        "|| text || chr(10) || chr(10) || 'shared footer paragraph' AS text",
    )
    t0 = time.monotonic()
    paragraph_dedup(para_docs).count()
    timings["paragraph_dedup"] = time.monotonic() - t0

    # round-5 operators: quality verdicts, corpus LM scoring, line-level
    # repetition, url canonicalization, anchor index, rank correlation
    from pagerank_spark.operators.textops import (
        dup_line_stats,
        gopher_filter,
        unigram_logloss,
    )

    t0 = time.monotonic()
    gopher_filter(docs, min_words=30, min_stop_hits=1).count()
    timings["gopher_filter"] = time.monotonic() - t0

    t0 = time.monotonic()
    unigram_logloss(docs).count()
    timings["unigram_logloss"] = time.monotonic() - t0

    line_docs = docs.selectExpr(
        "doc_id",
        "substr(text, 1, 40) || chr(10) || 'repeated line' || chr(10) "
        "|| substr(text, 21, 50) || chr(10) || 'repeated line' AS text",
    )
    t0 = time.monotonic()
    dup_line_stats(line_docs).count()
    timings["dup_line_stats"] = time.monotonic() - t0

    from pagerank_spark.functions.urls import canonical_url_groups

    urls = spark.sql(
        "SELECT CASE WHEN event_id % 3 = 0 THEN 'http://www.h' ELSE 'h' END "
        "|| CAST(user_id % 5000 AS STRING) || '.test/p' "
        "|| CAST(event_id % 9973 AS STRING) "
        "|| (CASE WHEN event_id % 2 = 0 THEN '/' ELSE '' END) AS url FROM events"
    )
    t0 = time.monotonic()
    canonical_url_groups(urls).count()
    timings["canonical_urls"] = time.monotonic() - t0

    from pagerank_spark.operators.textsearch import anchor_term_index

    anchors = spark.sql(
        "SELECT 's' || CAST(event_id % 5000 AS STRING) AS src, "
        "'t' || CAST((event_id * 13 + 5) % 5000 AS STRING) AS dst, "
        "'link to page ' || CAST((event_id * 13 + 5) % 5000 AS STRING) AS anchor "
        "FROM events"
    )
    t0 = time.monotonic()
    anchor_term_index(anchors).count()
    timings["anchor_index"] = time.monotonic() - t0

    from pagerank_spark.operators.graphstats import spearman_correlation

    m = spark.sql(
        "SELECT CAST(event_id % 997 AS BIGINT) AS x, "
        "CAST((event_id * 31 + user_id) % 997 AS BIGINT) AS y FROM events"
    )
    t0 = time.monotonic()
    spearman_correlation(m, "x", "y").count()
    timings["rank_correlation"] = time.monotonic() - t0

    # redirect-chain resolution: alias chains of length 7 over ~events/2
    # sources plus a loop — pointer doubling resolves in 3 rounds + 1
    # stall round regardless of source count
    from pagerank_spark.operators.redirects import resolve_redirects

    redirs = spark.sql(
        "SELECT 'r' || CAST(event_id % 4000000 AS STRING) AS src, "
        "'r' || CAST((event_id % 4000000) + 1 AS STRING) AS dst "
        "FROM events WHERE (event_id % 4000000) % 8 < 7 "
        "UNION ALL SELECT 'loop0', 'loop1' FROM events WHERE event_id % 2 = 0 "
        "UNION ALL SELECT 'loop1', 'loop0' FROM events WHERE event_id % 2 = 1"
    )
    t0 = time.monotonic()
    resolve_redirects(redirs).count()
    timings["resolve_redirects"] = time.monotonic() - t0

    # event-log sessionization + funnel over the real events table: the
    # one-exchange window assignment, the piggybacked (user, session)
    # rollup, and the chained conditional-min funnel
    from pagerank_spark.operators.sessions import funnel, session_stats

    ev = spark.table("events")
    t0 = time.monotonic()
    session_stats(ev, gap_seconds=8 * 3600).count()
    timings["session_stats"] = time.monotonic() - t0
    t0 = time.monotonic()
    funnel(ev.where(F.col("event_id") % 7 == 0)).count()
    timings["funnel"] = time.monotonic() - t0

    # crawl-frontier prioritization + politeness schedule: inflow of the
    # uncrawled pages of a synthetic page graph under 1/outdeg weights
    from pagerank_spark.operators.crawl import frontier_schedule

    fedges = spark.sql(
        "SELECT 'http://h' || CAST(user_id % 97 AS STRING) || '.test/p' "
        "|| CAST(event_id % 2039 AS STRING) AS src, "
        "'http://h' || CAST((user_id * 5 + 2) % 97 AS STRING) || '.test/q' "
        "|| CAST((event_id * 17 + 3) % 2039 AS STRING) AS dst, "
        "1.0 / (1 + event_id % 7) AS weight FROM events"
    )
    franks = spark.sql(
        "SELECT DISTINCT 'http://h' || CAST(user_id % 97 AS STRING) || '.test/p' "
        "|| CAST(event_id % 2039 AS STRING) AS url, "
        "0.5 + ((event_id % 2039) % 100) / 100.0 AS rank FROM events"
    )
    t0 = time.monotonic()
    frontier_schedule(fedges, franks, per_host=2).count()
    timings["frontier_schedule"] = time.monotonic() - t0

    # re-crawl edge diff between two 90%-overlapping snapshots of the
    # page-graph feed — two change-sized anti joins
    from pagerank_spark.operators.graphdiff import edge_diff

    snap_old = fedges.where(F.col("src").isNotNull() & (F.length("dst") % 10 != 0))
    snap_new = fedges.where(F.col("src").isNotNull() & (F.length("dst") % 10 != 1))
    t0 = time.monotonic()
    edge_diff(snap_old, snap_new).count()
    timings["graph_diff"] = time.monotonic() - t0

    # k-truss on a triangle-rich circulant (2039 vertices, offsets 1-5)
    # plus peeling chains — two support rounds to the fixpoint
    from pagerank_spark.operators.ktruss import k_truss

    truss_edges = spark.sql(
        "SELECT 'v' || CAST(event_id % 2039 AS STRING) AS src, "
        "'v' || CAST((event_id + 1 + event_id % 5) % 2039 AS STRING) AS dst "
        "FROM events "
        "UNION ALL "
        "SELECT 'c' || CAST(event_id % 4093 AS STRING) AS src, "
        "'c' || CAST((event_id * 31 + 7) % 4093 AS STRING) AS dst FROM events"
    )
    t0 = time.monotonic()
    k_truss(truss_edges, k=6).count()
    timings["k_truss6"] = time.monotonic() - t0

    # host-level mirror detection over the documents table: per-source
    # 5-gram shingle sets, shingle-keyed pair join with the host-df cap
    from pagerank_spark.operators.mirrors import host_resemblance

    t0 = time.monotonic()
    host_resemblance(docs, n=5, min_common=5, max_shingle_hosts=15).count()
    timings["host_resemblance"] = time.monotonic() - t0

    # cohort retention over the real events table, day periods
    from pagerank_spark.operators.sessions import cohort_retention

    t0 = time.monotonic()
    cohort_retention(ev, period_seconds=86400).count()
    timings["cohort_retention"] = time.monotonic() - t0

    # term co-occurrence PMI + per-source tf-idf keywords over documents
    from pagerank_spark.operators.textsearch import (
        term_cooccurrence_pmi,
        tfidf_keywords,
    )

    t0 = time.monotonic()
    term_cooccurrence_pmi(docs, min_pair_count=120, min_term_df=5).count()
    timings["term_pmi"] = time.monotonic() - t0

    t0 = time.monotonic()
    tfidf_keywords(docs, group_col="source", k=5).count()
    timings["tfidf_keywords"] = time.monotonic() - t0

    # per-community conductance of a hash-bucketed assignment over the main
    # graph (labels vertex-sized, output community-sized)
    from pagerank_spark.operators.graphstats import community_conductance

    cc_labels = graph.vertices.select(
        "url", (F.xxhash64("url") % 64).cast("string").alias("label")
    )
    t0 = time.monotonic()
    community_conductance(graph.edges, cc_labels).count()
    timings["conductance"] = time.monotonic() - t0

    # per-host intra-link fraction on the 499-host page graph
    from pagerank_spark.operators.hostgraph import link_locality

    t0 = time.monotonic()
    link_locality(spark.sql(hg_sql)).count()
    timings["link_locality"] = time.monotonic() - t0

    # order-2 corpus LM cross-entropy + Flesch pass over documents
    from pagerank_spark.operators.textops import bigram_logloss, readability

    t0 = time.monotonic()
    bigram_logloss(docs).count()
    timings["bigram_logloss"] = time.monotonic() - t0

    t0 = time.monotonic()
    readability(docs).count()
    timings["readability"] = time.monotonic() - t0

    # per-doc shingle novelty over documents
    from pagerank_spark.operators.dedup import doc_novelty

    t0 = time.monotonic()
    doc_novelty(docs).count()
    timings["doc_novelty"] = time.monotonic() - t0

    # Luby MIS on the main graph (vertex-priority symmetry breaking)
    from pagerank_spark.operators.mis import maximal_independent_set

    t0 = time.monotonic()
    maximal_independent_set(graph.edges).count()
    timings["mis"] = time.monotonic() - t0

    # double-cover bipartiteness (two components runs) on the main graph
    from pagerank_spark.operators.components import bipartite_check

    t0 = time.monotonic()
    bipartite_check(graph.edges).count()
    timings["bipartite"] = time.monotonic() - t0

    # exact landmark closeness from the '%0' seed sample, depth 3
    from pagerank_spark.operators.distance import closeness_sample

    t0 = time.monotonic()
    closeness_sample(
        graph.edges, graph.vertices.filter(F.col("url").endswith("00")), max_depth=3
    ).count()
    timings["closeness"] = time.monotonic() - t0

    # weighted walks over the 1/outdeg kernel (exponential-race argmin)
    from pagerank_spark.operators.walks import weighted_random_walks

    t0 = time.monotonic()
    weighted_random_walks(graph.edges, walk_length=4, walks_per_vertex=1).count()
    timings["weighted_walks4"] = time.monotonic() - t0

    from pagerank_spark.operators.walks import node2vec_walks

    t0 = time.monotonic()
    node2vec_walks(
        graph.edges, walk_length=4, p=4.0, q=0.25, walks_per_vertex=1
    ).count()
    timings["node2vec_walks4"] = time.monotonic() - t0

    from pagerank_spark.operators.wl import wl_refinement

    t0 = time.monotonic()
    wl_refinement(graph.edges, rounds=2).count()
    timings["wl_labels2"] = time.monotonic() - t0

    # host-conditional boilerplate line removal over documents
    from pagerank_spark.operators.dedup import host_boilerplate

    t0 = time.monotonic()
    host_boilerplate(docs).count()
    timings["host_boilerplate"] = time.monotonic() - t0

    # per-page in-link host diversity on the page graph
    from pagerank_spark.operators.hostgraph import inlink_diversity

    t0 = time.monotonic()
    inlink_diversity(spark.sql(hg_sql)).count()
    timings["inlink_diversity"] = time.monotonic() - t0

    # corpus Zipf exponent over the documents vocabulary
    from pagerank_spark.operators.textops import zipf_alpha

    t0 = time.monotonic()
    zipf_alpha(docs).count()
    timings["zipf_alpha"] = time.monotonic() - t0

    # graph Voronoi partition from the '%00' seed set, depth 3
    from pagerank_spark.operators.distance import nearest_seed

    t0 = time.monotonic()
    nearest_seed(
        graph.edges, graph.vertices.filter(F.col("url").endswith("00")), max_depth=3
    ).count()
    timings["nearest_seed"] = time.monotonic() - t0

    # all-pairs tf-idf cosine near-dup join (df-capped candidates + exact
    # rescore); cap scales with corpus size like the production setting
    from pagerank_spark.operators.textsearch import tfidf_cosine_pairs

    n_docs_b = docs.count()
    t0 = time.monotonic()
    tfidf_cosine_pairs(
        docs, threshold=0.85, max_term_df=max(50, n_docs_b // 5)
    ).count()
    timings["tfidf_cosine"] = time.monotonic() - t0

    # sampled Brandes betweenness from the '%00' landmark set, depth 3
    from pagerank_spark.operators.distance import betweenness_sample

    t0 = time.monotonic()
    betweenness_sample(
        graph.edges, graph.vertices.filter(F.col("url").endswith("00")), max_depth=3
    ).count()
    timings["betweenness3"] = time.monotonic() - t0

    # average-neighbor-degree curve on the page graph
    from pagerank_spark.operators.graphstats import avg_neighbor_degree

    t0 = time.monotonic()
    avg_neighbor_degree(spark.sql(hg_sql)).count()
    timings["avg_neighbor_degree"] = time.monotonic() - t0

    # robots.txt parse + frontier filter over the page-graph hosts
    from pagerank_spark.operators.crawl import robots_allowed, robots_rules

    robots_sql = (
        "SELECT 'www.h' || CAST(k AS STRING) || '.example' AS host, "
        "'User-agent: *' || chr(10) || 'Disallow: /p1' || chr(10) "
        "|| CASE WHEN k % 3 = 0 THEN 'Allow: /p1' || CAST(k AS STRING) "
        "|| chr(10) ELSE '' END AS robots_txt "
        "FROM (SELECT DISTINCT user_id % 499 AS k FROM events) t"
    )
    t0 = time.monotonic()
    rb_rules = robots_rules(spark.sql(robots_sql))
    frontier_df = spark.sql(f"SELECT DISTINCT src AS url FROM ({hg_sql})")
    robots_allowed(frontier_df, rb_rules).count()
    timings["robots_filter"] = time.monotonic() - t0

    # seeded (hard-clamped) label spread, 3 rounds, two seed classes
    from pagerank_spark.operators.labelprop import seeded_label_propagation

    t0 = time.monotonic()
    slp_seeds = graph.vertices.select(
        "url",
        F.when(F.col("url").endswith("0"), F.lit("A"))
        .when(F.col("url").endswith("1"), F.lit("B"))
        .alias("label"),
    ).where(F.col("label").isNotNull())
    seeded_label_propagation(graph.edges, slp_seeds, iterations=3).count()
    timings["seeded_labels3"] = time.monotonic() - t0

    # reciprocal rank fusion of BM25 + rank prior + readability lists
    from pagerank_spark.operators.textops import readability as _readability
    from pagerank_spark.operators.textsearch import (
        bm25_topk as _bm25,
        reciprocal_rank_fusion,
    )

    t0 = time.monotonic()
    fuse_bm25 = _bm25(docs, ["query", "spark", "window"], k=25)
    fuse_prior = (
        docs.select(
            "doc_id", F.round((F.col("doc_id") % 97) / 97.0, 9).alias("prior")
        )
        .orderBy(F.desc("prior"), F.col("doc_id"))
        .limit(25)
    )
    fuse_read = (
        _readability(docs)
        .where(F.col("flesch").isNotNull())
        .select("doc_id", "flesch")
        .orderBy(F.desc("flesch"), F.col("doc_id"))
        .limit(25)
    )
    reciprocal_rank_fusion(
        [(fuse_bm25, "score"), (fuse_prior, "prior"), (fuse_read, "flesch")],
        top_k=30,
    ).count()
    timings["rank_fusion"] = time.monotonic() - t0

    # change-rate estimation + re-crawl schedule over the event crawl log
    from pagerank_spark.operators.crawl import change_rate, recrawl_schedule

    t0 = time.monotonic()
    obs = spark.sql(
        "SELECT 'p' || CAST(event_id % 499 AS STRING) AS url, ts, "
        "user_id % 5 AS fingerprint FROM events"
    )
    recrawl_schedule(change_rate(obs), budget=50).count()
    timings["recrawl_schedule"] = time.monotonic() - t0

    # HTML tag-structure features over synthesized pages (one Arrow pass)
    from pagerank_spark.functions.extract import html_tag_stats_df

    t0 = time.monotonic()
    tag_pages = docs.select(
        F.concat(F.lit("www.s"), F.col("doc_id").cast("string")).alias("url"),
        F.encode(
            F.concat(
                F.lit("<script>var x;</script><p>"),
                F.col("text"),
                F.lit('</p><a href="/x">go</a>'),
            ),
            "UTF-8",
        ).alias("html"),
    )
    html_tag_stats_df(tag_pages).count()
    timings["html_tag_stats"] = time.monotonic() - t0

    # histogram-based curriculum bucketing by token count
    from pagerank_spark.operators.sampling import quantile_buckets

    t0 = time.monotonic()
    qb_v = docs.select(
        "doc_id", F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tokens")
    )
    quantile_buckets(qb_v, "n_tokens", k=10).count()
    timings["curriculum_buckets"] = time.monotonic() - t0

    # sliding-window chunking (zero-shuffle scan)
    from pagerank_spark.operators.sampling import chunk_documents

    t0 = time.monotonic()
    chunk_documents(docs, size=40, stride=30).count()
    timings["chunk_documents"] = time.monotonic() - t0

    # canonical extraction + chain-resolved edge rewrite (parser Arrow
    # pass + pointer doubling + two anti/left join rewrites)
    import __spark_entry__ as entry_mod

    t0 = time.monotonic()
    entry_mod.q_canonical_edges(spark, sf_dir).count()
    timings["canonical_edges"] = time.monotonic() - t0

    # sitemap XML parse (pure JVM regex, zero shuffle)
    t0 = time.monotonic()
    entry_mod.q_sitemap_entries(spark, sf_dir).count()
    timings["sitemap_entries"] = time.monotonic() - t0

    # exact coreness (h-index fixpoint on the bench graph)
    from pagerank_spark.operators.kcore import core_numbers

    t0 = time.monotonic()
    core_numbers(graph.edges).count()
    timings["core_numbers"] = time.monotonic() - t0

    # eigenvector centrality (6 fixed power steps)
    from pagerank_spark.operators.eigencentrality import eigenvector_centrality

    t0 = time.monotonic()
    eigenvector_centrality(graph.edges, iterations=6).count()
    timings["eigenvector6"] = time.monotonic() - t0

    # hashed linear classifier inference over documents
    from pagerank_spark.operators.classify import linear_text_classifier
    from pagerank_spark.operators.sampling import uniform01

    t0 = time.monotonic()
    wdf = spark.range(4096).select(
        F.col("id").alias("bucket"),
        (F.lit(2.0) * uniform01(F.col("id"), "qw") - F.lit(1.0)).alias("weight"),
    )
    linear_text_classifier(docs, wdf, 4096, bias=-0.05).count()
    timings["quality_classifier"] = time.monotonic() - t0

    # Unicode script census (zero-shuffle scan)
    from pagerank_spark.operators.textops import script_profile

    t0 = time.monotonic()
    script_profile(docs).count()
    timings["script_profile"] = time.monotonic() - t0

    # 2-round embedding smoothing over the bench graph (dimension-parallel)
    from pagerank_spark.operators.featprop import feature_propagation

    t0 = time.monotonic()
    fp_verts = graph.vertices.withColumn(
        "_vid",
        F.abs(F.hash("url")).cast("bigint") % F.lit(max(1, emb.count())),
    )
    fp_feats = fp_verts.join(
        emb.select(
            F.col("vec_id").alias("_vid"),
            F.posexplode("embedding").alias("dim", "x"),
        ),
        "_vid",
    ).select("url", "dim", "x")
    feature_propagation(graph.edges, fp_feats, rounds=2).count()
    timings["feature_propagation2"] = time.monotonic() - t0

    # BPE pair statistics (vocabulary-collapsed)
    from pagerank_spark.operators.textsearch import bpe_pair_counts

    t0 = time.monotonic()
    bpe_pair_counts(docs).count()
    timings["bpe_pairs"] = time.monotonic() - t0

    # Jones-Plassmann coloring (hash-priority rounds)
    from pagerank_spark.operators.coloring import greedy_coloring

    t0 = time.monotonic()
    greedy_coloring(graph.edges).count()
    timings["coloring"] = time.monotonic() - t0

    # MAD outliers on token counts (two histogram medians)
    from pagerank_spark.operators.sampling import mad_outliers

    t0 = time.monotonic()
    mad_outliers(
        docs.select(
            "doc_id",
            F.size(F.split(F.col("text"), " ")).cast("long").alias("value"),
        ),
        "value",
    ).count()
    timings["mad_outliers"] = time.monotonic() - t0

    # Bloom build + probe over the bench graph's url universe
    from pagerank_spark.operators.bloom import bloom_might_contain, build_bloom

    t0 = time.monotonic()
    bl_bits = build_bloom(
        graph.edges.select(F.col("dst").alias("url")), m_bits=1 << 20
    )
    bloom_might_contain(
        bl_bits, graph.vertices.select("url"), m_bits=1 << 20
    ).count()
    timings["bloom_filter"] = time.monotonic() - t0

    # bitext candidates / alignment / traps / WL similarity via the
    # contract queries (they decorate deterministic substrates)
    t0 = time.monotonic()
    entry_mod.q_bitext_candidates(spark, sf_dir).count()
    timings["bitext_candidates"] = time.monotonic() - t0

    t0 = time.monotonic()
    entry_mod.q_align_spans(spark, sf_dir).count()
    timings["align_spans"] = time.monotonic() - t0

    t0 = time.monotonic()
    entry_mod.q_url_traps(spark, sf_dir).count()
    timings["url_traps"] = time.monotonic() - t0

    t0 = time.monotonic()
    entry_mod.q_graph_similarity(spark, sf_dir).count()
    timings["graph_similarity"] = time.monotonic() - t0

    # sketches / cube / vocab curve / trend
    from pagerank_spark.operators.sketches import (
        cms_build,
        cms_estimate,
        hll_distinct,
    )

    t0 = time.monotonic()
    hll_distinct(graph.vertices, "url").collect()
    timings["hll_distinct"] = time.monotonic() - t0

    t0 = time.monotonic()
    srcs = graph.edges.select(F.col("src").alias("url"))
    cms_estimate(cms_build(srcs, "url"), srcs, key_col="url").count()
    timings["cms_counts"] = time.monotonic() - t0

    from pagerank_spark.operators.sampling import dimensional_report

    t0 = time.monotonic()
    dimensional_report(docs).count()
    timings["corpus_cube"] = time.monotonic() - t0

    from pagerank_spark.operators.textsearch import vocab_coverage

    t0 = time.monotonic()
    vocab_coverage(docs).count()
    timings["vocab_coverage"] = time.monotonic() - t0

    from pagerank_spark.operators.sessions import crawl_volume_trend

    t0 = time.monotonic()
    crawl_volume_trend(spark.table("events")).count()
    timings["crawl_trend"] = time.monotonic() - t0

    # host churn / fertility / mixture via the contract queries
    t0 = time.monotonic()
    entry_mod.q_host_churn(spark, sf_dir).count()
    timings["host_churn"] = time.monotonic() - t0

    t0 = time.monotonic()
    entry_mod.q_tokenizer_fertility(spark, sf_dir).count()
    timings["tokenizer_fertility"] = time.monotonic() - t0

    t0 = time.monotonic()
    entry_mod.q_mixture_plan(spark, sf_dir).count()
    timings["mixture_plan"] = time.monotonic() - t0

    # data-quality + skew tooling
    from pagerank_spark.operators.profile import table_profile
    from pagerank_spark.operators.skew import salted_join, skew_report

    t0 = time.monotonic()
    table_profile(docs).count()
    timings["table_profile"] = time.monotonic() - t0

    t0 = time.monotonic()
    skew_report(graph.edges, "dst").count()
    timings["skew_report"] = time.monotonic() - t0

    t0 = time.monotonic()
    sj_dim = graph.edges.select("dst").distinct().select(
        "dst", F.length("dst").alias("dim_attr")
    )
    salted_join(
        graph.edges.select("src", "dst"), sj_dim, "dst", salt_col="src"
    ).count()
    timings["salted_join"] = time.monotonic() - t0

    from pagerank_spark.operators.similarity import random_projection

    t0 = time.monotonic()
    random_projection(emb, out_dim=16).count()
    timings["random_projection"] = time.monotonic() - t0

    timings = {k: round(v, 3) for k, v in timings.items()}
    return {"timings": timings, "extra": extra}


def main() -> None:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from pagerank_spark.session import get_spark

    if "--scaling" in sys.argv:
        # two-parallelism-level protocol (no real cluster in this sandbox):
        # identical job at N and 4N cores, same input
        import subprocess

        # the sandbox host shows heavy run-to-run variance (same job: 15-115s),
        # so alternate the two arms and keep each arm's BEST of N repeats —
        # robust to transient slowdowns that would corrupt a single-shot ratio
        repeats = int(os.environ.get("SPARK_GRAFT_SCALING_REPEATS", "3"))
        # N and 4N parallelism arms; default 2->8 so per-iteration parallel
        # compute dominates the ~1.4s fixed job latency at sandbox data sizes
        # (at 8->32 with <=10M edges both arms are latency-bound and the
        # ratio measures nothing)
        lo, hi = os.environ.get("SPARK_GRAFT_SCALING_CORES", "2,8").split(",")
        # SPARK_GRAFT_SCALING_MASTERS="<lo_master>|<hi_master>" switches the
        # arms from local[N] threads to arbitrary masters — the round-5 use
        # is local-cluster[E,C,MB] (SEPARATE executor JVMs with private
        # heaps + a real netty shuffle), the closest sandbox analogue of an
        # N-executor -> 4N-executor cluster scale-out. lo/hi above stay the
        # unit counts (executors for local-cluster) used in the efficiency
        # denominator: eff = (rate_hi/units_hi) / (rate_lo/units_lo).
        masters = os.environ.get("SPARK_GRAFT_SCALING_MASTERS", "")
        arm_master = dict(zip((lo, hi), masters.split("|"))) if masters else {}
        results: dict[str, dict] = {}
        # both arms run the IDENTICAL plan over identically-partitioned data
        # (like adding executors to a cluster); default 64 ~ 2M rows/partition
        # at the 128M-edge protocol size
        parts = os.environ.get("SPARK_GRAFT_SHUFFLE_PARTS", "64")
        # one-time edge-table materialization at full parallelism (untimed)
        import tempfile

        edges_dir = os.environ.get("SPARK_GRAFT_EDGES_DIR") or tempfile.mkdtemp(
            prefix="bench_scaling_edges_"
        )
        prep = subprocess.run(
            [sys.executable, __file__, "--make-scaling-input"],
            capture_output=True, text=True,
            env=dict(os.environ, SPARK_GRAFT_SF_DIR=SF_DIR,
                     SPARK_GRAFT_SHUFFLE_PARTS=parts, SPARK_GRAFT_EDGES_DIR=edges_dir),
        )
        if prep.returncode != 0:
            sys.stderr.write(prep.stderr[-4000:])
            raise SystemExit("scaling input materialization failed")
        for _ in range(repeats):
            for cores in (lo, hi):
                env = dict(os.environ, SPARK_GRAFT_CPUS=cores, SPARK_GRAFT_SF_DIR=SF_DIR,
                           SPARK_GRAFT_SHUFFLE_PARTS=parts, SPARK_GRAFT_EDGES_DIR=edges_dir)
                if arm_master:
                    env["SPARK_GRAFT_MASTER"] = arm_master[cores]
                out = subprocess.run(
                    [sys.executable, __file__, "--pagerank-only"],
                    capture_output=True, text=True, env=env,
                )
                if out.returncode != 0:
                    sys.stderr.write(out.stderr[-4000:])
                    raise SystemExit(f"arm local[{cores}] failed rc={out.returncode}")
                r = json.loads(out.stdout.strip().splitlines()[-1])
                best = results.get(cores)
                if best is None or r["pagerank"]["seconds"] < best["pagerank"]["seconds"]:
                    results[cores] = r
        tlo = results[lo]["pagerank"]["edges_per_sec"]
        thi = results[hi]["pagerank"]["edges_per_sec"]
        eff = (thi / int(hi)) / (tlo / int(lo))
        print(json.dumps({
            "metric": (f"pagerank_scaling_{arm_master[lo]}_to_{arm_master[hi]}"
                       if arm_master else
                       f"pagerank_scaling_local{lo}_to_local{hi}"),
            "sf": SF_DIR,
            f"local{lo}": results[lo]["pagerank"],
            f"local{hi}": results[hi]["pagerank"],
            "throughput_ratio": round(thi / tlo, 3),
            "scaling_efficiency": round(eff, 3),
        }))
        return

    if "--personalized-batch" in sys.argv:
        # amortization protocol (round-4 stretch item): Q personalized runs
        # over ONE graph — batch-CSR (one spill, warm mmap blocks for
        # queries 2..Q) vs Q independent v1 join-agg runs on the same
        # prebuilt edge table (v1 has no spill to amortize; it is the
        # honest baseline). Arms ALTERNATE in fresh subprocesses, best-of-N
        # per arm — measured same-session the second arm inherits the
        # first's JVM/GC state and the comparison is order-contaminated.
        import subprocess
        import tempfile

        repeats = int(os.environ.get("SPARK_GRAFT_PBATCH_REPEATS", "2"))
        parts = os.environ.get("SPARK_GRAFT_SHUFFLE_PARTS", SHUFFLE_PARTS)
        edges_dir = os.environ.get("SPARK_GRAFT_EDGES_DIR") or tempfile.mkdtemp(
            prefix="bench_pbatch_edges_"
        )
        prep = subprocess.run(
            [sys.executable, __file__, "--make-scaling-input"],
            capture_output=True, text=True,
            env=dict(os.environ, SPARK_GRAFT_SF_DIR=SF_DIR,
                     SPARK_GRAFT_SHUFFLE_PARTS=str(parts),
                     SPARK_GRAFT_EDGES_DIR=edges_dir),
        )
        if prep.returncode != 0:
            sys.stderr.write(prep.stderr[-4000:])
            raise SystemExit("personalized-batch input materialization failed")
        best: dict[str, dict] = {}
        for _ in range(repeats):
            for impl in ("joinagg", "csr"):
                env = dict(os.environ, SPARK_GRAFT_SF_DIR=SF_DIR,
                           SPARK_GRAFT_PR_IMPL=impl,
                           SPARK_GRAFT_SHUFFLE_PARTS=str(parts),
                           SPARK_GRAFT_EDGES_DIR=edges_dir)
                out = subprocess.run(
                    [sys.executable, __file__, "--pbatch-arm"],
                    capture_output=True, text=True, env=env,
                )
                if out.returncode != 0:
                    sys.stderr.write(out.stderr[-4000:])
                    raise SystemExit(f"pbatch arm {impl} failed rc={out.returncode}")
                r = json.loads(out.stdout.strip().splitlines()[-1])
                if impl not in best or r["seconds"] < best[impl]["seconds"]:
                    best[impl] = r
        v1, csr = best["joinagg"], best["csr"]
        print(json.dumps({
            "metric": f"personalized_batch_q{v1['q']}",
            "sf": SF_DIR, "cores": CPUS, "edges": v1["edges"],
            "v1_seconds": v1["seconds"], "csr_seconds": csr["seconds"],
            "csr_setup_s": csr["setup_s"],
            "speedup": round(v1["seconds"] / csr["seconds"], 3),
            "v1_per_query_s": v1["per_query_s"],
            "csr_per_query_s": csr["per_query_s"],
            "iterations": csr["iterations"],
        }))
        return

    # SPARK_GRAFT_MASTER overrides the thread-local master (scaling arms use
    # local-cluster[E,C,MB] — separate executor JVMs); executor memory/cores
    # only apply on non-local masters, where executors are real processes
    _master = os.environ.get("SPARK_GRAFT_MASTER") or f"local[{CPUS}]"
    _extra: dict = {}
    if _master.startswith("local-cluster"):
        _extra["spark.executor.memory"] = os.environ.get("SPARK_GRAFT_EXEC_MEM", "16g")
        # local-cluster workers inherit this PYTHONPATH so any python worker
        # (none on the pure-JVM pagerank path, but harmless) finds the package
        _extra["spark.executorEnv.PYTHONPATH"] = os.path.dirname(os.path.abspath(__file__))
        # all executors share one box + loopback: cached-block locality is
        # meaningless, and the default 3 s locality wait stalls every stage
        # touching a persisted partition on 1-core executors (measured
        # 1.7 s/iter -> 7.6 s/iter at 4x1 executors before zeroing this)
        _extra["spark.locality.wait"] = "0s"
    spark = get_spark("bench", master=_master, shuffle_partitions=SHUFFLE_PARTS,
                      extra_conf=_extra)
    try:
        if "--make-scaling-input" in sys.argv:
            # materialize the weighted bench edge table ONCE (at full build
            # parallelism) so the measured arms only scan parquet + iterate;
            # the build is not part of the north-rule metric
            from pagerank_spark.operators.graph_build import LinkGraph

            out = os.environ["SPARK_GRAFT_EDGES_DIR"]
            spark.read.parquet(f"{SF_DIR}/events.parquet").createOrReplaceTempView("events")
            n_events = spark.table("events").count()
            raw = spark.sql(bench_graph_sql(n_events, BENCH_MULT))
            graph = LinkGraph.from_edges(raw, apply_regex_filter=False)
            graph.edges.write.mode("overwrite").parquet(f"{out}/edges")
            graph.vertices.write.mode("overwrite").parquet(f"{out}/vertices")
            print(json.dumps({"edges": graph.num_edges(), "vertices": graph.num_vertices()}))
            return

        if "--pbatch-arm" in sys.argv:
            # one arm of the personalized-batch protocol: Q personalization
            # runs through ONE impl (SPARK_GRAFT_PR_IMPL), fresh JVM — the
            # driver (--personalized-batch below) alternates arms in
            # subprocesses so neither impl inherits the other's JVM state
            from pyspark.sql import functions as F

            from pagerank_spark.operators.graph_build import LinkGraph
            from pagerank_spark.operators.personalize import personalized_batch

            Q = int(os.environ.get("SPARK_GRAFT_PBATCH_Q", "8"))
            impl = os.environ.get("SPARK_GRAFT_PR_IMPL", "csr")
            alpha = float(os.environ.get("SPARK_GRAFT_PR_ALPHA", "0.85"))
            eps = float(os.environ.get("SPARK_GRAFT_PR_EPSILON", "1e-6"))
            max_iter = int(os.environ.get("SPARK_GRAFT_PR_MAXITER", "1000"))
            pre = os.environ.get("SPARK_GRAFT_EDGES_DIR")
            if pre:
                graph = LinkGraph(
                    spark.read.parquet(f"{pre}/edges"),
                    spark.read.parquet(f"{pre}/vertices"),
                    num_partitions=SHUFFLE_PARTS,
                )
            else:
                spark.read.parquet(f"{SF_DIR}/events.parquet").createOrReplaceTempView("events")
                n_events = spark.table("events").count()
                graph = LinkGraph.from_edges(
                    spark.sql(bench_graph_sql(n_events, BENCH_MULT)),
                    apply_regex_filter=False,
                )
            n_edges = graph.num_edges()
            # Q deterministic personalization vectors (hash-bucket
            # indicators), materialized BEFORE the timer — identical for
            # both arms and not what the protocol measures
            vs = {}
            for r in range(Q):
                v = graph.vertices.withColumn(
                    "v",
                    F.when(F.abs(F.xxhash64("url")) % Q == r, 1.0).otherwise(0.0),
                )
                total = v.agg(F.sum("v")).first()[0]
                vs[f"q{r}"] = (
                    v.withColumn("v", F.col("v") / F.lit(float(total)))
                    .localCheckpoint(eager=True)
                )
            m: list = []
            t0 = time.monotonic()
            personalized_batch(graph, vs, impl=impl, alpha=alpha,
                               epsilon=eps, max_iterations=max_iter,
                               num_blocks=SHUFFLE_PARTS, metrics=m)
            t = time.monotonic() - t0
            print(json.dumps({
                "impl": impl, "q": Q, "edges": n_edges, "cores": CPUS,
                "seconds": round(t, 3),
                "setup_s": round(m[0].get("setup_wall_s", 0.0), 3),
                "per_query_s": [round(x["wall_s"], 3) for x in m],
                "iterations": [x["iterations"] for x in m],
            }))
            return

        if "--pagerank-only" in sys.argv:
            from pagerank_spark.operators.graph_build import LinkGraph

            pre = os.environ.get("SPARK_GRAFT_EDGES_DIR")
            if pre:
                graph = LinkGraph(
                    spark.read.parquet(f"{pre}/edges"),
                    spark.read.parquet(f"{pre}/vertices"),
                    num_partitions=SHUFFLE_PARTS,
                )
            else:
                spark.read.parquet(f"{SF_DIR}/events.parquet").createOrReplaceTempView("events")
                n_events = spark.table("events").count()
                raw = spark.sql(bench_graph_sql(n_events, BENCH_MULT))
                graph = LinkGraph.from_edges(raw, apply_regex_filter=False)
            n_edges = graph.num_edges()
            # SPARK_GRAFT_PR_IMPL=csr selects the CSR/Arrow SpMV path so the
            # scaling protocol can be run against either implementation
            impl = os.environ.get("SPARK_GRAFT_PR_IMPL", "joinagg")
            pr = graph.pagerank_csr if impl == "csr" else graph.pagerank
            # SPARK_GRAFT_PR_ALPHA drives iteration count (alpha -> 1 is the
            # reference's slow-convergence Part-4 regime: the steady-state
            # per-iteration comparison where the CSR path's one-time setup
            # amortizes); SPARK_GRAFT_PR_MAXITER caps the run
            alpha = float(os.environ.get("SPARK_GRAFT_PR_ALPHA", "0.85"))
            max_iter = int(os.environ.get("SPARK_GRAFT_PR_MAXITER", "1000"))
            # epsilon=0 + MAXITER=k forces exactly k iterations — the honest
            # way to measure steady-state per-iteration rates on a synthetic
            # expander that epsilon-converges in ~6-9 rounds at any alpha
            eps = float(os.environ.get("SPARK_GRAFT_PR_EPSILON", "1e-6"))
            t0 = time.monotonic()
            metrics: list = []
            pr(alpha=alpha, epsilon=eps, max_iterations=max_iter, metrics=metrics).count()
            dt = time.monotonic() - t0
            walls = sorted(m["wall_s"] for m in metrics)
            print(json.dumps({
                "pagerank": {
                    "cores": CPUS,
                    "impl": impl,
                    "alpha": alpha,
                    "edges": n_edges,
                    "iterations": len(metrics),
                    "seconds": round(dt, 3),
                    "edges_per_sec": round(n_edges * len(metrics) / dt, 1),
                    # setup-vs-steady-state decomposition: iteration walls
                    # (median ~ steady state; seconds - sum(walls) ~ setup,
                    # which for the CSR impl includes the one-time spill)
                    "median_iter_s": round(walls[len(walls) // 2], 3) if walls else None,
                    "iter_walls_s": [round(m["wall_s"], 3) for m in metrics],
                }
            }))
            return

        # the sandbox host drifts ~2x across hours; a single-shot suite makes
        # round-over-round diffs drift-dominated. Run the suite N times (same
        # session — JVM/code-cache warm-up is part of what best-of measures)
        # and report per-query BEST, with every raw run recorded for audit.
        repeats = int(os.environ.get("SPARK_GRAFT_SUITE_REPEATS", "2"))
        runs = [run_suite(spark, SF_DIR) for _ in range(repeats)]
        best = {
            k: min(r["timings"][k] for r in runs) for k in runs[0]["timings"]
        }
        # headline extra comes from the run whose pagerank was fastest
        extra = min(runs, key=lambda r: r["timings"]["pagerank"])["extra"]
        total = round(sum(best.values()), 3)
        # stdout gets EXACTLY ONE compact JSON line (the driver captures a
        # bounded tail of stdout — round 4's summary grew past that window
        # and BENCH_r04.json recorded `parsed: null`); the raw per-repeat
        # runs go to a sidecar file for audit instead of stdout
        detail_path = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "BENCH", "suite_runs_latest.json"
        )
        try:
            with open(detail_path, "w") as f:
                json.dump({"runs": [r["timings"] for r in runs], "sf": SF_DIR,
                           "cores": CPUS, **extra}, f)
        except OSError:
            detail_path = None
        print(json.dumps({
            "metric": "engine_suite_seconds",
            "value": total,
            "unit": "sec",
            "queries": {k: round(v, 3) for k, v in best.items()},
            "sf": SF_DIR,
            "cores": CPUS,
            "pagerank": extra.get("pagerank"),
            "runs_detail": detail_path,
        }, separators=(",", ":")))
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
