"""Inverted index / BM25 retrieval / C4 filter / blocklist
(operators/textsearch.py) hand fixtures, including a pure-Python BM25
replay pinning the scoring formula."""

import math

import pytest
from pyspark.sql import functions as F

from pagerank_spark.operators.textsearch import (
    BM25_B,
    BM25_K1,
    blocklist_filter,
    bm25_topk,
    c4_filter,
    inverted_index,
    postings,
    ranked_retrieval,
)

CORPUS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "the lazy dog sleeps all day the dog dreams"),
    (3, "quick foxes and quick hares run quick circles"),
    (4, "completely unrelated text about spark engines"),
]


def _tok(s):
    import re

    return re.findall(r"[a-z0-9]+", s.lower())


def test_postings_and_index(spark):
    docs = spark.createDataFrame(CORPUS, ["doc_id", "text"])
    post = {(r["term"], r["doc_id"]): r["tf"] for r in postings(docs).collect()}
    assert post[("the", 1)] == 2
    assert post[("the", 2)] == 2
    assert post[("quick", 3)] == 3
    assert ("fox", 2) not in post

    idx = {r["term"]: (r["df"], r["cf"]) for r in inverted_index(docs).collect()}
    assert idx["dog"] == (2, 3)  # docs 1,2; tf 1+2
    assert idx["quick"] == (2, 4)
    # min_df prunes hapaxes
    idx2 = {r["term"] for r in inverted_index(docs, min_df=2).collect()}
    assert "fox" not in idx2 and "dog" in idx2


def test_bm25_matches_python_replay(spark):
    docs = spark.createDataFrame(CORPUS, ["doc_id", "text"])
    terms = ["quick", "dog"]
    got = {r["doc_id"]: r for r in bm25_topk(docs, terms, k=10).collect()}

    toks = {d: _tok(t) for d, t in CORPUS}
    n = len(toks)
    avgdl = sum(len(v) for v in toks.values()) / n
    df = {t: sum(1 for v in toks.values() if t in v) for t in terms}
    expected = {}
    for d, v in toks.items():
        s, m = 0.0, 0
        for t in terms:
            tf = v.count(t)
            if not tf:
                continue
            m += 1
            idf = math.log(1.0 + (n - df[t] + 0.5) / (df[t] + 0.5))
            s += round(
                idf
                * tf
                * (BM25_K1 + 1.0)
                / (tf + BM25_K1 * (1.0 - BM25_B + BM25_B * len(v) / avgdl)),
                9,
            )
        if m:
            expected[d] = (m, round(s, 6))

    assert set(got) == set(expected)
    for d, (m, s) in expected.items():
        assert got[d]["n_matched"] == m
        assert abs(got[d]["score"] - s) < 1e-9
    order = [r["doc_id"] for r in bm25_topk(docs, terms, k=10).collect()]
    assert order == sorted(expected, key=lambda d: (-expected[d][1], d))


def test_bm25_topk_cut_and_tiebreak(spark):
    docs = spark.createDataFrame(CORPUS, ["doc_id", "text"])
    top1 = bm25_topk(docs, ["the"], k=1).collect()
    assert len(top1) == 1
    # docs 1 and 2 both have tf=2; same dl=9 → identical score, doc_id wins
    assert top1[0]["doc_id"] == 1


def test_ranked_retrieval_composition(spark):
    docs = spark.createDataFrame(CORPUS, ["doc_id", "text"])
    bm = bm25_topk(docs, ["dog"], k=10)
    ranks = spark.createDataFrame([(1, 0.9), (2, 0.1)], ["doc_id", "rank"])
    comb = {r["doc_id"]: r["combined"] for r in ranked_retrieval(bm, ranks).collect()}
    # doc 2 has the higher BM25 (tf=2) but doc 1's authority prior flips it
    assert comb[1] > comb[2]


def test_c4_filter_rules(spark):
    good = "This is a perfectly normal sentence of text.\nAnd here is another good line of prose.\nShort one.\nA third full sentence ends properly here."
    docs = spark.createDataFrame(
        [
            (1, good),
            (2, "Lorem ipsum dolor sit amet, consectetur adipiscing elit. More words here. And more."),
            (3, "function foo() { return 1; }. Has sentences. Three of them."),
            (4, "no terminal punctuation anywhere here at all"),
        ],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: r for r in c4_filter(docs).collect()}
    assert got[1]["keep"] is True
    # "Short one." ends with '.' but has <5 words → dropped from clean_text
    assert got[1]["n_kept_lines"] == 3
    assert "Short one." not in got[1]["clean_text"]
    assert got[2]["keep"] is False and got[2]["has_lorem"] is True
    assert got[3]["keep"] is False and got[3]["has_brace"] is True
    assert got[4]["keep"] is False and got[4]["n_kept_lines"] == 0


def test_blocklist_filter_is_broadcast_anti(spark):
    docs = spark.createDataFrame(
        [(1, "a", "spamfarm.example"), (2, "b", "good.example"), (3, "c", "spamfarm.example")],
        ["doc_id", "text", "source"],
    )
    blocked = spark.createDataFrame([("spamfarm.example",)], ["source"])
    kept = blocklist_filter(docs, blocked)
    assert [r["doc_id"] for r in kept.collect()] == [2]
    plan = kept._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def test_tfidf_cosine_pairs_hand(spark):
    import math

    from pagerank_spark.operators.textsearch import tfidf_cosine_pairs

    docs = spark.createDataFrame(
        [(1, "apple banana apple"), (2, "apple banana"), (3, "cherry date")],
        ["doc_id", "text"],
    )
    got = {(r["id_a"], r["id_b"]): r["cosine"]
           for r in tfidf_cosine_pairs(docs, threshold=0.1).collect()}
    # doc 3 shares no term with 1/2: no pair row at all (not a 0.0 row)
    assert set(got) == {(1, 2)}
    # idf(apple)=idf(banana)=ln(3/2); d1=(2,1)·d2=(1,1) → 3/sqrt(10) after
    # the idf weights cancel in the normalized dot
    assert got[(1, 2)] == pytest.approx(3 / math.sqrt(10), abs=1e-5)


def test_tfidf_cosine_pairs_df_cap_prunes_candidates(spark):
    from pagerank_spark.operators.textsearch import tfidf_cosine_pairs

    docs = spark.createDataFrame(
        [(1, "apple banana apple"), (2, "apple banana"), (3, "cherry date")],
        ["doc_id", "text"],
    )
    # every shared term has df=2 > cap=1: candidate generation goes dry
    assert tfidf_cosine_pairs(docs, threshold=0.1, max_term_df=1).count() == 0


def test_reciprocal_rank_fusion_hand(spark):
    from pagerank_spark.operators.textsearch import reciprocal_rank_fusion

    l1 = spark.createDataFrame(
        [("a", 3.0), ("b", 2.0), ("c", 1.0)], ["doc_id", "s"]
    )
    l2 = spark.createDataFrame([("b", 9.0), ("a", 8.0)], ["doc_id", "s"])
    rows = reciprocal_rank_fusion([(l1, "s"), (l2, "s")]).collect()
    got = {r["doc_id"]: (r["n_lists"], r["rrf"]) for r in rows}
    # a: 1/61 + 1/62, b: 1/62 + 1/61 (identical), c: 1/63
    assert got["a"] == (2, pytest.approx(0.032522, abs=1e-6))
    assert got["b"] == got["a"]
    assert got["c"] == (1, pytest.approx(0.015873, abs=1e-6))
    # the a/b rrf tie breaks by doc_id ascending
    assert [r["doc_id"] for r in rows] == ["a", "b", "c"]


def test_reciprocal_rank_fusion_in_list_tie_and_topk(spark):
    from pagerank_spark.operators.textsearch import reciprocal_rank_fusion

    # equal scores within a list: rank by doc_id ascending — x gets rank 1
    l1 = spark.createDataFrame([("y", 5.0), ("x", 5.0)], ["doc_id", "s"])
    rows = reciprocal_rank_fusion([(l1, "s")], top_k=1).collect()
    assert len(rows) == 1
    assert rows[0]["doc_id"] == "x"
    assert rows[0]["rrf"] == pytest.approx(1 / 61, abs=1e-6)


def test_ql_matches_python_replay(spark):
    """Pure-Python replay of the Dirichlet query-likelihood formula:
    per matched term ln(1 + tf/(mu p_c)) + ln(mu/(dl+mu))."""
    from pagerank_spark.operators.textsearch import ql_topk

    docs = spark.createDataFrame(CORPUS, ["doc_id", "text"])
    terms = ["quick", "dog"]
    mu = 50.0
    got = {r["doc_id"]: r for r in ql_topk(docs, terms, k=10, mu=mu).collect()}

    toks = {d: _tok(t) for d, t in CORPUS}
    total = sum(len(v) for v in toks.values())
    cf = {t: sum(v.count(t) for v in toks.values()) for t in terms}
    expected = {}
    for d, v in toks.items():
        s, m = 0.0, 0
        for t in terms:
            tf = v.count(t)
            if not tf:
                continue
            m += 1
            p_c = cf[t] / total
            s += round(
                math.log(1.0 + tf / (mu * p_c))
                + math.log(mu / (len(v) + mu)),
                9,
            )
        if m:
            expected[d] = (m, round(s, 6))

    assert set(got) == set(expected)
    for d, (m, s) in expected.items():
        assert got[d]["n_matched"] == m
        assert abs(got[d]["score"] - s) < 1e-9
    order = [r["doc_id"] for r in ql_topk(docs, terms, k=10, mu=mu).collect()]
    assert order == sorted(expected, key=lambda d: (-expected[d][1], d))


def test_ql_length_prior_prefers_short_doc_on_equal_tf(spark):
    """Equal tf for the query term: the shorter doc scores strictly
    higher (the dl penalty is QL's analogue of BM25's b-normalization)."""
    from pagerank_spark.operators.textsearch import ql_topk

    docs = spark.createDataFrame(
        [
            (1, "cats sleep"),
            (2, "cats sleep on the very long comfortable sofa all day"),
        ],
        ["doc_id", "text"],
    )
    out = ql_topk(docs, ["cats"], k=2, mu=10.0).collect()
    assert [r["doc_id"] for r in out] == [1, 2]
    assert out[0]["score"] > out[1]["score"]


def test_phrase_topk_chain_overlap_and_cut(spark):
    """3-term chain, overlapping repeated-term matches, tf ordering and
    the k cut with doc_id tie-break."""
    from pagerank_spark.operators.textsearch import phrase_topk

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox and the quick brown hare"),
            (2, "quick brown quick brown fox"),
            (3, "a a a a"),
            (4, "brown quick nothing here"),
        ],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: r["tf"]
           for r in phrase_topk(docs, ["quick", "brown"], k=10).collect()}
    assert got == {1: 2, 2: 2}
    got3 = {r["doc_id"]: r["tf"]
            for r in phrase_topk(docs, ["quick", "brown", "fox"], k=10).collect()}
    assert got3 == {1: 1, 2: 1}
    # overlapping starts: 'a a a a' has three 'a a' starts
    gota = {r["doc_id"]: r["tf"]
            for r in phrase_topk(docs, ["a", "a"], k=10).collect()}
    assert gota == {3: 3}
    # cut + tie-break: equal tf -> lowest doc_id survives
    top1 = phrase_topk(docs, ["quick", "brown"], k=1).collect()
    assert [(r["doc_id"], r["tf"]) for r in top1] == [(1, 2)]
    import pytest as _pytest

    with _pytest.raises(ValueError):
        phrase_topk(docs, [])


def test_positional_postings_shape(spark):
    from pagerank_spark.operators.textsearch import positional_postings

    docs = spark.createDataFrame([(7, "b a b")], ["doc_id", "text"])
    rows = {(r["term"], r["pos"]) for r in positional_postings(docs).collect()}
    assert rows == {("b", 0), ("a", 1), ("b", 2)}


def test_vocab_growth_hand(spark):
    from pagerank_spark.operators.textsearch import vocab_growth

    docs = spark.createDataFrame(
        [(0, "a b"), (1, "b c"), (2, "a d e"), (3, "a b")],
        ["doc_id", "text"],
    )
    rows = {r["bucket"]: (r["n_docs"], r["new_terms"], r["cum_terms"])
            for r in vocab_growth(docs, bucket_size=2).collect()}
    # bucket 0 (docs 0,1): first-seen a,b,c = 3 new; bucket 1 (docs 2,3):
    # d,e new — cum 5
    assert rows == {0: (2, 3, 3), 1: (2, 2, 5)}
    import pytest as _pytest

    with _pytest.raises(ValueError):
        vocab_growth(docs, bucket_size=0)
