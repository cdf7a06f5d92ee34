"""Unit tests for host-level mirror detection (operators/mirrors.py),
cohort retention (operators/sessions.py cohort_retention), and the term
statistics operators (operators/textsearch.py term_cooccurrence_pmi /
tfidf_keywords) against hand-computed fixtures; cross-engine equivalence at
sf0.01 is covered by the DuckDB twins in __spark_entry__.py.
"""

from __future__ import annotations

import datetime as dt
import math

import pytest

from pagerank_spark.operators.mirrors import host_resemblance, host_shingles
from pagerank_spark.operators.sessions import cohort_retention
from pagerank_spark.operators.textsearch import term_cooccurrence_pmi, tfidf_keywords


# ---------------------------------------------------------------------------
# host_resemblance
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def mirror_docs(spark):
    # hostA/hostB share the 2-gram shingles {"a b", "b c"}; hostC is
    # disjoint from both except for the boilerplate "nav menu" shingle that
    # every host carries (the host-df-cap test target)
    rows = [
        (1, "a b c d", "hostA"),
        (2, "a b c e", "hostB"),
        (3, "x y z w", "hostC"),
        (4, "nav menu", "hostA"),
        (5, "nav menu", "hostB"),
        (6, "nav menu", "hostC"),
    ]
    return spark.createDataFrame(rows, "doc_id INT, text STRING, source STRING")


def test_host_shingles_distinct_per_host(spark, mirror_docs):
    sh = host_shingles(mirror_docs, n=2)
    counts = {r["host"]: r["n"] for r in sh.groupBy("host").count().withColumnRenamed("count", "n").collect()}
    # hostA: {"a b","b c","c d","nav menu"} = 4 (the 2-word doc is one shingle)
    assert counts == {"hostA": 4, "hostB": 4, "hostC": 4}


def test_host_resemblance_exact_uncapped(spark, mirror_docs):
    out = {
        (r["host_a"], r["host_b"]): r
        for r in host_resemblance(mirror_docs, n=2, min_common=1).collect()
    }
    ab = out[("hostA", "hostB")]
    # common = {"a b","b c","nav menu"} = 3 of 4+4 -> jaccard 3/5
    assert ab["common"] == 3 and ab["n_a"] == 4 and ab["n_b"] == 4
    assert ab["jaccard"] == pytest.approx(0.6)
    assert ab["containment"] == pytest.approx(0.75)
    # hostC pairs exist only through the boilerplate shingle
    assert out[("hostA", "hostC")]["common"] == 1
    assert out[("hostB", "hostC")]["common"] == 1


def test_host_resemblance_df_cap_drops_boilerplate(spark, mirror_docs):
    # "nav menu" is on 3 hosts; cap at 2 removes it from the universe, so
    # hostC has no surviving overlap and sizes shrink to the filtered sets
    out = {
        (r["host_a"], r["host_b"]): r
        for r in host_resemblance(
            mirror_docs, n=2, min_common=1, max_shingle_hosts=2
        ).collect()
    }
    assert set(out) == {("hostA", "hostB")}
    ab = out[("hostA", "hostB")]
    assert ab["common"] == 2 and ab["n_a"] == 3 and ab["n_b"] == 3
    assert ab["jaccard"] == pytest.approx(0.5)
    assert ab["containment"] == pytest.approx(round(2 / 3, 6))


def test_host_resemblance_min_common_floor(spark, mirror_docs):
    out = host_resemblance(mirror_docs, n=2, min_common=2).collect()
    assert {(r["host_a"], r["host_b"]) for r in out} == {("hostA", "hostB")}


# ---------------------------------------------------------------------------
# cohort_retention
# ---------------------------------------------------------------------------

T0 = dt.datetime(2024, 1, 1, 12, 0, 0)
DAY0 = 19723  # floor(epoch_us(2024-01-01) / 86400e6)


def _day(k):
    return T0 + dt.timedelta(days=k)


@pytest.fixture(scope="module")
def cohort_events(spark):
    rows = [
        # user 1: first day 0, active days 0, 1, 3 (two events on day 0 —
        # the distinct collapses them)
        (1, 1, _day(0)),
        (2, 1, _day(0) + dt.timedelta(hours=3)),
        (3, 1, _day(1)),
        (4, 1, _day(3)),
        # user 2: day-0 cohort, never returns
        (5, 2, _day(0)),
        # user 3: day-1 cohort, active days 1, 2
        (6, 3, _day(1)),
        (7, 3, _day(2)),
    ]
    return spark.createDataFrame(rows, "event_id INT, user_id INT, ts TIMESTAMP")


def test_cohort_retention_matrix(spark, cohort_events):
    out = {
        (r["cohort_period"], r["period_offset"]): (r["n_users"], r["retention"])
        for r in cohort_retention(cohort_events, period_seconds=86400).collect()
    }
    assert out == {
        (DAY0, 0): (2, 1.0),
        (DAY0, 1): (1, 0.5),
        (DAY0, 3): (1, 0.5),
        (DAY0 + 1, 0): (1, 1.0),
        (DAY0 + 1, 1): (1, 1.0),
    }


def test_cohort_retention_period_boundary_is_floor_division(spark):
    # 23:59 and next-day 00:01 are different day periods; two events in the
    # same period collapse to one active row
    rows = [
        (1, 1, dt.datetime(2024, 1, 1, 23, 59, 0)),
        (2, 1, dt.datetime(2024, 1, 2, 0, 1, 0)),
    ]
    ev = spark.createDataFrame(rows, "event_id INT, user_id INT, ts TIMESTAMP")
    out = {
        r["period_offset"]: r["n_users"]
        for r in cohort_retention(ev, period_seconds=86400).collect()
    }
    assert out == {0: 1, 1: 1}


# ---------------------------------------------------------------------------
# term_cooccurrence_pmi
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def pmi_docs(spark):
    rows = [
        (1, "apple banana apple"),  # duplicate token: distinct-per-doc collapses it
        (2, "apple banana"),
        (3, "apple cherry"),
        (4, "banana cherry"),
    ]
    return spark.createDataFrame(rows, "doc_id INT, text STRING")


def test_term_pmi_values(spark, pmi_docs):
    out = {
        (r["term_a"], r["term_b"]): r
        for r in term_cooccurrence_pmi(pmi_docs, min_pair_count=1).collect()
    }
    # N=4; df apple=3, banana=3, cherry=2
    ab = out[("apple", "banana")]
    assert (ab["n_pairs"], ab["df_a"], ab["df_b"]) == (2, 3, 3)
    assert ab["pmi"] == pytest.approx(round(math.log(4 * 2 / 9), 6))
    ac = out[("apple", "cherry")]
    assert ac["n_pairs"] == 1
    assert ac["pmi"] == pytest.approx(round(math.log(4 * 1 / 6), 6))
    bc = out[("banana", "cherry")]
    assert bc["n_pairs"] == 1
    assert bc["pmi"] == pytest.approx(round(math.log(4 * 1 / 6), 6))


def test_term_pmi_df_caps_and_pair_floor(spark, pmi_docs):
    # max_term_df=2 drops apple and banana (df 3) before the self-join
    out = term_cooccurrence_pmi(pmi_docs, min_pair_count=1, max_term_df=2).collect()
    assert out == []
    # min_pair_count=2 keeps only the count-2 pair
    out2 = {
        (r["term_a"], r["term_b"])
        for r in term_cooccurrence_pmi(pmi_docs, min_pair_count=2).collect()
    }
    assert out2 == {("apple", "banana")}


# ---------------------------------------------------------------------------
# tfidf_keywords
# ---------------------------------------------------------------------------

def test_tfidf_keywords_scores_and_tiebreak(spark):
    rows = [
        (1, "x x y", "g1"),
        (2, "x z", "g1"),
        (3, "y y z", "g2"),
    ]
    docs = spark.createDataFrame(rows, "doc_id INT, text STRING, source STRING")
    out = {
        (r["group"], r["pos"]): (r["term"], r["tf"], r["df"], r["score"])
        for r in tfidf_keywords(docs, group_col="source", k=2).collect()
    }
    idf = math.log(3 / 2)  # every term has df=2 over N=3 docs
    # g1: x tf=3 wins; y and z tie at tf=1 -> term-asc picks y
    assert out[("g1", 1)] == ("x", 3, 2, round(3 * idf, 6))
    assert out[("g1", 2)] == ("y", 1, 2, round(1 * idf, 6))
    # g2: y tf=2, z tf=1
    assert out[("g2", 1)] == ("y", 2, 2, round(2 * idf, 6))
    assert out[("g2", 2)] == ("z", 1, 2, round(1 * idf, 6))
    assert ("g1", 3) not in out and ("g2", 3) not in out


def test_host_resemblance_releases_caches(spark, mirror_docs):
    # the persisted (host, shingle) set must not outlive the operator —
    # the output is an eager localCheckpoint whose blocks the
    # ContextCleaner owns (plans/caching.py pattern)
    host_resemblance(mirror_docs, n=2, min_common=1).collect()
    cm = spark._jsparkSession.sharedState().cacheManager()
    assert cm.isEmpty()
