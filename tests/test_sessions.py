"""Unit tests for event-log sessionization and funnel analysis
(operators/sessions.py) against hand-computed fixtures; cross-engine
equivalence at sf0.01 is covered by the DuckDB twins in __spark_entry__.py
via tools/check_oracles.py and the driver harness.
"""

from __future__ import annotations

import datetime as dt

import pytest

from pagerank_spark.operators.sessions import funnel, session_stats, sessionize

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _ts(minutes, micros=0):
    return T0 + dt.timedelta(minutes=minutes, microseconds=micros)


# user 1: three sessions under a 30-min gap —
#   [0m, 10m, 40m] (10m and 30m gaps; 30m == gap is NOT a break: strict >)
#   [100m] singleton
#   [200m, 200m] duplicate timestamp, order falls back to event_id
# user 2: one session [0m, 29m59.999999s] (just under the gap)
EVENTS = [
    (1, 1, _ts(0), "view", 1.10),
    (2, 1, _ts(10), "click", 2.20),
    (3, 1, _ts(40), "purchase", 3.30),
    (4, 1, _ts(100), "view", 4.40),
    (5, 1, _ts(200), "view", 5.50),
    (6, 1, _ts(200), "click", 6.60),
    (7, 2, _ts(0), "view", 7.70),
    (8, 2, _ts(30, -1), "error", 8.80),
]


@pytest.fixture(scope="module")
def events(spark):
    return spark.createDataFrame(
        EVENTS, "event_id INT, user_id INT, ts TIMESTAMP, event_type STRING, value DOUBLE"
    )


def test_sessionize_assignment(events):
    rows = {
        r["event_id"]: (r["session_seq"], r["idx_in_session"])
        for r in sessionize(events, gap_seconds=1800).collect()
    }
    assert rows == {
        1: (1, 1),
        2: (1, 2),
        3: (1, 3),   # exactly 30m after event 2: not a break (strict >)
        4: (2, 1),
        5: (3, 1),
        6: (3, 2),   # same ts as 5 — event_id breaks the tie
        7: (1, 1),
        8: (1, 2),   # 1 microsecond under the gap
    }


def test_sessionize_strict_gap_boundary(events):
    # at gap_seconds=599 the 10-minute gap (600 s) becomes a break
    rows = {
        r["event_id"]: r["session_seq"]
        for r in sessionize(events, gap_seconds=599).collect()
    }
    assert rows[1] == 1 and rows[2] == 2 and rows[3] == 3


def test_session_stats(events):
    got = {
        (r["user_id"], r["session_seq"]): (
            r["n_events"],
            r["duration_us"],
            float(r["value_sum"]),
        )
        for r in session_stats(events, gap_seconds=1800).collect()
    }
    assert got == {
        (1, 1): (3, 40 * 60 * 1_000_000, 6.60),
        (1, 2): (1, 0, 4.40),
        (1, 3): (2, 0, 12.10),
        (2, 1): (2, 30 * 60 * 1_000_000 - 1, 16.50),
    }


def test_funnel_strict_ordering(events):
    # user 1: view@0 -> click@10 -> purchase@40  => converts all 3 stages
    # user 2: view@0, no click                    => stops after stage 1
    got = {r["stage"]: r["n_users"] for r in funnel(events).collect()}
    assert got == {"view": 2, "click": 1, "purchase": 1}


def test_funnel_requires_order(spark):
    # purchase BEFORE the first view must not count as a conversion
    ev = spark.createDataFrame(
        [
            (1, 9, _ts(0), "purchase", 0.0),
            (2, 9, _ts(5), "view", 0.0),
            (3, 9, _ts(6), "click", 0.0),
        ],
        "event_id INT, user_id INT, ts TIMESTAMP, event_type STRING, value DOUBLE",
    )
    got = {r["stage"]: r["n_users"] for r in funnel(ev).collect()}
    assert got == {"view": 1, "click": 1, "purchase": 0}


def test_funnel_anchor_is_first_event(spark):
    # the anchor is the FIRST stage-1 event: a later view cannot re-anchor
    # to rescue a click that precedes it
    ev = spark.createDataFrame(
        [
            (1, 9, _ts(0), "view", 0.0),
            (2, 9, _ts(1), "click", 0.0),
            (3, 9, _ts(2), "view", 0.0),
        ],
        "event_id INT, user_id INT, ts TIMESTAMP, event_type STRING, value DOUBLE",
    )
    got = {r["stage"]: r["n_users"] for r in funnel(ev).collect()}
    assert got == {"view": 1, "click": 1, "purchase": 0}


def test_covisitation_pairs_hand(spark):
    from datetime import datetime

    from pagerank_spark.operators.sessions import covisitation_pairs

    def t(m):
        return datetime(2026, 1, 1, 10, m)

    rows = [
        # user 1 session 1: a,b,a (a repeats — pair counted once)
        (1, 1, t(0), "a"), (2, 1, t(1), "b"), (3, 1, t(2), "a"),
        # user 1 session 2 (gap): a,b again -> support 2
        (4, 1, t(50), "a"), (5, 1, t(51), "b"),
        # user 2: a,c (pair below min_support 2)
        (6, 2, t(0), "a"), (7, 2, t(1), "c"),
    ]
    df = spark.createDataFrame(rows, ["event_id", "user_id", "ts", "item"])
    got = {(r["item_a"], r["item_b"]): r["n_sessions"]
           for r in covisitation_pairs(df, gap_seconds=600,
                                       min_support=2).collect()}
    assert got == {("a", "b"): 2}
    # min_support 1 reveals the a-c pair
    got1 = {(r["item_a"], r["item_b"]): r["n_sessions"]
            for r in covisitation_pairs(df, gap_seconds=600,
                                        min_support=1).collect()}
    assert got1 == {("a", "b"): 2, ("a", "c"): 1}
    # bot guard: a 3-item session vanishes whole at cap 2
    bot = spark.createDataFrame(
        [(10, 9, t(0), "x"), (11, 9, t(1), "y"), (12, 9, t(2), "z")],
        ["event_id", "user_id", "ts", "item"],
    )
    assert covisitation_pairs(bot, gap_seconds=600, max_session_items=2,
                              min_support=1).count() == 0
