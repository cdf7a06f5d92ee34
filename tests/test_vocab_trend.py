"""vocab_coverage (textsearch) and crawl_volume_trend (sessions) hand
fixtures."""

from __future__ import annotations

import datetime

import pytest

from pagerank_spark.operators.sessions import crawl_volume_trend
from pagerank_spark.operators.textsearch import vocab_coverage


def test_vocab_coverage_hand(spark):
    # counts: the=4, cat=2, dog=1, sat=1  -> total 8 instances
    docs = [(1, "the cat sat"), (2, "the cat the dog the")]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {r["threshold"]: r for r in
           vocab_coverage(df, thresholds=(1, 2, 3, 5)).collect()}
    assert got[1]["n_terms_kept"] == 4 and got[1]["coverage"] == 1.0
    assert got[1]["total_instances"] == 8
    assert got[2]["n_terms_kept"] == 2
    assert got[2]["covered_instances"] == 6
    assert got[2]["coverage"] == 0.75
    assert got[3]["n_terms_kept"] == 1 and got[3]["covered_instances"] == 4
    assert got[5]["n_terms_kept"] == 0 and got[5]["coverage"] == 0.0


def test_vocab_coverage_rejects_bad_threshold(spark):
    df = spark.createDataFrame([(1, "a b")], ["doc_id", "text"])
    with pytest.raises(ValueError):
        vocab_coverage(df, thresholds=(0,))


def _ts(day, i):
    return datetime.datetime(2024, 1, day, 8, 0, i)


def test_crawl_volume_trend_with_gap(spark):
    # days 1,2,3 then a GAP then day 6 — the range window must not span
    # the missing days as if they were adjacent rows
    rows = (
        [(_ts(1, i),) for i in range(2)]
        + [(_ts(2, i),) for i in range(4)]
        + [(_ts(3, i),) for i in range(6)]
        + [(_ts(6, i),) for i in range(3)]
    )
    df = spark.createDataFrame(rows, ["ts"])
    got = {r["day"]: r for r in crawl_volume_trend(df, window_days=3).collect()}
    assert got["2024-01-01"]["trailing_days"] == 1
    assert got["2024-01-02"]["trailing_total"] == 6
    d3 = got["2024-01-03"]
    assert d3["trailing_days"] == 3 and d3["trailing_total"] == 12
    assert d3["trailing_avg"] == 4.0
    assert d3["ratio_to_trailing"] == round(6 * 3 / 12, 6)
    # day 6: trailing window covers days 4-6; only day 6 observed
    d6 = got["2024-01-06"]
    assert d6["trailing_days"] == 1 and d6["trailing_total"] == 3
    assert d6["ratio_to_trailing"] == 1.0


def test_crawl_volume_trend_rejects_bad_window(spark):
    df = spark.createDataFrame([(_ts(1, 0),)], ["ts"])
    with pytest.raises(ValueError):
        crawl_volume_trend(df, window_days=0)
