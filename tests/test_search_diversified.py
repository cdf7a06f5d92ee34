"""Host-crowding diversified search (operators/search.py)."""

from __future__ import annotations

from pagerank_spark.operators.search import search_diversified


def _ranks(spark):
    rows = [
        ("a.test/1", 0.9), ("a.test/2", 0.8), ("a.test/3", 0.7),
        ("b.test/1", 0.6), ("b.test/2", 0.5),
        ("c.test/1", 0.4),
    ]
    return spark.createDataFrame(rows, ["url", "rank"])


def test_per_host_cap_applies_before_topk(spark):
    out = search_diversified(_ranks(spark), max_results=10, per_host=2).collect()
    urls = [r["url"] for r in out]
    # a.test/3 is globally 3rd but host-crowded out
    assert urls == ["a.test/1", "a.test/2", "b.test/1", "b.test/2", "c.test/1"]
    assert [r["result_rank"] for r in out] == [0, 1, 2, 3, 4]
    assert out[0]["host"] == "a.test"


def test_per_host_one_is_one_result_per_site(spark):
    out = search_diversified(_ranks(spark), max_results=10, per_host=1).collect()
    assert [r["url"] for r in out] == ["a.test/1", "b.test/1", "c.test/1"]


def test_query_filters_before_crowding(spark):
    out = search_diversified(
        _ranks(spark), query="b.test", max_results=10, per_host=1
    ).collect()
    assert [r["url"] for r in out] == ["b.test/1"]


def test_plan_uses_window_group_limit_and_take_ordered(spark):
    df = search_diversified(_ranks(spark), max_results=3, per_host=2)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # per-host cut must lower to WindowGroupLimit (no full per-host sort
    # materialization) and the final cut to TakeOrderedAndProject (no
    # global sort of the corpus)
    assert "WindowGroupLimit" in plan, plan
    assert "TakeOrderedAndProject" in plan, plan
