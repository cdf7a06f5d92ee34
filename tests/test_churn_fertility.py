"""host_churn (graphdiff) and tokenizer_fertility (textops) fixtures."""

from __future__ import annotations

import re

import pytest

from pagerank_spark.operators.graphdiff import host_churn
from pagerank_spark.operators.textops import BPE_TOKEN_PATTERN, tokenizer_fertility


def test_host_churn_hand(spark):
    old = spark.createDataFrame(
        [
            ("www.a.test/1", "www.x.test/1"),
            ("www.a.test/2", "www.x.test/2"),
            ("www.a.test/2", "www.x.test/2"),  # duplicate: counts once
            ("www.b.test/1", "www.x.test/1"),
            ("www.dead.test/1", "www.x.test/9"),
        ],
        ["src", "dst"],
    )
    new = spark.createDataFrame(
        [
            ("www.a.test/1", "www.x.test/1"),      # kept
            ("www.a.test/3", "www.x.test/3"),      # added (a)
            ("www.b.test/1", "www.x.test/1"),      # kept
            ("www.new.test/1", "www.x.test/1"),    # added (brand-new host)
        ],
        ["src", "dst"],
    )
    got = {r["host"]: r for r in host_churn(old, new).collect()}
    a = got["www.a.test"]
    assert (a["n_old"], a["n_added"], a["n_removed"]) == (2, 1, 1)
    assert a["churn"] == 1.0
    b = got["www.b.test"]
    assert (b["n_old"], b["n_added"], b["n_removed"]) == (1, 0, 0)
    assert b["churn"] == 0.0
    dead = got["www.dead.test"]
    assert dead["n_removed"] == 1 and dead["churn"] == 1.0
    newh = got["www.new.test"]
    assert (newh["n_old"], newh["n_added"]) == (0, 1)
    assert newh["churn"] is None


def test_tokenizer_fertility_hand(spark):
    docs = [
        (1, "Hello, world!", "en"),
        (2, "don't stop", "en"),
        (3, "中文 文本", "zh"),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text", "lang"])
    got = {r["lang"]: r for r in tokenizer_fertility(df).collect()}

    def bpe(t):
        return len(re.findall(BPE_TOKEN_PATTERN, t.lower()))

    en_bpe = bpe("Hello, world!") + bpe("don't stop")
    en_chars = len("Hello, world!") + len("don't stop")
    en_ws = 2 + 2
    en = got["en"]
    assert en["n_docs"] == 2
    assert en["total_chars"] == en_chars
    assert en["total_ws_tokens"] == en_ws
    assert en["total_bpe_tokens"] == en_bpe
    assert en["chars_per_bpe"] == round(en_chars / en_bpe, 6)
    assert en["bpe_per_ws"] == round(en_bpe / en_ws, 6)
    zh = got["zh"]
    assert zh["n_docs"] == 1 and zh["total_ws_tokens"] == 2
    # CJK chars are neither [a-z] nor [0-9] nor punctuation-with-space:
    # each char matches the single-symbol branch
    assert zh["total_bpe_tokens"] == bpe("中文 文本")


# --- mixture planning -------------------------------------------------------


def test_mixture_plan_hand(spark):
    from pagerank_spark.operators.sampling import mixture_plan

    inv = spark.createDataFrame(
        [("web", 1000), ("wiki", 100), ("code", 400), ("junk", 999)],
        ["source", "n_tokens"],
    )
    # shares normalize to web .5, wiki .1, code .4; junk excluded
    plan = mixture_plan(inv, {"web": 5, "wiki": 1, "code": 4})
    got = {r["source"]: r for r in plan.collect()}
    # binding source: wiki (100 / .1 = 1000), web 2000, code 1000 ->
    # T = 1000: wiki at exactly 1 epoch
    assert got["wiki"]["planned_tokens"] == 100.0
    assert got["wiki"]["epochs"] == 1.0
    assert got["web"]["planned_tokens"] == 500.0
    assert got["web"]["epochs"] == 0.5
    assert got["code"]["planned_tokens"] == 400.0
    assert got["junk"]["share"] == 0.0
    assert got["junk"]["planned_tokens"] == 0.0
    # total allocation == T
    assert sum(r["planned_tokens"] for r in got.values()) == 1000.0


def test_mixture_plan_max_epochs_scales_budget(spark):
    from pagerank_spark.operators.sampling import mixture_plan

    inv = spark.createDataFrame([("a", 100), ("b", 100)], ["source", "n_tokens"])
    plan = mixture_plan(inv, {"a": 1, "b": 1}, max_epochs=2.0)
    got = {r["source"]: r for r in plan.collect()}
    assert got["a"]["epochs"] == 2.0 and got["a"]["planned_tokens"] == 200.0


def test_mixture_plan_rejects_bad_inputs(spark):
    import pytest as _pytest

    from pagerank_spark.operators.sampling import mixture_plan

    inv = spark.createDataFrame([("a", 10)], ["source", "n_tokens"])
    with _pytest.raises(ValueError):
        mixture_plan(inv, {})
    with _pytest.raises(ValueError):
        mixture_plan(inv, {"a": -1})
    with _pytest.raises(ValueError):
        mixture_plan(inv, {"a": 1}, max_epochs=0)
