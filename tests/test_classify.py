"""Hashed linear classifier inference (operators/classify.py) vs a pure
Python replay of the same md5 bucketing + mean-pooled weights."""

from __future__ import annotations

import hashlib
import re

import pytest

from pagerank_spark.operators.classify import (
    hashed_token_buckets,
    linear_text_classifier,
)

B = 8
WEIGHTS = {0: 0.5, 1: -0.25, 2: 0.125, 3: -1.0, 5: 2.0, 7: 0.75}  # 4, 6 pruned
BIAS = -0.05

DOCS = [
    (1, "The quick brown fox jumps over the lazy dog"),
    (2, "spark spark spark duckdb"),
    (3, ""),  # no tokens: logit = round(bias, 6)
    (4, "!!! ??? ..."),  # punctuation only: no [a-z0-9]+ tokens
    (5, "a b c d e f g h i j k l m n o p"),
]


def _bucket(tok: str) -> int:
    return int(hashlib.md5(tok.encode()).hexdigest()[:15], 16) % B


def _py_logit(text: str) -> float:
    toks = re.findall(r"[a-z0-9]+", text.lower())
    if not toks:
        return round(BIAS, 6)
    s = sum(WEIGHTS.get(_bucket(t), 0.0) for t in toks)
    return round(s / len(toks) + BIAS, 6)


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"])


@pytest.fixture(scope="module")
def weights_df(spark):
    return spark.createDataFrame(
        [(b, w) for b, w in WEIGHTS.items()], ["bucket", "weight"]
    )


def test_buckets_match_python_md5(spark, docs_df):
    got = {
        (r["doc_id"], r["bucket"])
        for r in hashed_token_buckets(docs_df, B).collect()
    }
    want = {
        (i, _bucket(t))
        for i, text in DOCS
        for t in re.findall(r"[a-z0-9]+", text.lower())
    }
    assert got == want


def test_logits_match_python_replay(spark, docs_df, weights_df):
    out = linear_text_classifier(docs_df, weights_df, B, bias=BIAS)
    got = {r["doc_id"]: (r["n_tokens"], r["logit"], r["pass"]) for r in out.collect()}
    assert set(got) == {1, 2, 3, 4, 5}
    for doc_id, text in DOCS:
        n_want = len(re.findall(r"[a-z0-9]+", text.lower()))
        z_want = _py_logit(text)
        n, z, ok = got[doc_id]
        assert n == n_want, doc_id
        assert z == pytest.approx(z_want, abs=1e-9), doc_id
        assert ok == (z >= 0.0), doc_id


def test_empty_doc_gets_bias(spark, docs_df, weights_df):
    out = linear_text_classifier(docs_df, weights_df, B, bias=BIAS)
    row = {r["doc_id"]: r for r in out.collect()}[3]
    assert row["n_tokens"] == 0 and row["logit"] == round(BIAS, 6)
    assert row["pass"] is False


def test_threshold_on_rounded_logit(spark, docs_df, weights_df):
    hi = linear_text_classifier(docs_df, weights_df, B, bias=BIAS, threshold=10.0)
    assert all(not r["pass"] for r in hi.collect())
    lo = linear_text_classifier(docs_df, weights_df, B, bias=BIAS, threshold=-10.0)
    assert all(r["pass"] for r in lo.collect())


def test_rejects_bad_buckets(docs_df, weights_df):
    with pytest.raises(ValueError):
        linear_text_classifier(docs_df, weights_df, 0)
