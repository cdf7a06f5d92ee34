"""BPE first-merge pair statistics (operators/textsearch.py
bpe_pair_counts) vs a pure-Python replay."""

from __future__ import annotations

import re
from collections import Counter

import pytest

from pagerank_spark.operators.textsearch import bpe_pair_counts

DOCS = [
    (1, "low lower lowest low"),
    (2, "new newer newest new new"),
    (3, "a I x"),  # single-char words: no pairs
    (4, "ab ab ab"),
]


def _py_pairs(docs, min_word_count=1):
    wc = Counter()
    for _, text in docs:
        wc.update(re.findall(r"[a-z0-9]+", text.lower()))
    pairs = Counter()
    for w, n in wc.items():
        if len(w) < 2 or n < min_word_count:
            continue
        for i in range(len(w) - 1):
            pairs[(w[i], w[i + 1])] += n
    return dict(pairs)


def test_pairs_match_python_replay(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    got = {
        (r["left"], r["right"]): r["pair_count"]
        for r in bpe_pair_counts(df).collect()
    }
    assert got == _py_pairs(DOCS)
    # 'lo' appears in low(2) lower lowest -> 4; 'ne' in new(3) newer newest -> 5
    assert got[("l", "o")] == 4
    assert got[("n", "e")] == 5
    assert got[("a", "b")] == 3


def test_min_word_count_prunes(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    got = {
        (r["left"], r["right"]): r["pair_count"]
        for r in bpe_pair_counts(df, min_word_count=2).collect()
    }
    assert got == _py_pairs(DOCS, min_word_count=2)
    # 'lower'/'lowest'/'newer'/'newest' are hapax: their pairs vanish
    assert ("e", "r") not in got and ("w", "e") not in got
    assert got[("l", "o")] == 2  # only 'low' (count 2) survives


def test_single_char_words_contribute_nothing(spark):
    df = spark.createDataFrame([(1, "a b c 1 2 3")], ["doc_id", "text"])
    assert bpe_pair_counts(df).count() == 0
