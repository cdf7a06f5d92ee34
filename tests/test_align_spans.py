"""Pairwise n-gram alignment (operators/dedup.py align_spans) hand
fixtures + a pure-Python replay."""

from __future__ import annotations

import pytest

from pagerank_spark.operators.dedup import align_spans


def _py_align(docs, pairs, n=3):
    toks = {i: t.lower().split(" ") for i, t in docs}
    out = {}
    for a, b in pairs:
        ta, tb = toks[a], toks[b]
        ga = {i + 1: tuple(ta[i:i + n]) for i in range(len(ta) - n + 1)}
        gb = {j + 1: tuple(tb[j:j + n]) for j in range(len(tb) - n + 1)}
        best = None
        runs = {}
        for i, g in ga.items():
            for j, h in gb.items():
                if g == h:
                    runs[(i, j)] = runs.get((i - 1, j - 1), 0) + 1
        for (i, j), r in runs.items():
            start_a, start_b = i - r + 1, j - r + 1
            key = (-r, start_a, start_b)
            if best is None or key < best[0]:
                best = (key, (start_a, start_b, r, r + n - 1))
        # keep only maximal runs: a run extended later overwrites via key
        if best:
            # recompute: best by (run desc, start_a, start_b) over MAXIMAL runs
            maximal = [
                (i - r + 1, j - r + 1, r)
                for (i, j), r in runs.items()
                if (i + 1, j + 1) not in runs
            ]
            maximal.sort(key=lambda t: (-t[2], t[0], t[1]))
            sa, sb, r = maximal[0]
            out[(a, b)] = (sa, sb, r, r + n - 1)
    return out


DOCS = [
    (1, "aa bb cc dd ee ff gg hh"),
    (2, "xx yy cc dd ee ff zz"),       # shares 'cc dd ee ff': 2 grams
    (3, "aa bb cc dd ee ff gg hh ii"), # shares 7-token prefix with 1
    (4, "qq rr ss"),                   # no overlap with 1
    (5, "cc dd ee"),                   # single shared gram with 1
]
PAIRS = [(1, 2), (1, 3), (1, 4), (1, 5)]


@pytest.fixture(scope="module")
def got(spark):
    d = spark.createDataFrame(DOCS, ["doc_id", "text"])
    p = spark.createDataFrame(PAIRS, ["doc_a", "doc_b"])
    return {
        (r["doc_a"], r["doc_b"]): (
            r["start_a"], r["start_b"], r["run_grams"], r["span_tokens"]
        )
        for r in align_spans(d, p).collect()
    }


def test_matches_python_replay(got):
    want = _py_align(DOCS, PAIRS)
    assert got == want


def test_hand_values(got):
    # 1-2: 'cc dd ee ff' aligned at a-pos 3, b-pos 3 -> 2 grams, 4 tokens
    assert got[(1, 2)] == (3, 3, 2, 4)
    # 1-3: 8-token shared prefix -> 6 grams, 8 tokens, both at pos 1
    assert got[(1, 3)] == (1, 1, 6, 8)
    # 1-4: nothing shared -> pair absent
    assert (1, 4) not in got
    # 1-5: exactly one gram at a-pos 3, b-pos 1
    assert got[(1, 5)] == (3, 1, 1, 3)


def test_repeated_gram_picks_leftmost(spark):
    d = spark.createDataFrame(
        [(1, "aa bb cc zz aa bb cc"), (2, "aa bb cc")], ["doc_id", "text"]
    )
    p = spark.createDataFrame([(1, 2)], ["doc_a", "doc_b"])
    rows = align_spans(d, p).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["start_a"], r["start_b"], r["run_grams"]) == (1, 1, 1)
