"""Unicode script census (operators/textops.py script_profile) vs a pure
Python replay over the same BMP ranges."""

from __future__ import annotations

import re

import pytest

from pagerank_spark.operators.textops import SCRIPT_RANGES, script_profile

DOCS = [
    (1, "Hello world 42"),
    (2, "Привет мир"),  # Cyrillic
    (3, "中文网页内容"),  # CJK
    (4, "mixed αβγ latin مرحبا"),
    (5, ""),  # empty: all zero, dominant 'none', NULL frac
    (6, "!!! ???"),  # punctuation only: counts zero, dominant 'none'
    (7, "가각 कख"),  # Hangul + Devanagari tie -> hangul
]


def _py_counts(text: str) -> dict[str, int]:
    return {
        name: len(re.findall(f"[{rng}]", text)) for name, rng in SCRIPT_RANGES
    }


def _py_dominant(text: str) -> str:
    c = _py_counts(text)
    mx = max(c.values())
    if mx == 0:
        return "none"
    for name, _ in SCRIPT_RANGES:
        if c[name] == mx:
            return name
    raise AssertionError


@pytest.fixture(scope="module")
def out_rows(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    return {r["doc_id"]: r for r in script_profile(df).collect()}


def test_counts_match_python(out_rows):
    for doc_id, text in DOCS:
        want = _py_counts(text)
        row = out_rows[doc_id]
        for name in want:
            assert row[f"n_{name}"] == want[name], (doc_id, name)


def test_dominant_script_and_tie_break(out_rows):
    for doc_id, text in DOCS:
        assert out_rows[doc_id]["dominant_script"] == _py_dominant(text), doc_id
    # doc 7: hangul and devanagari tie at 2 -> hangul wins (priority order)
    assert out_rows[7]["dominant_script"] == "hangul"


def test_nonascii_fraction(out_rows):
    for doc_id, text in DOCS:
        row = out_rows[doc_id]
        assert row["n_chars"] == len(text)
        if not text:
            assert row["nonascii_frac"] is None
        else:
            want = round(sum(1 for ch in text if ord(ch) > 0x7F) / len(text), 6)
            assert row["nonascii_frac"] == pytest.approx(want, abs=1e-9), doc_id
