"""Bitext candidate mining (operators/bitext.py) hand fixtures."""

from __future__ import annotations

import pytest

from pagerank_spark.operators.bitext import bitext_candidates

DOCS = [
    # en/de translated pair sharing two rare anchors (sn4821x, v17)
    (1, "the engine model sn4821x firmware v17 ships today", "en"),
    (2, "das triebwerk modell sn4821x firmware v17 erscheint heute", "de"),
    # fr doc sharing only one anchor with doc 1
    (3, "le moteur sn4821x est disponible", "fr"),
    # same-language near-copy of doc 1: must NOT pair (lang_a < lang_b)
    (4, "the engine model sn4821x firmware v17 again", "en"),
    # de doc sharing a too-common anchor only ('2024' below is ubiquitous)
    (5, "bericht 2024 ohne seriennummer", "de"),
    # very long en doc sharing sn4821x: killed by the length-ratio gate
    (6, "sn4821x " + "filler " * 40, "en"),
] + [
    # make '2024' ubiquitous (df > cap)
    (100 + i, f"report 2024 copy {i} zz", "en") for i in range(25)
]


@pytest.fixture(scope="module")
def pairs(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text", "lang"])
    out = bitext_candidates(df, df_cap=10, min_shared=1, max_len_ratio=2.0)
    return {(r["doc_a"], r["doc_b"]): r for r in out.collect()}


def test_translated_pair_found_with_shared_count(pairs):
    assert (2, 1) in pairs  # de < en canonical order
    assert pairs[(2, 1)]["shared_anchors"] == 2
    assert pairs[(2, 1)]["lang_a"] == "de" and pairs[(2, 1)]["lang_b"] == "en"


def test_single_anchor_pair_and_counts(pairs):
    assert (1, 3) in pairs and pairs[(1, 3)]["shared_anchors"] == 1
    assert (2, 3) in pairs  # de-fr via sn4821x


def test_same_language_pairs_excluded(pairs):
    assert not any(
        r["lang_a"] == r["lang_b"] for r in pairs.values()
    )
    assert (1, 4) not in pairs and (4, 1) not in pairs


def test_ubiquitous_anchor_dropped(pairs):
    assert not any(5 in k for k in pairs)


def test_length_ratio_gate(pairs):
    assert not any(6 in k for k in pairs)


def test_rejects_bad_params(spark):
    df = spark.createDataFrame(DOCS[:2], ["doc_id", "text", "lang"])
    with pytest.raises(ValueError):
        bitext_candidates(df, df_cap=0)
