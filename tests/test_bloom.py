"""Deterministic Bloom filter (operators/bloom.py) vs a pure-Python
replay — including bit-identical FALSE POSITIVES."""

from __future__ import annotations

import hashlib

import pytest

from pagerank_spark.operators.bloom import bloom_might_contain, build_bloom

M, K = 512, 3  # small filter so false positives actually occur

MEMBERS = [f"www.site{i}.test/page{i}" for i in range(60)]
PROBES = MEMBERS[:10] + [f"www.other{i}.test/p{i}" for i in range(200)]


def _pos(key: str, i: int) -> int:
    h = hashlib.md5(f"bf{i},{key}".encode()).hexdigest()
    return int(h[:15], 16) % M


def _py_bits(keys):
    return {_pos(k, i) for k in keys for i in range(K)}


def _py_might(bits, key):
    return all(_pos(key, i) in bits for i in range(K))


@pytest.fixture(scope="module")
def verdicts(spark):
    keys = spark.createDataFrame([(k,) for k in MEMBERS], ["url"])
    probes = spark.createDataFrame([(p,) for p in PROBES], ["url"])
    bits = build_bloom(keys, m_bits=M, k_hashes=K)
    out = bloom_might_contain(bits, probes, m_bits=M, k_hashes=K)
    return {r["key"]: r["might_contain"] for r in out.collect()}


def test_no_false_negatives(verdicts):
    for k in MEMBERS[:10]:
        assert verdicts[k] is True, k


def test_verdicts_match_python_replay_including_fps(verdicts):
    bits = _py_bits(MEMBERS)
    for p in PROBES:
        assert verdicts[p] == _py_might(bits, p), p


def test_false_positives_exist_and_are_minority(verdicts):
    bits = _py_bits(MEMBERS)
    nonmembers = [p for p in PROBES if p not in MEMBERS]
    fps = [p for p in nonmembers if verdicts[p]]
    # fill ~ 1-exp(-180/512) = .30 -> fp rate ~ .027; 200 probes -> a few
    assert fps == [p for p in nonmembers if _py_might(bits, p)]
    assert 0 < len(fps) < len(nonmembers) / 2


def test_build_bloom_bit_set_matches(spark):
    keys = spark.createDataFrame([(k,) for k in MEMBERS], ["url"])
    got = {r["pos"] for r in build_bloom(keys, m_bits=M, k_hashes=K).collect()}
    assert got == _py_bits(MEMBERS)


def test_rejects_bad_params(spark):
    keys = spark.createDataFrame([("a",)], ["url"])
    with pytest.raises(ValueError):
        build_bloom(keys, m_bits=0)
