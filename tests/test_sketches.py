"""HLL + count-min sketches (operators/sketches.py) vs pure-Python
replays of the same md5 register/counter layouts."""

from __future__ import annotations

import hashlib
from collections import Counter

import pytest

from pagerank_spark.operators.sketches import (
    HLL_B,
    HLL_M,
    HLL_PAYLOAD_BITS,
    cms_build,
    cms_estimate,
    hll_distinct,
    hll_registers,
)


def _h(key: str) -> int:
    return int(hashlib.md5(key.encode()).hexdigest()[:15], 16)


def _py_registers(keys):
    regs = {}
    for k in set(keys):
        h = _h(k)
        reg = h % HLL_M
        w = h >> HLL_B
        rho = (
            HLL_PAYLOAD_BITS + 1
            if w == 0
            else HLL_PAYLOAD_BITS - w.bit_length() + 1
        )
        regs[reg] = max(regs.get(reg, 0), rho)
    return regs


KEYS = [f"www.page{i}.test/p{i % 700}" for i in range(3000)]  # 700 distinct? no:
KEYS = [f"www.page{i % 900}.test/x" for i in range(3000)]  # 900 distinct


def test_registers_match_python(spark):
    df = spark.createDataFrame([(k,) for k in KEYS], ["url"])
    got = {r["reg"]: r["maxrho"] for r in hll_registers(df, "url").collect()}
    assert got == _py_registers(KEYS)


def test_hll_estimate_close_and_exact_reported(spark):
    df = spark.createDataFrame([(k,) for k in KEYS], ["url"])
    row = hll_distinct(df, "url").collect()[0]
    assert row["exact_distinct"] == 900
    # m=64 -> typical error 1.04/sqrt(64) = 13%; allow 3 sigma
    assert abs(row["estimate"] - 900) / 900 < 0.4
    assert row["rel_error"] == round(abs(row["estimate"] - 900) / 900, 6)
    assert row["n_registers_hit"] + row["n_zero_registers"] == HLL_M


def test_hll_small_range_linear_counting(spark):
    import math

    few = [f"k{i}" for i in range(10)]
    df = spark.createDataFrame([(k,) for k in few], ["url"])
    row = hll_distinct(df, "url").collect()[0]
    v = row["n_zero_registers"]
    assert v > 0
    want = round(HLL_M * math.log(HLL_M / v), 6)
    assert row["estimate"] == pytest.approx(want, abs=1e-6)


def test_cms_overestimates_and_matches_replay(spark):
    W, D = 64, 3  # tiny so collisions actually happen
    items = [f"item{i % 40}" for i in range(400)] + ["hot"] * 100
    true = Counter(items)
    df = spark.createDataFrame([(k,) for k in items], ["url"])
    cms = cms_build(df, "url", width=W, depth=D)
    probes = spark.createDataFrame([(k,) for k in set(items)] + [("absent",)],
                                   ["url"])
    got = {
        r["key"]: r["estimate"]
        for r in cms_estimate(cms, probes, key_col="url",
                              width=W, depth=D).collect()
    }
    # python replay
    cells = Counter()
    for k, n in true.items():
        for i in range(D):
            cells[(i, _h(f"cms{i},{k}") % W)] += n
    for k in list(true) + ["absent"]:
        want = min(cells.get((i, _h(f"cms{i},{k}") % W), 0) for i in range(D))
        assert got[k] == want, k
        assert got[k] >= true.get(k, 0)  # never underestimates
    assert got["hot"] >= 100


def test_cms_rejects_bad_params(spark):
    df = spark.createDataFrame([("a",)], ["url"])
    with pytest.raises(ValueError):
        cms_build(df, "url", width=0)
