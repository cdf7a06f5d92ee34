"""Unit tests for the CSR block store (no Spark session needed).

Covers the round-3 node-cache design: JVM-side parquet spill is factorized
once per node into mmap-able .npy arrays (_localize_block), served via the
OS page cache (_load_block), with the manifest as the authority on which
blocks exist — an unreadable scratch or a listed-but-missing block RAISES
instead of silently yielding an empty graph (the teleport-vector failure
mode from the round-2 ADVICE).
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pagerank_spark.operators import pagerank_csr as mod


def _reset_cache():
    mod._BLOCK_CACHE.update({"dir": None, "manifest": None, "blocks": {}})


def _fake_spill(root: str, blocks: dict[int, tuple], manifest_blocks=None):
    """Write a minimal spill: per-block parquet + manifest."""
    for b, (sid, did, w) in blocks.items():
        os.makedirs(f"{root}/block={b}", exist_ok=True)
        pq.write_table(
            pa.table({"sid": pa.array(sid, pa.int64()),
                      "did": pa.array(did, pa.int64()),
                      "weight": pa.array(w, pa.float64())}),
            f"{root}/block={b}/part-0.parquet",
        )
    if manifest_blocks is None:
        manifest_blocks = sorted(blocks)
    with open(f"{root}/{mod._MANIFEST}", "w") as f:
        json.dump({"num_blocks": 4, "salt": 0, "version": 3,
                   "blocks": manifest_blocks}, f)


@pytest.fixture(autouse=True)
def fresh_cache():
    _reset_cache()
    yield
    _reset_cache()


def test_load_block_factorizes_and_roundtrips(tmp_path):
    root = str(tmp_path / "spill")
    sid = [11, 7, 11, 42, 7, 7]
    did = [1, 2, 2, 1, 3, 1]
    w = [0.5, 1.0, 0.5, 1.0, 0.25, 0.25]
    _fake_spill(root, {0: (sid, did, w)})

    sid_u, sid_codes, did_u, did_codes, got_w = mod._load_block(root, 0)
    # factorization round-trips to the original edge list
    assert list(sid_u[sid_codes]) == sid
    assert list(did_u[did_codes]) == did
    assert list(got_w) == w
    # sorted unique ids, compact int32 codes
    assert list(sid_u) == sorted(set(sid))
    assert sid_codes.dtype == np.int32 and did_codes.dtype == np.int32


def test_load_block_is_mmap_from_node_cache(tmp_path):
    root = str(tmp_path / "spill")
    _fake_spill(root, {0: ([1, 2], [3, 4], [1.0, 1.0])})

    arrays = mod._load_block(root, 0)
    # served as mmaps (OS page cache is the real store) from the node cache
    assert all(isinstance(a, np.memmap) for a in arrays)
    cache = mod._node_cache_dir(root)
    names = sorted(os.listdir(os.path.join(cache, "block=0")))
    assert names == sorted(f"{n}.npy" for n in mod._ARRAYS)
    # a second process-level load (cold dict) reuses the published files
    _reset_cache()
    again = mod._load_block(root, 0)
    assert list(again[0]) == list(arrays[0])


def test_block_absent_from_manifest_is_empty(tmp_path):
    root = str(tmp_path / "spill")
    _fake_spill(root, {0: ([1], [2], [1.0])})  # manifest lists only block 0
    assert mod._load_block(root, 3) is None


def test_missing_manifest_raises_not_empty(tmp_path):
    # unreadable/unshared scratch must raise, never look like an empty graph
    root = str(tmp_path / "nonexistent")
    with pytest.raises(RuntimeError, match="no readable"):
        mod._load_block(root, 0)


def test_listed_block_with_missing_parquet_raises(tmp_path):
    root = str(tmp_path / "spill")
    _fake_spill(root, {0: ([1], [2], [1.0])}, manifest_blocks=[0, 1])
    with pytest.raises(RuntimeError, match="corrupt|no parquet"):
        mod._load_block(root, 1)


def test_node_cache_dir_env_override(tmp_path, monkeypatch):
    # PAGERANK_CSR_CACHE_DIR redirects the node cache (e.g. to NVMe on
    # memory-tight executors); default prefers /dev/shm when present
    monkeypatch.setenv("PAGERANK_CSR_CACHE_DIR", str(tmp_path))
    d = mod._node_cache_dir("/some/scratch/run-abc")
    assert d.startswith(str(tmp_path))
    monkeypatch.delenv("PAGERANK_CSR_CACHE_DIR")
    d2 = mod._node_cache_dir("/some/scratch/run-abc")
    assert d2.startswith("/dev/shm") or not os.path.isdir("/dev/shm")
    # keyed by the scratch path: different spill => different cache dir
    assert mod._node_cache_dir("/some/scratch/run-xyz") != d2
