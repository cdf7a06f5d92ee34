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
    published = [os.path.join(d, "block=0") for d in mod._node_cache_dirs(root)
                 if os.path.isdir(os.path.join(d, "block=0"))]
    assert len(published) == 1  # exactly one base holds the block
    names = sorted(os.listdir(published[0]))
    assert names == sorted([f"{n}.npy" for n in mod._ARRAYS] + [mod._BLOCK_META])
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
    # memory-tight executors) and replaces the whole candidate list;
    # default prefers /dev/shm when present, with the disk tempdir as the
    # always-available fallback base
    monkeypatch.setenv("PAGERANK_CSR_CACHE_DIR", str(tmp_path))
    dirs = mod._node_cache_dirs("/some/scratch/run-abc")
    assert len(dirs) == 1 and dirs[0].startswith(str(tmp_path))
    monkeypatch.delenv("PAGERANK_CSR_CACHE_DIR")
    dirs2 = mod._node_cache_dirs("/some/scratch/run-abc")
    if os.path.isdir("/dev/shm"):
        assert dirs2[0].startswith("/dev/shm") and len(dirs2) == 2
    # keyed by the scratch path: different spill => different cache dirs
    assert mod._node_cache_dirs("/some/scratch/run-xyz") != dirs2


def test_evicted_cache_dir_is_rebuilt_from_spill(tmp_path):
    # round-4 hardening: /dev/shm is bounded — a block dir deleted by tmpfs
    # pressure (or a tmp cleaner) between runs must be REBUILT from the
    # spill, not crash and not serve garbage
    root = str(tmp_path / "spill")
    sid, did, w = [5, 9, 5], [1, 1, 2], [0.5, 1.0, 0.5]
    _fake_spill(root, {0: (sid, did, w)})

    first = tuple(list(a) for a in mod._load_block(root, 0))
    # evict: remove every base's copy, as tmpfs pressure would
    import shutil
    for d in mod._node_cache_dirs(root):
        shutil.rmtree(os.path.join(d, "block=0"), ignore_errors=True)
    _reset_cache()
    rebuilt = tuple(list(a) for a in mod._load_block(root, 0))
    assert rebuilt == first


def test_truncated_cache_is_detected_and_rebuilt(tmp_path):
    # verify-on-load: an array shorter than its length manifest entry (the
    # mid-write/truncation corruption mode) is detected, the block is
    # rebuilt from the spill, and the result is correct — never a silent
    # garbage mapping
    root = str(tmp_path / "spill")
    sid, did, w = [5, 9, 5, 7], [1, 1, 2, 3], [0.5, 1.0, 0.5, 1.0]
    _fake_spill(root, {0: (sid, did, w)})

    first = tuple(list(a) for a in mod._load_block(root, 0))
    blockdir = [os.path.join(d, "block=0") for d in mod._node_cache_dirs(root)
                if os.path.isdir(os.path.join(d, "block=0"))][0]
    # truncate one array but leave the manifest claiming the full length
    np.save(os.path.join(blockdir, "w.npy"), np.array([0.5]), allow_pickle=False)
    _reset_cache()
    rebuilt = tuple(list(a) for a in mod._load_block(root, 0))
    assert rebuilt == first


def test_evicted_cache_with_dead_spill_raises_cleanly(tmp_path):
    # if the cache is gone AND the spill cannot rebuild it, the kernel must
    # raise (converging to garbage ranks is the unacceptable outcome)
    root = str(tmp_path / "spill")
    _fake_spill(root, {0: ([1], [2], [1.0])})
    mod._load_block(root, 0)

    import shutil
    for d in mod._node_cache_dirs(root):
        shutil.rmtree(os.path.join(d, "block=0"), ignore_errors=True)
    shutil.rmtree(f"{root}/block=0")  # spill data gone; manifest remains
    _reset_cache()
    with pytest.raises(RuntimeError, match="corrupt|could not be rebuilt"):
        mod._load_block(root, 0)


def test_shm_budget_skips_tight_base(tmp_path, monkeypatch):
    # cache-budget rule: when the block's arrays exceed the budget fraction
    # of a base's free space, that base is skipped and the block lands on
    # the fallback base — filling tmpfs would SIGBUS someone else's mapping
    if not os.path.isdir("/dev/shm"):
        pytest.skip("no /dev/shm on this host")
    monkeypatch.delenv("PAGERANK_CSR_CACHE_DIR", raising=False)
    root = str(tmp_path / "spill")
    _fake_spill(root, {0: ([1, 2, 3], [4, 5, 6], [1.0, 1.0, 1.0])})

    monkeypatch.setattr(mod, "_SHM_BUDGET_FRACTION", 0.0)  # nothing fits shm
    arrays = mod._load_block(root, 0)
    assert list(arrays[0]) == [1, 2, 3]
    shm_dir, fallback_dir = mod._node_cache_dirs(root)
    assert not os.path.isdir(os.path.join(shm_dir, "block=0"))
    assert os.path.isdir(os.path.join(fallback_dir, "block=0"))
