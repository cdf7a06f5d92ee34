"""spark-submit --py-files deliverable: the package must work from a zip.

--py-files distributes the archive to executors and puts it on sys.path
WITHOUT extraction, so every module must be zipimport-clean: no import-time
side effects, no __file__-relative data reads. A subprocess import from the
built zip (repo root deliberately NOT on sys.path) enforces it.
"""

from __future__ import annotations

import os
import subprocess
import sys


def test_pyfiles_zip_is_zipimportable(tmp_path):
    sys.path.insert(0, "/root/repo/tools")
    try:
        from make_pyfiles_zip import build
    finally:
        sys.path.pop(0)

    out = build(str(tmp_path / "pagerank_spark.zip"), repo_root="/root/repo")
    assert os.path.getsize(out) > 10_000

    code = (
        "import pagerank_spark, pagerank_spark.cli, "
        "pagerank_spark.operators.pagerank_csr, "
        "pagerank_spark.operators.dedup, pagerank_spark.streaming.ingest; "
        "import os, pagerank_spark.operators.graph_build as gb; "
        "assert '.zip' in pagerank_spark.__file__, pagerank_spark.__file__; "
        "print('zipimport-ok')"
    )
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["PYTHONPATH"] = out
    p = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        env=env, cwd=str(tmp_path),
    )
    assert p.returncode == 0, p.stderr[-2000:]
    assert "zipimport-ok" in p.stdout
