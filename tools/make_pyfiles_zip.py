"""Build the spark-submit --py-files archive for cluster deployment.

    python tools/make_pyfiles_zip.py [out.zip]      # default: pagerank_spark.zip

The archive contains the ``pagerank_spark`` package only (no tests, no
bench harness) and is importable via zipimport — which is exactly how
``spark-submit --py-files pagerank_spark.zip`` exposes it to executors:

    spark-submit --py-files pagerank_spark.zip your_job.py
    spark-submit --py-files pagerank_spark.zip -m pagerank_spark.cli --data ...

The package keeps import-time side effects to zero and never reads files
relative to ``__file__``, so zipimport needs no extraction
(tests/test_packaging.py enforces this by importing from the built zip).
"""

from __future__ import annotations

import os
import sys
import zipfile

PKG = "pagerank_spark"


def build(out_path: str, repo_root: str | None = None) -> str:
    root = repo_root or os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    src = os.path.join(root, PKG)
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for dirpath, dirnames, filenames in os.walk(src):
            dirnames[:] = [d for d in dirnames if d != "__pycache__"]
            for fn in sorted(filenames):
                if not fn.endswith(".py"):
                    continue
                full = os.path.join(dirpath, fn)
                zf.write(full, os.path.relpath(full, root))
    return out_path


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "pagerank_spark.zip"
    print(build(out))
