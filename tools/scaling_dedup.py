"""Two-parallelism-level scaling protocol for the dedup pipeline.

Same honesty rules as bench.py --scaling (the north-rule PageRank protocol):
identical job and identically-partitioned input at N and 4N cores, arms
ALTERNATED within one host window (the sandbox drifts ~2x across hours),
best-of-R per arm, data-sized shuffle partitions.

The measured job is MinHash+LSH near-duplicate detection over a synthetic
corpus inflated from sf0.1's documents table: each source doc yields
``--variants`` distinct documents (every word rewritten with a
variant-dependent hash suffix, so variants share almost no shingles and the
candidate-pair load stays realistic instead of quadratic).

Usage:
  python tools/scaling_dedup.py                     # full protocol
  SPARK_GRAFT_SCALING_CORES=2,8 SPARK_GRAFT_SCALING_REPEATS=2 ...
  python tools/scaling_dedup.py --make-input        # corpus only
  python tools/scaling_dedup.py --arm               # one timed arm
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
PARTS = os.environ.get("SPARK_GRAFT_SHUFFLE_PARTS", "32")
VARIANTS = int(os.environ.get("SPARK_GRAFT_DEDUP_VARIANTS", "100"))


def _spark():
    from pagerank_spark.session import get_spark

    return get_spark(
        "scaling-dedup", master=f"local[{CPUS}]", shuffle_partitions=int(PARTS)
    )


def make_input(out_dir: str) -> None:
    from pyspark.sql import functions as F

    spark = _spark()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "text")
    # repartition BEFORE the explode so one scan task doesn't generate the
    # whole corpus (the source table is a single parquet file)
    docs = docs.repartition(int(PARTS))
    inflated = (
        docs.withColumn("v", F.explode(F.sequence(F.lit(0), F.lit(VARIANTS - 1))))
        .select(
            (F.col("doc_id") * VARIANTS + F.col("v")).alias("doc_id"),
            F.expr(
                "array_join(transform(split(text, ' '), "
                "w -> concat(w, '_', cast(pmod(hash(w, v), 1000) as string))), ' ')"
            ).alias("text"),
        )
    )
    inflated.write.mode("overwrite").parquet(out_dir)
    n = spark.read.parquet(out_dir).count()
    print(json.dumps({"docs": n, "dir": out_dir}))


def run_arm(in_dir: str) -> None:
    from pagerank_spark.operators.dedup import minhash_near_duplicates

    spark = _spark()
    docs = spark.read.parquet(in_dir)
    n = docs.count()  # untimed: input scan warms nothing (no cache), just sizes
    t0 = time.monotonic()
    n_pairs = minhash_near_duplicates(docs, threshold=0.25).count()
    dt = time.monotonic() - t0
    print(
        json.dumps(
            {
                "cores": CPUS,
                "docs": n,
                "pairs": n_pairs,
                "seconds": round(dt, 3),
                "docs_per_sec": round(n / dt, 1),
            }
        )
    )


def main() -> None:
    if "--make-input" in sys.argv:
        make_input(os.environ["SPARK_GRAFT_DEDUP_DIR"])
        return
    if "--arm" in sys.argv:
        run_arm(os.environ["SPARK_GRAFT_DEDUP_DIR"])
        return

    lo, hi = os.environ.get("SPARK_GRAFT_SCALING_CORES", "2,8").split(",")
    repeats = int(os.environ.get("SPARK_GRAFT_SCALING_REPEATS", "2"))
    in_dir = os.environ.get("SPARK_GRAFT_DEDUP_DIR") or tempfile.mkdtemp(
        prefix="scaling_dedup_"
    )
    env_base = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR=SF_DIR,
        SPARK_GRAFT_SHUFFLE_PARTS=PARTS,
        SPARK_GRAFT_DEDUP_DIR=in_dir,
    )
    if not os.path.exists(f"{in_dir}/_SUCCESS"):
        prep = subprocess.run(
            [sys.executable, __file__, "--make-input"],
            capture_output=True, text=True, env=env_base,
        )
        if prep.returncode != 0:
            sys.stderr.write(prep.stderr[-4000:])
            raise SystemExit("corpus materialization failed")
        sys.stderr.write(prep.stdout.strip().splitlines()[-1] + "\n")

    results: dict[str, dict] = {}
    raw: list[dict] = []
    for _ in range(repeats):
        for cores in (lo, hi):
            out = subprocess.run(
                [sys.executable, __file__, "--arm"],
                capture_output=True, text=True,
                env=dict(env_base, SPARK_GRAFT_CPUS=cores),
            )
            if out.returncode != 0:
                sys.stderr.write(out.stderr[-4000:])
                raise SystemExit(f"arm local[{cores}] failed")
            r = json.loads(out.stdout.strip().splitlines()[-1])
            raw.append(r)
            best = results.get(cores)
            if best is None or r["seconds"] < best["seconds"]:
                results[cores] = r
    tlo, thi = results[lo]["docs_per_sec"], results[hi]["docs_per_sec"]
    eff = (thi / int(hi)) / (tlo / int(lo))
    print(
        json.dumps(
            {
                "metric": f"minhash_dedup_scaling_local{lo}_to_local{hi}",
                "sf": SF_DIR,
                "variants": VARIANTS,
                f"local{lo}": results[lo],
                f"local{hi}": results[hi],
                "throughput_ratio": round(thi / tlo, 3),
                "scaling_efficiency": round(eff, 3),
                "raw_runs": raw,
            }
        )
    )


if __name__ == "__main__":
    main()
