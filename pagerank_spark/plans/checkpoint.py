"""Durable per-iteration checkpointing with lineage metrics (north rule).

Every iteration writes the rank vector as partitioned parquet plus a JSON
manifest recording iteration number, residual, dangling mass (hex-exact
floats), per-partition row counts, wall time, and edges/sec. A killed job
resumes from the latest COMPLETE manifest without recomputing earlier
iterations; resumed runs are bit-for-bit identical to uninterrupted ones
(parquet doubles round-trip exactly; scalars round-trip via float.hex).

Layout:
    <dir>/iter=K/data/*.parquet      rank vector (url, v, dangling, rank)
    <dir>/iter=K/MANIFEST.json       written LAST => presence == completeness
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class IterationCheckpointer:
    def __init__(
        self,
        spark: SparkSession,
        directory: str,
        num_partitions: int,
        every: int = 1,
        n_edges: int | None = None,
    ):
        self.spark = spark
        self.dir = directory
        self.num_partitions = num_partitions
        self.every = max(1, every)
        self.n_edges = n_edges
        os.makedirs(directory, exist_ok=True)
        self._t_iter = time.monotonic()

    # -- write ---------------------------------------------------------------

    def save(self, iteration: int, x: DataFrame, dangling_mass: float, residual: float) -> DataFrame:
        """Persist iteration state; returns a DataFrame re-read from parquet so
        downstream lineage starts at the checkpoint (and memory is bounded)."""
        if iteration % self.every != 0:
            return x
        wall = time.monotonic() - self._t_iter
        self._t_iter = time.monotonic()
        path = os.path.join(self.dir, f"iter={iteration}")
        data = os.path.join(path, "data")
        x.repartition(self.num_partitions, "url").write.mode("overwrite").parquet(data)

        df = self.spark.read.parquet(data)
        part_counts = (
            df.groupBy(F.spark_partition_id().alias("pid"))
            .count()
            .collect()
        )
        manifest = {
            "iteration": iteration,
            "residual": residual,
            "residual_hex": float(residual).hex(),
            "dangling_mass": dangling_mass,
            "dangling_mass_hex": float(dangling_mass).hex(),
            "num_partitions": self.num_partitions,
            "partition_rows": {str(r["pid"]): r["count"] for r in part_counts},
            "rows": int(sum(r["count"] for r in part_counts)),
            "wall_s": wall,
            "edges_per_sec": (self.n_edges / wall) if (self.n_edges and wall > 0) else None,
        }
        tmp = os.path.join(path, "MANIFEST.json.tmp")
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=1)
        os.replace(tmp, os.path.join(path, "MANIFEST.json"))
        return df.repartition(self.num_partitions, "url")

    # -- resume --------------------------------------------------------------

    def latest_complete(self) -> int | None:
        best = None
        if not os.path.isdir(self.dir):
            return None
        for name in os.listdir(self.dir):
            if name.startswith("iter=") and os.path.exists(
                os.path.join(self.dir, name, "MANIFEST.json")
            ):
                k = int(name.split("=")[1])
                best = k if best is None else max(best, k)
        return best

    def try_resume(self):
        """Return (next_iteration, x, dangling_mass) or None if no checkpoint."""
        k = self.latest_complete()
        if k is None:
            return None
        path = os.path.join(self.dir, f"iter={k}")
        with open(os.path.join(path, "MANIFEST.json")) as f:
            manifest = json.load(f)
        x = (
            self.spark.read.parquet(os.path.join(path, "data"))
            .repartition(self.num_partitions, "url")
        )
        dangling_mass = float.fromhex(manifest["dangling_mass_hex"])
        return k + 1, x, dangling_mass

    def read_manifests(self) -> list[dict]:
        out = []
        for name in sorted(
            (n for n in os.listdir(self.dir) if n.startswith("iter=")),
            key=lambda n: int(n.split("=")[1]),
        ):
            p = os.path.join(self.dir, name, "MANIFEST.json")
            if os.path.exists(p):
                with open(p) as f:
                    out.append(json.load(f))
        return out
