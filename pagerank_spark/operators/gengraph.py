"""Deterministic R-MAT graph generation (Chakrabarti, Zhan & Faloutsos,
SDM'04) — the synthetic power-law graphs Graph500 and every scale test
use, generated as a pure Column expression so a 10^12-edge test graph
needs NO driver-side RNG, no shuffle, and no stored input: each edge is a
pure function of its index.

Edge i picks one of four adjacency-matrix quadrants per recursion level
(probabilities a, b, c, d), assembling one src bit and one dst bit per
level; ``scale`` levels give 2^scale vertices. The quadrant draw at
(edge, level) is the engine's deterministic md5 uniform
(sampling.uniform01), so the SAME graph materializes on every run, any
partitioning, and in the DuckDB twin — reproducible benchmarks without
shipping data. Defaults a=0.57, b=0.19, c=0.19, d=0.05 (Graph500).

Self-loops and duplicate edges are kept (R-MAT semantics; LinkGraph's
coalesce handles them downstream like any crawl feed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pagerank_spark.operators.sampling import uniform01

RMAT_A = 0.57
RMAT_B = 0.19
RMAT_C = 0.19
RMAT_D = 0.05


def rmat_edges(
    indices: DataFrame,
    scale: int,
    a: float = RMAT_A,
    b: float = RMAT_B,
    c: float = RMAT_C,
    seed: str = "rmat",
    index_col: str = "edge_id",
) -> DataFrame:
    """(src, dst) string vertices 'v0'..'v{2^scale-1}', one edge per row
    of ``indices``. Per level l the draw u = uniform01(edge_id|l, seed)
    selects the quadrant by the cumulative cut a / a+b / a+b+c (d is the
    remainder); quadrant bit pairs (0,0)/(0,1)/(1,0)/(1,1) accumulate
    into the vertex ids most-significant-level-first. Pure Column
    arithmetic — one codegen'd scan, zero shuffle, zero Python
    (plan-audited)."""
    if scale < 1:
        raise ValueError("scale must be >= 1")
    if not (0 < a and 0 <= b and 0 <= c and a + b + c < 1):
        raise ValueError("quadrant probabilities must be positive with a+b+c < 1")
    i = F.col(index_col).cast("long")
    src = F.lit(0).cast("long")
    dst = F.lit(0).cast("long")
    for lvl in range(scale):
        u = uniform01(F.concat(i.cast("string"), F.lit(f"|{lvl}")), seed)
        q = (
            F.when(u < a, F.lit(0))
            .when(u < a + b, F.lit(1))
            .when(u < a + b + c, F.lit(2))
            .otherwise(F.lit(3))
        )
        bit = F.lit(1 << (scale - 1 - lvl)).cast("long")
        src = src + F.when(q >= 2, bit).otherwise(F.lit(0).cast("long"))
        dst = dst + F.when((q == 1) | (q == 3), bit).otherwise(
            F.lit(0).cast("long")
        )
    return indices.select(
        F.concat(F.lit("v"), src.cast("string")).alias("src"),
        F.concat(F.lit("v"), dst.cast("string")).alias("dst"),
    )
