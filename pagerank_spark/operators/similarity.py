"""Similarity search over an embedding column (array<float>).

Three paths:

  * brute_force_topk — exact cosine top-k: broadcast the (small) query set
    against the corpus, JVM-side dot products via zip_with/aggregate, per-query
    top-k via window. The baseline and the oracle-checkable path.

  * ann_lsh_topk — sign-random-projection LSH: P deterministic hyperplanes
    (md5-derived, so the DuckDB oracle reproduces them bit-exactly), corpus
    bucketed by the P-bit sign signature, candidates restricted to the query's
    bucket (optionally multi-probe neighbors at Hamming distance 1), exact
    cosine rerank inside the bucket. At 10^12 vectors the bucket join replaces
    the O(n·q) scan with O(n/2^P · q) per probe; buckets are hash-partitioned
    so the rerank is an ordinary co-partitioned join.

  * lsh_near_duplicate_pairs — pairwise near-dup at corpus scale: both sides
    bucketed, one side expanded to its Hamming-1 probe buckets, single
    equi-join on bucket, exact cosine rerank. No crossJoin anywhere; recall
    for a pair at angle θ with P planes and Hamming-1 probes is
    (1-θ/π)^P + P·(θ/π)·(1-θ/π)^(P-1).

The P-bit signature is computed by a vectorized Arrow pandas_udf (one NumPy
matmul per batch against the dim×P plane matrix) — constant expression size
regardless of dim, unlike a per-dimension unrolled Column expression which
hits codegen limits at realistic dims (768·8 ≈ 6k nodes). Plane weights are
md5-derived scalars shared verbatim with the DuckDB oracle.

The reference's only similarity operation is gensim ``most_similar`` for query
expansion (pagerank.py:224-227); these operators generalize it to corpus-scale
ANN per the build brief.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

LSH_PLANES = 8
PAIR_LSH_PLANES = 4  # pairwise near-dup default: fewer planes => higher recall
HEX60 = float(1 << 59)


def plane_weight(p: int, i: int) -> float:
    """Deterministic hyperplane component in [-1, 1): md5-derived so Spark and
    the DuckDB oracle agree bit-for-bit on the plane matrix."""
    h = int(hashlib.md5(f"plane{p},{i}".encode()).hexdigest()[:15], 16)
    return h / HEX60 - 1.0


def plane_matrix(planes: int, dim: int) -> np.ndarray:
    """dim × planes float64 matrix of deterministic hyperplane weights."""
    return np.array(
        [[plane_weight(p, i) for p in range(planes)] for i in range(dim)], dtype=np.float64
    )


def _norm_expr(vec_col: str):
    return F.sqrt(
        F.expr(f"aggregate({vec_col}, 0D, (acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))")
    )


def _infer_dim(df: DataFrame, vec_col: str) -> int:
    """One tiny job; raises a clear error on an empty corpus."""
    row = df.select(F.size(F.col(vec_col)).alias("d")).limit(1).collect()
    if not row:
        raise ValueError("cannot infer embedding dim from an empty corpus; pass dim=")
    return int(row[0]["d"])


def with_lsh_bucket(
    df: DataFrame, planes: int = LSH_PLANES, vec_col: str = "embedding", dim: int | None = None
) -> DataFrame:
    """Add a `bucket` column: P-bit sign signature under the deterministic
    hyperplanes. One Arrow batch matmul per partition — no per-dimension
    expression unrolling, works at any dim."""
    if dim is None:
        dim = _infer_dim(df, vec_col)
    W = plane_matrix(planes, dim)
    shifts = (np.int64(1) << np.arange(planes, dtype=np.int64))

    @pandas_udf("bigint")
    def _bucket(v: pd.Series) -> pd.Series:
        if len(v) == 0:
            return pd.Series([], dtype="int64")
        M = np.vstack(v.to_numpy()).astype(np.float64)  # batch × dim
        bits = (M @ W) > 0  # batch × planes
        return pd.Series((bits.astype(np.int64) * shifts).sum(axis=1))

    return df.withColumn("bucket", _bucket(F.col(vec_col)))


def brute_force_topk(
    corpus: DataFrame,
    query_ids: list,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(query_id, neighbor_id, cosine, rn) exact top-k cosine neighbors for
    each query vector (queries drawn from the corpus by id; self excluded).

    Deterministic ordering: (round(cosine,6) DESC, neighbor_id ASC)."""
    e = corpus.select(
        F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"), _norm_expr(vec_col).alias("_n")
    )
    q = e.where(F.col("_id").isin(query_ids)).select(
        F.col("_id").alias("query_id"), F.col("_v").alias("qv"), F.col("_n").alias("qn")
    )
    c = e.select(
        F.col("_id").alias("neighbor_id"), F.col("_v").alias("cv"), F.col("_n").alias("cn")
    )
    dot = F.expr(
        "aggregate(zip_with(qv, cv, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 0D, (acc, v) -> acc + v)"
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        F.broadcast(q)
        .crossJoin(c)
        .where(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", F.round(dot / (F.col("qn") * F.col("cn")), 6))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "cosine", "rn")
    )


def _probe_buckets(bucket_col, planes: int):
    """array(own bucket, each Hamming-1 neighbor bucket)."""
    return F.array(
        bucket_col,
        *[
            bucket_col.bitwiseXOR(F.shiftleft(F.lit(1).cast("bigint"), p))
            for p in range(planes)
        ],
    )


def ann_lsh_topk(
    corpus: DataFrame,
    query_ids: list,
    k: int = 10,
    planes: int = LSH_PLANES,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    multiprobe: bool = True,
    dim: int | None = None,
) -> DataFrame:
    """(query_id, neighbor_id, cosine, rn) approximate top-k: candidates from
    the query's LSH bucket (plus Hamming-1 neighbor buckets when multiprobe),
    exact cosine rerank within candidates. Result is materialized (it is
    query-set-sized) so intermediates can be unpersisted before returning."""
    if dim is None:
        dim = _infer_dim(corpus, vec_col)
    e = with_lsh_bucket(
        corpus.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"),
                      _norm_expr(vec_col).alias("_n")).withColumnRenamed("_v", vec_col),
        planes, vec_col, dim,
    ).withColumnRenamed(vec_col, "_v").persist()

    q = e.where(F.col("_id").isin(query_ids)).select(
        F.col("_id").alias("query_id"),
        F.col("_v").alias("qv"),
        F.col("_n").alias("qn"),
        F.col("bucket").alias("qbucket"),
    )
    if multiprobe:
        q = q.select(
            "query_id", "qv", "qn",
            F.explode(_probe_buckets(F.col("qbucket"), planes)).alias("bucket"),
        )
    else:
        q = q.withColumnRenamed("qbucket", "bucket")

    c = e.select(
        F.col("_id").alias("neighbor_id"), F.col("_v").alias("cv"),
        F.col("_n").alias("cn"), "bucket",
    )
    dot = F.expr(
        "aggregate(zip_with(qv, cv, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 0D, (acc, v) -> acc + v)"
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    out = (
        F.broadcast(q)
        .join(c, "bucket")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", F.round(dot / (F.col("qn") * F.col("cn")), 6))
        .dropDuplicates(["query_id", "neighbor_id"])
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "cosine", "rn")
    ).localCheckpoint(eager=True)
    e.unpersist()
    return out


def lsh_near_duplicate_pairs(
    embeddings: DataFrame,
    threshold: float = 0.95,
    planes: int = PAIR_LSH_PLANES,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    multiprobe: bool = True,
    dim: int | None = None,
) -> DataFrame:
    """(id_a, id_b, cosine) pairs with cosine >= threshold among LSH-bucketed
    candidates — the corpus-scale pairwise near-dup path (no crossJoin).

    One side is expanded to its Hamming-1 probe buckets, the other stays in
    its own bucket; a pair is caught iff their signatures differ in <= 1 bit
    (multiprobe) or agree exactly. Approximate by construction: pairs whose
    signatures differ in more bits are not candidates (recall formula in the
    module docstring — raise recall with fewer planes or more probes)."""
    if dim is None:
        dim = _infer_dim(embeddings, vec_col)
    e = with_lsh_bucket(
        embeddings.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"),
                          _norm_expr(vec_col).alias("_n")).withColumnRenamed("_v", vec_col),
        planes, vec_col, dim,
    ).withColumnRenamed(vec_col, "_v").persist()

    a = e.select(
        F.col("_id").alias("id_a"), F.col("_v").alias("va"), F.col("_n").alias("na"),
        F.col("bucket").alias("_ba"),
    )
    if multiprobe:
        a = a.select(
            "id_a", "va", "na", F.explode(_probe_buckets(F.col("_ba"), planes)).alias("bucket")
        )
    else:
        a = a.withColumnRenamed("_ba", "bucket")
    b = e.select(
        F.col("_id").alias("id_b"), F.col("_v").alias("vb"), F.col("_n").alias("nb"), "bucket"
    )
    dot = F.expr(
        "aggregate(zip_with(va, vb, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 0D, (acc, v) -> acc + v)"
    )
    out = (
        a.join(b, "bucket")
        .where(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
        .withColumn("cosine", F.round(dot / (F.col("na") * F.col("nb")), 6))
        .where(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    ).localCheckpoint(eager=True)
    e.unpersist()
    return out
