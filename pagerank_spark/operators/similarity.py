"""Similarity search over an embedding column (array<float>).

Two paths:

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

Everything is JVM-side Column expressions — no Python UDF in the hot path.
The reference's only similarity operation is gensim ``most_similar`` for query
expansion (pagerank.py:224-227); these operators generalize it to corpus-scale
ANN per the build brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pagerank_spark.operators.textops import hexint15

LSH_PLANES = 8
HEX60 = float(1 << 59)


def _norm_expr(vec_col: str):
    return F.sqrt(
        F.expr(f"aggregate({vec_col}, 0D, (acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))")
    )


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


def lsh_plane_weight(p: int, i: int):
    """Deterministic hyperplane component in [-1, 1): md5-derived so Spark and
    the DuckDB oracle agree bit-for-bit."""
    return hexint15(F.lit(f"plane{p},{i}")).cast("double") / F.lit(HEX60) - F.lit(1.0)


def with_lsh_bucket(
    df: DataFrame, planes: int = LSH_PLANES, vec_col: str = "embedding", dim: int | None = None
) -> DataFrame:
    """Add a `bucket` column: P-bit sign signature under the deterministic
    hyperplanes. One pass, JVM-side."""
    if dim is None:
        dim = len(df.select(vec_col).first()[0])
    bucket = F.lit(0).cast("bigint")
    for p in range(planes):
        dot = sum(
            F.element_at(F.col(vec_col), i + 1).cast("double") * lsh_plane_weight(p, i)
            for i in range(dim)
        )
        bucket = bucket + F.when(dot > 0, F.shiftleft(F.lit(1).cast("bigint"), p)).otherwise(0)
    return df.withColumn("bucket", bucket)


def ann_lsh_topk(
    corpus: DataFrame,
    query_ids: list,
    k: int = 10,
    planes: int = LSH_PLANES,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    multiprobe: bool = True,
) -> DataFrame:
    """(query_id, neighbor_id, cosine, rn) approximate top-k: candidates from
    the query's LSH bucket (plus Hamming-1 neighbor buckets when multiprobe),
    exact cosine rerank within candidates."""
    dim = len(corpus.select(vec_col).first()[0])
    e = with_lsh_bucket(
        corpus.select(
            F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"), _norm_expr(vec_col).alias("_n")
        ).withColumnRenamed("_v", vec_col),
        planes,
        vec_col,
        dim,
    ).withColumnRenamed(vec_col, "_v").persist()

    q = e.where(F.col("_id").isin(query_ids)).select(
        F.col("_id").alias("query_id"),
        F.col("_v").alias("qv"),
        F.col("_n").alias("qn"),
        F.col("bucket").alias("qbucket"),
    )
    if multiprobe:
        probes = F.array(
            F.col("qbucket"),
            *[
                F.col("qbucket").bitwiseXOR(F.shiftleft(F.lit(1).cast("bigint"), p))
                for p in range(planes)
            ],
        )
        q = q.select("query_id", "qv", "qn", F.explode(probes).alias("bucket"))
    else:
        q = q.withColumnRenamed("qbucket", "bucket")

    c = e.select(
        F.col("_id").alias("neighbor_id"),
        F.col("_v").alias("cv"),
        F.col("_n").alias("cn"),
        "bucket",
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
    )
    return out
