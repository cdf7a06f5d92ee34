"""Linear text-classifier inference over hashed bag-of-words features —
the "apply a trained quality/toxicity/domain classifier to the whole
corpus" step of an LLM-data pipeline (the fastText-shaped filter of
CCNet/RedPajama/Dolma), expressed as a broadcast join + one
partial-aggregated rollup.

Model contract: a (bucket, weight) table + a scalar bias. Features are
the hashing trick (Weinberger et al. 2009): token -> 60-bit md5 ->
``% n_buckets``; the document's logit is

    z = bias + (1 / n_tokens) * sum_t weight[bucket(t)]

i.e. mean-pooled hashed embeddings with a scalar output head. The
decision ``pass = z >= threshold`` is taken on the 6dp-ROUNDED logit so
the boolean can never straddle an engine ulp, and the sigmoid is left
out of the hashed output entirely — it is monotone, so thresholding the
logit IS thresholding the probability (p >= sigmoid^-1-image of the
threshold), and keeping libm's ``exp`` out of the contract keeps the
value hash bit-stable across engines.

Scale shape: the model broadcasts (even a 2M-bucket float table is
~16 MB); the corpus-sized side takes ONE explode (no shuffle — tokens
stay with their document), a broadcast hash join against the weights,
and ONE partial-aggregated groupBy(doc_id) whose map-side combine
collapses every document to a single row before the exchange. Weights
are 9dp-quantized and summed in DECIMAL(38,9) (exact — decimal x int
counts), the mean is one double division, so both engines produce the
identical IEEE double before the final round.

The reference (laurenleadbetter/Pagerank) has no corpus layer; this
joins gopher_filter / unigram_logloss / c4_filter as the model-driven
member of the document-quality family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pagerank_spark.operators.textops import hexint15
from pagerank_spark.operators.textsearch import tokens_col


def hashed_token_buckets(
    docs: DataFrame,
    n_buckets: int,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, bucket) — one row per token occurrence, bucketed by the
    hashing trick (60-bit md5 of the token, mod ``n_buckets``; the hash
    is non-negative so ``%`` and ``pmod`` agree). DuckDB twin of the
    bucket: ``('0x' || substr(md5(term), 1, 15))::BIGINT % n_buckets``."""
    if n_buckets < 1:
        raise ValueError("n_buckets must be >= 1")
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokens_col(F.col(text_col))).alias("_term"),
    ).select(
        "doc_id", (hexint15(F.col("_term")) % F.lit(n_buckets)).alias("bucket")
    )


def linear_text_classifier(
    docs: DataFrame,
    weights: DataFrame,
    n_buckets: int,
    bias: float = 0.0,
    threshold: float = 0.0,
    text_col: str = "text",
    id_col: str = "doc_id",
    bucket_col: str = "bucket",
    weight_col: str = "weight",
) -> DataFrame:
    """(doc_id, n_tokens, logit, pass) — mean-pooled hashed-bag-of-words
    linear scores for every document. ``weights`` is the model: one row
    per bucket (missing buckets contribute 0 — an untrained/pruned
    feature). Documents with no tokens get logit = round(bias, 6).

    ``threshold`` is compared against the ROUNDED logit (the
    gopher_filter convention), so the boolean is reproducible anywhere
    the 6dp logit is."""
    w = weights.select(
        F.col(bucket_col).cast("long").alias("bucket"),
        F.round(F.col(weight_col), 9).cast("decimal(38,9)").alias("_w"),
    )
    per_doc = (
        hashed_token_buckets(docs, n_buckets, text_col=text_col, id_col=id_col)
        .join(F.broadcast(w), "bucket", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.sum(F.coalesce(F.col("_w"), F.lit(0).cast("decimal(38,9)"))).alias("_s"),
        )
    )
    base = docs.select(F.col(id_col).alias("doc_id"))
    z = F.round(
        F.when(
            F.col("n_tokens") > 0,
            F.col("_s").cast("double") / F.col("n_tokens") + F.lit(float(bias)),
        ).otherwise(F.lit(float(bias))),
        6,
    )
    return (
        base.join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_tokens"), F.lit(0).cast("long")).alias("n_tokens"),
            z.alias("logit"),
        )
        .withColumn("pass", F.col("logit") >= F.lit(float(threshold)))
    )
