"""Parallel-corpus (bitext) candidate mining: find cross-language
document pairs that share rare TRANSLATION-INVARIANT anchor tokens —
numbers, serial/version codes, product ids — and have compatible
lengths. This is the cheap high-precision first stage of web bitext
mining (the STRAND/Resnik-Smith family; modern pipelines like CCMatrix
layer embedding scoring on top of exactly this candidate generation):
translated pages keep their digits even when every word changes.

Scale shape (the cocitation/ngram_jaccard cap-then-join contract):
anchors hash to int64 BEFORE any shuffle, a corpus-wide document
frequency count DROPS ubiquitous anchors (years, '2024', port numbers)
at ``df_cap`` — so the anchor-keyed self-join fans out at most
df_cap^2 rows per anchor, never O(n^2) — and the pair rollup is one
partial-aggregated groupBy. The length-ratio gate is evaluated in exact
integer arithmetic (len_a <= ratio * len_b both ways with a dyadic
ratio), and only pairs with different languages in canonical
(lang_a < lang_b) order survive.

The reference has no multilingual layer; this joins the dedup/similarity
stack as the cross-lingual member — downstream, embedding cosine over
the candidates (operators/similarity.py) is the standard rescore.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pagerank_spark.operators.textops import hexint15
from pagerank_spark.operators.textsearch import tokens_col


def bitext_candidates(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
    df_cap: int = 20,
    min_shared: int = 1,
    max_len_ratio: float = 2.0,
) -> DataFrame:
    """(doc_a, doc_b, lang_a, lang_b, shared_anchors, len_a, len_b) —
    candidate bitext pairs: different languages, >= ``min_shared``
    shared rare digit-bearing anchors (distinct per doc, corpus df <=
    ``df_cap``), token lengths within ``max_len_ratio`` of each other.
    Deterministic; pairs oriented lang_a < lang_b."""
    if df_cap < 1 or min_shared < 1 or max_len_ratio < 1.0:
        raise ValueError("df_cap, min_shared >= 1 and max_len_ratio >= 1 required")
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(lang_col).alias("lang"),
        tokens_col(F.col(text_col)).alias("_toks"),
    )
    an = base.select(
        "doc_id",
        "lang",
        F.explode(F.array_distinct("_toks")).alias("_tok"),
    ).where(
        (F.char_length("_tok") >= 2) & F.col("_tok").rlike("[0-9]")
    ).select("doc_id", "lang", hexint15(F.col("_tok")).alias("a"))
    rare = (
        an.groupBy("a")
        .agg(F.count(F.lit(1)).alias("_df"))
        .where(F.col("_df") <= int(df_cap))
        .select("a")
    )
    ank = an.join(rare, "a", "left_semi")
    pairs = (
        ank.alias("x")
        .join(ank.alias("y"), "a")
        .where(F.col("x.lang") < F.col("y.lang"))
        .groupBy(
            F.col("x.doc_id").alias("doc_a"),
            F.col("y.doc_id").alias("doc_b"),
            F.col("x.lang").alias("lang_a"),
            F.col("y.lang").alias("lang_b"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("shared_anchors"))
        .where(F.col("shared_anchors") >= int(min_shared))
    )
    lens = base.select(
        "doc_id", F.size("_toks").cast("long").alias("n")
    )
    r = float(max_len_ratio)
    return (
        pairs.join(lens.withColumnRenamed("doc_id", "doc_a"), "doc_a")
        .withColumnRenamed("n", "len_a")
        .join(lens.withColumnRenamed("doc_id", "doc_b"), "doc_b")
        .withColumnRenamed("n", "len_b")
        .where(
            (F.col("len_a") <= F.lit(r) * F.col("len_b"))
            & (F.col("len_b") <= F.lit(r) * F.col("len_a"))
        )
        .select(
            "doc_a", "doc_b", "lang_a", "lang_b",
            "shared_anchors", "len_a", "len_b",
        )
    )
