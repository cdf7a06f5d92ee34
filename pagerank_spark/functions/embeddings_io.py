"""Loaders for pretrained word-vector tables (the gensim parity shim).

The reference loads gensim's glove-twitter-25 at import time
(pagerank.py:16) and uses only ``most_similar`` from it. This sandbox has no
gensim and no network, so the engine consumes word vectors as a DataFrame —
``(word string, embedding array<float/double>)`` — which
functions/url_query.most_similar and expand_terms operate on.

These loaders document and enforce that contract so the parity claim is
concrete: export the reference's vectors once wherever gensim IS available,

    from gensim import downloader
    kv = downloader.load("glove-twitter-25")
    with open("glove.txt", "w") as f:           # word2vec text format
        f.write(f"{len(kv.index_to_key)} {kv.vector_size}\n")
        for w in kv.index_to_key:
            f.write(w + " " + " ".join(map(str, kv[w])) + "\n")

then load the export here with ``embeddings_from_word2vec_text`` (or convert
to parquet once and use ``embeddings_from_parquet``). Queries expanded
against the exported table match the reference's gensim expansion exactly —
same vectors, same cosine, same top-n.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EMBEDDING_SCHEMA = T.StructType(
    [
        T.StructField("word", T.StringType(), nullable=False),
        T.StructField("embedding", T.ArrayType(T.DoubleType()), nullable=False),
    ]
)


def embeddings_from_word2vec_text(spark: SparkSession, path: str) -> DataFrame:
    """(word, embedding) from a word2vec-text-format export (the format
    gensim's ``KeyedVectors.save_word2vec_format(binary=False)`` writes):
    optional '<count> <dim>' header line, then one 'word v1 v2 ... vd' line
    per word. Parsed entirely JVM-side (split + transform + cast) — the file
    may be arbitrarily large; no driver-side materialization."""
    lines = spark.read.text(path)
    parts = F.split(F.col("value"), " ")
    return (
        lines
        # drop the header row (exactly 2 tokens, both numeric) and blanks
        .where(F.size(parts) > 2)
        .select(
            F.element_at(parts, 1).alias("word"),
            F.expr(
                "transform(slice(split(value, ' '), 2, size(split(value, ' ')) - 1),"
                " s -> CAST(s AS DOUBLE))"
            ).alias("embedding"),
        )
        .where(~F.exists(F.col("embedding"), lambda x: x.isNull()))
    )


def embeddings_from_parquet(spark: SparkSession, path: str) -> DataFrame:
    """(word, embedding) from a parquet export; validates the contract the
    query-expansion operators assume and fails fast with a clear message."""
    df = spark.read.parquet(path)
    cols = set(df.columns)
    if not {"word", "embedding"} <= cols:
        raise ValueError(
            f"embedding table at {path!r} must have columns (word, embedding);"
            f" found {sorted(cols)}"
        )
    vec_type = df.schema["embedding"].dataType
    if not isinstance(vec_type, T.ArrayType) or not isinstance(
        vec_type.elementType, (T.DoubleType, T.FloatType)
    ):
        raise ValueError(
            f"embedding column must be array<float|double>, found {vec_type.simpleString()}"
        )
    return df.select("word", F.col("embedding").cast("array<double>").alias("embedding"))
