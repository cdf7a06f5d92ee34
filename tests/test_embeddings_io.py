"""Pretrained word-vector loader shim (gensim export parity contract)."""

from __future__ import annotations

import pytest


W2V_TEXT = """4 3
corona 1.0 0.0 0.0
covid 0.95 0.05 0.0
pizza 0.1 1.0 0.0
court 0.0 0.0 1.0
"""


def test_word2vec_text_roundtrip_and_expansion(spark, tmp_path):
    from pagerank_spark.functions.embeddings_io import embeddings_from_word2vec_text
    from pagerank_spark.functions.url_query import expand_terms, most_similar

    p = tmp_path / "glove.txt"
    p.write_text(W2V_TEXT)
    emb = embeddings_from_word2vec_text(spark, str(p))
    rows = {r["word"]: r["embedding"] for r in emb.collect()}
    # header dropped, all 4 vocab rows parsed, dim preserved
    assert set(rows) == {"corona", "covid", "pizza", "court"}
    assert rows["corona"] == [1.0, 0.0, 0.0]

    # the loaded table drives the same expansion path the CLI uses
    sims = most_similar(emb, "corona", topn=2)
    assert sims[0][0] == "covid"
    assert "covid" in expand_terms("corona", emb).split()


def test_parquet_loader_validates_contract(spark, tmp_path):
    from pagerank_spark.functions.embeddings_io import embeddings_from_parquet

    good = str(tmp_path / "good.parquet")
    spark.createDataFrame(
        [("w", [1.0, 2.0])], ["word", "embedding"]
    ).write.parquet(good)
    df = embeddings_from_parquet(spark, good)
    assert df.schema["embedding"].dataType.simpleString() == "array<double>"

    bad_cols = str(tmp_path / "bad_cols.parquet")
    spark.createDataFrame([("w", 1.0)], ["word", "score"]).write.parquet(bad_cols)
    with pytest.raises(ValueError, match="must have columns"):
        embeddings_from_parquet(spark, bad_cols)

    bad_type = str(tmp_path / "bad_type.parquet")
    spark.createDataFrame([("w", "x")], ["word", "embedding"]).write.parquet(bad_type)
    with pytest.raises(ValueError, match="array<float|double>|array"):
        embeddings_from_parquet(spark, bad_type)
