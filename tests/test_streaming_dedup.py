"""Stateful streaming exact-dedup (streaming/dedup.py): cross-micro-batch
suppression via applyInPandasWithState, stream ≡ batch keep rule, and state
survival across a query restart."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import types as T

DOCS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("text", T.StringType(), True),
    ]
)

# batch 1: A appears twice (ids 3,1 -> min id 1 wins), B once
# batch 2: A re-appears (must be suppressed by state), C is new
BATCH1 = [(3, "alpha text"), (1, "alpha  TEXT "), (2, "beta text")]
BATCH2 = [(4, "alpha text"), (5, "gamma text")]


def _write_batches(spark, tmp_path, batches):
    in_dir = tmp_path / "docs_in"
    in_dir.mkdir(parents=True, exist_ok=True)
    for rows in batches:
        spark.createDataFrame(rows, DOCS_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(str(in_dir))
    return str(in_dir)


def _run(spark, in_dir, out_dir, ck_dir):
    from pagerank_spark.streaming.dedup import streaming_exact_dedup, write_deduped_log

    stream = (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", 1)  # one parquet file per micro-batch
        .parquet(in_dir)
    )
    q = write_deduped_log(
        streaming_exact_dedup(stream), out_dir, ck_dir, available_now=True
    )
    q.awaitTermination(180)


def test_streaming_dedup_cross_batch(spark, tmp_path):
    in_dir = _write_batches(spark, tmp_path, [BATCH1, BATCH2])
    out_dir, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    _run(spark, in_dir, out_dir, ck)

    got = {r["text_hash"]: r["doc_id"] for r in spark.read.parquet(out_dir).collect()}
    # one row per distinct normalized text; 'alpha text' normalizes equal
    # for ids 1/3/4, min-id-in-first-batch 1 wins; batch-2 re-crawl suppressed
    assert len(got) == 3
    assert sorted(got.values()) == [1, 2, 5]

    # with ids assigned in arrival order (min id of each text in its first
    # batch, as here) the stream's survivors equal the batch operator's
    # global-min keep_ids over the concatenated input
    from pagerank_spark.operators.dedup import exact_duplicates

    all_docs = spark.createDataFrame(BATCH1 + BATCH2, DOCS_SCHEMA)
    batch_keep = {
        r["text_hash"]: r["keep_id"] for r in exact_duplicates(all_docs).collect()
    }
    assert batch_keep == got


def test_streaming_dedup_first_seen_wins_on_late_smaller_id(spark, tmp_path):
    # the documented divergence from batch semantics: an emitted survivor
    # cannot be retracted, so a LATER batch re-carrying a smaller id for an
    # already-seen text is suppressed (first-seen-wins), while the batch
    # operator over the concatenated input would keep the smaller id
    in_dir = _write_batches(
        spark, tmp_path, [[(5, "zeta text")], [(2, "zeta text")]]
    )
    out_dir, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    _run(spark, in_dir, out_dir, ck)
    assert [r["doc_id"] for r in spark.read.parquet(out_dir).collect()] == [5]


def test_streaming_dedup_state_survives_restart(spark, tmp_path):
    out_dir, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    in_dir = _write_batches(spark, tmp_path, [BATCH1])
    _run(spark, in_dir, out_dir, ck)
    assert sorted(
        r["doc_id"] for r in spark.read.parquet(out_dir).collect()
    ) == [1, 2]

    # second query run, same checkpoint: the state store remembers batch 1,
    # so the re-crawled 'alpha text' stays suppressed
    _write_batches(spark, tmp_path, [BATCH2])
    _run(spark, in_dir, out_dir, ck)
    got = pd.DataFrame(
        [(r["doc_id"], r["text_hash"]) for r in spark.read.parquet(out_dir).collect()],
        columns=["doc_id", "h"],
    )
    assert sorted(got["doc_id"]) == [1, 2, 5]
    assert got["h"].nunique() == 3
