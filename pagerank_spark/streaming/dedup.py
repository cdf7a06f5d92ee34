"""Stateful streaming exact-dedup: emit each distinct document once, ever.

A batch `drop_exact_duplicates` (operators/dedup.py) dedups within one
dataset; an ingest stream needs dedup across the whole stream lifetime —
a document seen in micro-batch 1 must suppress its re-crawls in micro-batch
10^6. This is Structured Streaming's custom-stateful-operator shape:
``groupBy(text_hash).applyInPandasWithState`` with one tiny state row per
distinct hash.

Scale design:
  * State is keyed by the 32-char md5 of normalized text and hash-partitioned
    by Spark's state store — per-key state is one (first_doc_id, n_seen)
    row, so 10^12 distinct docs cost ~50 bytes/key spread over the cluster's
    state backend (RocksDB in production confs).
  * The dedup decision never shuffles document payloads twice: the one
    exchange is the groupBy on the 128-bit hash, the same shuffle the batch
    operator pays.
  * Arrow-batched pandas on the executor (input_hint mandate) — the state
    function sees whole per-key pandas frames, never row-at-a-time Python.
  * Semantics are FIRST-SEEN-WINS: the survivor is the min doc_id within
    the first micro-batch that contained the text. That equals the batch
    operator's global-min keep_id whenever ids arrive in non-decreasing
    order across batches (the normal ingest case: ids assigned at arrival);
    if a LATER batch re-carries a smaller id, streaming keeps the earlier
    doc while batch-over-everything would keep the smaller id — inherent to
    streaming (an emitted survivor cannot be retracted from an append sink).
    Both behaviors are pinned in tests/test_streaming_dedup.py.
"""

from __future__ import annotations

from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

DEDUP_OUT_SCHEMA = T.StructType(
    [
        T.StructField("text_hash", T.StringType(), False),
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("text", T.StringType(), True),
    ]
)

# (first_doc_id, n_first_batch) per distinct hash — written ONCE at first
# sight; duplicate batches read the state but never write it (no state-store
# write amplification on the re-crawl path)
DEDUP_STATE_SCHEMA = T.StructType(
    [
        T.StructField("first_doc_id", T.LongType(), False),
        T.StructField("n_first_batch", T.LongType(), False),
    ]
)


def _dedup_state_fn(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    if state.exists:
        return  # seen in an earlier micro-batch: emit nothing, write nothing
    batch = pd.concat(list(pdfs), ignore_index=True)
    winner = batch.sort_values("doc_id").iloc[0]
    state.update((int(winner["doc_id"]), len(batch)))
    yield pd.DataFrame(
        {
            "text_hash": [key[0]],
            "doc_id": [int(winner["doc_id"])],
            "text": [winner["text"]],
        }
    )


def streaming_exact_dedup(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """First-seen-wins exact dedup over a streaming DataFrame of documents.

    Input: a streaming (doc_id, text, ...) frame. Output: one
    (text_hash, doc_id, text) row per distinct normalized text across the
    entire stream, the row being the min-doc_id instance from the FIRST
    micro-batch that contained it. Normalization is byte-identical to the
    batch operator (textops.normalized_text), and when ids are assigned in
    arrival order (non-decreasing across batches) the survivor equals the
    batch operator's global-min keep_id; see the module docstring for the
    one divergence streaming inherently has (a later batch re-carrying a
    smaller id cannot unseat an already-emitted survivor).
    """
    from pagerank_spark.operators.textops import normalized_text

    norm = normalized_text(F.col(text_col))
    keyed = docs.select(
        F.md5(norm).alias("text_hash"),
        F.col(id_col).cast("long").alias("doc_id"),
        F.col(text_col).alias("text"),
    )
    return keyed.groupBy("text_hash").applyInPandasWithState(
        _dedup_state_fn,
        outputStructType=DEDUP_OUT_SCHEMA,
        stateStructType=DEDUP_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def write_deduped_log(
    deduped: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    available_now: bool = False,
):
    """Sink the deduped stream to an append-only parquet log (exactly-once
    via the streaming checkpoint; resuming the query resumes the state
    store, so dedup state survives restarts)."""
    w = (
        deduped.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        w = w.trigger(availableNow=True)
    return w.start()
