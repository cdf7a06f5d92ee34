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
  * Within a micro-batch the winner is the min doc_id, matching the batch
    operator's keep_id = MIN(doc_id) semantics, so stream ≡ batch on any
    prefix of the input (asserted in tests/test_streaming_dedup.py).
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

# (first_doc_id, n_seen) per distinct hash
DEDUP_STATE_SCHEMA = T.StructType(
    [
        T.StructField("first_doc_id", T.LongType(), False),
        T.StructField("n_seen", T.LongType(), False),
    ]
)


def _dedup_state_fn(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    batch = pd.concat(list(pdfs), ignore_index=True)
    if state.exists:
        first_id, n_seen = state.get
        state.update((int(first_id), int(n_seen) + len(batch)))
        return  # seen in an earlier micro-batch: emit nothing
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
    entire stream, the row being the min-doc_id instance from the first
    micro-batch that contained it — identical normalization + keep rule as
    the batch operator (dedup.exact_duplicates), so replaying a stream
    through this and running the batch dedup over the concatenated input
    agree on every prefix.
    """
    norm = F.regexp_replace(F.trim(F.lower(F.col(text_col))), r"\s+", " ")
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
