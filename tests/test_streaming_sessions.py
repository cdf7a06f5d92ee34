"""Stateful streaming sessionization (streaming/sessions.py): in-batch gap
splits, cross-batch continuation, watermark-driven timeout closes, and the
open trailing session."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import types as T

EV_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("ts", T.TimestampType(), False),
    ]
)


def _t(minute, second=0):
    return datetime(2026, 1, 1, 10, minute, second)


def _write_batches(spark, tmp_path, batches):
    in_dir = tmp_path / "ev_in"
    in_dir.mkdir(parents=True, exist_ok=True)
    for rows in batches:
        spark.createDataFrame(rows, EV_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(str(in_dir))
    return str(in_dir)


def _run(spark, in_dir, out_dir, ck_dir, gap_minutes=5.0):
    from pagerank_spark.streaming.sessions import (
        streaming_sessionize,
        write_session_log,
    )

    stream = (
        spark.readStream.schema(EV_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    q = write_session_log(
        streaming_sessionize(stream, gap_minutes=gap_minutes, watermark="0 seconds"),
        out_dir,
        ck_dir,
        available_now=True,
    )
    q.awaitTermination(180)
    return spark.read.parquet(out_dir)


def test_streaming_sessions_in_batch_split_and_trailing_open(spark, tmp_path):
    # user 1: events at 10:00,10:02 then a >5min jump to 10:20,10:21 —
    # the first session closes IN the batch; the second stays open
    # (nothing advances the watermark past it)
    batch = [(1, _t(0)), (1, _t(2)), (1, _t(20)), (1, _t(21))]
    in_dir = _write_batches(spark, tmp_path, [batch])
    out = _run(spark, in_dir, str(tmp_path / "o"), str(tmp_path / "c"))
    rows = [(r["session_start"], r["session_end"], r["n_events"])
            for r in out.collect()]
    assert rows == [(_t(0), _t(2), 2)]


def test_streaming_sessions_cross_batch_merge_then_timeout(spark, tmp_path):
    # user 7's session spans batches (10:00,10:03 then 10:06 — within gap
    # of 10:03); a batch-3 event at 10:30 advances the watermark past
    # 10:06+5min, so the merged 3-event session closes via timeout
    b1 = [(7, _t(0)), (7, _t(3))]
    b2 = [(7, _t(6))]
    b3 = [(8, _t(30))]
    in_dir = _write_batches(spark, tmp_path, [b1, b2, b3])
    out = _run(spark, in_dir, str(tmp_path / "o"), str(tmp_path / "c"))
    got = {r["user_id"]: (r["session_start"], r["session_end"], r["n_events"])
           for r in out.collect()}
    assert got == {7: (_t(0), _t(6), 3)}


def test_streaming_sessions_two_users_independent_state(spark, tmp_path):
    b1 = [(1, _t(0)), (2, _t(1))]
    b2 = [(1, _t(2)), (2, _t(30)), (1, _t(30))]
    in_dir = _write_batches(spark, tmp_path, [b1, b2])
    out = _run(spark, in_dir, str(tmp_path / "o"), str(tmp_path / "c"))
    got = {r["user_id"]: (r["session_start"], r["session_end"], r["n_events"])
           for r in out.collect()}
    # both first sessions close on the in-batch jump; the 10:30 sessions
    # stay open
    assert got == {1: (_t(0), _t(2), 2), 2: (_t(1), _t(1), 1)}
